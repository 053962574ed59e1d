"""Core-guided (OLL) objective descent: oracle tests vs brute force.

Mirrors the reference's optimization.cc test approach: small weighted
boolean optimization models with exhaustively known optima.
"""

import itertools
import random

import pytest

from ortools_tpu.sat import CpModel, CpSolver, OPTIMAL, INFEASIBLE


def _brute_force_min(model_builder):
    """model_builder(assign) -> (feasible, objective) over all assignments."""
    best = None
    for bits in itertools.product([0, 1], repeat=model_builder.n):
        ok, obj = model_builder.evaluate(bits)
        if ok and (best is None or obj < best):
            best = obj
    return best


class _WeightedCover:
    """min sum(w_i x_i) s.t. each clause of vars has one x true."""

    def __init__(self, n, clauses, weights):
        self.n, self.clauses, self.weights = n, clauses, weights

    def evaluate(self, bits):
        ok = all(any(bits[v] for v in cl) for cl in self.clauses)
        return ok, sum(w * b for w, b in zip(self.weights, bits))

    def build(self):
        m = CpModel()
        xs = [m.new_bool_var(f"x{i}") for i in range(self.n)]
        for cl in self.clauses:
            m.add_bool_or([xs[v] for v in cl])
        m.minimize(sum(w * x for w, x in zip(self.weights, xs)))
        return m


def test_weighted_set_cover_small():
    inst = _WeightedCover(
        4, [[0, 1], [1, 2], [2, 3], [0, 3]], [3, 5, 4, 2]
    )
    m = inst.build()
    solver = CpSolver()
    status = solver.solve(m)
    assert status == OPTIMAL
    assert solver.objective_value == _brute_force_min(inst)


def test_core_guided_direct():
    from ortools_tpu.sat.core_guided import minimize_core_guided

    inst = _WeightedCover(
        5, [[0, 1], [1, 2], [2, 3], [3, 4], [0, 4], [0, 2]], [2, 3, 4, 1, 5]
    )
    m = inst.build()
    st, values, bound, _ = minimize_core_guided(m.ir)
    assert st == 1
    assert bound == _brute_force_min(inst)
    ok, obj = inst.evaluate(values[: inst.n])
    assert ok and obj == bound


def test_maximize_and_negative_coeffs():
    m = CpModel()
    xs = [m.new_bool_var(f"x{i}") for i in range(4)]
    # at most two may be true
    m.add(sum(xs) <= 2)
    m.maximize(5 * xs[0] + 3 * xs[1] - 2 * xs[2] + 4 * xs[3])
    solver = CpSolver()
    status = solver.solve(m)
    assert status == OPTIMAL
    assert solver.objective_value == 9  # x0 + x3


def test_infeasible_with_objective():
    m = CpModel()
    x = m.new_bool_var("x")
    y = m.new_bool_var("y")
    m.add_bool_or([x, y])
    m.add_bool_and([x.negated(), y.negated()])
    m.minimize(x + y)
    solver = CpSolver()
    assert solver.solve(m) == INFEASIBLE


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_vs_bruteforce(seed):
    rng = random.Random(seed)
    n = 8
    clauses = []
    for _ in range(10):
        k = rng.randint(2, 3)
        clauses.append(rng.sample(range(n), k))
    weights = [rng.randint(1, 9) for _ in range(n)]
    inst = _WeightedCover(n, clauses, weights)
    m = inst.build()
    solver = CpSolver()
    status = solver.solve(m)
    expect = _brute_force_min(inst)
    assert status == OPTIMAL
    assert solver.objective_value == expect


def test_unknown_on_deadline_budget():
    from ortools_tpu.sat.core_guided import minimize_core_guided

    inst = _WeightedCover(
        6, [[0, 1], [2, 3], [4, 5], [0, 5], [1, 4]], [1, 2, 3, 4, 5, 6]
    )
    st, values, bound, _ = minimize_core_guided(
        inst.build().ir, deadline=0.0, conflict_slice=1
    )
    assert st in (1, -1)  # tiny model may finish within the first slice
    if st == -1:
        assert values is None
