"""MaxHS hitting-set optimizer (sat/max_hs.py) vs OLL and brute force."""

import itertools

import numpy as np
import pytest

from ortools_tpu.sat import CpModel, CpSolver, OPTIMAL
from ortools_tpu.sat.core_guided import minimize_core_guided
from ortools_tpu.sat.max_hs import minimize_max_hs


def weighted_maxsat_model(seed: int, n: int = 10, m: int = 18):
    """Random 3-clause hard constraints + weighted unit soft objective."""
    rng = np.random.default_rng(seed)
    mdl = CpModel()
    xs = [mdl.new_bool_var(f"x{i}") for i in range(n)]
    for _ in range(m):
        vs = rng.choice(n, 3, replace=False)
        signs = rng.integers(0, 2, 3)
        mdl.add_bool_or([xs[v] if s else ~xs[v]
                         for v, s in zip(vs, signs)])
    w = rng.integers(1, 9, n)
    mdl.minimize(sum(int(wi) * x for wi, x in zip(w, xs)))
    return mdl, w


def brute_force(mdl: CpModel, w, n: int):
    from ortools_tpu.sat.checker import solution_is_feasible

    best = None
    for bits in itertools.product([0, 1], repeat=n):
        if solution_is_feasible(mdl.ir, list(bits)):
            obj = int(np.asarray(w) @ np.asarray(bits))
            best = obj if best is None else min(best, obj)
    return best


@pytest.mark.parametrize("seed", range(5))
def test_max_hs_matches_brute_force_and_oll(seed):
    mdl, w = weighted_maxsat_model(seed)
    ref = brute_force(mdl, w, len(w))
    out = minimize_max_hs(mdl.ir)
    assert out is not None
    st, values, bound, _ = out
    if ref is None:
        assert st == 0
        return
    assert st == 1
    assert int(np.asarray(w) @ np.asarray(values[:len(w)])) == ref
    assert bound == ref
    oll = minimize_core_guided(mdl.ir)
    assert oll is not None and oll[0] == 1 and oll[2] == ref


def test_max_hs_through_solver_param():
    mdl, w = weighted_maxsat_model(7)
    ref = brute_force(mdl, w, len(w))
    s = CpSolver()
    s.parameters.core_algorithm = "max_hs"
    st = s.solve(mdl)
    if ref is None:
        from ortools_tpu.sat import INFEASIBLE
        assert st == INFEASIBLE
    else:
        assert st == OPTIMAL
        assert s.objective_value == ref


def test_max_hs_infeasible():
    mdl = CpModel()
    x = mdl.new_bool_var("x")
    mdl.add_bool_or([x])
    mdl.add_bool_or([~x])
    mdl.minimize(x)
    out = minimize_max_hs(mdl.ir)
    assert out is not None and out[0] == 0
