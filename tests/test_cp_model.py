"""CP-SAT layer tests: API surface + engine correctness on classic models.

Follows the reference test style (sat/python/cp_model_test.py): small
models with known solutions/counts; every solution re-verified by the
checker inside the solver."""

import pytest

from ortools_tpu.sat import (
    CpModel,
    CpSolver,
    CpSolverSolutionCallback,
    FEASIBLE,
    INFEASIBLE,
    MODEL_INVALID,
    OPTIMAL,
)
from ortools_tpu.utils.domain import Domain


def test_bool_logic():
    m = CpModel()
    a, b, c = m.new_bool_var("a"), m.new_bool_var("b"), m.new_bool_var("c")
    m.add_bool_or(a, b)
    m.add_implication(a, c)
    m.add_bool_and(~b)
    s = CpSolver()
    assert s.solve(m) == OPTIMAL
    assert s.boolean_value(a) and not s.boolean_value(b)
    assert s.boolean_value(c)


def test_linear_optimization():
    m = CpModel()
    x = m.new_int_var(0, 10, "x")
    y = m.new_int_var(0, 10, "y")
    m.add(x + 2 * y <= 14)
    m.add(3 * x - y >= 0)
    m.add(x - y <= 2)
    m.maximize(3 * x + 4 * y)
    s = CpSolver()
    assert s.solve(m) == OPTIMAL
    assert s.objective_value == 34
    assert s.value(x) == 6 and s.value(y) == 4


def test_n_queens_count():
    # 6-queens has 4 solutions
    n = 6
    m = CpModel()
    q = [m.new_int_var(0, n - 1, f"q{i}") for i in range(n)]
    m.add_all_different(q)
    m.add_all_different([q[i] + i for i in range(n)])
    m.add_all_different([q[i] - i for i in range(n)])

    count = [0]

    class Counter(CpSolverSolutionCallback):
        def on_solution_callback(self):
            count[0] += 1

    s = CpSolver()
    s.parameters.enumerate_all_solutions = True
    s.solve(m, Counter())
    assert count[0] == 4


def test_not_equal_and_domains():
    m = CpModel()
    x = m.new_int_var_from_domain(Domain.from_values([1, 3, 5, 7]), "x")
    y = m.new_int_var(0, 7, "y")
    m.add(x != 5)
    m.add(x == y)
    m.minimize(x + y)
    s = CpSolver()
    assert s.solve(m) == OPTIMAL
    assert s.value(x) == 1 and s.value(y) == 1


def test_min_max_abs():
    m = CpModel()
    x = m.new_int_var(-5, 5, "x")
    y = m.new_int_var(-5, 5, "y")
    mx = m.new_int_var(-10, 10, "mx")
    mn = m.new_int_var(-10, 10, "mn")
    ab = m.new_int_var(0, 10, "ab")
    m.add_max_equality(mx, [x, y])
    m.add_min_equality(mn, [x, y])
    m.add_abs_equality(ab, x)
    m.add(x == -3)
    m.add(y == 2)
    s = CpSolver()
    assert s.solve(m) == OPTIMAL
    assert s.value(mx) == 2 and s.value(mn) == -3 and s.value(ab) == 3


def test_product_division_modulo():
    m = CpModel()
    x = m.new_int_var(2, 10, "x")
    y = m.new_int_var(3, 10, "y")
    p = m.new_int_var(0, 100, "p")
    q = m.new_int_var(0, 100, "q")
    r = m.new_int_var(0, 100, "r")
    m.add_multiplication_equality(p, x, y)
    m.add_division_equality(q, p, m.new_constant(4))
    m.add_modulo_equality(r, p, m.new_constant(5))
    m.add(x == 6)
    m.add(y == 7)
    s = CpSolver()
    assert s.solve(m) == OPTIMAL
    assert s.value(p) == 42 and s.value(q) == 10 and s.value(r) == 2


def test_element():
    m = CpModel()
    idx = m.new_int_var(0, 4, "i")
    target = m.new_int_var(0, 100, "t")
    costs = [10, 20, 35, 5, 60]
    m.add_element(idx, [m.new_constant(c) for c in costs], target)
    m.minimize(target)
    s = CpSolver()
    assert s.solve(m) == OPTIMAL
    assert s.value(target) == 5 and s.value(idx) == 3


def test_allowed_forbidden_assignments():
    m = CpModel()
    x = m.new_int_var(0, 2, "x")
    y = m.new_int_var(0, 2, "y")
    m.add_allowed_assignments([x, y], [(0, 1), (1, 2), (2, 0)])
    m.add_forbidden_assignments([x, y], [(0, 1)])
    m.minimize(x)
    s = CpSolver()
    assert s.solve(m) == OPTIMAL
    assert (s.value(x), s.value(y)) == (1, 2)


def test_no_overlap_jobshop_2x2():
    # 2 machines, 2 jobs; minimal makespan schedule
    m = CpModel()
    horizon = 20
    # job0: m0(3) -> m1(2); job1: m1(4) -> m0(1)
    s00 = m.new_int_var(0, horizon, "s00")
    s01 = m.new_int_var(0, horizon, "s01")
    s10 = m.new_int_var(0, horizon, "s10")
    s11 = m.new_int_var(0, horizon, "s11")
    i00 = m.new_fixed_size_interval_var(s00, 3, "i00")  # job0 on m0
    i01 = m.new_fixed_size_interval_var(s01, 2, "i01")  # job0 on m1
    i10 = m.new_fixed_size_interval_var(s10, 4, "i10")  # job1 on m1
    i11 = m.new_fixed_size_interval_var(s11, 1, "i11")  # job1 on m0
    m.add(s01 >= s00 + 3)  # job precedence
    m.add(s11 >= s10 + 4)
    m.add_no_overlap([i00, i11])  # machine 0
    m.add_no_overlap([i01, i10])  # machine 1
    makespan = m.new_int_var(0, horizon, "mk")
    m.add_max_equality(makespan, [s01 + 2, s11 + 1])
    m.minimize(makespan)
    s = CpSolver()
    assert s.solve(m) == OPTIMAL
    # job1 occupies m1 0-4 (else it is pushed past job0's m1 task), so
    # job0's m1 task runs 4-6: optimal makespan 6.
    assert s.objective_value == 6


def test_optional_intervals():
    m = CpModel()
    pres = m.new_bool_var("p")
    st = m.new_int_var(0, 10, "s")
    iv = m.new_optional_interval_var(st, 5, st + 5, pres, "iv")
    iv2 = m.new_fixed_size_interval_var(m.new_constant(0), 8, "iv2")
    m.add_no_overlap([iv, iv2])
    # horizon too small for both -> pres must be false... unless start>=8
    m.add(st <= 2)
    m.maximize(pres)
    s = CpSolver()
    assert s.solve(m) == OPTIMAL
    assert s.value(pres) == 0


def test_cumulative():
    m = CpModel()
    starts = [m.new_int_var(0, 10, f"s{i}") for i in range(3)]
    ivs = [m.new_fixed_size_interval_var(starts[i], 3, f"i{i}")
           for i in range(3)]
    m.add_cumulative(ivs, [2, 2, 2], 4)  # only 2 can run at once
    mk = m.new_int_var(0, 20, "mk")
    m.add_max_equality(mk, [starts[i] + 3 for i in range(3)])
    m.minimize(mk)
    s = CpSolver()
    assert s.solve(m) == OPTIMAL
    assert s.objective_value == 6


def test_circuit():
    m = CpModel()
    n = 4
    arcs = []
    lits = {}
    for i in range(n):
        for j in range(n):
            if i != j:
                lit = m.new_bool_var(f"a{i}{j}")
                lits[i, j] = lit
                arcs.append((i, j, lit))
    m.add_circuit(arcs)
    # forbid 0->1 and require 0->2
    m.add_bool_and(lits[0, 2])
    s = CpSolver()
    assert s.solve(m) == OPTIMAL
    # follow the circuit from 0, must visit all 4 nodes
    nxt = {i: j for (i, j), lit in lits.items() if s.value(lit) == 1}
    seen = set()
    cur = 0
    while cur not in seen:
        seen.add(cur)
        cur = nxt[cur]
    assert seen == {0, 1, 2, 3} and cur == 0


def test_inverse():
    m = CpModel()
    n = 4
    f = [m.new_int_var(0, n - 1, f"f{i}") for i in range(n)]
    g = [m.new_int_var(0, n - 1, f"g{i}") for i in range(n)]
    m.add_inverse(f, g)
    m.add(f[0] == 2)
    m.add(f[1] == 0)
    s = CpSolver()
    assert s.solve(m) == OPTIMAL
    assert s.value(g[2]) == 0 and s.value(g[0]) == 1


def test_enforcement_literals():
    m = CpModel()
    b = m.new_bool_var("b")
    x = m.new_int_var(0, 10, "x")
    m.add(x >= 7).only_enforce_if(b)
    m.add(x <= 3).only_enforce_if(~b)
    m.add(x == 8)
    s = CpSolver()
    assert s.solve(m) == OPTIMAL
    assert s.boolean_value(b)


def test_infeasible_model():
    m = CpModel()
    x = m.new_int_var(0, 5, "x")
    m.add(x >= 3)
    m.add(x <= 2)
    s = CpSolver()
    assert s.solve(m) == INFEASIBLE


def test_partial_hint_guides_values():
    # partial hint: only some vars hinted; search follows them when feasible
    m = CpModel()
    xs = [m.new_int_var(0, 9, f"x{i}") for i in range(6)]
    m.add(sum(xs) >= 10)
    m.add_hint(xs[0], 7)
    m.add_hint(xs[1], 3)
    s = CpSolver()
    assert s.solve(m) == OPTIMAL
    assert s.value(xs[0]) == 7 and s.value(xs[1]) == 3


def test_hint_used():
    m = CpModel()
    x = m.new_int_var(0, 1000, "x")
    y = m.new_int_var(0, 1000, "y")
    m.add(x + y == 1000)
    m.add_hint(x, 400)
    m.add_hint(y, 600)
    s = CpSolver()
    assert s.solve(m) == OPTIMAL
    assert s.value(x) == 400


def test_assumptions_infeasible():
    m = CpModel()
    a = m.new_bool_var("a")
    b = m.new_bool_var("b")
    m.add_bool_or(a, b)
    m.add_implication(a, b)
    m.add_assumption(~b)
    s = CpSolver()
    assert s.solve(m) == INFEASIBLE
    assert s.sufficient_assumptions_for_infeasibility()


def test_model_validation():
    m = CpModel()
    x = m.new_int_var(0, 5, "x")
    # non-boolean used as literal must raise at build time
    with pytest.raises(AssertionError):
        m.add_bool_or(x)


def test_solution_callback_objective():
    m = CpModel()
    x = m.new_int_var(0, 5, "x")
    m.maximize(x)
    objs = []

    class Cb(CpSolverSolutionCallback):
        def on_solution_callback(self):
            objs.append(self.objective_value)

    s = CpSolver()
    assert s.solve(m, Cb()) == OPTIMAL
    assert objs[-1] == 5


def test_camelcase_aliases():
    m = CpModel()
    x = m.NewIntVar(0, 3, "x")
    y = m.NewBoolVar("y")
    m.Add(x >= 1)
    m.AddBoolOr([y])
    m.Minimize(x)
    s = CpSolver()
    assert s.Solve(m) == OPTIMAL
    assert s.Value(x) == 1 and s.BooleanValue(y)


def test_zero_size_interval_matters_in_no_overlap():
    # Reference semantics (cp_model.proto:131-133): size-0 intervals DO
    # matter — a point interval strictly inside another is infeasible.
    m2 = CpModel()
    p2 = m2.new_int_var(1, 4, "p")
    pt = m2.new_fixed_size_interval_var(p2, 0, "pt")
    big = m2.new_fixed_size_interval_var(m2.new_constant(0), 5, "big")
    m2.add_no_overlap([pt, big])
    s = CpSolver()
    assert s.solve(m2) == INFEASIBLE

    # ...but a point interval ON the boundary is fine.
    m3 = CpModel()
    p3 = m3.new_int_var(0, 5, "p")
    pt3 = m3.new_fixed_size_interval_var(p3, 0, "pt")
    big3 = m3.new_fixed_size_interval_var(m3.new_constant(0), 5, "big")
    m3.add_no_overlap([pt3, big3])
    s3 = CpSolver()
    assert s3.solve(m3) == OPTIMAL
    assert s3.value(p3) in (0, 5)


def test_zero_area_box_in_no_overlap_2d():
    # A point box strictly inside a 2x2 box violates no_overlap_2d
    # (cp_model.proto:142-146).
    from ortools_tpu.sat.checker import constraint_is_feasible

    m = CpModel()
    px = m.new_int_var(1, 1, "px")
    py = m.new_int_var(1, 1, "py")
    bx = m.new_fixed_size_interval_var(px, 0, "bx")
    by = m.new_fixed_size_interval_var(py, 0, "by")
    ox = m.new_fixed_size_interval_var(m.new_constant(0), 2, "ox")
    oy = m.new_fixed_size_interval_var(m.new_constant(0), 2, "oy")
    m.add_no_overlap_2d([bx, ox], [by, oy])
    s = CpSolver()
    assert s.solve(m) == INFEASIBLE


def test_enforced_reservoir():
    # enforcement literal on a reservoir constraint (was an assert crash)
    m = CpModel()
    lit = m.new_bool_var("use")
    t1 = m.new_int_var(0, 10, "t1")
    t2 = m.new_int_var(0, 10, "t2")
    m.add_reservoir_constraint(
        [t1, t2], [3, -3], 0, 2
    ).only_enforce_if(lit)
    m.add(t1 == 0)
    m.add(t2 == 5)
    m.maximize(lit)
    s = CpSolver()
    assert s.solve(m) == OPTIMAL
    # level after t1 is 3 > max 2, so the reservoir must be unenforced
    assert s.value(lit) == 0


def test_all_different_hall_interval_pruning():
    """Hall-interval BC (reference all_different.cc bounds propagator):
    three vars saturating [1,3] push the fourth out at the root."""
    from ortools_tpu.sat.engine import Engine
    from ortools_tpu.sat import expand
    m = CpModel()
    a = m.new_int_var(1, 3, "a")
    b = m.new_int_var(1, 3, "b")
    c = m.new_int_var(1, 3, "c")
    d = m.new_int_var(1, 9, "d")
    m.add_all_different([a, b, c, d])
    eng = Engine(expand.expand_model(m.ir))
    doms = eng.initial_domains()
    assert eng.root_propagate(doms)
    assert doms[d.index].min() >= 4, doms[d.index]


def test_all_different_hall_conflict():
    from ortools_tpu.sat.engine import Engine
    from ortools_tpu.sat import expand
    m = CpModel()
    xs = [m.new_int_var(1, 2, f"x{i}") for i in range(3)]
    m.add_all_different(xs)
    eng = Engine(expand.expand_model(m.ir))
    doms = eng.initial_domains()
    assert not eng.root_propagate(doms)
