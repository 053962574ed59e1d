"""Feasibility-jump local search tests."""

import numpy as np
import pytest

from ortools_tpu.sat import CpModel, CpSolver, OPTIMAL
from ortools_tpu.sat.checker import solution_is_feasible
from ortools_tpu.sat.feasibility_jump import (
    extract_linear_system,
    feasibility_jump,
)


def test_extract_simple_system():
    m = CpModel()
    x = m.new_int_var(0, 5, "x")
    y = m.new_int_var(0, 5, "y")
    b = m.new_bool_var("b")
    m.add(x + y <= 7)
    m.add_bool_or(b, ~b)
    sys_ = extract_linear_system(m.ir)
    assert sys_ is not None
    assert sys_.a.shape[0] == 2


def test_extract_rejects_nonlinear():
    m = CpModel()
    x = m.new_int_var(0, 5, "x")
    y = m.new_int_var(0, 5, "y")
    m.add_all_different([x, y])
    assert extract_linear_system(m.ir) is None


def test_extract_folds_enforced_rows():
    """Enforced rows no longer bail: they fold to big-M relaxations
    that are exact when the literal holds and vacuous when it doesn't."""
    import numpy as np

    m = CpModel()
    b = m.new_bool_var("b")
    x = m.new_int_var(0, 5, "x")
    m.add(x >= 3).only_enforce_if(b)
    sys = extract_linear_system(m.ir)
    assert sys is not None and sys.a.shape[0] == 1
    # b=1 requires x>=3; b=0 makes the row vacuous
    for b_val, x_val, ok in ((1, 3, True), (1, 0, False), (0, 0, True)):
        ax = sys.a @ np.array([float(b_val), float(x_val)])
        sat = bool(np.all(ax >= sys.row_lb - 1e-9)
                   and np.all(ax <= sys.row_ub + 1e-9))
        assert sat == ok, (b_val, x_val)


def test_jump_solves_inequality_system():
    # inequality-rich random system with a known feasible point — the
    # regime FJ is designed for (pure dense equalities are out of scope
    # for violation-guided search, same as the reference's heuristic)
    m = CpModel()
    n = 40
    xs = [m.new_int_var(0, 10, f"x{i}") for i in range(n)]
    rng = np.random.default_rng(5)
    sol = rng.integers(0, 11, n)
    for _ in range(60):
        idx = rng.choice(n, size=5, replace=False)
        coef = rng.integers(-3, 4, size=5)
        val = int(coef @ sol[idx])
        e = sum(int(c) * xs[int(j)] for c, j in zip(coef, idx))
        if rng.random() < 0.5:
            m.add(e <= val + int(rng.integers(0, 3)))
        else:
            m.add(e >= val - int(rng.integers(0, 3)))
    system = extract_linear_system(m.ir)
    assert system is not None
    x = feasibility_jump(system, seed=3, max_moves=20_000)
    assert x is not None
    assert solution_is_feasible(m.ir, [int(v) for v in x])


def test_jump_small_equalities():
    m = CpModel()
    ys = [m.new_int_var(0, 10, f"y{i}") for i in range(12)]
    m.add(ys[0] + ys[1] == 7)
    m.add(ys[2] - ys[3] == 2)
    system = extract_linear_system(m.ir)
    x = feasibility_jump(system, seed=0, max_moves=5000)
    assert x is not None
    assert solution_is_feasible(m.ir, [int(v) for v in x])


def test_solver_uses_fj_on_linear_model():
    # pure satisfaction model big enough to trigger FJ
    m = CpModel()
    n = 30
    xs = [m.new_int_var(0, 9, f"x{i}") for i in range(n)]
    for i in range(0, n - 2, 2):
        m.add(xs[i] + xs[i + 1] >= 5)
        m.add(xs[i] - xs[i + 2] <= 3)
    s = CpSolver()
    assert s.solve(m) == OPTIMAL
    vals = [s.value(x) for x in xs]
    assert solution_is_feasible(m.ir, vals)


def test_fj_budget_returns_none_on_infeasible():
    m = CpModel()
    x = m.new_int_var(0, 3, "x")
    y = m.new_int_var(0, 3, "y")
    m.add(x + y >= 10)  # infeasible
    for i in range(12):
        m.new_int_var(0, 1, f"pad{i}")
    system = extract_linear_system(m.ir)
    assert system is not None
    assert feasibility_jump(system, max_moves=3000) is None


def test_extraction_folds_enforcement_literals():
    """Enforced linear rows fold to big-M rows instead of bailing."""
    import numpy as np

    from ortools_tpu.sat import CpModel
    from ortools_tpu.sat.feasibility_jump import (
        extract_linear_system,
        feasibility_jump,
    )

    m = CpModel()
    b = m.new_bool_var("b")
    x = m.new_int_var(0, 10, "x")
    m.add(x >= 7).only_enforce_if(b)
    m.add(x <= 2).only_enforce_if(~b)
    sys = extract_linear_system(m.ir)
    assert sys is not None
    # each one-sided enforced row folds to one row
    assert sys.a.shape[0] == 2
    # semantics at concrete points: b=1,x=7 ok; b=1,x=0 violates row 0
    ax = sys.a @ np.array([1.0, 7.0])
    assert np.all(ax >= sys.row_lb - 1e-9) and np.all(
        ax <= sys.row_ub + 1e-9)
    ax_bad = sys.a @ np.array([1.0, 0.0])
    bad = (ax_bad < sys.row_lb - 1e-9) | (ax_bad > sys.row_ub + 1e-9)
    assert bad.any()
    # b=0, x=0: the enforced >=7 row must be vacuous
    ax0 = sys.a @ np.array([0.0, 0.0])
    assert np.all(ax0 >= sys.row_lb - 1e-9) and np.all(
        ax0 <= sys.row_ub + 1e-9)
    # FJ can actually solve it
    fj = feasibility_jump(sys, seed=3)
    if fj is not None:
        from ortools_tpu.sat.checker import solution_is_feasible
        assert solution_is_feasible(m.ir, [int(v) for v in fj])
