"""Model-builder front-end tests (parity: MPSolver / model_builder surface)."""

import math

import numpy as np
import pytest

from ortools_tpu.linear_solver import LinearExpr, Model, MPSolverStatus, Solver


def build_sample_model():
    # max 3x + 4y s.t. x + 2y <= 14, 3x - y >= 0, x - y <= 2
    m = Model("sample")
    x = m.new_num_var(0, math.inf, "x")
    y = m.new_num_var(0, math.inf, "y")
    c1 = m.add(x + 2 * y <= 14)
    c2 = m.add(3 * x - y >= 0)
    c3 = m.add(x - y <= 2)
    m.maximize(3 * x + 4 * y)
    return m, x, y, (c1, c2, c3)


@pytest.mark.parametrize("backend", ["glop", "pdlp"])
def test_solve_sample(backend):
    m, x, y, _ = build_sample_model()
    s = Solver(backend)
    status = s.solve(m)
    assert status == MPSolverStatus.OPTIMAL
    tol = 1e-7 if backend == "glop" else 1e-4
    assert abs(s.objective_value - 34.0) < tol * 35
    assert abs(s.value(x) - 6.0) < 1e-3
    assert abs(s.value(y) - 4.0) < 1e-3
    assert abs(s.value(3 * x + 4 * y) - 34.0) < 1e-2


def test_expressions():
    m = Model()
    x = m.new_num_var(0, 1, "x")
    y = m.new_num_var(0, 1, "y")
    e = 2 * x - y / 2 + 3 - 1
    assert e.coeffs == {0: 2.0, 1: -0.5}
    assert e.offset == 2.0
    e2 = LinearExpr.sum([x, y, 5])
    assert e2.offset == 5.0
    e3 = LinearExpr.weighted_sum([x, y], [2, 3])
    assert e3.coeffs == {0: 2.0, 1: 3.0}
    with pytest.raises(TypeError):
        x * y  # nonlinear


def test_constraint_offset_folding():
    m = Model()
    x = m.new_num_var(0, 10, "x")
    ct = m.add(x + 3 <= 5)  # -> x <= 2
    assert m.ct_ub[ct.index] == 2.0
    ct2 = m.add(2 * x - 1 == 7)  # -> 2x == 8
    assert m.ct_lb[ct2.index] == 8.0 == m.ct_ub[ct2.index]


def test_integer_dispatch():
    # knapsack via the front-end: auto-routes to branch and bound
    m = Model()
    xs = [m.new_bool_var(f"x{i}") for i in range(8)]
    w = [3, 5, 7, 2, 8, 4, 6, 1]
    v = [4, 6, 9, 2, 10, 5, 7, 1]
    m.add(LinearExpr.weighted_sum(xs, w) <= 15)
    m.maximize(LinearExpr.weighted_sum(xs, v))
    s = Solver("sat")
    status = s.solve(m)
    assert status == MPSolverStatus.OPTIMAL
    from scipy.optimize import milp, LinearConstraint as SciLin, Bounds
    ref = milp(-np.array(v, dtype=float),
               constraints=SciLin(np.array(w, dtype=float).reshape(1, -1),
                                  -np.inf, 15),
               bounds=Bounds(0, 1), integrality=np.ones(8))
    assert abs(s.objective_value - (-ref.fun)) < 1e-6
    vals = s.values(xs)
    assert np.all((np.abs(vals) < 1e-6) | (np.abs(vals - 1) < 1e-6))


def test_duals_via_front_end():
    m = Model()
    x = m.new_num_var(0, 10, "x")
    y = m.new_num_var(0, 10, "y")
    ct = m.add(x + y <= 4)
    m.minimize(-x - 2 * y)
    s = Solver("glop")
    assert s.solve(m) == MPSolverStatus.OPTIMAL
    assert abs(s.dual_value(ct) - (-2.0)) < 1e-9
    assert abs(s.reduced_cost(x) - 1.0) < 1e-9  # c_x - y = -1 - (-2)


def test_mps_roundtrip_through_model():
    m, *_ = build_sample_model()
    text = m.export_to_mps_string()
    import tempfile, os
    with tempfile.NamedTemporaryFile("w", suffix=".mps", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        m2 = Model.import_from_mps_file(path)
        s = Solver("glop")
        assert s.solve(m2) == MPSolverStatus.OPTIMAL
        assert abs(s.objective_value - 34.0) < 1e-6
    finally:
        os.unlink(path)


def test_bool_constraint_raises():
    m = Model()
    x = m.new_num_var(0, 1, "x")
    with pytest.raises(TypeError):
        m.add(True)
