"""Host simplex tests vs scipy HiGHS (exact vertex oracle)."""

import numpy as np
import pytest
import scipy.sparse as sp

from ortools_tpu.glop import solve
from ortools_tpu.models.lp import QuadraticProgram, random_lp
from ortools_tpu.models.mps import read_mps
from ortools_tpu.utils.status import MPSolverStatus

from tests.test_pdlp import scipy_solve


@pytest.mark.parametrize("seed,m,n", [(0, 10, 8), (1, 25, 40), (2, 50, 30),
                                      (5, 40, 40)])
def test_random_lp_matches_scipy(seed, m, n):
    qp = random_lp(m, n, density=0.4, seed=seed)
    ref = scipy_solve(qp)
    r = solve(qp)
    assert r.status == MPSolverStatus.OPTIMAL
    assert abs(r.objective_value - ref) <= 1e-7 * (1 + abs(ref))
    # exact feasibility of the vertex
    ax = qp.constraint_matrix @ r.primal_solution
    assert np.all(ax <= qp.constraint_upper + 1e-7)
    assert np.all(r.primal_solution >= qp.variable_lower - 1e-9)


def test_equality_and_two_sided():
    rng = np.random.default_rng(4)
    n = 12
    a = sp.vstack([
        sp.csr_matrix(np.ones((1, n))),
        sp.random(6, n, density=0.5, random_state=np.random.RandomState(1)),
    ])
    qp = QuadraticProgram(
        objective_vector=rng.standard_normal(n),
        constraint_matrix=sp.csr_matrix(a),
        constraint_lower=np.concatenate([[3.0], np.full(6, -1.0)]),
        constraint_upper=np.concatenate([[3.0], rng.uniform(1, 4, 6)]),
        variable_lower=np.zeros(n),
        variable_upper=np.full(n, 2.0),
    )
    ref = scipy_solve(qp)
    r = solve(qp)
    assert r.status == MPSolverStatus.OPTIMAL
    assert abs(r.objective_value - ref) <= 1e-7 * (1 + abs(ref))


def test_infeasible():
    qp = QuadraticProgram(
        objective_vector=np.ones(2),
        constraint_matrix=sp.csr_matrix(np.array([[1.0, 1.0], [-1.0, -1.0]])),
        constraint_lower=np.array([4.0, 1.0]),   # x+y>=4 and x+y<=-1
        constraint_upper=np.array([np.inf, np.inf]),
        variable_lower=np.zeros(2),
        variable_upper=np.full(2, 10.0),
    )
    r = solve(qp)
    assert r.status == MPSolverStatus.INFEASIBLE


def test_unbounded():
    qp = QuadraticProgram(
        objective_vector=np.array([-1.0]),
        constraint_matrix=sp.csr_matrix(np.array([[1.0]])),
        constraint_lower=np.array([0.0]),
        constraint_upper=np.array([np.inf]),
        variable_lower=np.zeros(1),
        variable_upper=np.array([np.inf]),
    )
    r = solve(qp)
    assert r.status == MPSolverStatus.UNBOUNDED


def test_duals_and_reduced_costs():
    # min -x1-2x2, x1+x2<=4, x1<=2 (row), 0<=x<=10 -> x=(0,4)
    qp = QuadraticProgram(
        objective_vector=np.array([-1.0, -2.0]),
        constraint_matrix=sp.csr_matrix(np.array([[1.0, 1.0], [1.0, 0.0]])),
        constraint_lower=np.full(2, -np.inf),
        constraint_upper=np.array([4.0, 2.0]),
        variable_lower=np.zeros(2),
        variable_upper=np.full(2, 10.0),
    )
    r = solve(qp)
    assert r.status == MPSolverStatus.OPTIMAL
    np.testing.assert_allclose(r.primal_solution, [0.0, 4.0], atol=1e-9)
    # dual feasibility: c - A^T y == reduced costs; y1 = -2 (binding row 1)
    resid = qp.objective_vector - qp.constraint_matrix.T @ r.dual_solution \
        - r.reduced_costs
    np.testing.assert_allclose(resid, 0.0, atol=1e-9)
    np.testing.assert_allclose(r.dual_solution, [-2.0, 0.0], atol=1e-9)


def test_maximization_fixture():
    import os
    path = "/root/reference/ortools/linear_solver/testdata/maximization.mps"
    if not os.path.exists(path):
        pytest.skip("reference data not mounted")
    qp = read_mps(path)
    r = solve(qp)
    assert r.status == MPSolverStatus.OPTIMAL
    assert abs(r.objective_value - 4.0) < 1e-9


def test_free_variables():
    # min x1 + x2 s.t. x1 + x2 >= 2, free vars
    qp = QuadraticProgram(
        objective_vector=np.array([1.0, 1.0]),
        constraint_matrix=sp.csr_matrix(np.ones((1, 2))),
        constraint_lower=np.array([2.0]),
        constraint_upper=np.array([np.inf]),
        variable_lower=np.full(2, -np.inf),
        variable_upper=np.full(2, np.inf),
    )
    r = solve(qp)
    assert r.status == MPSolverStatus.OPTIMAL
    assert abs(r.objective_value - 2.0) < 1e-9


def test_dual_simplex_warm_restart():
    """resolve() after a bound flip: dual simplex re-optimizes in far
    fewer iterations than a cold solve (reference revised_simplex.cc:3058
    DualMinimize warm-start role)."""
    import scipy.sparse as sp
    from ortools_tpu.glop.simplex import RevisedSimplex
    rng = np.random.default_rng(11)
    m, n = 40, 80
    a = sp.csr_matrix(rng.normal(size=(m, n)))
    x0 = np.abs(rng.normal(size=n))
    b = a @ x0
    qp = QuadraticProgram(
        objective_vector=1.0 + np.abs(rng.normal(size=n)),
        constraint_matrix=a,
        constraint_lower=b,
        constraint_upper=np.full(m, np.inf),
        variable_lower=np.zeros(n),
        variable_upper=np.full(n, 10.0),
    )
    sx = RevisedSimplex(qp)
    st = sx.primal_solve()
    assert st == MPSolverStatus.OPTIMAL
    cold_iters = sx.iters
    res0 = sx.result(st)

    # flip a bound like a B&B child node would
    lb2 = np.array(qp.variable_lower)
    ub2 = np.array(qp.variable_upper)
    j = int(np.argmax(res0.primal_solution))
    ub2[j] = max(0.0, np.floor(res0.primal_solution[j] - 0.5))
    before = sx.iters
    st2 = sx.resolve(lb2, ub2)
    warm_iters = sx.iters - before
    assert st2 == MPSolverStatus.OPTIMAL
    res2 = sx.result(st2)
    assert res2.primal_solution[j] <= ub2[j] + 1e-7

    # cold reference on the same modified LP
    import dataclasses as dc
    qp2 = dc.replace(qp, variable_lower=lb2, variable_upper=ub2)
    res_cold = solve(qp2)
    assert res_cold.status == MPSolverStatus.OPTIMAL
    assert abs(res2.objective_value - res_cold.objective_value) <= \
        1e-6 * (1 + abs(res_cold.objective_value))
    assert warm_iters < max(5, cold_iters // 2), (warm_iters, cold_iters)


def test_dual_simplex_detects_infeasible_bound_change():
    import scipy.sparse as sp
    from ortools_tpu.glop.simplex import RevisedSimplex
    # x + y >= 4, x,y in [0, 3] feasible; tighten ub to [0,1] -> infeasible
    a = sp.csr_matrix(np.array([[1.0, 1.0]]))
    qp = QuadraticProgram(
        objective_vector=np.array([1.0, 2.0]),
        constraint_matrix=a,
        constraint_lower=np.array([4.0]),
        constraint_upper=np.array([np.inf]),
        variable_lower=np.zeros(2),
        variable_upper=np.full(2, 3.0),
    )
    sx = RevisedSimplex(qp)
    assert sx.primal_solve() == MPSolverStatus.OPTIMAL
    st = sx.resolve(np.zeros(2), np.full(2, 1.0))
    assert st == MPSolverStatus.INFEASIBLE


def test_pow2_scaling_exact_roundtrip():
    """Badly scaled LP: scaling must not perturb the solution at all
    (powers of two are exact), and duals/reduced costs map back exactly."""
    import numpy as np
    import scipy.sparse as sp

    from ortools_tpu.glop.simplex import solve
    from ortools_tpu.models.lp import QuadraticProgram
    from ortools_tpu.utils.status import MPSolverStatus

    rng = np.random.default_rng(3)
    m, n = 20, 30
    a = rng.standard_normal((m, n)) * np.exp(rng.uniform(-8, 8, (m, 1)))
    a *= np.exp(rng.uniform(-6, 6, (1, n)))
    qp = QuadraticProgram(
        objective_vector=rng.standard_normal(n),
        constraint_matrix=sp.csr_matrix(a),
        constraint_lower=np.full(m, -np.inf),
        constraint_upper=rng.uniform(1.0, 5.0, m) * np.exp(
            rng.uniform(-8, 8, m)),
        variable_lower=np.zeros(n),
        variable_upper=np.ones(n) * 10.0,
    )
    r_scaled = solve(qp, scaling=True)
    r_plain = solve(qp, scaling=False)
    assert r_scaled.status == MPSolverStatus.OPTIMAL
    if r_plain.status == MPSolverStatus.OPTIMAL:
        assert abs(r_scaled.objective_value - r_plain.objective_value) \
            <= 1e-6 * (1 + abs(r_plain.objective_value))
    # feasibility of the returned point in the ORIGINAL space
    ax = qp.constraint_matrix @ r_scaled.primal_solution
    scale = 1 + np.abs(np.where(np.isfinite(qp.constraint_upper),
                                qp.constraint_upper, 0))
    assert (ax <= qp.constraint_upper + 1e-6 * scale).all()
    # strong duality in the original space
    y = r_scaled.dual_solution
    d = r_scaled.reduced_costs
    lagr = (np.where(y > 0, qp.constraint_lower, qp.constraint_upper) @ y
            if np.isfinite(qp.constraint_lower).any() else
            qp.constraint_upper @ np.minimum(y, 0))
    # check the dual identity d = c - A^T y instead (exact contract)
    assert np.allclose(d, qp.objective_vector
                       - qp.constraint_matrix.T @ y, atol=1e-7)


def test_dualizer_matches_primal_path():
    import numpy as np
    import scipy.sparse as sp

    from ortools_tpu.glop.simplex import solve, solve_dualized
    from ortools_tpu.models.lp import QuadraticProgram
    from ortools_tpu.utils.status import MPSolverStatus

    rng = np.random.default_rng(7)
    for trial in range(8):
        n = int(rng.integers(3, 10))
        m = int(rng.integers(4 * n, 6 * n))
        a = sp.random(m, n, density=0.5, random_state=trial, format="csr")
        a.data = rng.standard_normal(a.nnz)
        qp = QuadraticProgram(
            objective_vector=rng.standard_normal(n),
            constraint_matrix=a,
            constraint_lower=np.where(rng.random(m) < 0.3, -np.inf,
                                      -rng.uniform(1, 3, m)),
            constraint_upper=rng.uniform(1, 3, m),
            variable_lower=np.full(n, -5.0),
            variable_upper=np.full(n, 5.0),
        )
        rp = solve(qp, dualize=False)
        if rp.status != MPSolverStatus.OPTIMAL:
            continue
        rd = solve_dualized(qp)
        assert rd is not None
        assert abs(rd.objective_value - rp.objective_value) \
            <= 1e-6 * (1 + abs(rp.objective_value))
        assert np.allclose(
            rd.reduced_costs,
            np.asarray(qp.objective_vector) - a.T @ rd.dual_solution,
            atol=1e-6)
