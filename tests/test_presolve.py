"""LP presolve tests."""

import numpy as np
import pytest
import scipy.sparse as sp

from ortools_tpu.glop.presolve import PresolveStatus, presolve
from ortools_tpu.models.lp import QuadraticProgram, random_lp
from ortools_tpu.pdlp import PdhgParams, solve
from ortools_tpu.utils.status import TerminationReason

import jax.numpy as jnp

from tests.test_pdlp import scipy_solve


def test_singleton_row_becomes_bound():
    # row: 2x <= 6 -> x <= 3
    qp = QuadraticProgram(
        objective_vector=np.array([-1.0, 0.0]),
        constraint_matrix=sp.csr_matrix(np.array([[2.0, 0.0], [1.0, 1.0]])),
        constraint_lower=np.array([-np.inf, -np.inf]),
        constraint_upper=np.array([6.0, 10.0]),
        variable_lower=np.zeros(2),
        variable_upper=np.full(2, 100.0),
    )
    r = presolve(qp)
    assert r.status == PresolveStatus.REDUCED
    assert r.reduced.num_constraints == 1
    j = list(r.kept_cols).index(0)
    assert r.reduced.variable_upper[j] == 3.0


def test_fixed_variable_substitution():
    qp = QuadraticProgram(
        objective_vector=np.array([1.0, 2.0]),
        constraint_matrix=sp.csr_matrix(np.array([[1.0, 1.0]])),
        constraint_lower=np.array([4.0]),
        constraint_upper=np.array([4.0]),
        variable_lower=np.array([2.0, 0.0]),
        variable_upper=np.array([2.0, 10.0]),  # x fixed at 2
    )
    r = presolve(qp)
    assert r.status == PresolveStatus.REDUCED
    # substitution turns the row into a singleton on y, which fixes y too:
    # the whole model is solved by presolve
    assert r.reduced.num_variables == 0
    x = r.postsolve(np.zeros(0))
    np.testing.assert_allclose(x, [2.0, 2.0])


def test_empty_column_placement():
    qp = QuadraticProgram(
        objective_vector=np.array([5.0]),
        constraint_matrix=sp.csr_matrix((1, 1)),
        constraint_lower=np.array([-np.inf]),
        constraint_upper=np.array([np.inf]),
        variable_lower=np.array([1.0]),
        variable_upper=np.array([3.0]),
    )
    r = presolve(qp)
    assert r.status == PresolveStatus.REDUCED
    x = r.postsolve(np.zeros(0))
    assert x[0] == 1.0  # positive cost -> lower bound


def test_presolve_detects_infeasible():
    qp = QuadraticProgram(
        objective_vector=np.zeros(2),
        constraint_matrix=sp.csr_matrix(np.array([[1.0, 1.0]])),
        constraint_lower=np.array([10.0]),
        constraint_upper=np.array([np.inf]),
        variable_lower=np.zeros(2),
        variable_upper=np.full(2, 3.0),  # max activity 6 < 10
    )
    assert presolve(qp).status == PresolveStatus.PRIMAL_INFEASIBLE


def test_presolve_detects_unbounded_empty_col():
    qp = QuadraticProgram(
        objective_vector=np.array([-1.0]),
        constraint_matrix=sp.csr_matrix((1, 1)),
        constraint_lower=np.array([-np.inf]),
        constraint_upper=np.array([np.inf]),
        variable_lower=np.zeros(1),
        variable_upper=np.array([np.inf]),
    )
    assert presolve(qp).status == PresolveStatus.DUAL_INFEASIBLE


@pytest.mark.parametrize("seed", [3, 9])
def test_pdhg_with_presolve_matches(seed):
    qp = random_lp(50, 40, density=0.2, seed=seed)
    # add a fixed variable and a singleton row to exercise the rules
    qp.variable_lower[0] = qp.variable_upper[0] = 1.5
    extra = sp.lil_matrix((1, 40))
    extra[0, 3] = 1.0
    qp.constraint_matrix = sp.vstack([qp.constraint_matrix,
                                      sp.csr_matrix(extra)])
    qp.constraint_lower = np.append(qp.constraint_lower, -np.inf)
    qp.constraint_upper = np.append(qp.constraint_upper, 4.0)
    ref = scipy_solve(qp)
    r = solve(qp, PdhgParams(dtype=jnp.float64, presolve=True))
    assert r.termination_reason == TerminationReason.OPTIMAL
    assert abs(r.primal_objective - ref) <= 1e-4 * (1 + abs(ref))
    assert len(r.primal_solution) == 40
    assert abs(r.primal_solution[0] - 1.5) < 1e-12


def test_presolve_maximize_roundtrip():
    qp = QuadraticProgram(
        objective_vector=np.array([3.0, 1.0]),
        constraint_matrix=sp.csr_matrix(np.array([[1.0, 0.0]])),
        constraint_lower=np.array([-np.inf]),
        constraint_upper=np.array([5.0]),   # singleton row -> x <= 5
        variable_lower=np.zeros(2),
        variable_upper=np.array([np.inf, 2.0]),
        maximize=True,
    )
    r = solve(qp, PdhgParams(dtype=jnp.float64, presolve=True))
    assert r.termination_reason == TerminationReason.OPTIMAL
    assert abs(r.primal_objective - 17.0) < 1e-5  # 3*5 + 1*2


def test_exact_duals_for_binding_singleton_row():
    """A binding singleton row must receive a nonzero dual in postsolve
    (reference exact undo-stack postsolve; was 'best-effort' in round 1)."""
    from scipy.optimize import linprog
    # min x0 + x1  s.t. 2*x0 >= 4 (singleton), x0 + x1 >= 5; x free-ish
    a = sp.csr_matrix(np.array([[2.0, 0.0], [1.0, 1.0]]))
    qp = QuadraticProgram(
        objective_vector=np.array([3.0, 1.0]),
        constraint_matrix=a,
        constraint_lower=np.array([4.0, 5.0]),
        constraint_upper=np.array([np.inf, np.inf]),
        variable_lower=np.zeros(2),
        variable_upper=np.full(2, 100.0),
    )
    res = presolve(qp)
    assert res.status == PresolveStatus.REDUCED
    # solve the reduced LP exactly
    from ortools_tpu.glop import solve as glop_solve
    r = glop_solve(res.reduced)
    x = res.postsolve(r.primal_solution)
    y, rc = res.postsolve_duals(qp, x, r.dual_solution)
    # HiGHS reference duals
    ref = linprog(qp.objective_vector, A_ub=-a.todense(),
                  b_ub=-qp.constraint_lower,
                  bounds=[(0, 100)] * 2, method="highs")
    assert ref.status == 0
    y_ref = ref.ineqlin.marginals * -1.0  # sign: >= rows
    np.testing.assert_allclose(x, ref.x, atol=1e-7)
    np.testing.assert_allclose(y, y_ref, atol=1e-6)
    # strong duality through the reconstructed duals
    bound_term = float(np.where(y > 0, qp.constraint_lower, 0.0) @ y)
    rc_term = float(np.where(rc > 0, qp.variable_lower,
                             qp.variable_upper) @ rc)
    dual_obj = bound_term + rc_term
    np.testing.assert_allclose(dual_obj, ref.fun, atol=1e-6)


# ---------------------------------------------------------------------------
# Substitution pass (round 2: doubleton equality, implied-free singleton,
# duplicate rows) — exact primal AND dual postsolve vs HiGHS.
# ---------------------------------------------------------------------------


def _check_exact_duals(qp, atol=1e-6):
    """presolve -> glop on reduced -> postsolve; compare x, y, rc to HiGHS
    and verify strong duality + zero dual residual through the
    reconstruction."""
    from scipy.optimize import linprog
    from ortools_tpu.glop import solve as glop_solve

    qp_min = qp.as_minimization()
    res = presolve(qp_min)
    assert res.status in (PresolveStatus.REDUCED, PresolveStatus.UNCHANGED)
    r = glop_solve(res.reduced)
    x = res.postsolve(r.primal_solution)
    y, rc = res.postsolve_duals(qp_min, x, r.dual_solution)

    a = sp.csr_matrix(qp_min.constraint_matrix)
    m = qp_min.num_constraints
    # HiGHS on the original
    a_ub, b_ub = [], []
    a_eq, b_eq = [], []
    eq_rows, lo_rows, hi_rows = [], [], []
    for i in range(m):
        lo, hi = qp_min.constraint_lower[i], qp_min.constraint_upper[i]
        row = np.asarray(a[i].todense()).ravel()
        if np.isfinite(lo) and np.isfinite(hi) and lo == hi:
            a_eq.append(row); b_eq.append(lo); eq_rows.append(i)
        else:
            if np.isfinite(hi):
                a_ub.append(row); b_ub.append(hi); hi_rows.append(i)
            if np.isfinite(lo):
                a_ub.append(-row); b_ub.append(-lo); lo_rows.append(i)
    bounds = list(zip(
        [v if np.isfinite(v) else None for v in qp_min.variable_lower],
        [v if np.isfinite(v) else None for v in qp_min.variable_upper]))
    ref = linprog(qp_min.objective_vector,
                  A_ub=np.array(a_ub) if a_ub else None,
                  b_ub=np.array(b_ub) if b_ub else None,
                  A_eq=np.array(a_eq) if a_eq else None,
                  b_eq=np.array(b_eq) if b_eq else None,
                  bounds=bounds, method="highs")
    assert ref.status == 0
    obj = float(qp_min.objective_vector @ x) + qp_min.objective_constant
    assert abs(obj - (ref.fun + qp_min.objective_constant)) <= \
        atol * (1 + abs(ref.fun))
    # primal feasibility of the reconstruction
    act = a @ x
    assert np.all(act >= qp_min.constraint_lower - 1e-7 * (1 + np.abs(act)))
    assert np.all(act <= qp_min.constraint_upper + 1e-7 * (1 + np.abs(act)))
    # dual residual must be EXACTLY absorbed: r = c - A^T y - rc == 0
    resid = qp_min.objective_vector - a.T @ y - rc
    np.testing.assert_allclose(resid, 0.0, atol=atol)
    # dual feasibility signs
    assert np.all((y >= -atol) | np.isfinite(qp_min.constraint_upper))
    assert np.all((y <= atol) | np.isfinite(qp_min.constraint_lower))
    # strong duality through reconstructed duals
    yl = np.where(y > atol, y, 0.0)
    yu = np.where(y < -atol, y, 0.0)
    bound_term = float(
        np.sum(np.where(yl > 0, qp_min.constraint_lower, 0.0) * yl)
        + np.sum(np.where(yu < 0, qp_min.constraint_upper, 0.0) * yu))
    rl = np.where(rc > atol, rc, 0.0)
    ru = np.where(rc < -atol, rc, 0.0)
    rc_term = float(
        np.sum(np.where(rl > 0, qp_min.variable_lower, 0.0) * rl)
        + np.sum(np.where(ru < 0, qp_min.variable_upper, 0.0) * ru))
    np.testing.assert_allclose(bound_term + rc_term, ref.fun,
                               atol=atol * (1 + abs(ref.fun)))
    return res, x, y, rc


def test_doubleton_equality_substitution():
    # x0 + x1 = 4 (doubleton eq); x1 also in another row
    qp = QuadraticProgram(
        objective_vector=np.array([1.0, 3.0, 0.5]),
        constraint_matrix=sp.csr_matrix(np.array(
            [[1.0, 1.0, 0.0],
             [0.0, 2.0, 1.0],
             [1.0, 0.0, 1.0]])),
        constraint_lower=np.array([4.0, -np.inf, 2.0]),
        constraint_upper=np.array([4.0, 7.0, np.inf]),
        variable_lower=np.zeros(3),
        variable_upper=np.full(3, 10.0),
    )
    res, x, y, rc = _check_exact_duals(qp)
    assert res.reduced.num_variables < 3   # something was substituted


def test_implied_free_singleton_elimination():
    # x2 appears only in the equality row and is implied free there
    qp = QuadraticProgram(
        objective_vector=np.array([2.0, 1.0, 0.3]),
        constraint_matrix=sp.csr_matrix(np.array(
            [[1.0, 1.0, 1.0],
             [1.0, 2.0, 0.0]])),
        constraint_lower=np.array([5.0, 3.0]),
        constraint_upper=np.array([5.0, np.inf]),
        variable_lower=np.array([0.0, 0.0, -100.0]),
        variable_upper=np.array([4.0, 4.0, 100.0]),
    )
    res, x, y, rc = _check_exact_duals(qp)
    assert res.reduced.num_variables < 3


def test_duplicate_row_merge_dual_on_binding_row():
    # rows 0 and 1 proportional (row1 = 2*row0) with row1's bound tighter
    qp = QuadraticProgram(
        objective_vector=np.array([-1.0, -1.0]),
        constraint_matrix=sp.csr_matrix(np.array(
            [[1.0, 1.0],
             [2.0, 2.0],
             [1.0, -1.0]])),
        constraint_lower=np.array([-np.inf, -np.inf, -1.0]),
        constraint_upper=np.array([10.0, 8.0, 1.0]),   # row1 binds: x0+x1<=4
        variable_lower=np.zeros(2),
        variable_upper=np.full(2, 100.0),
    )
    res, x, y, rc = _check_exact_duals(qp)
    assert abs(x[0] + x[1] - 4.0) < 1e-6
    # the dual must sit on the DROPPED-but-binding row 1, not row 0
    assert abs(y[0]) < 1e-7
    assert y[1] < -1e-7 or abs(y[1]) > 1e-7


@pytest.mark.parametrize("seed", list(range(6)))
def test_substitution_random_lps_exact_duals(seed):
    rng = np.random.default_rng(seed)
    m, n = 14, 18
    a = sp.random(m, n, density=0.35, random_state=rng.integers(1 << 30),
                  data_rvs=lambda k: rng.uniform(-2, 2, k))
    a = sp.csr_matrix(a)
    # plant structure: equality rows, a doubleton, a column singleton,
    # a duplicate row
    cl = np.full(m, -np.inf)
    cu = rng.uniform(1, 6, m)
    cl[:3] = cu[:3] = rng.uniform(1, 4, 3)          # equalities
    lil = a.tolil()
    lil[0, :] = 0.0
    lil[0, 0] = 1.0
    lil[0, 1] = rng.uniform(0.5, 2.0)               # doubleton eq row
    lil[1, 5] = rng.uniform(0.5, 2.0)               # col 5 singleton in row 1
    lil[2:, 5] = 0.0
    lil[m - 1, :] = 3.0 * lil[m - 2, :]             # duplicate row
    a = sp.csr_matrix(lil)
    cl[m - 1] = -np.inf
    cu[m - 1] = 3.0 * cu[m - 2] - rng.uniform(0, 1)  # tighter on the dup
    qp = QuadraticProgram(
        objective_vector=rng.uniform(-1, 2, n),
        constraint_matrix=a,
        constraint_lower=cl,
        constraint_upper=cu,
        variable_lower=np.zeros(n),
        variable_upper=np.full(n, 20.0),
        name=f"subst-{seed}",
    )
    from scipy.optimize import linprog
    # skip seeds where the planted instance is infeasible
    probe = linprog(qp.objective_vector, A_eq=a[:3].todense(), b_eq=cl[:3],
                    A_ub=a[3:].todense(), b_ub=cu[3:],
                    bounds=[(0, 20)] * n, method="highs")
    if probe.status != 0:
        pytest.skip("planted instance infeasible/unbounded")
    _check_exact_duals(qp)
