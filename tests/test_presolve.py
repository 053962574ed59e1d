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
