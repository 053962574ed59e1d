"""Multi-device PDHG: block-sharded SpMV over a mesh with psum combine.

Runs on the virtual 8-device CPU mesh (conftest); the driver separately
dry-runs this path via __graft_entry__.dryrun_multichip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ortools_tpu.models.lp import random_lp
from ortools_tpu.parallel import make_mesh
from ortools_tpu.pdlp import PdhgParams, solve
from ortools_tpu.utils.status import TerminationReason

from tests.test_pdlp import scipy_solve


def test_sharded_matches_scipy():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh()
    qp = random_lp(120, 90, density=0.1, seed=17)
    ref = scipy_solve(qp)
    r = solve(qp, PdhgParams(dtype=jnp.float64), mesh=mesh)
    assert r.termination_reason == TerminationReason.OPTIMAL
    assert abs(r.primal_objective - ref) <= 1e-4 * (1 + abs(ref))


def test_sharded_matches_single_device():
    mesh = make_mesh()
    qp = random_lp(60, 60, density=0.2, seed=23)
    p = PdhgParams(dtype=jnp.float64, iteration_limit=512)
    r1 = solve(qp, p)
    r8 = solve(qp, p, mesh=mesh)
    # Same deterministic algorithm; f64 reduction orders may differ slightly
    # between the psum tree and the single-device sum.
    assert r1.iterations == r8.iterations
    np.testing.assert_allclose(
        r8.primal_solution, r1.primal_solution, rtol=1e-6, atol=1e-8
    )


def test_sharded_mesh_size_2():
    mesh = make_mesh(shape=(2,))
    qp = random_lp(50, 40, density=0.2, seed=31)
    ref = scipy_solve(qp)
    r = solve(qp, PdhgParams(dtype=jnp.float64), mesh=mesh)
    assert r.termination_reason == TerminationReason.OPTIMAL
    assert abs(r.primal_objective - ref) <= 1e-4 * (1 + abs(ref))


def test_2d_mesh_matches_scipy():
    """Row x col partition: segment psum + all_gather (Comm2D)."""
    mesh = make_mesh(shape=(2, 4), axis_names=("row", "col"))
    qp = random_lp(140, 100, density=0.12, seed=31)
    ref = scipy_solve(qp)
    r = solve(qp, PdhgParams(dtype=jnp.float64), mesh=mesh)
    assert r.termination_reason == TerminationReason.OPTIMAL
    assert abs(r.primal_objective - ref) <= 1e-4 * (1 + abs(ref))


def test_2d_mesh_iteration_invariance():
    """Single chip vs (2,4) mesh: identical iteration counts and matching
    solutions (VERDICT r1 item 6 'Done' criterion)."""
    mesh = make_mesh(shape=(2, 4), axis_names=("row", "col"))
    qp = random_lp(80, 70, density=0.15, seed=37)
    p = PdhgParams(dtype=jnp.float64, iteration_limit=1024)
    r1 = solve(qp, p)
    r2d = solve(qp, p, mesh=mesh)
    assert r1.iterations == r2d.iterations
    # The 2-D path pads to different shapes (different summation order),
    # so iterates drift at roundoff scale over hundreds of iterations;
    # both land within solver tolerance of the same optimum.
    assert abs(r2d.primal_objective - r1.primal_objective) <= \
        1e-6 * (1 + abs(r1.primal_objective))
    np.testing.assert_allclose(
        r2d.primal_solution, r1.primal_solution, rtol=1e-3, atol=1e-3
    )


def test_2d_mesh_infeasible_certificate():
    # x >= 2 and x <= 1 -> primal infeasible; the 2-D path must still
    # produce the certificate.
    import scipy.sparse as sp
    from ortools_tpu.models.lp import QuadraticProgram
    a = sp.csr_matrix(np.array([[1.0], [1.0]]))
    qp = QuadraticProgram(
        objective_vector=np.array([1.0]),
        constraint_matrix=a,
        constraint_lower=np.array([2.0, -np.inf]),
        constraint_upper=np.array([np.inf, 1.0]),
        variable_lower=np.array([-10.0]),
        variable_upper=np.array([10.0]),
    )
    mesh = make_mesh(shape=(2, 4), axis_names=("row", "col"))
    r = solve(qp, PdhgParams(dtype=jnp.float64, iteration_limit=20000),
              mesh=mesh)
    assert r.termination_reason == TerminationReason.PRIMAL_INFEASIBLE
