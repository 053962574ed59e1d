"""Batched B&B MIP tests against scipy.optimize.milp (HiGHS oracle)."""

import math

import numpy as np
import pytest
import scipy.sparse as sp
from scipy.optimize import LinearConstraint as SciLin, milp, Bounds

from ortools_tpu.mip import MipParams, solve
from ortools_tpu.mip.propagation import propagate_bounds
from ortools_tpu.models.lp import QuadraticProgram
from ortools_tpu.utils.status import MPSolverStatus


def milp_reference(qp: QuadraticProgram):
    qpm = qp.as_minimization()
    res = milp(
        qpm.objective_vector,
        constraints=SciLin(qpm.constraint_matrix, qpm.constraint_lower,
                           qpm.constraint_upper),
        bounds=Bounds(qpm.variable_lower, qpm.variable_upper),
        integrality=qpm.integrality.astype(int),
    )
    return res


def make_knapsack(n=12, seed=0, cap_frac=0.4):
    rng = np.random.default_rng(seed)
    w = rng.integers(1, 20, size=n).astype(float)
    v = rng.integers(1, 30, size=n).astype(float)
    cap = float(w.sum() * cap_frac)
    return QuadraticProgram(
        objective_vector=v,
        constraint_matrix=sp.csr_matrix(w.reshape(1, -1)),
        constraint_lower=np.array([-np.inf]),
        constraint_upper=np.array([cap]),
        variable_lower=np.zeros(n),
        variable_upper=np.ones(n),
        maximize=True,
        integrality=np.ones(n, dtype=bool),
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_knapsack_matches_highs(seed):
    qp = make_knapsack(seed=seed)
    ref = milp_reference(qp)
    r = solve(qp, MipParams(node_batch_size=8))
    assert r.status == MPSolverStatus.OPTIMAL
    # qp is a maximization; milp ran the minimized form
    assert abs(r.objective_value - (-ref.fun)) <= 1e-5 * (1 + abs(ref.fun))


def test_mixed_integer_lp():
    # 2 integer + 2 continuous vars, random constraints
    rng = np.random.default_rng(7)
    n, m = 4, 6
    a = rng.standard_normal((m, n))
    x0 = rng.uniform(0, 3, size=n)
    b = a @ x0 + rng.uniform(0.2, 1.0, size=m)
    qp = QuadraticProgram(
        objective_vector=rng.standard_normal(n),
        constraint_matrix=sp.csr_matrix(a),
        constraint_lower=np.full(m, -np.inf),
        constraint_upper=b,
        variable_lower=np.zeros(n),
        variable_upper=np.full(n, 5.0),
        integrality=np.array([True, True, False, False]),
    )
    ref = milp_reference(qp)
    r = solve(qp, MipParams(node_batch_size=4))
    assert r.status == MPSolverStatus.OPTIMAL
    assert abs(r.objective_value - ref.fun) <= 1e-4 * (1 + abs(ref.fun))
    # returned solution must be integer + feasible
    assert np.all(np.abs(r.solution[:2] - np.round(r.solution[:2])) < 1e-6)


def test_binary_random_mips():
    rng = np.random.default_rng(11)
    for seed in range(3):
        n, m = 10, 6
        a = sp.random(m, n, density=0.5,
                      random_state=np.random.RandomState(seed))
        b = np.asarray(a.sum(axis=1)).ravel() * 0.5 + 0.5
        qp = QuadraticProgram(
            objective_vector=rng.standard_normal(n),
            constraint_matrix=sp.csr_matrix(a),
            constraint_lower=np.full(m, -np.inf),
            constraint_upper=b,
            variable_lower=np.zeros(n),
            variable_upper=np.ones(n),
            integrality=np.ones(n, dtype=bool),
        )
        ref = milp_reference(qp)
        r = solve(qp, MipParams(node_batch_size=16))
        assert r.status == MPSolverStatus.OPTIMAL, seed
        assert abs(r.objective_value - ref.fun) <= 1e-4 * (1 + abs(ref.fun)), seed


def test_infeasible_mip():
    # x1 + x2 >= 3, x binary -> infeasible (max sum = 2)
    qp = QuadraticProgram(
        objective_vector=np.ones(2),
        constraint_matrix=sp.csr_matrix(np.ones((1, 2))),
        constraint_lower=np.array([3.0]),
        constraint_upper=np.array([np.inf]),
        variable_lower=np.zeros(2),
        variable_upper=np.ones(2),
        integrality=np.ones(2, dtype=bool),
    )
    r = solve(qp, MipParams())
    assert r.status == MPSolverStatus.INFEASIBLE


def test_pure_lp_through_mip():
    # no integer vars: B&B reduces to one LP solve
    rng = np.random.default_rng(3)
    n = 5
    qp = QuadraticProgram(
        objective_vector=rng.standard_normal(n),
        constraint_matrix=sp.csr_matrix(np.abs(rng.standard_normal((3, n)))),
        constraint_lower=np.full(3, -np.inf),
        constraint_upper=np.full(3, 10.0),
        variable_lower=np.zeros(n),
        variable_upper=np.ones(n),
        integrality=np.zeros(n, dtype=bool),
    )
    r = solve(qp, MipParams())
    assert r.status == MPSolverStatus.OPTIMAL


# ---- propagation unit tests ----------------------------------------------


def test_propagation_tightens():
    # x + y <= 3, x,y int in [0,10] -> both <= 3
    a = sp.csr_matrix(np.array([[1.0, 1.0]]))
    lb, ub, ok = propagate_bounds(
        a, np.array([-np.inf]), np.array([3.0]),
        np.zeros(2), np.full(2, 10.0), np.ones(2, dtype=bool),
    )
    assert ok
    np.testing.assert_allclose(ub, [3.0, 3.0])


def test_propagation_detects_infeasible():
    # x + y >= 5 with x,y in [0,2] -> max activity 4 < 5
    a = sp.csr_matrix(np.ones((1, 2)))
    _, _, ok = propagate_bounds(
        a, np.array([5.0]), np.array([np.inf]),
        np.zeros(2), np.full(2, 2.0), np.zeros(2, dtype=bool),
    )
    assert not ok


def test_propagation_with_infinite_bounds():
    # x - y <= 1 with y <= 4  ->  x <= 5; y stays unbounded below
    a = sp.csr_matrix(np.array([[1.0, -1.0]]))
    lb, ub, ok = propagate_bounds(
        a, np.array([-np.inf]), np.array([1.0]),
        np.array([-np.inf, -np.inf]), np.array([np.inf, 4.0]),
        np.zeros(2, dtype=bool),
    )
    assert ok
    assert ub[0] == 5.0
    assert lb[1] == -np.inf


def test_propagation_chain():
    # x1 = 2; x2 >= x1 + 1; x3 >= x2 + 1 => lb propagates down the chain
    rows = [[1, 0, 0], [-1, 1, 0], [0, -1, 1]]
    a = sp.csr_matrix(np.array(rows, dtype=float))
    lb, ub, ok = propagate_bounds(
        a,
        np.array([2.0, 1.0, 1.0]), np.array([2.0, np.inf, np.inf]),
        np.zeros(3), np.full(3, 10.0), np.zeros(3, dtype=bool),
    )
    assert ok
    np.testing.assert_allclose(lb, [2.0, 3.0, 4.0])


def test_batched_lp_infeasibility_certificate():
    # An infeasible node LP must be pruned ONLY on a verified dual-ray
    # certificate (ADVICE r1); check solve_batch surfaces one.
    from ortools_tpu.pdlp.batched import solve_batch
    from ortools_tpu.pdlp.params import PdhgParams

    # x1 + x2 >= 4 with x in [0,1]^2: infeasible.  Second instance
    # relaxes the upper bounds: feasible.
    qp = QuadraticProgram(
        objective_vector=np.array([1.0, 1.0]),
        constraint_matrix=sp.csr_matrix(np.array([[1.0, 1.0]])),
        constraint_lower=np.array([4.0]),
        constraint_upper=np.array([np.inf]),
        variable_lower=np.zeros(2),
        variable_upper=np.ones(2),
    )
    lbs = np.zeros((2, 2))
    ubs = np.array([[1.0, 1.0], [5.0, 5.0]])
    res = solve_batch(qp, lbs, ubs,
                      PdhgParams(iteration_limit=20_000))
    assert bool(res.primal_infeasible[0])
    assert not bool(res.primal_infeasible[1])
    assert bool(res.optimal[1])
    # instance 1 optimum: x1+x2=4 -> objective 4
    assert res.primal_objective[1] == pytest.approx(4.0, abs=1e-4)
    # valid dual bound never exceeds the true optimum
    assert res.dual_bound[1] <= 4.0 + 1e-4


def test_dual_bound_is_valid_lower_bound():
    # dual_bound from an *unconverged* iterate must still lower-bound the
    # LP optimum (soundness of B&B pruning).
    from ortools_tpu.pdlp.batched import solve_batch
    from ortools_tpu.pdlp.params import PdhgParams

    rng = np.random.default_rng(7)
    m, n = 8, 14
    a = rng.standard_normal((m, n))
    qp = QuadraticProgram(
        objective_vector=rng.standard_normal(n),
        constraint_matrix=sp.csr_matrix(a),
        constraint_lower=a @ np.clip(rng.standard_normal(n), 0, 1) - 1.0,
        constraint_upper=np.full(m, np.inf),
        variable_lower=np.zeros(n),
        variable_upper=np.ones(n),
    )
    from scipy.optimize import linprog
    ref = linprog(qp.objective_vector,
                  A_ub=-a, b_ub=-qp.constraint_lower,
                  bounds=[(0, 1)] * n, method="highs")
    assert ref.status == 0
    # starve the solver: 40 iterations only
    res = solve_batch(qp, qp.variable_lower[None, :],
                      qp.variable_upper[None, :],
                      PdhgParams(iteration_limit=40,
                                 termination_check_frequency=40))
    assert res.dual_bound[0] <= ref.fun + 1e-6


def test_greedy_cover_heuristic():
    """Greedy covering incumbent: feasible, reverse-deleted, and in-scope
    detection (returns None on non-covering structures)."""
    import numpy as np
    import scipy.sparse as sp

    from ortools_tpu.mip.heuristics import greedy_cover
    from ortools_tpu.models.lp import QuadraticProgram
    from ortools_tpu.models.mip_generators import multi_knapsack, set_cover

    qp = set_cover(60, 25, seed=3).as_minimization()
    int_idx = np.nonzero(np.asarray(qp.integrality, dtype=bool))[0]
    x = greedy_cover(qp, int_idx)
    assert x is not None
    a = sp.csr_matrix(qp.constraint_matrix)
    assert np.all(a @ x >= qp.constraint_lower - 1e-6)
    assert set(np.unique(x)) <= {0.0, 1.0}
    # knapsack (<= rows) is out of scope
    qk = multi_knapsack(20, 3, seed=1).as_minimization()
    ik = np.nonzero(np.asarray(qk.integrality, dtype=bool))[0]
    assert greedy_cover(qk, ik) is None


def test_general_integer_random_mips_fuzz():
    """Fuzz: small random MIPs with GENERAL integers (not just binaries)
    and mixed continuous columns, exactness vs HiGHS.  Exercises the
    session's node-LP + heuristic + propagation paths together."""
    import numpy as np
    import scipy.sparse as sp
    from scipy.optimize import Bounds, LinearConstraint, milp

    from ortools_tpu.mip import MipParams, solve as mip_solve
    from ortools_tpu.models.lp import QuadraticProgram
    from ortools_tpu.utils.status import MPSolverStatus

    rng = np.random.default_rng(99)
    solved = 0
    for trial in range(12):
        n = int(rng.integers(4, 10))
        m = int(rng.integers(2, 6))
        a = rng.integers(-3, 4, (m, n)).astype(float)
        integ = rng.random(n) < 0.7
        if not integ.any():
            integ[0] = True
        lb = rng.integers(-3, 1, n).astype(float)
        ub = lb + rng.integers(2, 6, n)
        qp = QuadraticProgram(
            objective_vector=rng.integers(-5, 6, n).astype(float),
            constraint_matrix=sp.csr_matrix(a),
            constraint_lower=np.full(m, -np.inf),
            constraint_upper=rng.integers(2, 15, m).astype(float),
            variable_lower=lb,
            variable_upper=ub,
            integrality=integ,
        )
        s = milp(qp.objective_vector,
                 constraints=LinearConstraint(a, qp.constraint_lower,
                                              qp.constraint_upper),
                 bounds=Bounds(lb, ub),
                 integrality=integ.astype(float))
        r = mip_solve(qp, MipParams(max_nodes=5000, time_limit_sec=20,
                                    fj_root_seconds=1.0))
        if s.status == 0:
            assert r.status in (MPSolverStatus.OPTIMAL,
                                MPSolverStatus.FEASIBLE), trial
            assert r.objective_value <= s.fun + 1e-5 * (1 + abs(s.fun)), \
                (trial, r.objective_value, s.fun)
            if r.status == MPSolverStatus.OPTIMAL:
                assert r.objective_value >= s.fun - 1e-5 * (1 + abs(s.fun))
            solved += 1
        elif s.status == 2:  # infeasible
            assert r.status in (MPSolverStatus.INFEASIBLE,
                                MPSolverStatus.NOT_SOLVED), trial
    assert solved >= 5  # the generator produces mostly feasible models


def test_feasibility_pump_finds_feasible_point():
    """Alternating-projection pump (reference sat/feasibility_pump.h):
    on a fixed-charge instance the plain rounding of the LP point is
    infeasible; the pump's L1-projection loop must land a feasible one."""
    import numpy as np

    from ortools_tpu.mip.heuristics import feasibility_pump
    from ortools_tpu.models.mip_generators import miplib_like_battery

    qp = miplib_like_battery(scale=0.3)[6].as_minimization()  # fixed_charge
    int_idx = np.nonzero(np.asarray(qp.integrality, bool))[0]
    cands = feasibility_pump(qp, int_idx)
    assert cands, "pump produced no candidates"
    a = qp.constraint_matrix
    import scipy.sparse as sp
    a = sp.csr_matrix(a)
    ok = False
    for x in cands:
        ax = a @ x
        if (np.all(ax >= qp.constraint_lower - 1e-6)
                and np.all(ax <= qp.constraint_upper + 1e-6)
                and np.all(x >= qp.variable_lower - 1e-9)
                and np.all(x <= qp.variable_upper + 1e-9)
                and np.all(np.abs(x[int_idx] - np.round(x[int_idx]))
                           <= 1e-6)):
            ok = True
            break
    assert ok, "no pump candidate is feasible"
