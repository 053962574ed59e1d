"""Device-side (vmapped, jitted) feasibility jump.

Reference roles: ortools/sat/feasibility_jump.h:48 (multi-seed portfolio
workers), constraint_violation.h:33 (violation evaluator).  These tests
run on the CPU jax backend; the solutions are host-re-verified inside
device_feasibility_jump itself (A.9 contract).
"""

import numpy as np
import scipy.sparse as sp

from ortools_tpu.sat.fj_device import (
    device_feasibility_jump,
    objective_descent_system,
)


def _set_cover_system(n=60, m=25, density=0.12, seed=0):
    rng = np.random.default_rng(seed)
    a = (rng.random((m, n)) < density).astype(float)
    for i in range(m):  # every row coverable
        if a[i].sum() == 0:
            a[i, rng.integers(0, n)] = 1.0
    cost = 0.1 + rng.random(n)
    return sp.csr_matrix(a), np.ones(m), np.full(m, np.inf), cost


def test_device_fj_finds_cover():
    a, rlo, rhi, _ = _set_cover_system()
    res = device_feasibility_jump(a, rlo, rhi, n_seeds=16,
                                  steps_per_round=64, max_rounds=10,
                                  seed=3)
    assert res.solutions, "no feasible cover found"
    x = res.solutions[0]
    assert ((a @ x) >= rlo - 1e-9).all()
    assert set(np.unique(x)) <= {0.0, 1.0}


def test_device_fj_objective_descent_improves():
    a, rlo, rhi, cost = _set_cover_system(seed=5)
    # start from the all-ones (feasible, expensive) cover and ask for
    # anything strictly cheaper via the cutoff row
    x_all = np.ones(a.shape[1])
    ub = float(cost @ x_all)
    a2, lb2, ub2 = objective_descent_system(a, rlo, rhi, cost,
                                            cutoff=ub * 0.5)
    res = device_feasibility_jump(a2, lb2, ub2, n_seeds=16,
                                  steps_per_round=64, max_rounds=20,
                                  seed=7, x0=x_all)
    assert res.solutions, "no improving cover found"
    x = res.solutions[0]
    assert float(cost @ x) <= ub * 0.5 + 1e-6
    assert ((a @ x) >= rlo - 1e-9).all()


def test_device_fj_respects_deadline():
    import time

    a, rlo, rhi, _ = _set_cover_system(n=40, m=15, seed=9)
    t0 = time.perf_counter()
    device_feasibility_jump(a, rlo, rhi, n_seeds=8, steps_per_round=32,
                            max_rounds=10**6,
                            deadline=time.perf_counter() + 3.0)
    assert time.perf_counter() - t0 < 30.0  # one round past deadline max
