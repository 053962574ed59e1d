"""Native small-LP dual simplex (_native/smalllp.cc) vs the Python oracle.

The soundness contract is verification-based: OPTIMAL claims must pass an
independent weak-duality certificate, INFEASIBLE claims a Farkas interval
check — both recomputed in numpy by glop/native_simplex.py.
"""

import dataclasses

import numpy as np
import pytest

from ortools_tpu.glop.native_simplex import NativeSmallLp
from ortools_tpu.glop.simplex import RevisedSimplex, solve as pysolve
from ortools_tpu.utils.status import MPSolverStatus

from tests.test_glop import random_lp


def test_native_resolve_fuzz_matches_python():
    rng = np.random.default_rng(7)
    counts = {"opt": 0, "inf": 0, "ab": 0}
    for seed in range(8):
        qp = random_lp(20, 15, density=0.5, seed=seed)
        qpm = qp.as_minimization() if qp.maximize else qp
        sx = RevisedSimplex(qpm)
        if sx.primal_solve() != MPSolverStatus.OPTIMAL:
            continue
        nat = NativeSmallLp(qpm)
        nat.seed_basis(sx.basis, sx.nb_status)
        vlb = np.asarray(qpm.variable_lower, dtype=float)
        vub = np.asarray(qpm.variable_upper, dtype=float)
        for _ in range(20):
            l2, u2 = vlb.copy(), vub.copy()
            for j in rng.choice(qpm.num_variables,
                                size=rng.integers(1, 5), replace=False):
                lo = l2[j] if np.isfinite(l2[j]) else -5.0
                hi = u2[j] if np.isfinite(u2[j]) else 5.0
                cut = rng.uniform(lo, hi)
                if rng.random() < 0.5:
                    l2[j] = cut
                else:
                    u2[j] = cut
            st, x, y, obj, bound = nat.resolve(l2, u2)
            qp2 = dataclasses.replace(qpm, variable_lower=l2,
                                      variable_upper=u2)
            ref = pysolve(qp2)
            if st == MPSolverStatus.OPTIMAL:
                counts["opt"] += 1
                assert ref.status == MPSolverStatus.OPTIMAL
                assert abs(obj - ref.objective_value) <= 1e-5 * (
                    1 + abs(ref.objective_value))
                # the weak-duality bound never exceeds the true optimum
                assert bound <= ref.objective_value + 1e-5 * (
                    1 + abs(ref.objective_value))
            elif st == MPSolverStatus.INFEASIBLE:
                counts["inf"] += 1
                # the Farkas certificate was verified by interval
                # arithmetic, so this is a proof even when the Python
                # simplex gives up (ABNORMAL)
                assert ref.status in (MPSolverStatus.INFEASIBLE,
                                      MPSolverStatus.ABNORMAL)
            else:
                counts["ab"] += 1
    # the native path must actually fire on most re-solves
    assert counts["opt"] >= 50
    assert counts["ab"] <= 0.2 * sum(counts.values())


def test_native_rejects_oversize():
    qp = random_lp(20, 15, density=0.5, seed=0)
    qpm = qp.as_minimization() if qp.maximize else qp
    NativeSmallLp.MAX_M  # class guard exists
    with pytest.raises(ValueError):
        big = dataclasses.replace(
            qpm,
            constraint_matrix=np.zeros((600, 15)),
            constraint_lower=np.full(600, -np.inf),
            constraint_upper=np.zeros(600),
        )
        NativeSmallLp(big)
