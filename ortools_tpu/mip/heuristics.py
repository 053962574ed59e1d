"""Primal heuristics for the batched B&B: LP-guided rounding + repair.

Capability parity: the incumbent-finding role of the reference portfolio's
first-solution subsolvers and feasibility pump
(``ortools/sat/feasibility_pump.h``, ``cp_model_solver.cc:3613``) —
recast as vectorized numpy passes over the node LP solution:

1. threshold-round the integer variables at several thresholds;
2. greedy repair: while a row is violated, flip the integer variable with
   the best violation-reduction per unit objective damage;
3. for mixed problems, re-optimize the continuous part with the ints
   fixed (one small LP through glop);
4. vectorized 1-opt polish on the binaries.

All candidates are re-verified by the caller against the original model
(the runtime self-verification contract, SURVEY §4.5) before acceptance.
"""

from __future__ import annotations

import math
from typing import Iterable, List, Optional

import numpy as np
import scipy.sparse as sp

from ortools_tpu.models.lp import QuadraticProgram


def _row_violations(a, cl, cu, x):
    ax = a @ x
    return np.maximum(cl - ax, 0.0) + np.maximum(ax - cu, 0.0), ax


def round_and_repair(
    qp_min: QuadraticProgram,
    x_lp: np.ndarray,
    int_idx: np.ndarray,
    max_repair_steps: int = 300,
    thresholds: Iterable[float] = (0.5, 0.3, 0.7),
    rng: Optional[np.random.Generator] = None,
    feas_tol: float = 1e-6,
) -> List[np.ndarray]:
    """Return integer-feasible CANDIDATES (possibly violating rows — the
    caller's checker decides).  qp_min must be in minimization form."""
    a = sp.csr_matrix(qp_min.constraint_matrix)
    at = sp.csc_matrix(a)
    cl, cu = qp_min.constraint_lower, qp_min.constraint_upper
    lb, ub = qp_min.variable_lower, qp_min.variable_upper
    c = qp_min.objective_vector
    n = qp_min.num_variables
    cont_mask = np.ones(n, dtype=bool)
    cont_mask[int_idx] = False
    has_cont = bool(cont_mask.any())
    out: List[np.ndarray] = []

    for th in thresholds:
        x = np.array(x_lp, dtype=np.float64)
        f = x[int_idx] - np.floor(x[int_idx])
        x[int_idx] = np.floor(x[int_idx]) + (f > th)
        x = np.clip(x, lb, ub)
        # -- greedy repair on integer flips -------------------------------
        for _ in range(max_repair_steps):
            viol, ax = _row_violations(a, cl, cu, x)
            scale = 1.0 + np.maximum(np.abs(np.where(np.isfinite(cl), cl, 0)),
                                     np.abs(np.where(np.isfinite(cu), cu, 0)))
            bad = viol > feas_tol * scale
            if not bad.any():
                break
            r = int(np.argmax(viol / scale))
            lo_r, hi_r = a.indptr[r], a.indptr[r + 1]
            cols = a.indices[lo_r:hi_r]
            vals = a.data[lo_r:hi_r]
            need = (cl[r] - ax[r]) if ax[r] < cl[r] else (cu[r] - ax[r])
            # candidate unit moves on integer vars in this row
            best_j, best_score, best_step = -1, -math.inf, 0.0
            for j, v in zip(cols, vals):
                if cont_mask[j] or v == 0.0:
                    continue
                step = 1.0 if need * v > 0 else -1.0
                xj_new = x[j] + step
                if xj_new < lb[j] - 1e-9 or xj_new > ub[j] + 1e-9:
                    continue
                gain = min(abs(v), abs(need))
                cost_pen = c[j] * step
                score = gain / (1.0 + max(cost_pen, 0.0))
                if score > best_score:
                    best_j, best_score, best_step = int(j), score, step
            if best_j < 0:
                break  # stuck
            x[best_j] += best_step
        # -- continuous re-optimization -----------------------------------
        if has_cont:
            x = _reopt_continuous(qp_min, x, int_idx, cont_mask)
            if x is None:
                continue
        viol, _ = _row_violations(a, cl, cu, x)
        if (viol <= feas_tol * (1.0 + np.maximum(
                np.abs(np.where(np.isfinite(cl), cl, 0)),
                np.abs(np.where(np.isfinite(cu), cu, 0))))).all():
            x = _one_opt(qp_min, a, at, x, int_idx, feas_tol)
            out.append(x)
    return out


def _reopt_continuous(qp_min, x, int_idx, cont_mask):
    """Fix the integers, re-optimize the continuous part with glop."""
    import dataclasses

    from ortools_tpu.glop import simplex as glop_simplex

    lb2 = np.array(qp_min.variable_lower, dtype=np.float64)
    ub2 = np.array(qp_min.variable_upper, dtype=np.float64)
    lb2[int_idx] = x[int_idx]
    ub2[int_idx] = x[int_idx]
    sub = dataclasses.replace(qp_min, variable_lower=lb2, variable_upper=ub2,
                              integrality=None)
    res = glop_simplex.solve(sub, max_iterations=5000)
    from ortools_tpu.utils.status import MPSolverStatus
    if res.status != MPSolverStatus.OPTIMAL:
        return None
    return res.primal_solution


def _one_opt(qp_min, a, at, x, int_idx, feas_tol):
    """Vectorized 1-opt: flip/step any single integer variable that
    improves the objective and keeps all rows feasible."""
    cl, cu = qp_min.constraint_lower, qp_min.constraint_upper
    lb, ub = qp_min.variable_lower, qp_min.variable_upper
    c = qp_min.objective_vector
    x = np.array(x, dtype=np.float64)
    for _ in range(3):  # few passes
        ax = a @ x
        slack_up = cu - ax  # how much each row can increase
        slack_dn = ax - cl
        improved = False
        # try steps -1 and +1 for improving-cost variables
        for step in (-1.0, 1.0):
            cand = int_idx[(c[int_idx] * step < -1e-12)]
            for j in cand:
                xn = x[j] + step
                if xn < lb[j] - 1e-9 or xn > ub[j] + 1e-9:
                    continue
                lo_c, hi_c = at.indptr[j], at.indptr[j + 1]
                rows = at.indices[lo_c:hi_c]
                vals = at.data[lo_c:hi_c] * step
                if np.any(vals > slack_up[rows] + feas_tol) or \
                        np.any(-vals > slack_dn[rows] + feas_tol):
                    continue
                x[j] = xn
                ax[rows] += vals
                slack_up[rows] -= vals
                slack_dn[rows] += vals
                improved = True
        if not improved:
            break
    return x
