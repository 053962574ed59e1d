"""Revised primal simplex with bounded variables (host).

Capability parity: ``ortools/glop`` (revised_simplex.cc — primal phases
FEASIBILITY/OPTIMIZATION) scoped to the role glop plays in this framework:
the *exact* host-side LP oracle producing vertex solutions, duals and
reduced costs for small/medium LPs (the control-heavy simplex stays on the
host by design, SURVEY §2.15 last row; PDHG is the at-scale path).

Formulation: rows become equalities  A x - s = 0  with slack bounds
s_i in [l_i, u_i]; columns z = (x, s) carry all bounds.  Phase 1 drives
basic infeasibilities to zero with the composite (piecewise-linear)
objective; phase 2 optimizes c.  Dense numpy linear algebra with a fresh
LU factorization per iteration (no Forrest-Tomlin updates yet — fine at
host-oracle sizes), Bland's rule fallback against cycling.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np
import scipy.linalg as sla
import scipy.sparse as sp

from ortools_tpu.models.lp import QuadraticProgram
from ortools_tpu.utils.status import MPSolverStatus

_AT_LOWER, _AT_UPPER, _FREE = 0, 1, 2


@dataclasses.dataclass
class SimplexResult:
    status: MPSolverStatus
    primal_solution: np.ndarray
    dual_solution: np.ndarray
    reduced_costs: np.ndarray
    objective_value: float
    iterations: int


def solve(qp: QuadraticProgram, max_iterations: int = 50_000,
          tol: float = 1e-9) -> SimplexResult:
    if not qp.is_lp():
        raise ValueError("glop simplex solves LPs only (no quadratic term)")
    errs = qp.validate()
    if errs:
        return SimplexResult(MPSolverStatus.MODEL_INVALID,
                             np.zeros(qp.num_variables),
                             np.zeros(qp.num_constraints),
                             np.zeros(qp.num_variables), math.nan, 0)
    qpm = qp.as_minimization()
    sign = -1.0 if qp.maximize else 1.0
    m, n = qpm.num_constraints, qpm.num_variables

    a = sp.csr_matrix(qpm.constraint_matrix).toarray() if m else np.zeros((0, n))
    # columns: n structural + m slacks;  A x - s = 0
    tab = np.hstack([a, -np.eye(m)]) if m else np.zeros((0, n))
    lb = np.concatenate([qpm.variable_lower, qpm.constraint_lower])
    ub = np.concatenate([qpm.variable_upper, qpm.constraint_upper])
    cost = np.concatenate([qpm.objective_vector, np.zeros(m)])
    total = n + m

    if m == 0:
        # box LP: each variable at its best finite bound
        x = np.where(cost >= 0, lb, ub)
        x = np.where(np.isfinite(x), x, np.where(cost == 0, 0.0, x))
        if np.any(~np.isfinite(x) & (cost != 0)):
            return SimplexResult(MPSolverStatus.UNBOUNDED, np.zeros(n),
                                 np.zeros(0), cost[:n].copy(), -math.inf, 0)
        x = np.where(np.isfinite(x), x, 0.0)
        obj = sign * (qpm.objective_constant + cost @ x)
        return SimplexResult(MPSolverStatus.OPTIMAL, x[:n], np.zeros(0),
                             sign * cost[:n], obj, 0)

    # initial basis: slacks; structurals nonbasic at a finite bound (or free)
    basis = np.arange(n, n + m)
    in_basis = np.zeros(total, dtype=bool)
    in_basis[basis] = True
    nb_status = np.full(total, _AT_LOWER, dtype=np.int8)
    for j in range(total):
        if np.isfinite(lb[j]):
            nb_status[j] = _AT_LOWER
        elif np.isfinite(ub[j]):
            nb_status[j] = _AT_UPPER
        else:
            nb_status[j] = _FREE

    def nb_value(j: int) -> float:
        if nb_status[j] == _AT_LOWER:
            return lb[j]
        if nb_status[j] == _AT_UPPER:
            return ub[j]
        return 0.0

    iters = 0
    degenerate_steps = 0

    def compute_xb(lu) -> np.ndarray:
        rhs = np.zeros(m)
        for j in range(total):
            if not in_basis[j]:
                v = nb_value(j)
                if v != 0.0:
                    rhs -= tab[:, j] * v
        return sla.lu_solve(lu, rhs)

    for phase in (1, 2):
        while True:
            if iters >= max_iterations:
                return SimplexResult(MPSolverStatus.ABNORMAL, np.zeros(n),
                                     np.zeros(m), np.zeros(n), math.nan, iters)
            b_mat = tab[:, basis]
            try:
                lu = sla.lu_factor(b_mat)
            except Exception:
                return SimplexResult(MPSolverStatus.ABNORMAL, np.zeros(n),
                                     np.zeros(m), np.zeros(n), math.nan, iters)
            xb = compute_xb(lu)

            if phase == 1:
                viol_lo = np.where(np.isfinite(lb[basis]),
                                   lb[basis] - xb, 0.0)
                viol_hi = np.where(np.isfinite(ub[basis]),
                                   xb - ub[basis], 0.0)
                infeas = np.maximum(viol_lo, 0.0).sum() + np.maximum(
                    viol_hi, 0.0).sum()
                if infeas <= tol * (1.0 + np.abs(xb).sum()):
                    break  # feasible: go to phase 2
                # composite phase-1 gradient wrt basic values
                g = np.where(viol_lo > tol, -1.0,
                             np.where(viol_hi > tol, 1.0, 0.0))
                cb = g
            else:
                cb = cost[basis]

            y = sla.lu_solve(lu, cb, trans=1)
            entering = -1
            best_d = 0.0
            use_bland = degenerate_steps > 200
            direction = 0.0
            for j in range(total):
                if in_basis[j]:
                    continue
                dj = (cost[j] if phase == 2 else 0.0) - float(y @ tab[:, j])
                cand_dir = 0.0
                if nb_status[j] == _AT_LOWER and dj < -tol:
                    cand_dir = +1.0
                elif nb_status[j] == _AT_UPPER and dj > tol:
                    cand_dir = -1.0
                elif nb_status[j] == _FREE and abs(dj) > tol:
                    cand_dir = -math.copysign(1.0, dj)
                if cand_dir != 0.0:
                    score = abs(dj)
                    if use_bland:
                        entering, direction = j, cand_dir
                        break
                    if score > best_d + 1e-15:
                        best_d = score
                        entering, direction = j, cand_dir
            if entering < 0:
                if phase == 1:
                    return SimplexResult(MPSolverStatus.INFEASIBLE,
                                         np.zeros(n), np.zeros(m),
                                         np.zeros(n), math.nan, iters)
                break  # phase 2 optimal

            w = sla.lu_solve(lu, tab[:, entering]) * direction
            # ratio test: basics move by -w * t as entering moves by t>=0
            t_max = math.inf
            leaving_pos = -1
            leaving_to_upper = False
            if np.isfinite(ub[entering] - lb[entering]):
                t_max = ub[entering] - lb[entering]  # bound flip distance
            for i in range(m):
                wi = w[i]
                if abs(wi) <= 1e-11:
                    continue
                bi = basis[i]
                xi = xb[i]
                # Basic i moves as xi - wi*t.  Infeasible basics (phase 1)
                # block at the bound they currently violate (where their
                # composite cost kinks); feasible basics block at the bound
                # they move toward.
                if wi > 0:  # xi decreasing
                    if phase == 1 and np.isfinite(ub[bi]) and xi > ub[bi] + tol:
                        tgt, to_upper = ub[bi], True
                    elif np.isfinite(lb[bi]):
                        tgt, to_upper = lb[bi], False
                    else:
                        continue
                else:  # xi increasing
                    if phase == 1 and np.isfinite(lb[bi]) and xi < lb[bi] - tol:
                        tgt, to_upper = lb[bi], False
                    elif np.isfinite(ub[bi]):
                        tgt, to_upper = ub[bi], True
                    else:
                        continue
                t = (xi - tgt) / wi
                if t < t_max - 1e-12 or (
                    t < t_max + 1e-12 and leaving_pos >= 0 and use_bland
                    and basis[i] < basis[leaving_pos]
                ):
                    t_max = max(t, 0.0)
                    leaving_pos = i
                    leaving_to_upper = to_upper
            if math.isinf(t_max):
                if phase == 1:
                    # should not happen; guard
                    return SimplexResult(MPSolverStatus.ABNORMAL,
                                         np.zeros(n), np.zeros(m),
                                         np.zeros(n), math.nan, iters)
                return SimplexResult(MPSolverStatus.UNBOUNDED, np.zeros(n),
                                     np.zeros(m), np.zeros(n),
                                     -math.inf if sign > 0 else math.inf,
                                     iters)
            iters += 1
            degenerate_steps = degenerate_steps + 1 if t_max <= 1e-12 else 0
            if leaving_pos < 0:
                # bound flip of the entering variable
                nb_status[entering] = (
                    _AT_UPPER if nb_status[entering] == _AT_LOWER else _AT_LOWER
                )
            else:
                out = basis[leaving_pos]
                in_basis[out] = False
                nb_status[out] = _AT_UPPER if leaving_to_upper else _AT_LOWER
                basis[leaving_pos] = entering
                in_basis[entering] = True

    # assemble solution
    b_mat = tab[:, basis]
    lu = sla.lu_factor(b_mat)
    xb = compute_xb(lu)
    z = np.array([nb_value(j) for j in range(total)])
    z[basis] = xb
    y = sla.lu_solve(lu, cost[basis], trans=1)
    # duals: for row i, dual is the multiplier on  a_i x in [l,u]; the slack
    # column is -e_i, so pi = y solves B^T y = c_B directly and the slack's
    # reduced cost is  0 - y^T(-e_i) = y_i.
    rc_struct = cost[:n] - (y @ tab[:, :n] if m else 0.0)
    x = z[:n]
    obj = sign * (qpm.objective_constant + cost[:n] @ x)
    return SimplexResult(
        status=MPSolverStatus.OPTIMAL,
        primal_solution=x,
        dual_solution=sign * y,
        reduced_costs=sign * rc_struct,
        objective_value=obj,
        iterations=iters,
    )
