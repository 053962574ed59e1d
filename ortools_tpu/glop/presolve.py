"""LP presolve with postsolve.

Capability parity: ``ortools/glop/preprocessor.{h,cc}`` (MainLpPreprocessor
and its rule classes, SURVEY §2.2) scoped to the core composable rules:

- EmptyConstraint: rows with no entries (feasibility check, drop);
- SingletonRow: one-entry rows fold into variable bounds;
- FixedVariable: lb == ub substitution into row activities;
- EmptyColumn: cost-sign placement at a finite bound (dual-infeasible if
  the needed bound is infinite);
- implied free/forcing-row detection via activity bounds (infeasibility);

Each fired rule pushes an undo record; ``postsolve`` reconstructs a primal
solution of the ORIGINAL problem.  ``postsolve_duals`` replays the
singleton-row undo log in reverse (the reference's exact undo-stack
design, preprocessor.h:271): a reduced cost stranded on a bound that a
dropped singleton row imposed is transferred to that row's dual
(y_i = r_j / a_ij), which zeroes the residual exactly because a singleton
row touches one column.  Redundant rows keep dual 0 (valid: they are
implied), fixed/empty columns keep their recomputed reduced costs.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional, Tuple

import numpy as np
import scipy.sparse as sp

from ortools_tpu.models.lp import QuadraticProgram


class PresolveStatus(enum.Enum):
    REDUCED = 0
    UNCHANGED = 1
    PRIMAL_INFEASIBLE = 2
    DUAL_INFEASIBLE = 3  # unbounded direction found


@dataclasses.dataclass
class PresolveResult:
    status: PresolveStatus
    reduced: Optional[QuadraticProgram]
    kept_rows: np.ndarray  # original row indices kept
    kept_cols: np.ndarray  # original col indices kept
    fixed_values: np.ndarray  # value for every original col (nan if kept)
    # Undo log of folded singleton rows, in firing order:
    # (row, col, a_ij, imposed_lo, imposed_hi) — bounds in x_j space.
    singleton_log: List[Tuple[int, int, float, float, float]] = \
        dataclasses.field(default_factory=list)

    def postsolve(self, x_reduced: np.ndarray) -> np.ndarray:
        n = len(self.fixed_values)
        x = np.array(self.fixed_values)
        x[self.kept_cols] = x_reduced
        return x

    def postsolve_duals(self, qp: QuadraticProgram, x: np.ndarray,
                        y_reduced: np.ndarray, tol: float = 1e-7
                        ) -> Tuple[np.ndarray, np.ndarray]:
        """Exact dual reconstruction (reference undo-stack postsolve).

        Replays the singleton-row log in reverse: when the final reduced
        cost of x_j is complementary to a bound that only the dropped
        singleton row i imposed (the original variable bound is strictly
        looser), the reduced cost moves onto y_i = r_j / a_ij; since row i
        touches only column j this zeroes r_j without disturbing any other
        column.  Rows dropped as redundant are implied by the rest, so
        dual 0 is optimal for them."""
        qp = qp.as_minimization()
        m = qp.num_constraints
        y = np.zeros(m)
        y[self.kept_rows] = y_reduced
        at = sp.csc_matrix(qp.constraint_matrix)
        r = np.asarray(qp.objective_vector - at.T @ y, dtype=np.float64)
        lb = qp.variable_lower
        ub = qp.variable_upper
        for (i, j, aij, lo_imp, hi_imp) in reversed(self.singleton_log):
            if abs(r[j]) <= tol:
                continue
            scale = 1.0 + abs(x[j])
            if r[j] > 0:
                # complementary with a LOWER bound; transfer when x_j sits
                # on the imposed bound and the original bound is looser
                if (np.isfinite(lo_imp) and abs(x[j] - lo_imp) <= tol * scale
                        and (not np.isfinite(lb[j])
                             or lo_imp > lb[j] + tol * scale)):
                    y[i] += r[j] / aij
                    r[j] = 0.0
            else:
                if (np.isfinite(hi_imp) and abs(x[j] - hi_imp) <= tol * scale
                        and (not np.isfinite(ub[j])
                             or hi_imp < ub[j] - tol * scale)):
                    y[i] += r[j] / aij
                    r[j] = 0.0
        rc = np.where(
            r > 0,
            np.where(np.isfinite(lb), r, 0.0),
            np.where(np.isfinite(ub), r, 0.0),
        )
        return y, rc


def presolve(qp: QuadraticProgram, max_rounds: int = 10,
             feas_tol: float = 1e-9) -> PresolveResult:
    """Run the rule set to a fix point.  LP only (quadratic objective
    disables everything except validation)."""
    qp = qp.as_minimization()
    m, n = qp.num_constraints, qp.num_variables
    if not qp.is_lp():
        return PresolveResult(
            PresolveStatus.UNCHANGED, qp,
            np.arange(m), np.arange(n), np.full(n, np.nan),
        )
    a = sp.csr_matrix(qp.constraint_matrix).astype(np.float64)
    cl = np.array(qp.constraint_lower, dtype=np.float64)
    cu = np.array(qp.constraint_upper, dtype=np.float64)
    lb = np.array(qp.variable_lower, dtype=np.float64)
    ub = np.array(qp.variable_upper, dtype=np.float64)
    c = np.array(qp.objective_vector, dtype=np.float64)
    row_alive = np.ones(m, dtype=bool)
    col_alive = np.ones(n, dtype=bool)
    fixed = np.full(n, np.nan)
    changed_any = False
    singleton_log: List[Tuple[int, int, float, float, float]] = []

    csc = sp.csc_matrix(a)

    def row_entries(i):
        s, e = a.indptr[i], a.indptr[i + 1]
        idx = a.indices[s:e]
        val = a.data[s:e]
        keep = col_alive[idx] & (val != 0)
        return idx[keep], val[keep]

    def col_entries(j):
        s, e = csc.indptr[j], csc.indptr[j + 1]
        idx = csc.indices[s:e]
        val = csc.data[s:e]
        keep = row_alive[idx] & (val != 0)
        return idx[keep], val[keep]

    def fix_var(j, value) -> bool:
        nonlocal changed_any
        if value < lb[j] - feas_tol or value > ub[j] + feas_tol:
            return False
        col_alive[j] = False
        fixed[j] = value
        changed_any = True
        if value != 0.0:
            rows, vals = col_entries(j)
            cl[rows] -= vals * value
            cu[rows] -= vals * value
        return True

    for _ in range(max_rounds):
        changed = False
        # variable bound sanity
        if np.any(lb[col_alive] > ub[col_alive] + feas_tol):
            return PresolveResult(PresolveStatus.PRIMAL_INFEASIBLE, None,
                                  np.arange(m), np.arange(n), fixed)
        # fixed variables
        for j in np.nonzero(col_alive & (np.abs(ub - lb) <= feas_tol))[0]:
            if not fix_var(j, 0.5 * (lb[j] + ub[j])):
                return PresolveResult(
                    PresolveStatus.PRIMAL_INFEASIBLE, None,
                    np.arange(m), np.arange(n), fixed,
                )
            changed = True
        # rows: empty and singleton
        for i in np.nonzero(row_alive)[0]:
            idx, val = row_entries(i)
            if len(idx) == 0:
                if cl[i] > feas_tol or cu[i] < -feas_tol:
                    return PresolveResult(
                        PresolveStatus.PRIMAL_INFEASIBLE, None,
                        np.arange(m), np.arange(n), fixed,
                    )
                row_alive[i] = False
                changed = True
            elif len(idx) == 1:
                j, aij = int(idx[0]), float(val[0])
                lo, hi = cl[i] / aij, cu[i] / aij
                if aij < 0:
                    lo, hi = hi, lo
                singleton_log.append((int(i), j, aij, lo, hi))
                if lo > lb[j]:
                    lb[j] = lo
                if hi < ub[j]:
                    ub[j] = hi
                if lb[j] > ub[j] + feas_tol:
                    return PresolveResult(
                        PresolveStatus.PRIMAL_INFEASIBLE, None,
                        np.arange(m), np.arange(n), fixed,
                    )
                row_alive[i] = False
                changed = True
        # empty columns
        for j in np.nonzero(col_alive)[0]:
            rows, _ = col_entries(j)
            if len(rows) == 0:
                if c[j] > 0:
                    tgt = lb[j]
                elif c[j] < 0:
                    tgt = ub[j]
                else:
                    tgt = np.clip(0.0, lb[j], ub[j])
                if not np.isfinite(tgt):
                    return PresolveResult(
                        PresolveStatus.DUAL_INFEASIBLE, None,
                        np.arange(m), np.arange(n), fixed,
                    )
                fix_var(j, float(tgt))
                changed = True
        # forcing/infeasible rows via activity bounds
        for i in np.nonzero(row_alive)[0]:
            idx, val = row_entries(i)
            if len(idx) == 0:
                continue
            t_lo = np.where(val > 0, val * lb[idx], val * ub[idx])
            t_hi = np.where(val > 0, val * ub[idx], val * lb[idx])
            act_lo, act_hi = t_lo.sum(), t_hi.sum()
            if act_lo > cu[i] + feas_tol * (1 + abs(cu[i])) or \
               act_hi < cl[i] - feas_tol * (1 + abs(cl[i])):
                return PresolveResult(
                    PresolveStatus.PRIMAL_INFEASIBLE, None,
                    np.arange(m), np.arange(n), fixed,
                )
            if act_lo >= cl[i] - feas_tol and act_hi <= cu[i] + feas_tol:
                row_alive[i] = False  # redundant (free) row
                changed = True
        if not changed:
            break
        changed_any = changed_any or changed

    kept_rows = np.nonzero(row_alive)[0]
    kept_cols = np.nonzero(col_alive)[0]
    if len(kept_cols) == 0:
        # everything fixed: represent as an empty LP
        reduced = QuadraticProgram(
            objective_vector=np.zeros(0),
            constraint_matrix=sp.csr_matrix((0, 0)),
            constraint_lower=np.zeros(0),
            constraint_upper=np.zeros(0),
            variable_lower=np.zeros(0),
            variable_upper=np.zeros(0),
            objective_constant=qp.objective_constant
            + float(np.nansum(qp.objective_vector * np.nan_to_num(fixed))),
        )
        return PresolveResult(PresolveStatus.REDUCED, reduced,
                              kept_rows, kept_cols, fixed, singleton_log)
    sub = sp.csr_matrix(a[np.ix_(kept_rows, kept_cols)])
    obj_shift = float(np.nansum(
        np.where(col_alive, 0.0, qp.objective_vector * np.nan_to_num(fixed))
    ))
    reduced = QuadraticProgram(
        objective_vector=c[kept_cols],
        constraint_matrix=sub,
        constraint_lower=cl[kept_rows],
        constraint_upper=cu[kept_rows],
        variable_lower=lb[kept_cols],
        variable_upper=ub[kept_cols],
        objective_constant=qp.objective_constant + obj_shift,
        name=qp.name,
    )
    status = PresolveStatus.REDUCED if changed_any else \
        PresolveStatus.UNCHANGED
    return PresolveResult(status, reduced, kept_rows, kept_cols, fixed,
                          singleton_log)
