"""Quick per-family probe of the MIPLIB-like battery (dev tool)."""
import math
import sys
import time

import numpy as np
from scipy.optimize import Bounds, LinearConstraint, milp

from ortools_tpu.mip.branch_and_bound import solve as mip_solve
from ortools_tpu.models import mip_generators as g
from ortools_tpu.utils.status import MPSolverStatus


def probe(qp, tlim=30.0, **kw):
    t0 = time.perf_counter()
    r = mip_solve(qp, max_nodes=20_000, node_batch_size=64,
                  time_limit_sec=tlim, **kw)
    dt = time.perf_counter() - t0
    qpm = qp.as_minimization()
    sign = -1.0 if qp.maximize else 1.0
    s = milp(qpm.objective_vector,
             constraints=LinearConstraint(qpm.constraint_matrix,
                                          qpm.constraint_lower,
                                          qpm.constraint_upper),
             bounds=Bounds(qpm.variable_lower, qpm.variable_upper),
             integrality=np.asarray(qpm.integrality, dtype=float),
             options={"time_limit": tlim})
    ours = (sign * r.objective_value
            if r.status in (MPSolverStatus.OPTIMAL, MPSolverStatus.FEASIBLE)
            and not math.isnan(r.objective_value) else math.nan)
    ref = s.fun if s.status in (0, 1) and s.fun is not None else math.nan
    ok = (not math.isnan(ours) and not math.isnan(ref)
          and abs(ours - ref) <= 1e-4 * (1 + abs(ref)))
    print(f"{qp.name}: ours={ours:.6g} ref={ref:.6g} match={ok} "
          f"status={r.status.name} nodes={r.num_nodes} {dt:.1f}s",
          flush=True)
    return ok


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    tlim = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0
    insts = {
        "sc": lambda: g.set_cover(150, 60, seed=1),
        "mk": lambda: g.multi_knapsack(100, 5, seed=4),
        "mk2": lambda: g.multi_knapsack(200, 8, seed=5),
        "mk3": lambda: g.multi_knapsack(300, 10, seed=6),
        "fc": lambda: g.fixed_charge(100, seed=8),
        "gap": lambda: g.assignment_gap(30, 8, seed=11),
        "ep": lambda: g.edge_packing(200, 800, seed=14),
        "ek": lambda: g.equality_knapsack(200, seed=17),
    }
    keys = list(insts) if which == "all" else which.split(",")
    n_ok = 0
    for k in keys:
        n_ok += probe(insts[k](), tlim=tlim)
    print(f"{n_ok}/{len(keys)} matched", flush=True)
