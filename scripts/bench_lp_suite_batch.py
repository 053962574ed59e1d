"""LP suite as ONE padded batch on the chip (BASELINE config 2).

The Netlib-style suite stand-in (the families of tests/test_lp_battery)
is solved as a SINGLE block-diagonal LP: independent instances occupy
independent blocks, so one PDHG solve advances the whole suite at once —
the 'padded scenario batch' the BASELINE sketches, realized through the
same block-sparse kernel as any other matrix.  Each block's solution is
then verified against scipy HiGHS on the host.

Writes artifacts/LPSUITE_r05.json.
"""

import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_suite():
    from ortools_tpu.models.generators import (block_random_lp,
                                               multicommodity_flow_lp)
    from ortools_tpu.models.lp import random_lp

    suite = []
    for seed in range(4):
        suite.append(random_lp(120, 160, density=0.15, seed=seed))
    for seed in range(4):
        suite.append(block_random_lp(256, 256, num_blocks=48,
                                     block_shape=(8, 128),
                                     seed=10 + seed))
    for seed in range(4):
        suite.append(multicommodity_flow_lp(24, 90, 4, seed=20 + seed))
    return suite


def main():
    import jax
    import jax.numpy as jnp

    from ortools_tpu.models.lp import QuadraticProgram
    from ortools_tpu.pdlp import PdhgParams, solve

    suite = [qp.as_minimization() for qp in build_suite()]
    names = [qp.name or f"lp{i}" for i, qp in enumerate(suite)]
    # block-diagonal stacking: independent blocks, one matrix
    a_stack = sp.block_diag([qp.constraint_matrix for qp in suite],
                            format="csr")
    qp_all = QuadraticProgram(
        objective_vector=np.concatenate(
            [qp.objective_vector for qp in suite]),
        constraint_matrix=a_stack,
        constraint_lower=np.concatenate(
            [qp.constraint_lower for qp in suite]),
        constraint_upper=np.concatenate(
            [qp.constraint_upper for qp in suite]),
        variable_lower=np.concatenate(
            [qp.variable_lower for qp in suite]),
        variable_upper=np.concatenate(
            [qp.variable_upper for qp in suite]),
        name="suite_blockdiag",
    )
    params = PdhgParams(dtype=jnp.float32,
                        eps_optimal_absolute=1e-5,
                        eps_optimal_relative=1e-5,
                        iteration_limit=300_000)
    t0 = time.perf_counter()
    r = solve(qp_all, params)
    batch_sec = time.perf_counter() - t0
    x = np.asarray(r.primal_solution)

    # per-block verification vs HiGHS
    from scipy.optimize import linprog

    rows_ok = 0
    offsets_v = np.cumsum([0] + [qp.num_variables for qp in suite])
    per = []
    for k, qp in enumerate(suite):
        xk = x[offsets_v[k]:offsets_v[k + 1]]
        a = sp.csr_matrix(qp.constraint_matrix)
        res = linprog(
            qp.objective_vector,
            A_ub=sp.vstack([a, -a]).toarray(),
            b_ub=np.concatenate([
                np.where(np.isfinite(qp.constraint_upper),
                         qp.constraint_upper, 1e12),
                np.where(np.isfinite(qp.constraint_lower),
                         -qp.constraint_lower, 1e12)]),
            bounds=list(zip(qp.variable_lower, qp.variable_upper)),
            method="highs")
        ours = float(qp.objective_vector @ xk)
        ok = res.status == 0 and abs(ours - res.fun) <= 1e-3 * (
            1 + abs(res.fun))
        rows_ok += ok
        per.append({"name": names[k], "ours": round(ours, 6),
                    "highs": round(float(res.fun), 6)
                    if res.status == 0 else None,
                    "ok": bool(ok)})
        print(f"# {names[k]}: ours={ours:.6f} "
              f"highs={res.fun if res.status == 0 else None} ok={ok}",
              file=sys.stderr)
    out = {
        "metric": "lp_suite_blockdiag_batch",
        "devices": [str(d) for d in jax.devices()],
        "n_instances": len(suite),
        "stacked_shape": [int(qp_all.num_constraints),
                          int(qp_all.num_variables)],
        "stacked_nnz": int(qp_all.num_nonzeros),
        "status": r.termination_reason.name,
        "iterations": int(r.iterations),
        "batch_solve_sec": round(batch_sec, 2),
        "verified_ok": f"{rows_ok}/{len(suite)}",
        "instances": per,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "LPSUITE_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k != "instances"}))


if __name__ == "__main__":
    main()
