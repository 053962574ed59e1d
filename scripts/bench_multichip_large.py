"""Large-instance multichip evidence (VERDICT r4 item #6).

The toy dryrun (`__graft_entry__.dryrun_multichip`) proves collective
correctness with cross-mesh iteration invariance; this script exercises
the padded BLOCK-SPARSE sharding path the toys skip: a >= 1M-nnz
multicommodity-flow LP solved to OPTIMAL on an 8-device virtual CPU mesh
in the 2-D (2 x 4) row x col layout, with per-cell block populations
logged and objective parity vs the single-device solve asserted at 1e-6
relative.

Run:
    cd /tmp && PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python /root/repo/scripts/bench_multichip_large.py
"""

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    devices = jax.devices()
    assert len(devices) >= 8, f"need 8 virtual devices, have {len(devices)}"

    from ortools_tpu.models.generators import multicommodity_flow_lp
    from ortools_tpu.parallel import make_mesh
    from ortools_tpu.pdlp import PdhgParams, solve
    from ortools_tpu.pdlp import solver as S

    # >= 1M nnz: 128 commodities x 2700 arcs -> 3*128*2700 = 1.037M nnz
    qp = multicommodity_flow_lp(200, 2700, 128, seed=3)
    nnz = qp.num_nonzeros
    print(f"instance: {qp.name} m={qp.num_constraints} "
          f"n={qp.num_variables} nnz={nnz}", file=sys.stderr)
    assert nnz >= 1_000_000, nnz

    # 1e-7: both solves terminate within 1e-7 of optimum, so their
    # objectives agree to the asserted 1e-6 with margin (at 1e-6 each,
    # the two differed by 1.2e-6 relative — a legitimate miss)
    params = PdhgParams(dtype=jnp.float64,
                        eps_optimal_absolute=1e-7,
                        eps_optimal_relative=1e-7,
                        iteration_limit=400_000)

    t0 = time.perf_counter()
    r1 = solve(qp, params)
    t_single = time.perf_counter() - t0
    print(f"single-device: {r1.termination_reason.name} "
          f"iters={r1.iterations} obj={r1.primal_objective:.10f} "
          f"{t_single:.1f}s", file=sys.stderr)
    assert r1.termination_reason.name == "OPTIMAL"

    # per-cell block populations of the 2-D partition (the padded
    # block-sharding path under test)
    mesh = make_mesh(shape=(2, 4), axis_names=("row", "col"),
                     devices=devices[:8])
    prob2d, _ = S.build_2d_problem(qp.as_minimization(), params, mesh)
    # recompute the cell census exactly as build_2d_problem does
    qpm = qp.as_minimization()
    bm, bn = prob2d.a.data.shape[1], prob2d.a.data.shape[2]
    base = S.build_device_problem(
        qpm, params,
        row_pad_multiple=2 * bm * (128 // math.gcd(128, bm)),
        col_pad_multiple=4 * bn * (128 // math.gcd(128, bn)))
    mm, nn = base.a.padded_shape
    rows_per_seg = (mm // 2) // bm
    cols_per_seg = (nn // 4) // bn
    brow = np.asarray(base.a.block_rows)[: base.a.num_real_blocks]
    bcol = np.asarray(base.a.block_cols)[: base.a.num_real_blocks]
    cell = (brow // rows_per_seg) * 4 + (bcol // cols_per_seg)
    counts = np.bincount(cell, minlength=8).tolist()

    t0 = time.perf_counter()
    r2 = solve(qp, params, mesh=mesh)
    t_mesh = time.perf_counter() - t0
    print(f"2-D (2,4) mesh: {r2.termination_reason.name} "
          f"iters={r2.iterations} obj={r2.primal_objective:.10f} "
          f"{t_mesh:.1f}s", file=sys.stderr)
    assert r2.termination_reason.name == "OPTIMAL"
    rel = abs(r2.primal_objective - r1.primal_objective) / (
        1 + abs(r1.primal_objective))
    assert rel <= 1e-6, rel

    out = {
        "metric": "multichip_large_2d",
        "instance": qp.name,
        "m": int(qp.num_constraints),
        "n": int(qp.num_variables),
        "nnz": int(nnz),
        "mesh": "2x4 virtual CPU devices",
        "block_shape": [int(bm), int(bn)],
        "blocks_per_cell": counts,
        "cell_padding_ratio": round(max(counts) * 8
                                    / max(sum(counts), 1), 3),
        "single_device": {
            "status": r1.termination_reason.name,
            "iterations": int(r1.iterations),
            "objective": float(r1.primal_objective),
            "sec": round(t_single, 1),
        },
        "mesh_2d": {
            "status": r2.termination_reason.name,
            "iterations": int(r2.iterations),
            "objective": float(r2.primal_objective),
            "sec": round(t_mesh, 1),
        },
        "objective_rel_diff": float(rel),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "MULTICHIP_r05_large.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
