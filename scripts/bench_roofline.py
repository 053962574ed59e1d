"""In-dispatch HBM streaming ceiling (VERDICT r4 item #9).

Round-4 measured ~316 GB/s for plain XLA elementwise streaming, but every
measurement crossed the experimental remote-TPU tunnel (~25 ms fixed cost
per dispatch), leaving open whether 316 GB/s is the device ceiling or a
tunnel artifact.  This experiment times N streaming iterations INSIDE one
jitted dispatch (lax.fori_loop) and fits time(N) = fixed + N * per_iter:
the slope isolates on-device bandwidth from every per-dispatch cost.

Kernel: y <- x * a_i + y over f32 arrays (12 bytes/element/iteration:
read x, read y, write y).  Writes artifacts/ROOFLINE_r05.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    # 256 MiB per array: x + y = 512 MiB, 4x the 128 MiB v5e VMEM, so
    # the loop body MUST stream from HBM every iteration (64 MiB arrays
    # measured an impossible 2.2 TB/s — XLA had hoisted both operands
    # into VMEM across the fori_loop)
    n_elems = 1 << 26
    bytes_per_iter = 3 * 4 * n_elems

    def make_prog(n_iters):
        @jax.jit
        def prog(x, y):
            def body(i, y):
                return x * (1.0 + 1e-9 * i) + y
            return lax.fori_loop(0, n_iters, body, y)
        return prog

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n_elems, dtype=np.float32))
    y0 = jnp.asarray(rng.standard_normal(n_elems, dtype=np.float32))

    results = []
    for n_iters in (1, 16, 64, 256):
        prog = make_prog(n_iters)
        # warm up (compile + one run)
        r = prog(x, y0)
        float(np.asarray(jnp.sum(r)))  # force completion through tunnel
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            r = prog(x, y0)
            float(np.asarray(jnp.sum(r)))
            best = min(best, time.perf_counter() - t0)
        results.append((n_iters, best))
        print(f"N={n_iters:5d}: best {best*1e3:9.2f} ms", file=sys.stderr)

    # least-squares fit time = fixed + per_iter * N over the larger Ns
    ns = np.array([n for n, _ in results[1:]], dtype=np.float64)
    ts = np.array([t for _, t in results[1:]], dtype=np.float64)
    A = np.stack([np.ones_like(ns), ns], axis=1)
    (fixed, per_iter), *_ = np.linalg.lstsq(A, ts, rcond=None)
    in_dispatch_gbs = bytes_per_iter / per_iter / 1e9
    # the round-4 style single-dispatch measurement for contrast
    n1, t1 = results[0]
    single_gbs = bytes_per_iter * n1 / t1 / 1e9

    out = {
        "metric": "hbm_stream_roofline",
        "array_mib": n_elems * 4 / 2**20,
        "bytes_per_iteration": bytes_per_iter,
        "samples": [{"iters": n, "best_sec": round(t, 5)}
                    for n, t in results],
        "fixed_overhead_ms": round(fixed * 1e3, 2),
        "per_iteration_us": round(per_iter * 1e6, 2),
        "in_dispatch_gb_per_s": round(in_dispatch_gbs, 1),
        "single_dispatch_gb_per_s": round(single_gbs, 1),
        "v5e_paper_peak_gb_per_s": 819,
        "fraction_of_paper_peak": round(in_dispatch_gbs / 819, 3),
        "devices": [str(d) for d in jax.devices()],
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "ROOFLINE_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
