"""Validate mixed-precision PDHG (bf16 fast stream) vs exact on TPU.

1. fast-kernel vs exact-kernel agreement on the real chip,
2. run_major_fast per-iteration time vs exact,
3. full solve() in auto (mixed) vs exact mode: same termination, matching
   objectives.
"""
import os as _os
import jax as _jax
try:
    _jax.config.update("jax_compilation_cache_dir",
                       "/root/repo/.jax_cache")
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import time

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from ortools_tpu.models.generators import block_random_lp
from ortools_tpu.pdlp import solver as S
from ortools_tpu.pdlp.params import PdhgParams

import sys as _sys

# "small" keeps every transfer/compile tunnel-friendly (the full size
# wedges the remote-TPU tunnel for tens of minutes; measured round 4)
_SMALL = len(_sys.argv) > 1 and _sys.argv[1] == "small"
M = N = 8192 if _SMALL else 16384
NUM_BLOCKS = 2048 if _SMALL else 4096
BLOCK = (8, 128)
MAJORS = 32 if _SMALL else 64
REPS = 2 if _SMALL else 3


def sync(arr):
    return float(np.asarray(jnp.sum(arr)))


def main():
    qp = block_random_lp(M, N, num_blocks=NUM_BLOCKS, block_shape=BLOCK,
                         seed=0)
    params = PdhgParams(dtype=jnp.float32, block_shape=BLOCK)
    prob = S.build_device_problem(qp, params)
    assert prob.a.has_fast_stream and prob.at.has_fast_stream

    # 1. kernel agreement on chip
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(prob.a.padded_shape[1]),
                    dtype=jnp.float32)
    y_e = np.asarray(prob.a.matvec(x))
    y_f = np.asarray(prob.a.matvec_fast(x))
    rel = np.abs(y_f - y_e).max() / (1 + np.abs(y_e).max())
    print(f"fast-vs-exact on chip: max rel diff {rel:.2e}")
    assert rel < 3e-2

    # 2. timing
    _maj_e = S._make_run_major(params)
    _maj_f = S._make_run_major(params, fast=True)

    def mk(major):
        @jax.jit
        def run(prob_, st):
            return jax.lax.fori_loop(0, MAJORS,
                                     lambda _, s: major(prob_, s), st)
        return run

    run_e, run_f = mk(_maj_e), mk(_maj_f)
    a_csr = sp.csr_matrix(abs(qp.constraint_matrix))
    sigma = jnp.asarray(
        np.sqrt(float(a_csr.sum(axis=1).max())
                * float(a_csr.sum(axis=0).max())), params.dtype)
    st0 = jax.jit(S._make_initial_state(params))(prob, sigma)
    iters = MAJORS * params.termination_check_frequency
    for name, fn in (("exact", run_e), ("fast", run_f)):
        st = fn(prob, st0)
        sync(st.x)
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            st = fn(prob, st)
            sync(st.x)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:6s}: {best*1e6/iters:7.2f} us/iter "
              f"({iters/best:,.0f} iter/s)")

    # 3. solve parity (smaller problem so it converges quickly)
    qp2 = block_random_lp(2048 if _SMALL else 4096,
                          2048 if _SMALL else 4096,
                          num_blocks=512 if _SMALL else 1024,
                          block_shape=BLOCK, seed=3)
    for mode in ("exact", "auto"):
        p = PdhgParams(dtype=jnp.float32, block_shape=BLOCK,
                       stream_precision=mode, iteration_limit=200_000)
        t0 = time.perf_counter()
        r = S.solve(qp2, p)
        dt = time.perf_counter() - t0
        print(f"solve[{mode:5s}]: {r.termination_reason.name} "
              f"obj={r.primal_objective:.8e} iters={r.iterations} "
              f"gap={r.relative_gap:.2e} {dt:.1f}s")


if __name__ == "__main__":
    main()
