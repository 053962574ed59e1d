"""Benchmark: PDHG iterations/s/chip on a block-sparse LP.

North-star metric (BASELINE.md): PDHG iterations/s/chip.  The reference
(OR-Tools PDLP) is a CPU-multithreaded C++ solver with no published numbers
(BASELINE.json published: {}), so the baseline here is the same PDHG
iteration implemented over scipy CSR on the host CPU of this machine —
an honest stand-in for the reference's per-core CPU path on identical math:
2 SpMVs + vector ops + reductions per iteration.

Prints exactly one JSON line (VERDICT r3 task #2 schema):
  {"metric": "pdhg_iterations_per_sec_per_chip", "value": ..., "unit":
   "iter/s", "vs_baseline": <tpu / PINNED cpu baseline>,
   "fast_stream_iter_per_sec": ...,
   "spmv": {"exact_us": ..., "exact_gbps": ..., "fast_us": ...,
            "fast_gbps": ..., "device_stream_gbps": ...}, ...extras}

``vs_baseline`` divides by a PINNED constant so the ratio cannot swing
with host load; the live measurement is also reported for transparency.
"""

import json
import time

import numpy as np
import scipy.sparse as sp

# Problem size: ~4M nnz in dense (8,128) blocks -> 16 MB f32 matrix data,
# bandwidth-bound SpMV; representative of a mid-size LP relaxation.
M = 16384
N = 16384
NUM_BLOCKS = 4096
BLOCK = (8, 128)
MAJORS_TIMED = 128  # timed majors of 64 iterations each, one dispatch
TIMING_REPS = 3  # best-of repetitions (amortizes remote dispatch noise)

# PINNED CPU baseline for vs_baseline (VERDICT r3 weak #4: the in-run
# baseline swung 14-84 iter/s with host load, moving vs_baseline 30%
# with zero code change).  Provenance: cpu_baseline_iters_per_sec(qp)
# below — same-math scipy CSR float64 loop, single thread — median of 5
# runs on this container's idle host CPU, 2026-08-20, bench matrix
# (16384^2, 4M nnz): 62.8 iter/s.  Re-pin only with a recorded rerun.
PINNED_CPU_BASELINE_IPS = 62.8
KERNEL_SPMV_ITERS = 512  # chained matvecs per dispatch for kernel timing


def cpu_baseline_iters_per_sec(qp, iters: int = 192) -> float:
    """Same PDHG math on host CPU with scipy CSR (float64, like the
    reference's Eigen path)."""
    a = sp.csr_matrix(qp.constraint_matrix)
    at = sp.csr_matrix(a.T)
    n, m = a.shape[1], a.shape[0]
    c = qp.objective_vector
    lb, ub = qp.variable_lower, qp.variable_upper
    cl, cu = qp.constraint_lower, qp.constraint_upper
    x = np.clip(np.zeros(n), lb, ub)
    y = np.zeros(m)
    ax = a @ x
    aty = at @ y
    tau = sigma = 0.05
    t0 = time.perf_counter()
    for _ in range(iters):
        grad = c - aty
        x_new = np.clip(x - tau * grad, lb, ub)
        ax_mid = a @ (2.0 * x_new - x)
        y_hat = y - sigma * ax_mid
        pos = y_hat + sigma * cl
        neg = y_hat + sigma * cu
        y_new = np.where(pos > 0, pos, np.where(neg < 0, neg, 0.0))
        dx = x_new - x
        dy = y_new - y
        movement = 0.5 * (dx @ dx + dy @ dy)
        interaction = abs(dy @ (ax_mid - ax)) * 0.5
        _ = movement, interaction  # same reductions as the device loop
        ax = 0.5 * (ax_mid + ax)
        aty = at @ y_new
        x, y = x_new, y_new
    dt = time.perf_counter() - t0
    return iters / dt


def main():
    t_start = time.perf_counter()
    import os

    import jax

    # Persistent compile cache: the first bench run of a session pays the
    # (remote) compiles, later runs start timing immediately.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from ortools_tpu.models.generators import block_random_lp
    from ortools_tpu.pdlp import solver as S
    from ortools_tpu.pdlp.params import PdhgParams

    qp = block_random_lp(M, N, num_blocks=NUM_BLOCKS, block_shape=BLOCK,
                         seed=0)
    nnz = qp.num_nonzeros

    params = PdhgParams(dtype=jnp.float32, block_shape=BLOCK)
    prob = S.build_device_problem(qp, params)
    run_major = jax.jit(S._make_run_major(params))
    # All timed majors inside ONE jitted program: a single dispatch, so
    # host<->device round-trip latency (large under the remote-TPU tunnel)
    # is excluded from the measurement.
    _major = S._make_run_major(params)

    @jax.jit
    def run_block(prob_, state_):
        return jax.lax.fori_loop(
            0, MAJORS_TIMED, lambda _, s: _major(prob_, s), state_
        )

    initial_state = jax.jit(S._make_initial_state(params))

    # sigma_max upper bound computed on the host (sqrt(norm1 * norminf))
    # — avoids compiling the power-iteration program just for the bench;
    # the adaptive step rule corrects the initial step anyway.
    a_csr = sp.csr_matrix(abs(qp.constraint_matrix))
    norm_inf = float(a_csr.sum(axis=1).max())
    norm_1 = float(a_csr.sum(axis=0).max())
    sigma = jnp.asarray(np.sqrt(norm_inf * norm_1), dtype=params.dtype)
    state = initial_state(prob, sigma)

    # Warmup/compile.  NOTE: on the experimental remote-TPU platform
    # block_until_ready does not reliably wait, so completion is forced by
    # pulling a scalar to the host.
    def sync(arr):
        return float(np.asarray(jnp.sum(arr)))

    state = run_block(prob, state)
    sync(state.x)

    best_dt = float("inf")
    for _ in range(TIMING_REPS):
        t0 = time.perf_counter()
        state = run_block(prob, state)
        sync(state.x)
        best_dt = min(best_dt, time.perf_counter() - t0)
    iters_done = MAJORS_TIMED * params.termination_check_frequency
    tpu_ips = iters_done / best_dt

    # ---- fast (bf16) stream full loop ---------------------------------
    fast_ips = None
    if prob.a.has_fast_stream and prob.at.has_fast_stream:
        _major_fast = S._make_run_major(params, fast=True)

        @jax.jit
        def run_block_fast(prob_, state_):
            return jax.lax.fori_loop(
                0, MAJORS_TIMED, lambda _, s: _major_fast(prob_, s),
                state_)

        fstate = initial_state(prob, sigma)
        fstate = run_block_fast(prob, fstate)
        sync(fstate.x)
        best_f = float("inf")
        for _ in range(TIMING_REPS):
            t0 = time.perf_counter()
            fstate = run_block_fast(prob, fstate)
            sync(fstate.x)
            best_f = min(best_f, time.perf_counter() - t0)
        fast_ips = iters_done / best_f

    # ---- kernel-level SpMV timing (in-loop, chained) -------------------
    spmv = None
    if prob.a.tiled is not None:
        from ortools_tpu.ops import tiled_spmv as TS

        t = prob.a.tiled
        mm_p, nn_p = prob.a.padded_shape
        inv_sigma = jnp.asarray(1.0 / float(sigma), params.dtype)
        x0 = jnp.asarray(
            np.random.default_rng(0).standard_normal(nn_p), params.dtype)

        # fixed per-dispatch cost (the remote-tunnel tax, ~25 ms here):
        # measured on an empty program and subtracted from every chained
        # loop below.  Round-4 did NOT subtract it, which deflated every
        # kernel number by ~50 us/matvec and manufactured a false
        # ~316 GB/s "device ceiling" (see artifacts/ROOFLINE_r05.json —
        # the true in-dispatch streaming ceiling is ~684 GB/s).
        @jax.jit
        def _null(xx):
            return xx

        y = _null(x0)
        sync(y)
        disp_fixed = float("inf")
        for _ in range(TIMING_REPS):
            t0 = time.perf_counter()
            y = _null(y)
            sync(y)
            disp_fixed = min(disp_fixed, time.perf_counter() - t0)

        def time_matvec(mv):
            @jax.jit
            def run(xx):
                return jax.lax.fori_loop(
                    0, KERNEL_SPMV_ITERS,
                    lambda _, s: mv(s) * inv_sigma, xx)
            y = run(x0)
            sync(y)
            best = float("inf")
            for _ in range(TIMING_REPS):
                t0 = time.perf_counter()
                y = run(y)
                sync(y)
                best = min(best, time.perf_counter() - t0)
            return max(best - disp_fixed, 1e-9) / KERNEL_SPMV_ITERS

        exact_bytes = int(t.data_t.size) * t.data_t.dtype.itemsize
        dt_exact = time_matvec(lambda x: TS.tiled_matvec(t, x, mm_p))
        spmv = {
            "dispatch_fixed_ms": round(disp_fixed * 1e3, 2),
            "exact_us": round(dt_exact * 1e6, 2),
            "exact_gbps": round(exact_bytes / dt_exact / 1e9, 1),
        }
        if t.data_hi is not None:
            fast_bytes = int(t.data_hi.size) * 2
            dt_fast = time_matvec(
                lambda x: TS.tiled_matvec_fast(t, x, mm_p))
            spmv["fast_us"] = round(dt_fast * 1e6, 2)
            spmv["fast_gbps"] = round(fast_bytes / dt_fast / 1e9, 1)
        # achievable-streaming reference on THIS device: plain XLA
        # elementwise over arrays 4x the 128 MiB VMEM (smaller arrays get
        # hoisted into VMEM across the loop and report impossible rates),
        # in-dispatch, fixed overhead subtracted
        big = jnp.zeros((8192, 8192), params.dtype)

        @jax.jit
        def stream(xx):
            return jax.lax.fori_loop(
                0, 64, lambda _, s: s * 0.9999 + 0.0001, xx)

        y = stream(big)
        sync(y)
        best_s = float("inf")
        for _ in range(TIMING_REPS):
            t0 = time.perf_counter()
            y = stream(y)
            sync(y)
            best_s = min(best_s, time.perf_counter() - t0)
        spmv["device_stream_gbps"] = round(
            2 * big.size * big.dtype.itemsize
            / (max(best_s - disp_fixed, 1e-9) / 64) / 1e9, 1)

    cpu_ips = cpu_baseline_iters_per_sec(qp)

    # Extra: batched PDHG (B&B-node / scenario batch axis -> SpMM on the
    # MXU).  Reports aggregate LP-iterations/s across the batch.  Remote
    # compile times vary; skip the extra if the headline metric already
    # consumed the budget (the primary metric always lands).
    batched_ips = None
    if time.perf_counter() - t_start > 300:
        _emit(tpu_ips, cpu_ips, batched_ips, nnz, jax, fast_ips, spmv)
        return
    from ortools_tpu.pdlp.batched import _prob_axes

    bsz = 64
    vprob = prob._replace(
        var_lb=jnp.tile(prob.var_lb[None, :], (bsz, 1)),
        var_ub=jnp.tile(prob.var_ub[None, :], (bsz, 1)),
        orig_var_lb=jnp.tile(prob.orig_var_lb[None, :], (bsz, 1)),
        orig_var_ub=jnp.tile(prob.orig_var_ub[None, :], (bsz, 1)),
    )
    axes = _prob_axes(prob)
    _vmajor = jax.vmap(S._make_run_major(params), in_axes=(axes, 0))
    BATCH_MAJORS = 4

    @jax.jit
    def run_block_v(prob_, state_):
        return jax.lax.fori_loop(
            0, BATCH_MAJORS, lambda _, s: _vmajor(prob_, s), state_
        )

    init_v = jax.jit(jax.vmap(S._make_initial_state(params),
                              in_axes=(axes, None)))
    vstate = init_v(vprob, sigma)
    vstate = run_block_v(vprob, vstate)  # warmup/compile
    sync(vstate.x)
    best_b = float("inf")
    for _ in range(TIMING_REPS):
        t0 = time.perf_counter()
        vstate = run_block_v(vprob, vstate)
        sync(vstate.x)
        best_b = min(best_b, time.perf_counter() - t0)
    batched_ips = (BATCH_MAJORS * params.termination_check_frequency
                   * bsz / best_b)
    _emit(tpu_ips, cpu_ips, batched_ips, nnz, jax, fast_ips, spmv)


def _emit(tpu_ips, cpu_ips, batched_ips, nnz, jax, fast_ips=None,
          spmv=None):
    out = {
        "metric": "pdhg_iterations_per_sec_per_chip",
        "value": round(tpu_ips, 2),
        "unit": "iter/s",
        # pinned denominator: fixed impl/iters/threads (see header)
        "vs_baseline": round(tpu_ips / PINNED_CPU_BASELINE_IPS, 3),
        "baseline_cpu_iter_per_sec_pinned": PINNED_CPU_BASELINE_IPS,
        "baseline_cpu_iter_per_sec_live": round(cpu_ips, 2),
        "problem": {"m": M, "n": N, "nnz": int(nnz), "dtype": "float32"},
        "device": str(jax.devices()[0]),
    }
    if fast_ips is not None:
        out["fast_stream_iter_per_sec"] = round(fast_ips, 2)
    if spmv is not None:
        out["spmv"] = spmv
    if batched_ips is not None:
        out["batched64_lp_iterations_per_sec"] = round(batched_ips, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
