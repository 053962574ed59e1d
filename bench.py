"""Benchmark: PDHG iterations/s/chip on a block-sparse LP.

North-star metric (BASELINE.md): PDHG iterations/s/chip.  The reference
(OR-Tools PDLP) is a CPU-multithreaded C++ solver with no published numbers
(BASELINE.json published: {}), so the baseline here is the same PDHG
iteration implemented over scipy CSR on the host CPU of this machine —
an honest stand-in for the reference's per-core CPU path on identical math:
2 SpMVs + vector ops + reductions per iteration.

Prints exactly one JSON line:
  {"metric": "pdhg_iterations_per_sec_per_chip", "value": ..., "unit":
   "iter/s", "vs_baseline": <tpu / cpu-baseline ratio>, ...extras}
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
MAJORS_TIMED = 8  # timed calls of 64 iterations each


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
    import jax
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
    initial_state = jax.jit(S._make_initial_state(params))
    power_iter = jax.jit(S._make_power_iter(params))

    v0 = jax.random.normal(jax.random.PRNGKey(0), (prob.c.shape[0],),
                           dtype=prob.c.dtype)
    sigma = power_iter(prob, v0)
    state = initial_state(prob, sigma)

    # Warmup/compile.
    state = run_major(prob, state)
    jax.block_until_ready(state.x)

    t0 = time.perf_counter()
    for _ in range(MAJORS_TIMED):
        state = run_major(prob, state)
    jax.block_until_ready(state.x)
    dt = time.perf_counter() - t0
    iters_done = MAJORS_TIMED * params.termination_check_frequency
    tpu_ips = iters_done / dt

    cpu_ips = cpu_baseline_iters_per_sec(qp)

    out = {
        "metric": "pdhg_iterations_per_sec_per_chip",
        "value": round(tpu_ips, 2),
        "unit": "iter/s",
        "vs_baseline": round(tpu_ips / cpu_ips, 3),
        "baseline_cpu_iter_per_sec": round(cpu_ips, 2),
        "problem": {"m": M, "n": N, "nnz": int(nnz), "dtype": "float32"},
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
