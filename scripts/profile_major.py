"""Profile the PDHG major-iteration breakdown on the real TPU.

Times, each inside ONE jitted dispatch (fori_loop):
  1. full run_major loop (the bench headline),
  2. matvec+rmatvec only loop,
  3. matvec-only loop,
and reports per-iteration microseconds + linesearch attempt stats.
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

M = N = 16384
NUM_BLOCKS = 4096
BLOCK = (8, 128)
MAJORS = 64
REPS = 3


def sync(arr):
    return float(np.asarray(jnp.sum(arr)))


def timed(fn, *args):
    out = fn(*args)
    sync(out[0] if isinstance(out, tuple) else
         (out.x if hasattr(out, "x") else out))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out[0] if isinstance(out, tuple) else
             (out.x if hasattr(out, "x") else out))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    qp = block_random_lp(M, N, num_blocks=NUM_BLOCKS, block_shape=BLOCK,
                         seed=0)
    params = PdhgParams(dtype=jnp.float32, block_shape=BLOCK)
    prob = S.build_device_problem(qp, params)
    _major = S._make_run_major(params)

    @jax.jit
    def run_block(prob_, state_):
        return jax.lax.fori_loop(0, MAJORS, lambda _, s: _major(prob_, s),
                                 state_)

    a_csr = sp.csr_matrix(abs(qp.constraint_matrix))
    sigma = jnp.asarray(
        np.sqrt(float(a_csr.sum(axis=1).max()) *
                float(a_csr.sum(axis=0).max())), params.dtype)
    state = jax.jit(S._make_initial_state(params))(prob, sigma)

    iters = MAJORS * params.termination_check_frequency

    dt, state2 = timed(run_block, prob, state)
    print(f"full major loop : {dt*1e6/iters:8.2f} us/iter "
          f"({iters/dt:,.0f} iter/s)")
    ns = float(state2.num_steps) - float(state.num_steps)
    na = float(state2.num_accepted) - float(state.num_accepted)
    print(f"  linesearch attempts/accepted = {ns/max(na,1):.3f} "
          f"(steps {ns:.0f} / accepted {na:.0f})")

    # matvec + rmatvec only
    x0 = state.x
    y0 = state.y

    @jax.jit
    def mm_loop(prob_, x, y):
        def body(_, c):
            x_, y_ = c
            ax = prob_.a.matvec(x_)
            aty = prob_.at.matvec(y_)
            return (x_ + 1e-30 * aty, y_ + 1e-30 * ax)
        return jax.lax.fori_loop(0, iters, body, (x, y))

    dt, _ = timed(mm_loop, prob, x0, y0)
    print(f"matvec+rmatvec  : {dt*1e6/iters:8.2f} us/iter "
          f"({2*16*1.048576/ (dt*1e6/iters) * 1000:,.0f} GB/s fwd+bwd)")

    @jax.jit
    def mv_loop(prob_, x, y):
        def body(_, c):
            x_, y_ = c
            ax = prob_.a.matvec(x_)
            return (x_ * (1.0 + 1e-30 * ax[0]), y_)
        return jax.lax.fori_loop(0, iters, body, (x, y))

    dt, _ = timed(mv_loop, prob, x0, jnp.zeros_like(y0))
    print(f"matvec only     : {dt*1e6/iters:8.2f} us/iter "
          f"({16*1.048576/(dt*1e6/iters)*1000:,.0f} GB/s)")

    # vector ops only (no SpMV): the non-matvec part of an iteration
    @jax.jit
    def vec_loop(prob_, st):
        def body(_, s):
            grad = prob_.c + prob_.q * s.x - s.aty
            tau = s.step_size / s.primal_weight
            sigma_ = s.step_size * s.primal_weight
            x_new = jnp.clip(s.x - tau * grad, prob_.var_lb, prob_.var_ub)
            y_hat = s.y - sigma_ * s.ax
            y_new = S._dual_prox(y_hat, sigma_, prob_.con_lb, prob_.con_ub)
            dx = x_new - s.x
            dy = y_new - s.y
            movement = 0.5 * (jnp.vdot(dx, dx) + jnp.vdot(dy, dy))
            inter = jnp.abs(jnp.vdot(dy, s.ax)) * 0.5
            ns = jnp.where(movement > inter, s.step_size, s.step_size * 0.99)
            return s._replace(x=x_new, y=y_new, step_size=ns,
                              x_sum=s.x_sum + x_new, y_sum=s.y_sum + y_new)
        return jax.lax.fori_loop(0, iters, body, st)

    dt, _ = timed(vec_loop, prob, state)
    print(f"vector ops only : {dt*1e6/iters:8.2f} us/iter")


if __name__ == "__main__":
    main()
