"""Mixed-precision PDHG control flow (VERDICT r3 weak #7).

Forces the two host-side switching paths of pdlp/solver.py's fast-stream
loop on the CPU interpret-mode kernels:
  1. the bf16-noise-floor stall -> permanent switch to the exact stream;
  2. the non-finite fast major -> exact retry (solve must not abort).
Observability: each recorded iteration carries stream="fast"|"exact".
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ortools_tpu.models.lp import random_lp
from ortools_tpu.pdlp import PdhgParams, solve
from ortools_tpu.pdlp import solver as S
from ortools_tpu.utils.status import TerminationReason

from tests.test_pdlp import scipy_solve


def _mixed_params(**kw):
    # force the tiled interpret-mode path on CPU with the bf16 stream on
    base = dict(
        dtype=jnp.float32,
        use_tiled_spmv=True,
        # (8, 128) blocks on a dense 256x256 LP: 64 real blocks per
        # matrix -> chunk padding ratio 2, below the tiled-attach gate
        block_shape=(8, 128),
        stream_precision="mixed",
        record_iteration_stats=True,
        iteration_limit=20000,
    )
    base.update(kw)
    return PdhgParams(**base)


def test_fast_stream_runs_then_switches_and_solves():
    qp = random_lp(256, 256, density=0.5, seed=11)
    ref = scipy_solve(qp)
    params = _mixed_params()
    r = solve(qp, params)
    assert r.termination_reason == TerminationReason.OPTIMAL
    assert abs(r.primal_objective - ref) <= 1e-4 * (1 + abs(ref))
    streams = [rec["stream"] for rec in r.iteration_stats]
    assert streams, "iteration log must be recorded"
    # the solve starts on the fast stream
    assert streams[0] == "fast"
    # once it leaves fast mode it never returns (stall latch is one-way)
    if "exact" in streams:
        first_exact = streams.index("exact")
        assert all(s == "exact" for s in streams[first_exact:])


def test_fast_stream_stall_switches_to_exact():
    # tight tolerances sit below the bf16 noise floor, so the fast stream
    # MUST stall and hand over to the exact stream before OPTIMAL
    qp = random_lp(256, 256, density=0.5, seed=7)
    params = _mixed_params(
        eps_optimal_absolute=1e-6, eps_optimal_relative=1e-6,
    )
    r = solve(qp, params)
    streams = [rec["stream"] for rec in r.iteration_stats]
    assert r.termination_reason == TerminationReason.OPTIMAL
    assert "fast" in streams and "exact" in streams, streams
    # final majors (and hence the certificate) came from the exact stream
    assert streams[-1] == "exact"


def test_fast_stream_nonfinite_retries_exactly(monkeypatch):
    """A NaN-producing fast kernel must trigger the exact retry, not a
    NUMERICAL_ERROR abort (pdlp/solver.py _leave_fast_mode + continue)."""
    from ortools_tpu.ops import tiled_spmv as T

    def poisoned_fast(t, x, m_padded, interpret=False):
        return jnp.full((m_padded,), jnp.nan, dtype=x.dtype)

    monkeypatch.setattr(T, "tiled_matvec_fast", poisoned_fast)
    # unique params value so the memoized jit bundle is rebuilt with the
    # poisoned kernel traced in (solver._single_device_fns cache key)
    qp = random_lp(256, 256, density=0.5, seed=3)
    ref = scipy_solve(qp)
    params = _mixed_params(termination_check_frequency=48)
    r = solve(qp, params)
    assert r.termination_reason == TerminationReason.OPTIMAL
    assert abs(r.primal_objective - ref) <= 1e-4 * (1 + abs(ref))
    streams = [rec["stream"] for rec in r.iteration_stats]
    # the poisoned fast major is rewound (never recorded); every recorded
    # major came from the exact stream and the solve still succeeded
    assert streams and all(s == "exact" for s in streams), streams


def test_exact_precision_param_never_uses_fast():
    qp = random_lp(256, 256, density=0.5, seed=5)
    params = _mixed_params(stream_precision="exact")
    r = solve(qp, params)
    assert r.termination_reason == TerminationReason.OPTIMAL
    assert all(rec["stream"] == "exact" for rec in r.iteration_stats)
