"""Fused tiled SpMV kernel: exactness vs scipy and the XLA block path.

On CPU the Pallas kernel runs in interpreter mode (same program, no TPU
needed) — the TPU bench harness re-checks compiled-vs-XLA agreement on
the real chip.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from ortools_tpu.ops.block_sparse import BlockSparseMatrix
from ortools_tpu.ops.tiled_spmv import pack_tiled, tiled_matvec


def _make(m, n, density, block_shape, seed, chunk_size=None):
    rng = np.random.default_rng(seed)
    a = sp.random(m, n, density=density, random_state=rng, format="csr")
    bsm = BlockSparseMatrix.from_scipy(a, block_shape=block_shape)
    t = pack_tiled(
        np.asarray(bsm.data), np.asarray(bsm.block_rows),
        np.asarray(bsm.block_cols), bsm.num_real_blocks, bsm.padded_shape,
        chunk_size=chunk_size,
    )
    return a, bsm, t


@pytest.mark.parametrize(
    "m,n,density,block_shape",
    [
        (300, 500, 0.02, (8, 128)),
        (1000, 700, 0.005, (8, 128)),
        (900, 1100, 0.002, (32, 128)),
        (17, 5, 0.5, (8, 128)),
        (128, 20000, 0.001, (8, 128)),  # many super-cols
    ],
)
def test_tiled_matvec_matches_scipy(m, n, density, block_shape):
    a, bsm, t = _make(m, n, density, block_shape, seed=m + n)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(n)
    y = np.asarray(
        tiled_matvec(t, bsm.pad_x(x), bsm.padded_shape[0], interpret=True)
    )[:m]
    ref = a @ x
    assert np.abs(y - ref).max() <= 1e-5 * (1 + np.abs(ref).max())


def test_tiled_matches_xla_block_path():
    a, bsm, t = _make(600, 600, 0.01, (8, 128), seed=3)
    rng = np.random.default_rng(2)
    x = bsm.pad_x(rng.standard_normal(600))
    y_tiled = np.asarray(
        tiled_matvec(t, x, bsm.padded_shape[0], interpret=True)
    )
    y_xla = np.asarray(bsm.matvec(x))
    np.testing.assert_allclose(y_tiled, y_xla, rtol=1e-5, atol=1e-6)


def test_empty_matrix():
    a = sp.csr_matrix((50, 60))
    bsm = BlockSparseMatrix.from_scipy(a)
    t = pack_tiled(
        np.asarray(bsm.data), np.asarray(bsm.block_rows),
        np.asarray(bsm.block_cols), bsm.num_real_blocks, bsm.padded_shape,
    )
    y = tiled_matvec(t, bsm.pad_x(np.ones(60)), bsm.padded_shape[0],
                     interpret=True)
    assert float(jnp.abs(y).max()) == 0.0


def test_with_tiled_dispatch():
    # BlockSparseMatrix.with_tiled attaches the layout; on non-TPU
    # backends matvec automatically uses interpret mode.
    a = sp.random(200, 300, density=0.02, random_state=0, format="csr")
    bsm = BlockSparseMatrix.from_scipy(a).with_tiled()
    assert bsm.tiled is not None
    x = bsm.pad_x(np.random.default_rng(0).standard_normal(300))
    y_t = np.asarray(bsm.matvec(x))
    y_x = np.asarray(bsm.without_tiled().matvec(x))
    np.testing.assert_allclose(y_t, y_x, rtol=1e-5, atol=1e-6)
    # 2-D input (batched/matmat users) falls back to the XLA path
    xb = jnp.stack([x, x])
    assert bsm.without_tiled().tiled is None


def test_pdlp_solve_with_forced_tiled():
    # End-to-end PDHG with the fused kernel (interpret mode on CPU).
    from ortools_tpu.models.lp import QuadraticProgram
    from ortools_tpu.pdlp import solve
    from ortools_tpu.pdlp.params import PdhgParams

    rng = np.random.default_rng(5)
    m, n = 6, 10
    aa = rng.standard_normal((m, n))
    x_feas = np.clip(rng.standard_normal(n), 0, 1)
    qp = QuadraticProgram(
        objective_vector=rng.standard_normal(n),
        constraint_matrix=sp.csr_matrix(aa),
        constraint_lower=aa @ x_feas - 0.5,
        constraint_upper=np.full(m, np.inf),
        variable_lower=np.zeros(n),
        variable_upper=np.ones(n),
    )
    res = solve(qp, PdhgParams(
        use_tiled_spmv=True, dtype=jnp.float32,
        eps_optimal_absolute=1e-4, eps_optimal_relative=1e-4,
        iteration_limit=20_000,
    ))
    from scipy.optimize import linprog
    ref = linprog(qp.objective_vector, A_ub=-aa, b_ub=-qp.constraint_lower,
                  bounds=[(0, 1)] * n, method="highs")
    assert ref.status == 0
    assert res.primal_objective == pytest.approx(ref.fun, abs=5e-3)


@pytest.mark.parametrize(
    "m,n,density,block_shape",
    [
        (300, 500, 0.02, (8, 128)),
        (900, 1100, 0.002, (32, 128)),
    ],
)
def test_fast_stream_matvec_bf16_accuracy(m, n, density, block_shape):
    """Half-bandwidth bf16 stream: within bf16 rounding of the exact
    product (mixed-precision PDHG working pass)."""
    from ortools_tpu.ops.tiled_spmv import tiled_matvec_fast

    a, bsm, t = _make(m, n, density, block_shape, seed=m + 2 * n)
    t = t.with_hi()
    rng = np.random.default_rng(4)
    x = rng.standard_normal(n)
    y = np.asarray(
        tiled_matvec_fast(t, bsm.pad_x(x), bsm.padded_shape[0],
                          interpret=True)
    )[:m]
    ref = a @ x
    scale = 1.0 + np.abs(ref).max()
    # bf16 has an 8-bit mantissa: ~2^-9 relative per entry, a few ULPs
    # through the row accumulation
    assert np.abs(y - ref).max() <= 3e-2 * scale
    # and it must NOT be exactly the f32 result on a generic instance
    # (guards against silently running the exact kernel)
    y_exact = np.asarray(
        tiled_matvec(t, bsm.pad_x(x), bsm.padded_shape[0], interpret=True)
    )[:m]
    assert np.abs(y - y_exact).max() > 0


def test_matvec_fast_falls_back_without_hi():
    a, bsm, t = _make(300, 500, 0.02, (8, 128), seed=9)
    import dataclasses

    bsm2 = dataclasses.replace(bsm, tiled=t)  # no data_hi attached
    rng = np.random.default_rng(5)
    x = bsm.pad_x(rng.standard_normal(500))
    np.testing.assert_allclose(
        np.asarray(bsm2.matvec_fast(x)), np.asarray(bsm2.matvec(x)),
        rtol=1e-6, atol=1e-7)
