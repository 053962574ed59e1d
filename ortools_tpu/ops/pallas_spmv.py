"""Pallas block-sparse SpMV/SpMM kernels for TPU (experimental).

Streams block data from HBM with double-buffered DMA while x and the y
accumulator stay VMEM-resident (pallas_guide.md "Double Buffering").

Measured on TPU v5e (16384^2 LP, 4096 dense (8,128) blocks, f32):
  - per-block DMA variant:        1488 us/SpMV
  - chunked DMA (32 blocks/DMA):   659 us/SpMV
  - XLA gather+segsum baseline:    678 us/SpMV
All exact vs the XLA path.  At (8,128) granularity both engines are bound
by dynamic gather/scatter orchestration (~160 ns/block), NOT HBM bandwidth
(25 GB/s effective vs ~800 GB/s peak) — the round-2 lever is a layout
change (taller row blocks / row-run-length segments), not more DMA tuning,
so the XLA path remains the default and these kernels are the substrate
for that experiment.

Layout contract (matches BlockSparseMatrix):
  data:        [nb, bm, bn] float32, sorted by (block_row, block_col)
  block_rows:  [nb] int32 (scalar-prefetched)
  block_cols:  [nb] int32 (scalar-prefetched)
  x:           [N]  float32 (N = padded cols), fits VMEM
  y:           [M]  float32 (M = padded rows), fits VMEM

For matmat, x is [N, k] and y [M, k] with k a multiple of 128 preferred.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_N_BUF = 2
_CHUNK = 32  # blocks per DMA (chunked variant)


def _spmv_chunked_kernel(rows_ref, cols_ref, data_hbm, x_ref, y_ref,
                         scratch, sems):
    nb, bm, bn = data_hbm.shape
    n_chunks = nb // _CHUNK

    def get_dma(slot, chunk):
        return pltpu.make_async_copy(
            data_hbm.at[pl.ds(chunk * _CHUNK, _CHUNK)],
            scratch.at[slot], sems.at[slot],
        )

    get_dma(0, 0).start()
    y_ref[...] = jnp.zeros(y_ref.shape, y_ref.dtype)

    def body(ci, _):
        slot = ci % _N_BUF
        nxt = (ci + 1) % _N_BUF

        @pl.when(ci + 1 < n_chunks)
        def _():
            get_dma(nxt, ci + 1).start()

        get_dma(slot, ci).wait()
        base = ci * _CHUNK
        for k in range(_CHUNK):  # static unroll
            r = rows_ref[base + k]
            c = cols_ref[base + k]
            xb = x_ref[c, :]
            prod = jnp.sum(scratch[slot, k] * xb[None, :], axis=1)
            y_ref[r, :] = y_ref[r, :] + prod
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


@functools.partial(jax.jit, static_argnames=("m_padded",))
def pallas_matvec_chunked(data, block_rows, block_cols, x, m_padded: int):
    nb, bm, bn = data.shape
    assert nb % _CHUNK == 0, "pad num_blocks to a multiple of _CHUNK"
    x2 = x.reshape(-1, bn)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_N_BUF, _CHUNK, bm, bn), data.dtype),
            pltpu.SemaphoreType.DMA((_N_BUF,)),
        ],
    )
    y2 = pl.pallas_call(
        _spmv_chunked_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_padded // bm, bm), data.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(block_rows, block_cols, data, x2)
    return y2.reshape(m_padded)


def _spmv_kernel(rows_ref, cols_ref, data_hbm, x_ref, y_ref, scratch, sems):
    # x_ref: [N/bn, bn] blocks; y_ref: [M/bm, bm] blocks (2-D VMEM layouts —
    # 1-D dynamic slices are not Mosaic-friendly)
    nb, bm, bn = data_hbm.shape

    def get_dma(slot, idx):
        return pltpu.make_async_copy(
            data_hbm.at[idx], scratch.at[slot], sems.at[slot]
        )

    get_dma(0, 0).start()
    y_ref[...] = jnp.zeros(y_ref.shape, y_ref.dtype)

    def body(i, _):
        slot = i % _N_BUF
        nxt = (i + 1) % _N_BUF

        @pl.when(i + 1 < nb)
        def _():
            get_dma(nxt, i + 1).start()

        get_dma(slot, i).wait()
        r = rows_ref[i]
        c = cols_ref[i]
        xb = x_ref[c, :]
        prod = jnp.sum(scratch[slot] * xb[None, :], axis=1)
        y_ref[r, :] = y_ref[r, :] + prod
        return 0

    jax.lax.fori_loop(0, nb, body, 0)


@functools.partial(jax.jit, static_argnames=("m_padded",))
def pallas_matvec(data, block_rows, block_cols, x, m_padded: int):
    nb, bm, bn = data.shape
    x2 = x.reshape(-1, bn)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # data stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x resident
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_N_BUF, bm, bn), data.dtype),
            pltpu.SemaphoreType.DMA((_N_BUF,)),
        ],
    )
    y2 = pl.pallas_call(
        _spmv_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_padded // bm, bm), data.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(block_rows, block_cols, data, x2)
    return y2.reshape(m_padded)


def _spmm_kernel(rows_ref, cols_ref, data_hbm, x_ref, y_ref, scratch, sems):
    nb, bm, bn = data_hbm.shape

    def get_dma(slot, idx):
        return pltpu.make_async_copy(
            data_hbm.at[idx], scratch.at[slot], sems.at[slot]
        )

    get_dma(0, 0).start()
    y_ref[...] = jnp.zeros(y_ref.shape, y_ref.dtype)

    def body(i, _):
        slot = i % _N_BUF
        nxt = (i + 1) % _N_BUF

        @pl.when(i + 1 < nb)
        def _():
            get_dma(nxt, i + 1).start()

        get_dma(slot, i).wait()
        r = rows_ref[i]
        c = cols_ref[i]
        xb = x_ref[pl.ds(c * bn, bn), :]
        prod = jnp.dot(scratch[slot], xb,
                       preferred_element_type=y_ref.dtype)
        y_ref[pl.ds(r * bm, bm), :] = y_ref[pl.ds(r * bm, bm), :] + prod
        return 0

    jax.lax.fori_loop(0, nb, body, 0)


@functools.partial(jax.jit, static_argnames=("m_padded",))
def pallas_matmat(data, block_rows, block_cols, x, m_padded: int):
    nb, bm, bn = data.shape
    k = x.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_N_BUF, bm, bn), data.dtype),
            pltpu.SemaphoreType.DMA((_N_BUF,)),
        ],
    )
    return pl.pallas_call(
        _spmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_padded, k), data.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(block_rows, block_cols, data, x)
