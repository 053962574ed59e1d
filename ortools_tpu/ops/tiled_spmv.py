"""Tiled block-sparse SpMV: one fused Pallas kernel, no per-block scalar ops.

Round-1 diagnosis (ops/pallas_spmv.py header): at (8,128) block granularity
both the XLA gather+segment-sum path and the per-block-DMA Pallas kernels
are bound by ~160ns of *dynamic-index control* per block (gather of the x
block, read-modify-write of the y block), not by HBM bandwidth — 25-55 GB/s
effective vs ~800 GB/s peak.

This layout eliminates every per-block dynamic index:

- blocks are grouped into SUPER-TILES of (128 block-rows x 128 block-cols)
  and packed into fixed-size chunks of C blocks (zero-padded), stored as a
  [bn, bm*C] lane-major slab per chunk with block data TRANSPOSED:
  the per-block contraction over j (the bn axis) is a cross-SUBLANE
  reduction (a few vector adds) instead of a cross-lane reduction;
- the x gather is ONE one-hot matmul per chunk on the MXU and the y
  scatter is ONE one-hot matmul, with both one-hots built in-register
  from an iota comparison;
- all matmuls run as *exact* bf16 triples: f32 operands are split into
  three bf16 terms (hi/mid/lo cover the 24-bit mantissa), the one-hot side
  is exactly representable, and products accumulate in f32 — full f32
  accuracy at native-bf16 MXU rate (x is split once per matvec outside the
  kernel, the per-chunk product once per chunk);
- the only dynamic indexing left is one x-panel block and one y-panel
  block per *chunk* (scalar-prefetched super-tile indices drive the
  BlockSpec index maps) — 2 coarse ops per C blocks instead of 2C;
- chunk slabs stream HBM->VMEM through the Pallas grid pipeline
  (double-buffered automatically).

Two lane orderings cover all block shapes (Mosaic only supports 1-D->2-D
reshapes whose last dim is a multiple of 128):

- ``block`` order (wide blocks, C == 128): lane l = i*C + b; the summed
  products reshape to [bm, C] directly.
- ``row`` order (tall blocks, bm % 128 == 0): lane l = b*bm + i; the sum
  reshapes to [C, bm] and the scatter contracts over the leading axis.
  Used for the block-transposed Aᵀ layout (BlockSparseMatrix
  .block_transpose), whose blocks are (128, 8).

Capability parity: the TPU-native replacement for the reference Sharder's
TransposedMatrixVectorProduct kernel set (ortools/pdlp/sharder.h:237,
:250-307) — the two SpMV passes that dominate each PDHG iteration
(SURVEY §3.2).

Layout is produced on the host once per matrix (pack_tiled) and reused for
every matvec; A and the separately-stored A^T each get their own layout.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x: int, k: int) -> int:
    return -(-x // k) * k


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class TiledSpmv:
    """Chunked super-tile layout for the fused SpMV kernel."""

    data_t: jax.Array  # [nchunk, bn, bm * C] transposed slabs (see header)
    # 'block' order: rows_lo [nchunk, C, 1], cols_lo [nchunk, 1, C]
    # 'row' order:   rows_lo [nchunk, C, 1], cols_lo [nchunk, 1, bm*C]
    #                (cols expanded to lane resolution)
    rows_lo: jax.Array
    cols_lo: jax.Array
    super_rows: jax.Array  # int32 [nchunk]
    super_cols: jax.Array  # int32 [nchunk]
    bm: int
    bn: int
    nsr: int  # super-row count (y padded to nsr*128*bm)
    nsc: int  # super-col count (x padded to nsc*128*bn... cols nsc*128)
    num_real_blocks: int
    lane_order: str = "block"  # 'block' (l=i*C+b) or 'row' (l=b*bm+i)

    def tree_flatten(self):
        return (
            (self.data_t, self.rows_lo, self.cols_lo, self.super_rows,
             self.super_cols),
            (self.bm, self.bn, self.nsr, self.nsc, self.num_real_blocks,
             self.lane_order),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def chunk_size(self) -> int:
        return int(self.data_t.shape[2]) // self.bm

    @property
    def block_shape(self) -> Tuple[int, int]:
        return (self.bm, self.bn)

    @property
    def padding_ratio(self) -> float:
        """Stored blocks / real blocks (chunk zero-padding overhead)."""
        total = int(self.data_t.shape[0]) * self.chunk_size
        return total / max(1, self.num_real_blocks)


def default_chunk_size(bm: int) -> int:
    """'block' order needs C to be a multiple of 128 (the summed lanes
    reshape to [bm, C]); 'row' order (bm % 128 == 0) sizes C so a slab's
    lane width stays a multiple of 128 and ~4K lanes."""
    if bm % 128 == 0:
        return max(1, 4096 // bm)
    return 128


def pack_tiled(
    data: np.ndarray,
    block_rows: np.ndarray,
    block_cols: np.ndarray,
    num_real_blocks: int,
    padded_shape: Tuple[int, int],
    chunk_size: Optional[int] = None,
    dtype=jnp.float32,
) -> TiledSpmv:
    """Pack block-COO arrays (as in BlockSparseMatrix) into the tiled layout.

    Zero-padding blocks inside a chunk point at local (0, 0) with all-zero
    data — they contribute nothing through the one-hot matmuls.
    """
    nb = num_real_blocks
    data = np.asarray(data)[:nb]
    br = np.asarray(block_rows)[:nb].astype(np.int64)
    bc = np.asarray(block_cols)[:nb].astype(np.int64)
    bm, bn = int(data.shape[1]), int(data.shape[2])
    c_sz = chunk_size or default_chunk_size(bm)
    lane_order = "row" if bm % 128 == 0 else "block"
    if lane_order == "row":
        # same Mosaic reshape constraint, lane dim = bm here
        assert bm == 128, f"'row' lane order needs bm == 128, got {bm}"
    if lane_order == "block":
        # Mosaic's 1-D->2-D vector reshape requires the lane dim to be
        # exactly 128, so the summed [bm*C] lanes can only reshape to
        # [bm, 128].
        assert c_sz == 128, (
            f"'block' lane order needs chunk_size == 128, got {c_sz}")
    mm, nn = padded_shape
    nsr = max(1, _ceil_to(mm // bm, 128) // 128)
    nsc = max(1, _ceil_to(nn // bn, 128) // 128)

    sr = br // 128
    sc = bc // 128
    order = np.lexsort((bc, br, sc, sr))
    sr, sc, br, bc = sr[order], sc[order], br[order], bc[order]
    data = data[order]

    # group boundaries on (sr, sc)
    if nb:
        key = sr * nsc + sc
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        ends = np.r_[starts[1:], nb]
    else:
        starts = ends = np.zeros(0, dtype=np.int64)

    chunks = []  # (sr, sc, lo, hi) slices of the sorted arrays
    for s, e in zip(starts, ends):
        for lo in range(s, e, c_sz):
            chunks.append((sr[lo], sc[lo], lo, min(lo + c_sz, e)))
    nchunk = max(1, len(chunks))

    out_data = np.zeros((nchunk, c_sz, bm, bn), dtype=np.float64)
    out_rows = np.zeros((nchunk, c_sz, 1), dtype=np.int32)
    out_cols = np.zeros((nchunk, 1, c_sz), dtype=np.int32)
    out_sr = np.zeros(nchunk, dtype=np.int32)
    out_sc = np.zeros(nchunk, dtype=np.int32)
    for k, (csr, csc, lo, hi) in enumerate(chunks):
        cnt = hi - lo
        out_data[k, :cnt] = data[lo:hi]
        out_rows[k, :cnt, 0] = (br[lo:hi] - csr * 128).astype(np.int32)
        out_cols[k, 0, :cnt] = (bc[lo:hi] - csc * 128).astype(np.int32)
        out_sr[k] = csr
        out_sc[k] = csc
    if lane_order == "block":
        # slab lane l = i*C + b
        slabs = np.ascontiguousarray(out_data.transpose(0, 3, 2, 1)).reshape(
            nchunk, bn, bm * c_sz
        )
        cols_arr = out_cols
    else:
        # slab lane l = b*bm + i; cols expanded to lane resolution so the
        # gather one-hot can be built without an in-kernel // or repeat
        slabs = np.ascontiguousarray(out_data.transpose(0, 3, 1, 2)).reshape(
            nchunk, bn, bm * c_sz
        )
        cols_arr = np.repeat(out_cols, bm, axis=2)  # [nchunk, 1, bm*C]
    return TiledSpmv(
        data_t=jnp.asarray(slabs, dtype=dtype),
        rows_lo=jnp.asarray(out_rows),
        cols_lo=jnp.asarray(cols_arr),
        super_rows=jnp.asarray(out_sr),
        super_cols=jnp.asarray(out_sc),
        bm=bm,
        bn=bn,
        nsr=nsr,
        nsc=nsc,
        num_real_blocks=nb,
        lane_order=lane_order,
    )


def _split3(v, dtype):
    """Split an f32 array into three bf16 terms covering the mantissa."""
    hi = v.astype(jnp.bfloat16)
    r = v - hi.astype(dtype)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(dtype)).astype(jnp.bfloat16)
    return hi, mid, lo


def _dot3(ah, am, al, b, f32):
    return (
        jnp.dot(ah, b, preferred_element_type=f32)
        + jnp.dot(am, b, preferred_element_type=f32)
        + jnp.dot(al, b, preferred_element_type=f32)
    )


def _spmv_tiled_kernel(lane_order, sr_ref, sc_ref, data_ref, rows_ref,
                       cols_ref, xh_ref, xm_ref, xl_ref, y_ref):
    c = pl.program_id(0)
    bn = data_ref.shape[1]
    width = data_ref.shape[2]
    bm = y_ref.shape[1]
    cc = width // bm
    f32 = y_ref.dtype

    # Zero the output panel on its first visit (chunks are sorted by
    # super-row, so revisits are consecutive and the block stays in VMEM).
    prev = jnp.maximum(c - 1, 0)
    fresh = jnp.logical_or(c == 0, sr_ref[c] != sr_ref[prev])

    @pl.when(fresh)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    if lane_order == "block":
        # gather: xbT[j, b] = x_panelT[j, local_col[b]] via a one-hot
        # matmul, then broadcast to lanes l = i*C + b by tiling.
        sub = jax.lax.broadcasted_iota(jnp.int32, (128, cc), 0)
        gt = (cols_ref[0] == sub).astype(jnp.bfloat16)  # [128, C]
        xbt = _dot3(xh_ref[...], xm_ref[...], xl_ref[...], gt, f32)
        z = data_ref[0] * jnp.tile(xbt, (1, bm))  # [bn, bm*C]
        pvec = jnp.sum(z, axis=0)  # [bm*C], lane i*C + b
        p2 = pvec.reshape(bm, cc)  # [bm, C]  (C % 128 == 0)
        # scatter: y_panelT[i, q] += sum_b p2[i, b] * [local_row[b] == q]
        lane = jax.lax.broadcasted_iota(jnp.int32, (cc, 128), 1)
        r = (rows_ref[0] == lane).astype(jnp.bfloat16)  # [C, 128]
        ph, pm, plo = _split3(p2, f32)
        y_ref[0] += _dot3(ph, pm, plo, r, f32)  # [bm, 128]
    else:
        # 'row' order: lane l = b*bm + i; cols_ref is lane-expanded
        # [1, bm*C].  One gather matmul produces the x value per LANE.
        sub = jax.lax.broadcasted_iota(jnp.int32, (128, width), 0)
        gt = (cols_ref[0] == sub).astype(jnp.bfloat16)  # [128, bm*C]
        xbt = _dot3(xh_ref[...], xm_ref[...], xl_ref[...], gt, f32)
        z = data_ref[0] * xbt  # [bn, bm*C]
        pvec = jnp.sum(z, axis=0)  # [bm*C], lane b*bm + i
        p2t = pvec.reshape(cc, bm)  # [C, bm]  (bm % 128 == 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (cc, 128), 1)
        r = (rows_ref[0] == lane).astype(jnp.bfloat16)  # [C, 128]
        ph, pm, plo = _split3(p2t, f32)
        # contract over the chunk axis: y[i, q] += sum_b p2t[b, i] r[b, q]
        dn = (((0,), (0,)), ((), ()))
        y_ref[0] += (
            jax.lax.dot_general(ph, r, dn, preferred_element_type=f32)
            + jax.lax.dot_general(pm, r, dn, preferred_element_type=f32)
            + jax.lax.dot_general(plo, r, dn, preferred_element_type=f32)
        )  # [bm, 128]


@functools.partial(
    jax.jit,
    static_argnames=("nsr", "nsc", "bm", "bn", "lane_order", "interpret"),
)
def _tiled_matvec_call(data_t, rows_lo, cols_lo, super_rows, super_cols,
                       xt, nsr: int, nsc: int, bm: int, bn: int,
                       lane_order: str, interpret: bool):
    nchunk = data_t.shape[0]
    width = data_t.shape[2]
    c_sz = width // bm
    cols_width = width if lane_order == "row" else c_sz
    xh, xm, xl = _split3(xt, data_t.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # super_rows, super_cols
        grid=(nchunk,),
        in_specs=[
            pl.BlockSpec((1, bn, width), lambda c, sr, sc: (c, 0, 0)),
            pl.BlockSpec((1, c_sz, 1), lambda c, sr, sc: (c, 0, 0)),
            pl.BlockSpec((1, 1, cols_width), lambda c, sr, sc: (c, 0, 0)),
            pl.BlockSpec((bn, 128), lambda c, sr, sc: (0, sc[c])),
            pl.BlockSpec((bn, 128), lambda c, sr, sc: (0, sc[c])),
            pl.BlockSpec((bn, 128), lambda c, sr, sc: (0, sc[c])),
        ],
        out_specs=pl.BlockSpec(
            (1, bm, 128), lambda c, sr, sc: (sr[c], 0, 0)
        ),
    )
    y3t = pl.pallas_call(
        functools.partial(_spmv_tiled_kernel, lane_order),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nsr, bm, 128), data_t.dtype),
        interpret=interpret,
    )(super_rows, super_cols, data_t, rows_lo, cols_lo, xh, xm, xl)
    return y3t


def tiled_matvec(t: TiledSpmv, x: jax.Array, m_padded: int,
                 interpret: bool = False) -> jax.Array:
    """y = A @ x; x is the padded length-N vector (N = padded cols of the
    BlockSparseMatrix), the result is the padded length-M vector."""
    bm, bn = t.bm, t.bn
    x2 = x.reshape(-1, bn)
    ncb = x2.shape[0]
    xt = x2.T  # [bn, ncb]
    if ncb < t.nsc * 128:
        xt = jnp.pad(xt, ((0, 0), (0, t.nsc * 128 - ncb)))
    y3t = _tiled_matvec_call(
        t.data_t, t.rows_lo, t.cols_lo, t.super_rows, t.super_cols, xt,
        t.nsr, t.nsc, bm, bn, t.lane_order, interpret,
    )
    # [nsr, bm, 128] -> rows (sr*128 + q)*bm + i
    y = jnp.transpose(y3t, (0, 2, 1)).reshape(t.nsr * 128 * bm)
    return y[:m_padded]
