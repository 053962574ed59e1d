"""Tiled block-sparse SpMV: one fused Pallas kernel, no per-block scalar ops.

Round-1 diagnosis (from the since-deleted per-block-DMA kernels,
ops/pallas_spmv.py in git history): at (8,128) block granularity
both the XLA gather+segment-sum path and the per-block-DMA Pallas kernels
are bound by ~160ns of *dynamic-index control* per block (gather of the x
block, read-modify-write of the y block), not by HBM bandwidth.

This layout eliminates every per-block dynamic index:

- blocks are grouped into SUPER-TILES of (128*SRH block-rows x 128
  block-cols) and packed into fixed-size chunks of C blocks
  (zero-padded), stored as a 4-D slab [bn, bm, C] per chunk — lanes are
  the chunk axis, so the per-block contraction over j (the bn axis) is a
  cross-"row" vector reduction and NO lane reshape is ever needed;
- the x gather is ONE one-hot matmul per chunk on the MXU:
      Gt[l, b] = (local_col[b] == l)  ->  xbT = x_panelT @ Gt
  and the y scatter is ONE one-hot matmul:
      R[b, q]  = (local_row[b] == q)  ->  y_panelT += P @ R
  with both one-hots built in-register from an iota comparison;
- all exact-stream matmuls run as *exact* bf16 triples: f32 operands are
  split into three bf16 terms (hi/mid/lo cover the 24-bit mantissa), the
  one-hot side is exactly representable, and products accumulate in f32;
- the only dynamic indexing left is one x-panel block and one y-panel
  block per *chunk* (scalar-prefetched super-tile indices drive the
  BlockSpec index maps);
- chunk slabs stream HBM->VMEM through the Pallas grid pipeline.

Round-4 measurement (on-chip ablation, artifacts/KERNEL_r04.json): a
kernel that only STREAMS the slabs takes the same time as the full
kernel — per-grid-STEP overhead (~1-2 us) dominates, not compute and not
bytes.  Hence chunk size C and super-row height SRH are now free
parameters chosen by a cost model: bigger chunks amortize the per-step
overhead; taller super-rows keep chunk padding low when blocks spread
over many rows (at the price of a wider scatter one-hot).

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

_CHUNK = 128  # default/minimum blocks per chunk

# Cost-model constants for the (C, SRH) choice, fitted to the on-chip
# sweep (artifacts/KERNEL_r04.json): per-matvec wall time tracks PADDED
# slab bytes closely (the kernel runs at the device's achievable
# streaming rate), per-step overhead is minor, and tall super-rows tax
# the single-pass fast stream's scatter matmul.
_STEP_OVERHEAD_BYTES = 64 * 1024


def _ceil_to(x: int, k: int) -> int:
    return -(-x // k) * k


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class TiledSpmv:
    """Chunked super-tile layout for the fused SpMV kernel."""

    data_t: jax.Array  # [nchunk, bn, bm, C] slabs (see header)
    rows_lo: jax.Array  # int32 [nchunk, C, 1] block-row within super-tile
    cols_lo: jax.Array  # int32 [nchunk, 1, C] block-col within super-tile
    super_rows: jax.Array  # int32 [nchunk]
    super_cols: jax.Array  # int32 [nchunk]
    bm: int
    bn: int
    nsr: int  # super-row count (y padded to nsr*128*srh*bm)
    nsc: int  # super-col count (x padded to nsc*128 column blocks)
    srh: int  # super-row height in units of 128 block-rows
    num_real_blocks: int
    # Optional bf16 round of the slabs: the HALF-BANDWIDTH fast stream
    # (mixed-precision PDHG majors; exact f32 checks stay on data_t).
    data_hi: Optional[jax.Array] = None  # bf16 [nchunk, bn, bm, C]

    def tree_flatten(self):
        return (
            (self.data_t, self.rows_lo, self.cols_lo, self.super_rows,
             self.super_cols, self.data_hi),
            (self.bm, self.bn, self.nsr, self.nsc, self.srh,
             self.num_real_blocks),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        *head, data_hi = children
        return cls(*head, *aux, data_hi=data_hi)

    def with_hi(self) -> "TiledSpmv":
        """Attach the bf16 fast-stream slabs (rounded from data_t)."""
        if self.data_hi is not None:
            return self
        return dataclasses.replace(
            self, data_hi=self.data_t.astype(jnp.bfloat16))

    @property
    def chunk_size(self) -> int:
        return int(self.data_t.shape[3])

    @property
    def block_shape(self) -> Tuple[int, int]:
        return (self.bm, self.bn)

    @property
    def padding_ratio(self) -> float:
        """Stored blocks / real blocks (chunk zero-padding overhead)."""
        total = int(self.data_t.shape[0]) * self.chunk_size
        return total / max(1, self.num_real_blocks)


def _choose_layout(br: np.ndarray, bc: np.ndarray, row_blocks: int,
                   nsc: int, block_bytes: int) -> Tuple[int, int]:
    """Pick (chunk C, super-row height SRH) minimizing modeled cost:
    EXACT padded slab bytes (from the real block distribution) + per-step
    overhead, with a penalty for the wider scatter one-hot of tall
    super-rows."""
    best = None
    base_rows = max(1, _ceil_to(row_blocks, 128) // 128)
    nb = len(br)
    for srh in (1, 2, 4, 8):
        if srh > base_rows and srh != 1:
            break
        # exact per-(sr, sc)-group block counts for this super-row height
        keys = (br // (128 * srh)) * nsc + bc // 128
        _, counts = np.unique(keys, return_counts=True)
        for c in (128, 256, 512, 1024):
            nchunk = int(np.ceil(counts / c).sum()) if nb else 1
            bytes_total = nchunk * c * block_bytes
            # Round-5 re-fit against the TRUE in-dispatch ceiling
            # (artifacts/ROOFLINE_r05.json, 684 GB/s): once per-dispatch
            # tunnel tax is subtracted, large chunks with tall
            # super-rows WIN — on the bench matrix (1024, 4) runs the
            # fast stream 24% faster than (128, 1) at equal padding, so
            # the old scatter penalty (2048 B/lane) was an artifact of
            # overhead-polluted timings; a residual 256 B/lane keeps
            # degenerate tall-narrow choices out.
            scatter_pen = nchunk * (srh - 1) * c * 256
            cost = bytes_total + nchunk * _STEP_OVERHEAD_BYTES + scatter_pen
            if best is None or cost < best[0]:
                best = (cost, c, srh)
    return best[1], best[2]


def pack_tiled(
    data: np.ndarray,
    block_rows: np.ndarray,
    block_cols: np.ndarray,
    num_real_blocks: int,
    padded_shape: Tuple[int, int],
    chunk_size: Optional[int] = None,
    super_row_height: Optional[int] = None,
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
    mm, nn = padded_shape
    row_blocks = mm // bm
    nsc = max(1, _ceil_to(nn // bn, 128) // 128)
    if chunk_size is None or super_row_height is None:
        c_auto, srh_auto = _choose_layout(
            br, bc, row_blocks, nsc,
            bm * bn * np.dtype(np.float32).itemsize)
        c_sz = chunk_size or c_auto
        srh = super_row_height or srh_auto
    else:
        c_sz, srh = chunk_size, super_row_height
    assert c_sz % 128 == 0, f"chunk_size must be a multiple of 128: {c_sz}"
    span = 128 * srh  # block-rows per super-row
    nsr = max(1, _ceil_to(row_blocks, span) // span)

    sr = br // span
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
        out_rows[k, :cnt, 0] = (br[lo:hi] - csr * span).astype(np.int32)
        out_cols[k, 0, :cnt] = (bc[lo:hi] - csc * 128).astype(np.int32)
        out_sr[k] = csr
        out_sc[k] = csc
    # 4-D slab [bn, bm, C]: same bytes as [C, bm, bn] transposed, stored
    # with the chunk axis minor so the j-contraction crosses "rows"
    slabs = np.ascontiguousarray(out_data.transpose(0, 3, 2, 1))
    return TiledSpmv(
        data_t=jnp.asarray(slabs, dtype=dtype),
        rows_lo=jnp.asarray(out_rows),
        cols_lo=jnp.asarray(out_cols),
        super_rows=jnp.asarray(out_sr),
        super_cols=jnp.asarray(out_sc),
        bm=bm,
        bn=bn,
        nsr=nsr,
        nsc=nsc,
        srh=srh,
        num_real_blocks=nb,
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


def _spmv_tiled_kernel(sr_ref, sc_ref, data_ref, rows_ref, cols_ref,
                       xh_ref, xm_ref, xl_ref, y_ref):
    c = pl.program_id(0)
    cc = data_ref.shape[3]
    bm = y_ref.shape[1]
    span = y_ref.shape[2]
    f32 = y_ref.dtype

    # Zero the output panel on its first visit (chunks are sorted by
    # super-row, so revisits are consecutive and the block stays in VMEM).
    prev = jnp.maximum(c - 1, 0)
    fresh = jnp.logical_or(c == 0, sr_ref[c] != sr_ref[prev])

    @pl.when(fresh)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    # gather: xbT[j, b] = x_panelT[j, local_col[b]] via a one-hot matmul.
    # Gt is exactly representable in bf16; x comes pre-split into three
    # bf16 terms, so the three MXU passes reconstruct f32 exactly.
    sub = jax.lax.broadcasted_iota(jnp.int32, (128, cc), 0)
    gt = (cols_ref[0] == sub).astype(jnp.bfloat16)  # [128, C]
    xbt = _dot3(xh_ref[...], xm_ref[...], xl_ref[...], gt, f32)  # [bn, C]

    # per-block product; contraction over j is a cross-row reduction
    z3 = data_ref[0] * xbt[:, None, :]  # [bn, bm, C]
    p2 = jnp.sum(z3, axis=0)  # [bm, C]

    # scatter: y_panelT[i, q] += sum_b p2[i, b] * [local_row[b] == q]
    lane = jax.lax.broadcasted_iota(jnp.int32, (cc, span), 1)
    r = (rows_ref[0] == lane).astype(jnp.bfloat16)  # [C, span]
    ph, pm, plo = _split3(p2, f32)
    y_ref[0] += _dot3(ph, pm, plo, r, f32)  # [bm, span]


@functools.partial(
    jax.jit,
    static_argnames=("nsr", "nsc", "srh", "bm", "bn", "interpret"),
)
def _tiled_matvec_call(data_t, rows_lo, cols_lo, super_rows, super_cols,
                       xt, nsr: int, nsc: int, srh: int, bm: int, bn: int,
                       interpret: bool):
    nchunk = data_t.shape[0]
    c_sz = data_t.shape[3]
    span = 128 * srh
    xh, xm, xl = _split3(xt, data_t.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # super_rows, super_cols
        grid=(nchunk,),
        in_specs=[
            pl.BlockSpec((1, bn, bm, c_sz), lambda c, sr, sc: (c, 0, 0, 0)),
            pl.BlockSpec((1, c_sz, 1), lambda c, sr, sc: (c, 0, 0)),
            pl.BlockSpec((1, 1, c_sz), lambda c, sr, sc: (c, 0, 0)),
            pl.BlockSpec((bn, 128), lambda c, sr, sc: (0, sc[c])),
            pl.BlockSpec((bn, 128), lambda c, sr, sc: (0, sc[c])),
            pl.BlockSpec((bn, 128), lambda c, sr, sc: (0, sc[c])),
        ],
        out_specs=pl.BlockSpec(
            (1, bm, span), lambda c, sr, sc: (sr[c], 0, 0)
        ),
    )
    y3t = pl.pallas_call(
        _spmv_tiled_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nsr, bm, span), data_t.dtype),
        interpret=interpret,
    )(super_rows, super_cols, data_t, rows_lo, cols_lo, xh, xm, xl)
    return y3t


def _spmv_tiled_fast_kernel(sr_ref, sc_ref, data_ref, rows_ref, cols_ref,
                            xb_ref, y_ref):
    """Half-bandwidth fast stream: bf16 slabs, single bf16 one-hot
    gather/scatter matmuls (vs the exact kernel's 3-split triples), f32
    accumulation.  Matrix entries carry bf16 rounding (~2^-9 relative) —
    the mixed-precision PDHG major loop's working stream; every
    termination/restart decision is recomputed on the exact f32 kernel."""
    c = pl.program_id(0)
    cc = data_ref.shape[3]
    bm = y_ref.shape[1]
    span = y_ref.shape[2]
    f32 = y_ref.dtype

    prev = jnp.maximum(c - 1, 0)
    fresh = jnp.logical_or(c == 0, sr_ref[c] != sr_ref[prev])

    @pl.when(fresh)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    sub = jax.lax.broadcasted_iota(jnp.int32, (128, cc), 0)
    gt = (cols_ref[0] == sub).astype(jnp.bfloat16)  # [128, C]
    xbt = jnp.dot(xb_ref[...], gt, preferred_element_type=f32)  # [bn, C]

    z3 = data_ref[0].astype(f32) * xbt[:, None, :]  # [bn, bm, C]
    p2 = jnp.sum(z3, axis=0)  # [bm, C]

    lane = jax.lax.broadcasted_iota(jnp.int32, (cc, span), 1)
    r = (rows_ref[0] == lane).astype(jnp.bfloat16)  # [C, span]
    y_ref[0] += jnp.dot(p2.astype(jnp.bfloat16), r,
                        preferred_element_type=f32)  # [bm, span]


@functools.partial(
    jax.jit,
    static_argnames=("nsr", "nsc", "srh", "bm", "bn", "interpret"),
)
def _tiled_matvec_fast_call(data_hi, rows_lo, cols_lo, super_rows,
                            super_cols, xt, nsr: int, nsc: int, srh: int,
                            bm: int, bn: int, interpret: bool):
    nchunk = data_hi.shape[0]
    c_sz = data_hi.shape[3]
    span = 128 * srh
    xb = xt.astype(jnp.bfloat16)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchunk,),
        in_specs=[
            pl.BlockSpec((1, bn, bm, c_sz), lambda c, sr, sc: (c, 0, 0, 0)),
            pl.BlockSpec((1, c_sz, 1), lambda c, sr, sc: (c, 0, 0)),
            pl.BlockSpec((1, 1, c_sz), lambda c, sr, sc: (c, 0, 0)),
            pl.BlockSpec((bn, 128), lambda c, sr, sc: (0, sc[c])),
        ],
        out_specs=pl.BlockSpec(
            (1, bm, span), lambda c, sr, sc: (sr[c], 0, 0)
        ),
    )
    y3t = pl.pallas_call(
        _spmv_tiled_fast_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nsr, bm, span), xt.dtype),
        interpret=interpret,
    )(super_rows, super_cols, data_hi, rows_lo, cols_lo, xb)
    return y3t


def tiled_matvec_fast(t: TiledSpmv, x: jax.Array, m_padded: int,
                      interpret: bool = False) -> jax.Array:
    """y ~= A @ x through the bf16 fast stream (requires t.data_hi)."""
    assert t.data_hi is not None, "call TiledSpmv.with_hi() first"
    bm, bn = t.bm, t.bn
    x2 = x.reshape(-1, bn)
    ncb = x2.shape[0]
    xt = x2.T
    if ncb < t.nsc * 128:
        xt = jnp.pad(xt, ((0, 0), (0, t.nsc * 128 - ncb)))
    y3t = _tiled_matvec_fast_call(
        t.data_hi, t.rows_lo, t.cols_lo, t.super_rows, t.super_cols, xt,
        t.nsr, t.nsc, t.srh, bm, bn, interpret,
    )
    y = jnp.transpose(y3t, (0, 2, 1)).reshape(t.nsr * 128 * t.srh * bm)
    return y[:m_padded]


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
        t.nsr, t.nsc, t.srh, bm, bn, interpret,
    )
    # [nsr, bm, span] -> rows (sr*span + q)*bm + i
    y = jnp.transpose(y3t, (0, 2, 1)).reshape(t.nsr * 128 * t.srh * bm)
    return y[:m_padded]
