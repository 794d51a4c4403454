"""nnz_split — nnz-direction SpMM with segment combine.

Reference counterpart: the bitmap/segment reduction-template family
(thread_bit_map_reduce_to_two_register_token, warp_bit_map_reduce_token,
warp_segment_reduce_token, tblock_bit_map_reduce_token): blocks own equal nnz
ranges regardless of row boundaries — perfect load balance for arbitrarily
skewed matrices (a single monster row splits across blocks) — and rows that
straddle blocks are resolved by combining per-(block, row) partial sums.
The GPU uses atomicAdd at segment boundaries; TPU has no atomics, so each
block writes its per-segment partials to private slots and one scatter-add
combines them (the reference's correctness-by-construction analysis,
struct.hpp:159-167, becomes a disjoint-slot guarantee).

Two in-kernel paths:
  segment_spmm       stripe kernel with ``lrow`` = block-local segment id
                     (scalar per-nz loop; parity path)
  segment_span_spmm  the one-hot span machinery: within each nnz block,
                     column-sorted chunks with dynamic window starts feed
                     the transposed one-hot MXU contraction — the fast path
                     the tuner uses
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import numpy as np

from tpusparse.format import SegmentFormat
from tpusparse.io.mtx import CooMatrix
from tpusparse.kernels.common import kernel_backend_interpret, pad_dense_rows, round_up
from tpusparse.kernels.stripe_gather import _stripe_call


def segment_spmm(
    fmt: SegmentFormat,
    x: jnp.ndarray,
    *,
    ktile: int | None = None,
    unroll: int = 8,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Y[M, K] = A . X[N, K] with A in SegmentFormat."""
    if interpret is None:
        interpret = kernel_backend_interpret()
    m, n_cols = fmt.shape
    k = x.shape[1]
    assert x.shape[0] == n_cols
    if ktile is None:
        ktile = k if k <= 128 else 128
    if k % ktile:
        x = jnp.pad(x, ((0, 0), (0, ktile - k % ktile)))
    x = pad_dense_rows(x, -(-x.shape[0] // 8) * 8)
    u = unroll if fmt.block_nnz % unroll == 0 else 1
    slots = _stripe_call(
        fmt.cols, fmt.lrow, fmt.vals, x,
        n_stripes=fmt.n_blocks,
        stripe_nnz=fmt.block_nnz,
        rb=fmt.max_segments,
        ktile=ktile,
        unroll=u,
        interpret=interpret,
    )  # [P * RB, K] per-segment partials
    row = jnp.asarray(fmt.row_of_slot)
    row = jnp.where(row < 0, m, row)  # dropped by out-of-bounds scatter
    y = jnp.zeros((m, slots.shape[1]), slots.dtype)
    y = y.at[row].add(slots, mode="drop")
    return y[:, :k]


@dataclasses.dataclass
class SegmentSpanFormat:
    """Equal-nnz blocks, span-chunked within each block.

    Arrays (P blocks, NC span chunks per block, G nz per chunk):
      c0    [P, 1, NC] int32  window start column (multiple of 8)
      cols  [P, NC, G] int32  column offset within the window (< CT)
      lrow  [P, NC, G] int32  block-local segment id (< RB)
      vals  [P, NC, G] f32
      row_of_slot [P * RB] int32  global row of each (block, segment) slot
    """

    c0: Any
    cols: Any
    lrow: Any
    vals: Any
    row_of_slot: Any
    n_blocks: int
    n_chunks: int
    chunk_g: int
    rb: int  # max segments per block, rounded to the sublane
    ct: int
    shape: tuple[int, int]
    nnz_real: int

    @property
    def padding_rate(self) -> float:
        return self.n_blocks * self.n_chunks * self.chunk_g / max(self.nnz_real, 1)

    @property
    def memory_bytes(self) -> int:
        import numpy as _np

        return sum(_np.asarray(a).nbytes
                   for a in (self.c0, self.cols, self.lrow, self.vals,
                             self.row_of_slot))


def pack_segment_span(
    mat: CooMatrix,
    *,
    block_nnz: int = 4096,
    ct: int = 512,
    g: int = 256,
) -> SegmentSpanFormat:
    """Cut row-major nz into equal ``block_nnz`` blocks (rows may straddle),
    then span-chunk each block by column."""
    m, n = mat.shape
    rows = np.asarray(mat.rows, dtype=np.int64)
    cols = np.asarray(mat.cols, dtype=np.int64)
    vals = np.asarray(mat.vals, dtype=np.float32)
    nnz = rows.size
    b = max(block_nnz, 1)
    p_count = max(-(-max(nnz, 1) // b), 1)

    blk = np.minimum(np.arange(nnz) // b, p_count - 1) if nnz else np.empty(0, np.int64)
    # segment id = row RANK within the block (not row offset: a block
    # spanning a long empty-row gap would otherwise make rb — and the
    # P*rb*K slot output — arbitrarily large, and skewed matrices, the
    # case this family exists for, commonly have such gaps)
    max_seg = 1
    seg = np.zeros(nnz, dtype=np.int64)
    rows_of_block: list[np.ndarray] = [np.empty(0, np.int64)] * p_count
    for p in range(p_count):
        lo, hi = p * b, min((p + 1) * b, nnz)
        if lo >= hi:
            continue
        u, inv = np.unique(rows[lo:hi], return_inverse=True)
        seg[lo:hi] = inv
        rows_of_block[p] = u
        max_seg = max(max_seg, u.size)
    rb = round_up(max_seg, 8)

    # span-chunk within (block) by column
    order = np.lexsort((cols, blk))
    cols_s = cols[order]
    seg_s = seg[order]
    vals_s = vals[order]
    starts = np.searchsorted(blk[order], np.arange(p_count + 1))
    span_budget = ct - 8

    from tpusparse import native

    packed = None
    if native.available():
        packed = native.span_pack(cols_s, seg_s, vals_s, starts, g, span_budget)
    if packed is None:
        from tpusparse.kernels.span_gather import span_chunk_numpy

        c0_2d, cols_f, lrow_f, vals_f, _, _nc = span_chunk_numpy(
            cols_s, seg_s, vals_s, starts, g, span_budget
        )
    else:
        c0_2d, cols_f, lrow_f, vals_f, _nc = packed
    nc = c0_2d.shape[1]

    row_of_slot = np.full(p_count * rb, -1, dtype=np.int32)
    for p in range(p_count):
        u = rows_of_block[p]
        row_of_slot[p * rb: p * rb + u.size] = u.astype(np.int32)

    return SegmentSpanFormat(
        c0=jnp.asarray(c0_2d[:, None, :]),
        cols=jnp.asarray(cols_f),
        lrow=jnp.asarray(lrow_f),
        vals=jnp.asarray(vals_f),
        row_of_slot=jnp.asarray(row_of_slot),
        n_blocks=p_count,
        n_chunks=nc,
        chunk_g=g,
        rb=rb,
        ct=ct,
        shape=(m, n),
        nnz_real=int(np.count_nonzero(vals_f)),
    )


def segment_span_spmm(
    fmt: SegmentSpanFormat,
    x: jnp.ndarray,
    *,
    ktile: int | None = None,
    precision: str = "fp32x2",
    unroll: int = 4,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Y[M, K] = A . X[N, K] with A in SegmentSpanFormat (one-hot MXU path)."""
    from tpusparse.kernels.span_gather import _span_call

    if interpret is None:
        interpret = kernel_backend_interpret()
    m, n_cols = fmt.shape
    k = x.shape[1]
    assert x.shape[0] == n_cols
    if ktile is None:
        ktile = k if k <= 128 else 128
    if k % ktile:
        x = jnp.pad(x, ((0, 0), (0, ktile - k % ktile)))
    x = pad_dense_rows(x.astype(jnp.float32), round_up(n_cols, 8) + fmt.ct)
    slots = _span_call(
        fmt.c0, fmt.cols, fmt.lrow, fmt.vals, x,
        n_programs=fmt.n_blocks, nc=fmt.n_chunks, g=fmt.chunk_g,
        rb=fmt.rb, ct=fmt.ct, ktile=ktile, mode=precision,
        unroll=unroll, interpret=interpret,
    )
    row = jnp.asarray(fmt.row_of_slot)
    row = jnp.where(row < 0, m, row)
    y = jnp.zeros((m, slots.shape[1]), slots.dtype)
    y = y.at[row].add(slots, mode="drop")
    return y[:, :k]
