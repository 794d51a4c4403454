"""nnz_split — nnz-direction SpMM with segment combine.

Reference counterpart: the bitmap/segment reduction-template family
(thread_bit_map_reduce_to_two_register_token, warp_bit_map_reduce_token,
warp_segment_reduce_token, tblock_bit_map_reduce_token): blocks own equal nnz
ranges regardless of row boundaries — perfect load balance for arbitrarily
skewed matrices — and rows that straddle blocks are resolved by combining
per-(block, row) partial sums.  The GPU uses atomicAdd at segment
boundaries; TPU has no atomics, so each block writes its per-segment
partials to private slots and one scatter-add combines them (the reference's
correctness-by-construction analysis, struct.hpp:159-167, becomes a
disjoint-slot guarantee).

The in-kernel loop is the stripe_gather kernel with ``lrow`` reinterpreted
as the block-local segment id.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpusparse.format import SegmentFormat
from tpusparse.kernels.common import kernel_backend_interpret, pad_dense_rows
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
