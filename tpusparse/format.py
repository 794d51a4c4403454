"""Packed on-device sparse formats.

The reference's "format" is the set of ``needed_by_format`` metadata arrays
written to ``data_source/<id>/`` and read back by the generated program as
kernel parameters (metadata_set.cc:517-571, code_generator.cc:285-492).

TPU-native: a packed format is a small pytree of device-ready arrays with
*static* shapes (the TPU analogue of the reference's padding-for-fixed-work),
produced from a blocked MetaDataSet by a packer.  Every format also carries
``slot_of_origrow`` — the output-recovery gather that undoes sorting /
division / padding in one ``jnp.take`` (the reference recovers through
``original_nz_row_indices`` inside the kernel, code_generator.cc:1392-1525;
on TPU a single dense gather outside the kernel is cheaper than per-nz
recovery arithmetic).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

from tpusparse.levels import Level
from tpusparse.meta.set import MetaDataSet
from tpusparse.meta.item import narrow_dtype


@dataclasses.dataclass
class StripeFormat:
    """Row-aligned stripe format for the gather-style SpMM kernels.

    One stripe = one Pallas grid program: a contiguous run of rows with a
    *uniform* nnz budget C (padded; reference analogue: thread-total BMT
    blocking + padding).  Row-aligned means no row straddles stripes, so each
    program writes its rows exactly once (the reference's "total reduce to
    one register" direct-store pattern, total_BMT_result_...token.cc).

    Arrays (P = stripes, C = uniform nnz per stripe, RB = max rows/stripe):
      cols  [P, 1, C] int32   global column index of each nz (3D so the SMEM
      lrow  [P, 1, C] int32   row local to the stripe      BlockSpec delivers
      vals  [P, 1, C] dtype   value                         (1,1,C) blocks)
      slot_of_origrow [M] int32  stripe-slot (p*RB + r) per original matrix
                                 row, -1 for rows absent from this sub-matrix
    """

    cols: Any
    lrow: Any
    vals: Any
    slot_of_origrow: Any
    n_stripes: int
    stripe_nnz: int
    max_rows_per_stripe: int
    shape: tuple[int, int]
    nnz_real: int

    @property
    def padding_rate(self) -> float:
        return self.n_stripes * self.stripe_nnz / max(self.nnz_real, 1)

    def memory_bytes(self) -> int:
        return sum(np.asarray(a).nbytes for a in (self.cols, self.lrow, self.vals))


def pack_stripe(
    ms: MetaDataSet,
    sub: int,
    *,
    out_rows: int,
    level: Level = Level.TBLOCK,
    val_dtype=np.float32,
    index_dtype=np.int32,
) -> StripeFormat:
    """Pack a row-aligned, uniform-nnz blocked sub-matrix into StripeFormat.

    Preconditions: ``level`` has first_row_indices / first_nz_indices with
    uniform per-block nnz (run pad_blocks_to_uniform_nnz first) and row-major
    (or per-block interleaved) nz order.  ``out_rows`` is the row count of the
    *original* matrix that Y must be produced for.
    """
    first_rows = ms.get(level, "first_row_indices", sub).astype(np.int64)
    first_nzs = ms.get(level, "first_nz_indices", sub).astype(np.int64)
    rows, cols, vals = ms.coo(sub)
    nnz = rows.size
    sizes = np.diff(first_nzs)
    assert sizes.size >= 1 and (sizes == sizes[0]).all(), "stripe nnz must be uniform"
    c = int(sizes[0])
    p = int(sizes.size)
    assert p * c == nnz

    block_of_nz = np.repeat(np.arange(p, dtype=np.int64), c)
    lrow = rows - first_rows[block_of_nz]
    rb = int(np.diff(first_rows).max()) if p else 1
    rb = max(rb, 1)
    assert lrow.min() >= 0 and lrow.max() < rb

    # slot map: original row -> p * rb + local row
    row_num = ms.row_num(sub)
    local_rows = np.arange(row_num, dtype=np.int64)
    blk = np.searchsorted(first_rows, local_rows, side="right") - 1
    blk = np.clip(blk, 0, p - 1)
    slot_of_local = blk * rb + (local_rows - first_rows[blk])
    if ms.has(Level.ROW, "original_row_of_sorted", sub):
        rec = ms.get(Level.ROW, "original_row_of_sorted", sub)[:row_num]
    else:
        rec = local_rows
    slot_of_origrow = np.full(out_rows, -1, dtype=np.int64)
    keep = rec >= 0
    slot_of_origrow[rec[keep]] = slot_of_local[keep]

    col_num = ms.col_num(sub)
    _ = narrow_dtype  # dtype narrowing applies to the metadata set; packed
    # formats use int32 (TPU-native SMEM scalar width)
    fmt = StripeFormat(
        cols=np.ascontiguousarray(cols.reshape(p, 1, c).astype(index_dtype)),
        lrow=np.ascontiguousarray(lrow.reshape(p, 1, c).astype(index_dtype)),
        vals=np.ascontiguousarray(np.asarray(vals).reshape(p, 1, c).astype(val_dtype)),
        slot_of_origrow=slot_of_origrow.astype(index_dtype),
        n_stripes=p,
        stripe_nnz=c,
        max_rows_per_stripe=rb,
        shape=(out_rows, col_num),
        nnz_real=int(np.count_nonzero(vals)),
    )
    return fmt


@dataclasses.dataclass
class TileFormat:
    """Column-tiled chunk format for the one-hot MXU SpMM kernel.

    One grid program = RB consecutive rows.  Its nz are ordered by
    (column-tile, row), each (program, tile) segment padded to a multiple of
    the chunk size G, and every program padded to a uniform NC chunks.  A
    chunk's nz all lie in one column tile, so the kernel gathers X rows for
    the whole chunk with ONE one-hot matmul against the (CT, ktile) X window
    and scatters to rows with a second one-hot matmul — no per-nz scalar
    work (the TPU-native replacement for the reference's vectorized Load()
    coarsening; conceptual counterpart of interleaved ELL storage).

    Arrays:
      cols   [P, NC, G] int32  column local to the chunk's tile (< CT)
      lrow   [P, NC, G] int32  row local to the program (< RB)
      vals   [P, NC, G] dtype  value (0 for padding)
      chunk_tile [P, 1, NC] int32  column-tile id per chunk (SMEM)
      slot_of_origrow [M] int32    sorted-row slot per original row (-1 absent)
    """

    cols: Any
    lrow: Any
    vals: Any
    chunk_tile: Any
    slot_of_origrow: Any
    n_programs: int
    n_chunks: int
    chunk_g: int
    rb: int
    ct: int
    shape: tuple[int, int]
    nnz_real: int

    @property
    def padding_rate(self) -> float:
        return self.n_programs * self.n_chunks * self.chunk_g / max(self.nnz_real, 1)

    def memory_bytes(self) -> int:
        return sum(
            np.asarray(a).nbytes for a in (self.cols, self.lrow, self.vals, self.chunk_tile)
        )


def pack_tile(
    ms: MetaDataSet,
    sub: int,
    *,
    out_rows: int,
    rb: int = 256,
    ct: int = 512,
    g: int = 128,
    val_dtype=np.float32,
    index_dtype=np.int32,
) -> TileFormat:
    """Pack a sub-matrix into TileFormat (see TileFormat docstring)."""
    rows, cols, vals = ms.coo(sub)
    rows = rows.astype(np.int64)
    cols = cols.astype(np.int64)
    row_num = ms.row_num(sub)
    col_num = ms.col_num(sub)
    p_count = max(-(-row_num // rb), 1)
    n_tiles = max(-(-col_num // ct), 1)

    p_arr = rows // rb
    t_arr = cols // ct
    order = np.lexsort((cols, rows, t_arr, p_arr))
    rows, cols, vals = rows[order], cols[order], np.asarray(vals)[order]
    p_arr, t_arr = p_arr[order], t_arr[order]

    # (p, tile) segment sizes, padded to multiples of g
    seg_key = p_arr * n_tiles + t_arr
    seg_sizes = np.bincount(seg_key, minlength=p_count * n_tiles).reshape(p_count, n_tiles)
    seg_pad = -(-seg_sizes // g) * g  # zero stays zero
    chunks_per_p = seg_pad.sum(axis=1) // g
    nc = int(max(chunks_per_p.max(), 1))
    c_per_p = nc * g

    # destination offset of each nz: program base + padded segment start + rank
    seg_starts = np.cumsum(seg_pad, axis=1) - seg_pad  # within-program offsets
    nnz = rows.size
    if nnz:
        # rank within segment: positions minus segment start in sorted order
        seg_first = np.concatenate(([0], np.nonzero(np.diff(seg_key))[0] + 1))
        seg_ptr = np.zeros(nnz, dtype=np.int64)
        seg_ptr[seg_first] = seg_first
        seg_ptr = np.maximum.accumulate(seg_ptr)
        rank = np.arange(nnz) - seg_ptr
        dest = p_arr * c_per_p + seg_starts[p_arr, t_arr] + rank
    else:
        dest = np.empty(0, dtype=np.int64)

    total = p_count * c_per_p
    cols_f = np.zeros(total, dtype=index_dtype)
    lrow_f = np.zeros(total, dtype=index_dtype)
    vals_f = np.zeros(total, dtype=val_dtype)
    cols_f[dest] = (cols - t_arr * ct).astype(index_dtype)
    lrow_f[dest] = (rows - p_arr * rb).astype(index_dtype)
    vals_f[dest] = vals.astype(val_dtype)

    # chunk -> tile map (padding chunks use tile 0)
    chunk_tile = np.zeros((p_count, nc), dtype=index_dtype)
    for p in range(p_count):
        reps = (seg_pad[p] // g)
        tiles = np.repeat(np.arange(n_tiles, dtype=index_dtype), reps)
        chunk_tile[p, : tiles.size] = tiles

    # output recovery: slots are the sorted local rows, contiguous
    if ms.has(Level.ROW, "original_row_of_sorted", sub):
        rec = ms.get(Level.ROW, "original_row_of_sorted", sub)[:row_num]
    else:
        rec = np.arange(row_num, dtype=np.int64)
    slot_of_origrow = np.full(out_rows, -1, dtype=index_dtype)
    keep = rec >= 0
    slot_of_origrow[rec[keep]] = np.arange(row_num, dtype=index_dtype)[keep]

    return TileFormat(
        cols=cols_f.reshape(p_count, nc, g),
        lrow=lrow_f.reshape(p_count, nc, g),
        vals=vals_f.reshape(p_count, nc, g),
        chunk_tile=chunk_tile.reshape(p_count, 1, nc),
        slot_of_origrow=slot_of_origrow,
        n_programs=p_count,
        n_chunks=nc,
        chunk_g=g,
        rb=rb,
        ct=ct,
        shape=(out_rows, col_num),
        nnz_real=int(np.count_nonzero(vals)),
    )


@dataclasses.dataclass
class SegmentFormat:
    """nnz-direction chunk format for the segment-reduce SpMM path.

    Reference counterpart: thread_bit_map_reduce_to_two_register /
    warp_bit_map / warp_segment / tblock_bit_map reduction templates — blocks
    own fixed nnz ranges, rows straddle blocks, per-(block,row)-segment
    partial sums are combined afterwards (atomicAdd on GPU; a segment-sum
    scatter on TPU, which has no atomics).

    Arrays mirror StripeFormat but ``lrow`` holds the *segment id local to
    the block* and ``row_of_slot`` maps each (block, segment) slot to its
    original output row (-1 for unused slots).
    """

    cols: Any
    lrow: Any
    vals: Any
    row_of_slot: Any
    n_blocks: int
    block_nnz: int
    max_segments: int
    shape: tuple[int, int]
    nnz_real: int

    @property
    def padding_rate(self) -> float:
        return self.n_blocks * self.block_nnz / max(self.nnz_real, 1)

    def memory_bytes(self) -> int:
        return sum(np.asarray(a).nbytes
                   for a in (self.cols, self.lrow, self.vals, self.row_of_slot))


def pack_segment(
    ms: MetaDataSet,
    sub: int,
    *,
    out_rows: int,
    level: Level = Level.TBLOCK,
    val_dtype=np.float32,
    index_dtype=np.int32,
) -> SegmentFormat:
    """Pack an nnz-direction blocked sub-matrix (uniform block nnz + bitmap
    metadata present) into SegmentFormat."""
    first_nzs = ms.get(level, "first_nz_indices", sub).astype(np.int64)
    rows, cols, vals = ms.coo(sub)
    bm = ms.get(level, "bit_map_of_thread", sub).astype(np.int64)
    nnz = rows.size
    sizes = np.diff(first_nzs)
    assert sizes.size >= 1 and (sizes == sizes[0]).all(), "block nnz must be uniform"
    c = int(sizes[0])
    p = int(sizes.size)
    assert p * c == nnz

    # local segment id per nz: cumsum of bitmap within each block
    seg_global = np.cumsum(bm) - 1  # global segment id per nz
    block_of_nz = np.repeat(np.arange(p, dtype=np.int64), c)
    seg_start_of_block = seg_global[first_nzs[:-1]]
    lseg = seg_global - seg_start_of_block[block_of_nz]
    rb = int(lseg.max()) + 1 if nnz else 1

    # slot -> row map
    if ms.has(Level.ROW, "original_row_of_sorted", sub):
        rec = ms.get(Level.ROW, "original_row_of_sorted", sub)[: ms.row_num(sub)]
    else:
        rec = np.arange(ms.row_num(sub), dtype=np.int64)
    row_of_slot = np.full(p * rb, -1, dtype=np.int64)
    starts = bm.astype(bool)
    slot_of_seg = block_of_nz[starts] * rb + lseg[starts]
    local_row_of_seg = rows[starts]
    orig = np.where(local_row_of_seg < rec.size, rec[np.minimum(local_row_of_seg, rec.size - 1)], -1)
    row_of_slot[slot_of_seg] = orig

    return SegmentFormat(
        cols=np.ascontiguousarray(cols.reshape(p, 1, c).astype(index_dtype)),
        lrow=np.ascontiguousarray(lseg.reshape(p, 1, c).astype(index_dtype)),
        vals=np.ascontiguousarray(np.asarray(vals).reshape(p, 1, c).astype(val_dtype)),
        row_of_slot=row_of_slot.astype(index_dtype),
        n_blocks=p,
        block_nnz=c,
        max_segments=rb,
        shape=(out_rows, ms.col_num(sub)),
        nnz_real=int(np.count_nonzero(vals)),
    )


@dataclasses.dataclass
class NestedStripeFormat:
    """Two-level stripe format: TBLOCK programs containing WARP sub-blocks
    addressed by PARENT-RELATIVE offsets (the reference's nested
    BMTB > BMW loops with ..._relative_to_BMTB indices,
    code_generator.cc:1655-1871 / :1287-1390).

    Arrays (P tblocks, C nnz slots per tblock, Wmax warps per tblock):
      cols  [P, 1, C]       int32  global column per nz
      lrow  [P, 1, C]       int32  row LOCAL TO THE WARP (small ints — the
                                   point of relative indices: narrow range)
      vals  [P, 1, C]       f32
      wnz   [P, 1, Wmax+1]  int32  warp first-nz offsets relative to the
                                   tblock base (multiples of ``unroll``)
      wrow  [P, 1, Wmax+1]  int32  warp first-row offsets relative to the
                                   tblock's first row
    """

    cols: Any
    lrow: Any
    vals: Any
    wnz: Any
    wrow: Any
    slot_of_origrow: Any
    n_stripes: int
    stripe_nnz: int
    n_warps: int
    max_rows_per_stripe: int
    shape: tuple[int, int]
    nnz_real: int

    @property
    def padding_rate(self) -> float:
        return self.n_stripes * self.stripe_nnz / max(self.nnz_real, 1)

    def memory_bytes(self) -> int:
        return sum(np.asarray(a).nbytes
                   for a in (self.cols, self.lrow, self.vals, self.wnz, self.wrow))


def pack_stripe_nested(
    ms: MetaDataSet,
    sub: int,
    *,
    out_rows: int,
    unroll: int = 8,
) -> NestedStripeFormat:
    """Pack a TBLOCK⊃WARP two-level blocking into NestedStripeFormat.

    Preconditions: WARP and TBLOCK both have first_row/first_nz_indices with
    TBLOCK boundaries nesting the WARP ones (GroupChildrenBlockingOperator),
    plus the parent-relative arrays (RelativeIndexOperator) and child
    offsets (ChildOffsetsOperator).  Each warp's nz run is padded to a
    multiple of ``unroll`` so the inner loop can unroll without a tail."""
    w_rows = ms.get(Level.WARP, "first_row_indices", sub).astype(np.int64)
    w_nzs = ms.get(Level.WARP, "first_nz_indices", sub).astype(np.int64)
    p_rows = ms.get(Level.TBLOCK, "first_row_indices", sub).astype(np.int64)
    p_nzs = ms.get(Level.TBLOCK, "first_nz_indices", sub).astype(np.int64)
    offs = ms.get(Level.TBLOCK, "first_BMW_indices", sub).astype(np.int64)
    # parent-relative arrays must have been emitted (RelativeIndexOperator)
    assert ms.has(Level.WARP, "first_nz_indices_relative_to_BMTB", sub), \
        "run RelativeIndexOperator(WARP, TBLOCK) first"
    rows, cols, vals = ms.coo(sub)

    p = p_nzs.size - 1
    wmax = int(np.diff(offs).max()) if p else 1
    wsz = np.diff(w_nzs)
    wsz_pad = -(-wsz // unroll) * unroll
    # per-tblock padded nnz = sum of its warps' padded sizes
    c_per_p = np.add.reduceat(wsz_pad, offs[:-1]) if wsz_pad.size else np.zeros(p, np.int64)
    c = int(c_per_p.max()) if p else unroll
    c = max(-(-c // unroll) * unroll, unroll)

    cols_a = np.zeros((p, 1, c), dtype=np.int32)
    lrow_a = np.zeros((p, 1, c), dtype=np.int32)
    vals_a = np.zeros((p, 1, c), dtype=np.float32)
    wnz_a = np.zeros((p, 1, wmax + 1), dtype=np.int32)
    wrow_a = np.zeros((p, 1, wmax + 1), dtype=np.int32)
    for b in range(p):
        pos = 0
        wlo, whi = int(offs[b]), int(offs[b + 1])
        for wi, w in enumerate(range(wlo, whi)):
            lo, hi = int(w_nzs[w]), int(w_nzs[w + 1])
            nreal = hi - lo
            wnz_a[b, 0, wi] = pos
            wrow_a[b, 0, wi] = int(w_rows[w] - p_rows[b])
            cols_a[b, 0, pos:pos + nreal] = cols[lo:hi]
            lrow_a[b, 0, pos:pos + nreal] = rows[lo:hi] - w_rows[w]
            vals_a[b, 0, pos:pos + nreal] = vals[lo:hi]
            if nreal:  # padding repeats the warp's last col (index stays valid)
                padn = int(wsz_pad[w] - nreal)
                cols_a[b, 0, pos + nreal:pos + nreal + padn] = cols[hi - 1]
            pos += int(wsz_pad[w])
        wnz_a[b, 0, whi - wlo:] = pos
        wrow_a[b, 0, whi - wlo:] = int(p_rows[b + 1] - p_rows[b])

    rb = int(np.diff(p_rows).max()) if p else 1
    rb = max(rb, 1)

    row_num = ms.row_num(sub)
    local_rows = np.arange(row_num, dtype=np.int64)
    blk = np.clip(np.searchsorted(p_rows, local_rows, side="right") - 1, 0, p - 1)
    slot_of_local = blk * rb + (local_rows - p_rows[blk])
    if ms.has(Level.ROW, "original_row_of_sorted", sub):
        rec = ms.get(Level.ROW, "original_row_of_sorted", sub)[:row_num]
    else:
        rec = local_rows
    slot_of_origrow = np.full(out_rows, -1, dtype=np.int64)
    keep = rec >= 0
    slot_of_origrow[rec[keep]] = slot_of_local[keep]

    return NestedStripeFormat(
        cols=cols_a, lrow=lrow_a, vals=vals_a, wnz=wnz_a, wrow=wrow_a,
        slot_of_origrow=slot_of_origrow.astype(np.int32),
        n_stripes=p, stripe_nnz=c, n_warps=wmax, max_rows_per_stripe=rb,
        shape=(out_rows, ms.col_num(sub)),
        nnz_real=int(np.count_nonzero(vals_a)),
    )
