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
