"""Plan generation: schedule -> transforms -> packed format -> jitted kernel.

Reference counterpart: ``code_generator`` (L5) — which tracks needed metadata,
assembles the token AST, and emits the final program — plus the schedule
functions in token_test.cc (L6).  Here a *plan* is the packed format plus a
jitted Python callable; Mosaic compiles the per-(matrix, schedule) binary.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import numpy as np

from tpusparse.format import StripeFormat, pack_stripe
from tpusparse.io.mtx import CooMatrix
from tpusparse.levels import Level
from tpusparse.meta.set import MetaDataSet, create_init_metadata_set
from tpusparse import transforms as T


@dataclasses.dataclass
class SpmmPlan:
    """A ready-to-run SpMM: ``plan(x)`` computes A @ x."""

    fn: Callable[[Any], Any]
    formats: list[Any]
    shape: tuple[int, int]
    meta: dict

    def __call__(self, x):
        return self.fn(x)

    def cost_summary(self, k: int | None = None) -> dict:
        """Static cost introspection: format bytes, padding, and the
        per-call useful-FLOP count (the reference prints the same quantities
        around its timing loop, code_generator.cc:589-648)."""
        fmt_bytes = int(self.meta.get("format_bytes", 0))  # e.g. densified A
        nnz_padded = 0
        nnz_real = 0
        for f in self.formats:
            mb = getattr(f, "memory_bytes", 0)
            fmt_bytes += mb() if callable(mb) else mb
            nnz_real += getattr(f, "nnz_real", getattr(f, "nnz", 0))
            pr = getattr(f, "padding_rate", 1.0)
            nnz_padded += int(getattr(f, "nnz_real", 0) * pr) if hasattr(f, "nnz_real") else 0
        out = {
            "schedule": self.meta.get("schedule"),
            "format_bytes": int(fmt_bytes),
            "padding_rate": self.meta.get("padding_rate"),
            "n_sub_plans": self.meta.get("n_subs", 1),
            "shape": list(self.shape),
        }
        if nnz_real:
            out["nnz"] = int(nnz_real)
        if k is not None and nnz_real:
            out["useful_gflop_per_call"] = 2.0 * nnz_real * k / 1e9
        return out


def prepare_stripe_format(
    mat: CooMatrix,
    *,
    work_per_stripe: int = 1024,
    row_weight: int = 1,
    sort: bool = True,
    nnz_multiple: int = 8,
    val_dtype=np.float32,
) -> tuple[StripeFormat, MetaDataSet]:
    """The thread-total pipeline (reference: test_spmm_thread_total,
    token_test.cc:1003-1092 — sort -> blocking -> reduce -> grid): sort rows
    by length, merge-path partition into row-aligned stripes (bounding both
    rows and nnz per stripe), equalize stripe nnz, pack."""
    ms = create_init_metadata_set(mat)
    if sort:
        T.get_row_order_by_length(ms, 0)
        T.reorder_by_row_order(ms, 0)
        T.remove_empty_rows_in_end(ms, 0)
    T.block_merge_path(ms, 0, Level.TBLOCK, work_per_stripe, row_weight)
    T.pad_blocks_to_uniform_nnz(ms, 0, Level.TBLOCK, multiple_of=nnz_multiple)
    fmt = pack_stripe(ms, 0, out_rows=mat.shape[0], val_dtype=val_dtype)
    return fmt, ms


def build_stripe_plan(
    mat: CooMatrix,
    *,
    work_per_stripe: int = 1024,
    row_weight: int = 1,
    sort: bool = True,
    ktile: int | None = None,
    unroll: int = 8,
    val_dtype=np.float32,
    interpret: bool | None = None,
) -> SpmmPlan:
    from tpusparse.kernels.stripe_gather import stripe_spmm

    fmt, ms = prepare_stripe_format(
        mat,
        work_per_stripe=work_per_stripe,
        row_weight=row_weight,
        sort=sort,
        nnz_multiple=max(unroll, 1),
        val_dtype=val_dtype,
    )

    def fn(x):
        return stripe_spmm(fmt, x, ktile=ktile, unroll=unroll, interpret=interpret)

    return SpmmPlan(
        fn=fn,
        formats=[fmt],
        shape=mat.shape,
        meta={
            "kernel": "stripe_gather",
            "n_stripes": fmt.n_stripes,
            "stripe_nnz": fmt.stripe_nnz,
            "max_rows_per_stripe": fmt.max_rows_per_stripe,
            "padding_rate": fmt.padding_rate,
            "trace_steps": len(ms.trace),
        },
    )


def prepare_tile_format(
    mat: CooMatrix,
    *,
    rb: int = 256,
    ct: int = 512,
    g: int = 128,
    sort: bool = False,
    val_dtype=np.float32,
):
    """Tile/one-hot pipeline: (optional length-sort) -> implicit fixed-interval
    row blocking (RB) + col-direction tiling (CT) inside the packer."""
    from tpusparse.format import pack_tile

    ms = create_init_metadata_set(mat)
    if sort:
        T.get_row_order_by_length(ms, 0)
        T.reorder_by_row_order(ms, 0)
    fmt = pack_tile(ms, 0, out_rows=mat.shape[0], rb=rb, ct=ct, g=g, val_dtype=val_dtype)
    return fmt, ms


def build_tile_plan(
    mat: CooMatrix,
    *,
    rb: int = 256,
    ct: int = 512,
    g: int = 128,
    sort: bool = False,
    ktile: int | None = None,
    precision: str = "fp32x2",
    val_dtype=np.float32,
    interpret: bool | None = None,
) -> SpmmPlan:
    from tpusparse.kernels.tile_onehot import tile_spmm

    fmt, ms = prepare_tile_format(mat, rb=rb, ct=ct, g=g, sort=sort, val_dtype=val_dtype)

    def fn(x):
        return tile_spmm(fmt, x, ktile=ktile, precision=precision, interpret=interpret)

    return SpmmPlan(
        fn=fn,
        formats=[fmt],
        shape=mat.shape,
        meta={
            "kernel": "tile_onehot",
            "precision": precision,
            "n_programs": fmt.n_programs,
            "n_chunks": fmt.n_chunks,
            "chunk_g": fmt.chunk_g,
            "rb": rb,
            "ct": ct,
            "padding_rate": fmt.padding_rate,
        },
    )
