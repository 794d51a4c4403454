"""Schedules: the tuning vocabulary (reference L6).

A Schedule is the declarative analogue of the reference's ``test_spmm_*``
functions (token_test.cc:1003-1618) — a named kernel family plus the
converting/distributing/implementing operator parameters.  ``build_plan``
executes the operator pipeline through the OperatorExecutor (validity gates
+ rollback), packs the per-sub-matrix formats, and returns a jitted SpMM.

Reference schedule family -> tpusparse family:

  thread_total / warp_total / block_total   'stripe_total' (the three GPU
      (one owner per row range)             levels collapse to the stripe
                                            work budget on TPU)
  thread_bit_map / warp_bit_map /           'nnz_segment' (equal-nnz blocks,
  warp_segment / block_bitmap               segment partials + combine)
  (MXU path, no reference counterpart)      'tile_onehot'
  row_nz_matrix_div composite               'bucketed' (per-bucket schedule)
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

from tpusparse.format import pack_segment, pack_stripe, pack_tile
from tpusparse.generator import SpmmPlan
from tpusparse.io.mtx import CooMatrix
from tpusparse.levels import Level
from tpusparse.meta.set import create_init_metadata_set
from tpusparse.ops import (
    BalancedNnzRowBlockingOperator,
    FixedIntervalRowBlockingOperator,
    FixedNnzBlockingOperator,
    MergePathBlockingOperator,
    OperatorExecutor,
    RowNnzMatrixDivOperator,
    SegmentReduceOperator,
    SortOperator,
    ThreadTotalReduceOperator,
    TileOneHotImplementOperator,
    UniformBlockPadOperator,
)

KERNEL_FAMILIES = ("stripe_total", "stripe_nested", "nnz_segment",
                   "segment_span", "tile_onehot", "span_onehot",
                   "span_colsplit", "radix_span", "brick_ell", "dg_span",
                   "dgt_span", "bucketed", "dense", "block_ell", "hybrid_cols")
BLOCKINGS = ("merge_path", "balanced", "fixed_rows")


@dataclasses.dataclass(frozen=True)
class Schedule:
    """One tuning candidate."""

    family: str = "tile_onehot"
    # converting
    sort: bool = False
    sort_by: str = "length"
    bucket_bounds: tuple = ()          # non-empty => row-nnz div ('bucketed')
    # distributing
    blocking: str = "merge_path"       # stripe_total: merge_path|balanced|fixed_rows
    work_per_block: int = 1024         # stripe/segment nnz (or work) budget
    row_interval: int = 256            # fixed_rows interval
    # tile_onehot / span params
    rb: int = 1024
    ct: int = 1024
    g: int = 512
    col_split: int = 0                 # span_colsplit: number of column ranges
    sublanes: int = 128                # radix_span: window sublane count S
    ns: int = 8                        # dg_span: window tiles (W = ns*128)
    nw: int = 4                        # dgt_span: windows per 128-lane tile
    resid: bool = True                 # dgt_span: static-residue scatter
    scatter: str = "select"            # dgt_span: select|fullrow
    walk: str = "multi"                # dgt_span: tile walk (multi|single)
    pipe: bool = False                 # dgt_span: software-pipelined body
    rowhot_i8: bool = False            # dgt_span: int8 scatter one-hot (C4)
    hot_cols: int = 0                  # hybrid_cols: dense hot-column panel width
    # implementing
    precision: str = "fp32x2"          # tile kernel precision mode
    unroll: int = 4
    ktile: int | None = None
    # per-bucket schedules for 'bucketed' (parallel to bucket count)
    bucket_schedules: tuple = ()

    def describe(self) -> dict[str, Any]:
        return dataclasses.asdict(self)


def default_schedule(mat: CooMatrix, k: int | None = None) -> Schedule:
    """Benched default family for the K regime, with the X-VMEM gate: the
    radix/span kernels need the whole packed X block VMEM-resident, so
    large N falls back to span_colsplit (K known) or the streaming
    tile_onehot kernel (K unknown at plan-build time, e.g. SparseLinear)."""
    from tpusparse.kernels.radix_gather import choose_kt

    n = mat.shape[1]
    kt = 128 if k is None else min(k, 128)
    x_bytes = n * 2 * kt * 2  # fp32x2 packs hi+lo bf16: 2*ktile bf16 per row
    if k is not None and k > 128:
        return Schedule()  # tile_onehot (streams X, safe at any N)
    if k is not None and k <= 32:
        # dg x3 is (N+W)*kt*4 bytes f32 per resident tile (same class as
        # the radix lane packing)
        from tpusparse.kernels.dg_gather import choose_kt_dg

        kt_d = choose_kt_dg(k)
        if kt_d == 1 and n * 4 <= 6 * 1024 * 1024:
            return Schedule(family="dg_span", rb=4096, ns=4, g=2048,
                            unroll=8, ktile=1)
        if kt_d > 1 and n * kt_d * 4 <= 6 * 1024 * 1024:
            return Schedule(family="dg_span", rb=1024, ns=8, g=512,
                            unroll=8, ktile=kt_d)
        kt_r = choose_kt(k)
        if n * kt_r * 4 <= 6 * 1024 * 1024:
            return Schedule(family="radix_span", rb=1024, sublanes=128, g=1024,
                            unroll=4, ktile=kt_r)
    if k is not None and k <= 128 and n * 32 * 4 <= 6 * 1024 * 1024:
        # dg at kt=32 beats span at 32 < K <= 128 (57 vs 50 GF/s at K=64,
        # 59 vs 44 at K=128, 16k^2 power-law on v5e)
        return Schedule(family="dg_span", rb=512, ns=8, g=512, unroll=8,
                        ktile=32)
    if x_bytes <= 6 * 1024 * 1024:
        return Schedule(family="span_onehot", rb=512, ct=1024, g=512, unroll=4)
    if k is not None:
        return Schedule(family="span_colsplit",
                        col_split=-(-x_bytes // (4 * 1024 * 1024)),
                        rb=512, ct=1024, g=512, unroll=4)
    return Schedule()


def _build_sub_plan(ms, ex, sub: int, sched: Schedule, out_rows: int, interpret):
    """Run distributing+implementing for one sub-matrix; return (format, fn).

    Launch geometry (K tile, unroll/coarsening) flows through the metadata
    set: GridBlockOperator writes GLOBAL ``ktile``/``k_unroll`` and the
    kernels read them back — the reference's grid_block_operator ->
    set_thread_grid path, not a side channel."""
    from tpusparse.ops import GridBlockOperator

    ex.add_and_run(GridBlockOperator(sub, ktile=sched.ktile, unroll=sched.unroll))
    kt_meta = (int(ms.get(Level.GLOBAL, "ktile", sub))
               if ms.has(Level.GLOBAL, "ktile", sub) else None)
    unroll_meta = int(ms.get(Level.GLOBAL, "k_unroll", sub))
    sched = dataclasses.replace(sched, ktile=kt_meta, unroll=unroll_meta)
    if sched.family == "stripe_nested":
        # two-level TBLOCK⊃WARP schedule: balanced WARP blocking, small
        # warps coalesced (merge-thread), warps grouped into TBLOCK
        # programs, child offsets + parent-relative indices packed into the
        # device format; the kernel loops warps inside each program
        from tpusparse.format import pack_stripe_nested
        from tpusparse.kernels.stripe_gather import stripe_nested_spmm
        from tpusparse.ops import (ChildOffsetsOperator,
                                   GroupChildrenBlockingOperator,
                                   MergeAdjacentBlocksOperator,
                                   RelativeIndexOperator)

        work = max(sched.work_per_block // 8, 8)
        ex.add_and_run(BalancedNnzRowBlockingOperator(sub, Level.WARP, work))
        ex.add_and_run(MergeAdjacentBlocksOperator(sub, Level.WARP, work))
        ex.add_and_run(GroupChildrenBlockingOperator(
            sub, Level.TBLOCK, Level.WARP, children_per_parent=8))
        ex.add_and_run(ChildOffsetsOperator(sub, Level.TBLOCK, Level.WARP))
        ex.add_and_run(RelativeIndexOperator(sub, Level.WARP, Level.TBLOCK))
        ex.add_and_run(ThreadTotalReduceOperator(sub, Level.TBLOCK))
        fmt = pack_stripe_nested(ms, sub, out_rows=out_rows,
                                 unroll=max(sched.unroll, 1))

        def fn(x, fmt=fmt):
            return stripe_nested_spmm(fmt, x, ktile=sched.ktile,
                                      unroll=max(sched.unroll, 1),
                                      interpret=interpret)

        return fmt, fn
    if sched.family == "stripe_total":
        if sched.blocking == "merge_path":
            ex.add_and_run(MergePathBlockingOperator(sub, Level.TBLOCK, sched.work_per_block))
        elif sched.blocking == "balanced":
            ex.add_and_run(BalancedNnzRowBlockingOperator(sub, Level.TBLOCK, sched.work_per_block))
        else:
            ex.add_and_run(FixedIntervalRowBlockingOperator(sub, Level.TBLOCK, sched.row_interval))
        ex.add_and_run(ThreadTotalReduceOperator(sub, Level.TBLOCK))
        ex.add_and_run(UniformBlockPadOperator(sub, Level.TBLOCK, multiple_of=max(sched.unroll, 1)))
        fmt = pack_stripe(ms, sub, out_rows=out_rows)
        from tpusparse.kernels.stripe_gather import stripe_spmm

        def fn(x, fmt=fmt):
            return stripe_spmm(fmt, x, ktile=sched.ktile, unroll=max(sched.unroll, 1),
                               interpret=interpret)

        return fmt, fn
    if sched.family == "nnz_segment":
        ex.add_and_run(FixedNnzBlockingOperator(sub, Level.TBLOCK, sched.work_per_block))
        ex.add_and_run(SegmentReduceOperator(sub, Level.TBLOCK))
        fmt = pack_segment(ms, sub, out_rows=out_rows)
        from tpusparse.kernels.nnz_split import segment_spmm

        def fn(x, fmt=fmt):
            return segment_spmm(fmt, x, ktile=sched.ktile, unroll=max(sched.unroll, 1),
                                interpret=interpret)

        return fmt, fn
    if sched.family == "span_onehot":
        from tpusparse.kernels.span_gather import pack_span, span_spmm

        fmt = pack_span(ms, sub, out_rows=out_rows, rb=sched.rb, ct=sched.ct,
                        g=sched.g)

        def fn(x, fmt=fmt):
            return span_spmm(fmt, x, ktile=sched.ktile, precision=sched.precision,
                             unroll=sched.unroll, interpret=interpret)

        return fmt, fn
    if sched.family == "radix_span":
        from tpusparse.kernels.radix_gather import (PRECISIONS, choose_kt,
                                                    pack_radix, radix_spmm)

        mode = sched.precision if sched.precision in PRECISIONS else "fp32x2"
        kt = choose_kt(sched.ktile) if sched.ktile else 8
        fmt = pack_radix(ms, sub, out_rows=out_rows, rb=sched.rb,
                         S=sched.sublanes, g=sched.g, kt=kt, mode=mode)

        def fn(x, fmt=fmt):
            return radix_spmm(fmt, x, unroll=sched.unroll, interpret=interpret)

        return fmt, fn
    if sched.family == "dg_span":
        from tpusparse.kernels.dg_gather import (PRECISIONS, choose_kt_dg,
                                                 dg_spmm, dg_spmv, pack_dg)

        mode = sched.precision if sched.precision in PRECISIONS else "fp32x2"
        kt = choose_kt_dg(sched.ktile) if sched.ktile else 8
        if kt == 1:
            mode = "fp32x2"
        fmt = pack_dg(ms, sub, out_rows=out_rows, rb=sched.rb, ns=sched.ns,
                      g=sched.g, kt=kt, mode=mode)

        if kt == 1:
            def fn(x, fmt=fmt):
                assert x.shape[-1] == 1, "ktile=1 dg_span schedules are K=1"
                return dg_spmv(fmt, x, unroll=sched.unroll,
                               interpret=interpret).reshape(-1, 1)
        else:
            def fn(x, fmt=fmt):
                return dg_spmm(fmt, x, unroll=sched.unroll, interpret=interpret)

        return fmt, fn
    if sched.family == "dgt_span":
        from tpusparse.kernels.dgt_gather import (DGT_KTS, dgt_spmm, dgt_spmv,
                                                  pack_dgt)
        from tpusparse.kernels.dg_gather import PRECISIONS, choose_kt_dg

        mode = sched.precision if sched.precision in PRECISIONS else "fp32x2"
        kt = choose_kt_dg(max(sched.ktile or 8, 2))  # kt=1 stays dg_span
        fmt = pack_dgt(ms, sub, out_rows=out_rows, rb=sched.rb, g=sched.g,
                       kt=kt, mode=mode, resid=sched.resid, nw=sched.nw,
                       walk=sched.walk)

        def fn(x, fmt=fmt):
            return dgt_spmm(fmt, x, unroll=sched.unroll,
                            scatter=sched.scatter, pipe=sched.pipe,
                            rowhot_i8=sched.rowhot_i8,
                            interpret=interpret)

        return fmt, fn
    if sched.family == "brick_ell":
        # the reference's headline layout: length-sort + 8-row bricks
        # ELL-padded to the brick max + interleaved storage, chunked in
        # stored order and run through the radix kernel (head-to-head vs
        # span chunking with the kernel held constant)
        from tpusparse.kernels.radix_gather import (PRECISIONS, choose_kt,
                                                    pack_brick_ell, radix_spmm)
        from tpusparse.ops import (EllBlockPadOperator,
                                   InterleaveStorageOperator)

        mode = sched.precision if sched.precision in PRECISIONS else "fp32x2"
        kt = choose_kt(sched.ktile) if sched.ktile else 8
        ex.add_and_run(FixedIntervalRowBlockingOperator(sub, Level.TBLOCK, 8))
        ex.add_and_run(EllBlockPadOperator(sub, Level.TBLOCK))
        ex.add_and_run(InterleaveStorageOperator(sub, Level.TBLOCK))
        fmt = pack_brick_ell(ms, sub, out_rows=out_rows, rb=sched.rb,
                             S=sched.sublanes, g=sched.g, kt=kt, mode=mode)
        # interleaved order scatters columns, so NC explodes on matrices
        # without column locality; gate the per-program VMEM block before
        # Mosaic fails opaquely (this is the measured reason brick-ELL
        # loses to span chunking on TPU — see BENCH_SUITE layout_h2h)
        blk_bytes = fmt.n_chunks * fmt.chunk_g * 12
        if blk_bytes > 4 * 1024 * 1024:
            raise RuntimeError(
                f"brick_ell chunk blocks need {blk_bytes/2**20:.0f} MB VMEM "
                f"(NC={fmt.n_chunks}): the interleaved layout has no column "
                "locality on this matrix; use radix_span")

        def fn(x, fmt=fmt):
            return radix_spmm(fmt, x, unroll=sched.unroll, interpret=interpret)

        return fmt, fn
    if sched.family == "tile_onehot":
        ex.add_and_run(TileOneHotImplementOperator(
            sub, rb=sched.rb, ct=sched.ct, g=sched.g,
            precision=sched.precision, unroll=sched.unroll,
        ))
        fmt = pack_tile(ms, sub, out_rows=out_rows, rb=sched.rb, ct=sched.ct, g=sched.g)
        from tpusparse.kernels.tile_onehot import tile_spmm

        def fn(x, fmt=fmt):
            return tile_spmm(fmt, x, ktile=sched.ktile, precision=sched.precision,
                             unroll=sched.unroll, interpret=interpret)

        return fmt, fn
    raise ValueError(f"unknown family {sched.family!r}")


def _build_dense_plan(mat: CooMatrix, sched: Schedule) -> SpmmPlan:
    """Dense MXU matmul as a schedule family.  At high density or large K
    the one-hot gather costs more FLOPs than the dense product itself (the
    MXU has no gather), so the honest TPU-native schedule IS the dense
    matmul — the tuner measures and decides, exactly like the reference
    keeps the min over pipelines (token_test.cc:1625-1847)."""
    import jax
    import jax.numpy as jnp

    dt = jnp.bfloat16 if sched.precision == "bf16" else jnp.float32
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    m, n = mat.shape
    if m * n * np.dtype("float32").itemsize <= 256 * 1024 * 1024:
        a = jnp.asarray(mat.to_dense(np.float32), dtype=dt)
    else:
        # large A: densify on device (host->device transfer of a multi-GB
        # dense array dominates otherwise); one-time scatter cost
        @jax.jit
        def _densify(rows, cols, vals):
            z = jnp.zeros((m, n), dt)
            return z.at[rows, cols].add(vals.astype(dt))

        a = _densify(jnp.asarray(mat.rows, jnp.int32),
                     jnp.asarray(mat.cols, jnp.int32),
                     jnp.asarray(mat.vals, jnp.float32))

    @jax.jit
    def _mm(a, x):
        return jnp.dot(a, x.astype(dt), preferred_element_type=jnp.float32,
                       precision=prec)

    return SpmmPlan(
        fn=lambda x: _mm(a, x),
        formats=[],
        shape=mat.shape,
        meta={"schedule": sched.describe(), "n_subs": 1, "padding_rate": 1.0,
              "operator_history": "dense",
              # the densified A is the format: its HBM residency is the whole
              # trade-off vs sparse formats and must show up in cost_summary
              "format_bytes": int(a.size) * a.dtype.itemsize},
    )


def _build_block_ell_plan(mat: CooMatrix, sched: Schedule, interpret) -> SpmmPlan:
    """Block-sparse MXU dense-tile family (no row reordering: the format is
    already aligned to the original row space)."""
    from tpusparse.kernels.block_ell import block_ell_spmm, pack_block_ell

    bs = sched.row_interval if sched.row_interval in (64, 128, 256) else 128
    fmt = pack_block_ell(mat, bs=bs,
                         dtype="bfloat16" if sched.precision == "bf16" else "float32")

    def fn(x, fmt=fmt):
        return block_ell_spmm(
            fmt, x,
            precision="bf16" if sched.precision == "bf16" else "fp32",
            ktile=sched.ktile, interpret=interpret,
        )

    return SpmmPlan(
        fn=fn, formats=[fmt], shape=mat.shape,
        meta={"schedule": sched.describe(), "n_subs": 1,
              "padding_rate": fmt.padding_rate * (fmt.bs ** 2 * fmt.n_blocks) / max(mat.nnz, 1),
              "operator_history": "block_ell"},
    )


def _build_hybrid_cols_plan(mat: CooMatrix, sched: Schedule, interpret) -> SpmmPlan:
    """Hot-column hybrid: the ``hot_cols`` most-populated columns are
    extracted into a dense (M, C) panel multiplied on the MXU — no gather
    at all for the bulk of the nnz — and only the cold-column remainder
    runs through the one-hot kernel path.  On column-skewed matrices
    (web-graph class: in-link counts are power-law; also any push-oriented
    graph matrix with power-law out-degrees) the panel covers most nnz at
    dense-MXU speed while staying C/N of the dense family's HBM footprint.

    TPU-first composition of two reference ideas: the nnz-bucket matrix
    div (row_nz_matrix_div_operator, operator.hpp:319) applied in the
    column direction, and the dense calculation path — the tuner times it
    against the pure-sparse families and keeps the min, exactly like the
    reference's min-over-pipelines loop (token_test.cc:1625-1847)."""
    import jax
    import jax.numpy as jnp

    m, n = mat.shape
    C = min(max(int(sched.hot_cols) or 512, 128), n)
    C = (C + 127) & ~127  # lane-pad the panel width
    counts = np.bincount(mat.cols, minlength=n)
    if C >= n:
        hot = np.arange(n, dtype=np.int64)
        C = n
    else:
        hot = np.sort(np.argpartition(counts, n - C)[n - C:])
    is_hot = np.zeros(n, dtype=bool)
    is_hot[hot] = True
    colmap = np.cumsum(is_hot) - 1  # panel position of each hot column
    sel = is_hot[mat.cols]

    dt = jnp.bfloat16 if sched.precision == "bf16" else jnp.float32
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    panel_np = np.zeros((m, C), np.float32)
    np.add.at(panel_np, (mat.rows[sel], colmap[mat.cols[sel]]),
              np.asarray(mat.vals[sel], np.float32))
    panel = jnp.asarray(panel_np, dtype=dt)
    hot_d = jnp.asarray(hot, dtype=jnp.int32)

    rest = CooMatrix(mat.rows[~sel], mat.cols[~sel],
                     np.asarray(mat.vals)[~sel], mat.shape)
    covered = int(sel.sum())
    rest_plan = None
    if rest.nnz:
        rest_sched = (sched.bucket_schedules[0] if sched.bucket_schedules
                      else default_schedule(rest, sched.ktile or 8))
        if sched.ktile is not None:
            rest_sched = dataclasses.replace(rest_sched, ktile=sched.ktile)
        rest_plan = build_plan(mat=rest, sched=rest_sched, interpret=interpret)

    @jax.jit
    def _panel_mm(panel, x):
        xh = jnp.take(x, hot_d, axis=0).astype(dt)
        return jnp.dot(panel, xh, preferred_element_type=jnp.float32,
                       precision=prec)

    if rest_plan is None:
        fn = lambda x: _panel_mm(panel, x)
    else:
        fn = lambda x: _panel_mm(panel, x) + rest_plan(x)

    rest_meta = rest_plan.meta if rest_plan else {"padding_rate": 1.0,
                                                  "format_bytes": 0}
    rest_bytes = int(rest_meta.get("format_bytes", 0))
    if rest_plan and not rest_bytes:
        for f in rest_plan.formats:
            mb = getattr(f, "memory_bytes", 0)
            rest_bytes += mb() if callable(mb) else mb
    # nnz-weighted compute padding: panel-covered nz run at dense-MXU
    # speed (padding 1.0, like the dense family — the HBM cost is carried
    # by format_bytes); only the sparse remainder pads
    pad = ((covered + rest.nnz * float(rest_meta["padding_rate"]))
           / max(mat.nnz, 1))
    return SpmmPlan(
        fn=fn,
        formats=(rest_plan.formats if rest_plan else []),
        shape=mat.shape,
        meta={
            "schedule": sched.describe(), "n_subs": 2 if rest_plan else 1,
            "padding_rate": pad,
            "operator_history": (
                f"hybrid_cols[C={C}, covered={covered}/{mat.nnz}]"
                + (" + " + str(rest_meta.get("operator_history", ""))
                   if rest_plan else "")),
            # the panel is a format: its HBM residency is the trade-off
            "format_bytes": int(panel.size) * panel.dtype.itemsize + rest_bytes,
            "hot_cols": int(C),
            "covered_nnz": covered,
        },
    )


def _build_span_colsplit_plan(mat: CooMatrix, sched: Schedule, interpret) -> SpmmPlan:
    """Column-partitioned span family for large N at small K: the span
    kernel needs X resident in VMEM, so the matrix is split into
    ``col_split`` column ranges by the FixedIntervalColBlockingOperator
    (the reference's col-direction blocking,
    fixed_interval_col_direction_*_blocking_operator @ operator.hpp:727),
    each packed independently; the plan sums the partial products.  Every
    sub-format gathers back to the full output rows, so the sum is a plain
    add."""
    import jax.numpy as jnp

    from tpusparse.kernels.span_gather import pack_span, span_spmm
    from tpusparse.meta.set import create_init_metadata_set
    from tpusparse.ops import FixedIntervalColBlockingOperator, OperatorExecutor

    m, n = mat.shape
    s = max(int(sched.col_split), 2)
    width = -(-n // s)
    # run the actual distributing operator (validity gates + provenance),
    # then consume its emitted column-tile metadata
    ms = create_init_metadata_set(mat)
    ex = OperatorExecutor(ms)
    ex.add_and_run(FixedIntervalColBlockingOperator(0, Level.TBLOCK, width))
    first_nzs = ms.get(Level.TBLOCK, "first_nz_indices", 0)
    col_tiles = ms.get(Level.TBLOCK, "col_tile_indices", 0)
    rows_s, cols_s, vals_s = ms.coo(0)
    fmts, ranges = [], []
    for t in range(len(col_tiles)):
        lo = int(col_tiles[t])
        hi = min(lo + width, n)
        a, b = int(first_nzs[t]), int(first_nzs[t + 1])
        sub = CooMatrix(rows_s[a:b], cols_s[a:b] - lo, vals_s[a:b],
                        (m, hi - lo)).sort_row_major()
        fmts.append(pack_span(sub, rb=sched.rb, ct=min(sched.ct, hi - lo + 8),
                              g=sched.g))
        ranges.append((lo, hi))

    def fn(x):
        y = None
        for fmt, (lo, hi) in zip(fmts, ranges):
            part = span_spmm(fmt, x[lo:hi], ktile=sched.ktile,
                             precision=sched.precision, unroll=sched.unroll,
                             interpret=interpret)
            y = part if y is None else y + part
        return y

    pads = [f.padding_rate for f in fmts]
    return SpmmPlan(
        fn=fn, formats=fmts, shape=mat.shape,
        meta={"schedule": sched.describe(), "n_subs": len(fmts),
              "padding_rate": float(np.mean(pads)) if pads else 1.0,
              "operator_history": (
                  f"fixed_col_blocking[{width}] + span_colsplit[{s}]")},
    )


def build_plan(mat: CooMatrix, sched: Schedule, *, interpret: bool | None = None) -> SpmmPlan:
    if sched.family == "dense":
        return _build_dense_plan(mat, sched)
    if sched.family == "block_ell":
        return _build_block_ell_plan(mat, sched, interpret)
    if sched.family == "span_colsplit":
        return _build_span_colsplit_plan(mat, sched, interpret)
    if sched.family == "hybrid_cols":
        return _build_hybrid_cols_plan(mat, sched, interpret)
    if sched.family == "segment_span":
        from tpusparse.kernels.nnz_split import pack_segment_span, segment_span_spmm

        fmt = pack_segment_span(mat, block_nnz=sched.work_per_block,
                                ct=sched.ct, g=sched.g)

        def seg_fn(x, fmt=fmt):
            return segment_span_spmm(fmt, x, ktile=sched.ktile,
                                     precision=sched.precision,
                                     unroll=sched.unroll, interpret=interpret)

        return SpmmPlan(
            fn=seg_fn, formats=[fmt], shape=mat.shape,
            meta={"schedule": sched.describe(), "n_subs": 1,
                  "padding_rate": fmt.padding_rate,
                  "operator_history": "segment_span"},
        )
    ms = create_init_metadata_set(mat)
    ex = OperatorExecutor(ms)
    out_rows = mat.shape[0]

    if sched.sort:
        ex.add_and_run(SortOperator(0, by=sched.sort_by))

    subs = [0]
    sub_scheds = {0: sched}
    if sched.family == "bucketed" or sched.bucket_bounds:
        div = RowNnzMatrixDivOperator(0, bounds=tuple(sched.bucket_bounds))
        ex.add_and_run(div)
        subs = div.new_sub_ids
        bss = sched.bucket_schedules
        for i, s in enumerate(subs):
            if i < len(bss):
                sub_scheds[s] = bss[i]
            else:
                sub_scheds[s] = dataclasses.replace(
                    sched, family="span_onehot" if sched.family == "bucketed" else sched.family,
                    rb=512 if sched.family == "bucketed" else sched.rb,
                    ct=1024 if sched.family == "bucketed" else sched.ct,
                    bucket_bounds=(), bucket_schedules=(),
                )

    formats, fns = [], []
    for s in subs:
        fmt, fn = _build_sub_plan(ms, ex, s, sub_scheds[s], out_rows, interpret)
        formats.append(fmt)
        fns.append(fn)

    if len(fns) == 1:
        plan_fn = fns[0]
    else:
        def plan_fn(x):
            y = fns[0](x)
            for f in fns[1:]:
                y = y + f(x)
            return y

    pads = [f.padding_rate for f in formats]
    return SpmmPlan(
        fn=plan_fn,
        formats=formats,
        shape=mat.shape,
        meta={
            "schedule": sched.describe(),
            "n_subs": len(subs),
            "padding_rate": float(np.mean(pads)) if pads else 1.0,
            "operator_history": ex.ctx.convert_to_string(),
        },
    )
