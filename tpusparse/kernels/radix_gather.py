"""radix_gather — lane-packed 3-dot one-hot SpMM (the small-K champion).

The span kernel's structural cost is one CT-wide column one-hot plus one
RB-wide row one-hot per chunk: (CT + c*RB) * G MXU cells, with only kt of
128 output lanes carrying data at small K.  This kernel factors both
one-hots through the 128-lane dimension ("radix" decomposition):

  X packing   xp[row // spr, hl*64 + (row % spr)*kt + k]   spr = 64 // kt
              (fp32x2: hi/lo bf16 split shares the lane dim; bf16: spr =
              128 // kt, no hl axis) — spr consecutive X rows share one
              sublane of xp, so a W = S*spr column window needs only S
              sublanes.

  Per chunk (G nz), three dots replace span's two:
    gather    RT (S, G) one-hot of row-GROUP   . x2d (S, 128) -> (128, G)
              contraction S = W/spr instead of span's CT = W: spr x fewer
              MXU cells for the same window.
    collapse  Csum (128, nhl*kt) fixed one-hot . tsel -> xg2 (nhl*kt, G)
              after a VPU select of the in-group slot; recovers x (exact:
              hi+lo sublanes are bf16-exact, the dot moves them to f32).
    scatter   rowhot (rbs, G) one-hot of lrow // ngrp . psel -> (rbs, 128)
              the output row is encoded jointly: sublane = lrow // ngrp,
              lane group = lrow % ngrp (ngrp = 128 // (nhl*kt)), so the
              scatter contracts against rbs = RB/ngrp sublanes instead of
              RB — ngrp x fewer MXU cells AND a ngrp x smaller one-hot
              build.

  Measured on v5e (32k^2 power-law, 1M nnz, K=8 fp32x2): 15.7 GF/s vs the
  span kernel's 8.9 — and K=1 SpMV 1.06 Gnnz/s on 10M nnz vs 0.39 for the
  round-1 span path (span wastes 126/128 lanes at K=1; radix keeps every
  dot full).  See PERF.md for the microbenched cost model.

Numerics: fp32x2 splits the f32 product v*x into hi/lo bf16 AFTER the
multiply (single rounding), then recombines in f32 — ~2e-3-class like the
other fp32x2 kernels.  bf16 mode rounds the product once to bf16
(reference HALF tolerance class, 1e-2).

X must be VMEM-resident: xp is (N/spr, 128) bf16 per K-tile = N*kt*4
bytes (fp32x2) — the same footprint gate as span_onehot.

K > kt tiles run on a grid axis; ``radix_spmm(..., ktin=)`` can instead
process several K-tiles inside one program, sharing the chunk DMA and
every one-hot/mask build and fusing the scatter into one wide dot.
Measured neutral-to-negative on v5e (see max_ktin) — the VLIW pipeline
already hides the shared work — so auto keeps ktin=1.

Reference counterpart: the interleaved/ELL storage family
(interlance_storage_operator, data_transform_step.hpp:1597-1693) — the
lane packing IS an interleave: spr consecutive rows of X are stored
staggered in one 128-lane word so one load feeds spr rows, which is the
TPU equivalent of "consecutive threads read consecutive addresses".
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusparse.kernels.common import (_split_bf16, cdiv,
                                      kernel_backend_interpret,
                                      pad_dense_rows, round_up)

PRECISIONS = ("fp32x2", "bf16")
RADIX_KTS = (1, 2, 4, 8, 16, 32)


def choose_kt(k: int) -> int:
    """Smallest supported K-tile covering k (64/kt lanes must hold >= 2
    X rows for the packing to beat span)."""
    for kt in RADIX_KTS:
        if k <= kt:
            return kt
    return 32


def radix_geometry(kt: int, mode: str) -> tuple[int, int, int]:
    """(spr, nhl, ngrp): X rows per sublane, hi/lo planes, output lane
    groups."""
    assert kt in RADIX_KTS, f"kt={kt} not in {RADIX_KTS}"
    assert mode in PRECISIONS, mode
    nhl = 2 if mode == "fp32x2" else 1
    spr = 128 // (nhl * kt)
    ngrp = 128 // (nhl * kt)
    return spr, nhl, ngrp


@dataclasses.dataclass
class RadixFormat:
    """Span-chunked format with window starts aligned to 8*spr rows.

    Arrays (P programs, NC chunks, G nz each), all lane-major:
      c0    [P, 1, NC] int32  window start column (multiple of 8*spr)
      cols  [P, NC, G] int32  column offset within the window (< S*spr)
      lrow  [P, NC, G] int32  row local to the program (< RB)
      vals  [P, NC, G] f32
      nc_p  [P, 1, 1]  int32  REAL chunk count per program (diagnostic:
                              sum(nc_p)*G/nnz is the compute-padding rate;
                              the kernel keeps STATIC loop bounds — see the
                              pipelining note in _radix_kernel)
      slot_of_origrow [M] int32
    """

    c0: Any
    cols: Any
    lrow: Any
    vals: Any
    nc_p: Any
    slot_of_origrow: Any
    n_programs: int
    n_chunks: int
    chunk_g: int
    rb: int
    S: int
    kt: int
    mode: str
    shape: tuple[int, int]
    nnz_real: int
    perm_of_nz: Any = None
    # how output rows map back to original rows (verified at pack time):
    #   'blocks'    slot == row               -> y_rows[:m], no gather
    #   'index'     slot == (r%P)*rb + r//P   -> reshape+transpose, no gather
    #   'arbitrary' anything else             -> jnp.take through slot map
    # measured at the 32k headline: XLA overlaps the 'arbitrary' gather
    # with the kernel, so 'length' dealing (best balance) + gather beats
    # the affine deals (see pack_radix docstring); affine stays available
    # for callers that need a gather-free output (e.g. fori_loop bodies)
    deal: str = "arbitrary"

    @property
    def padding_rate(self) -> float:
        return self.n_programs * self.n_chunks * self.chunk_g / max(self.nnz_real, 1)

    @property
    def memory_bytes(self) -> int:
        return sum(np.asarray(a).nbytes
                   for a in (self.c0, self.cols, self.lrow, self.vals))

    @property
    def window(self) -> int:
        spr, _, _ = radix_geometry(self.kt, self.mode)
        return self.S * spr


def pack_radix(
    mat_or_ms,
    sub: int = 0,
    *,
    out_rows: int | None = None,
    rb: int = 1024,
    S: int = 128,
    g: int = 512,
    kt: int = 8,
    mode: str = "fp32x2",
    balance: bool = True,
    deal: str | None = None,
    keep_perm: bool = False,
) -> RadixFormat:
    """Pack into RadixFormat.  Reuses the span dealing+chunking machinery
    (native or numpy) with the window budget shrunk by the 8*spr
    alignment, then realigns each chunk's c0 down to the alignment
    boundary (padding cols stay < W, their vals are 0).

    ``deal`` picks the row->program assignment: 'length' (sorted-by-length
    round-robin, best nnz balance, output needs a row gather), 'index'
    (round-robin by row index: slot = (r%P)*rb + r//P, output unpermutes
    with a free reshape+transpose), 'blocks' (contiguous row blocks, no
    unpermute at all), or None = auto: 'length' when multi-program,
    'blocks' single-program or ``balance=False``.  Measured on the 32k
    power-law headline (interleaved min-of-4): 'length' 599 us vs 'index'
    741 us — the per-program chunk straggler under index dealing (42 vs
    33 chunks) costs more than the output row-gather it avoids (XLA
    overlaps the gather with the kernel; removing it alone changed
    nothing: 796 vs 786 us)."""
    from tpusparse.io.mtx import CooMatrix
    from tpusparse.kernels.span_gather import span_chunk_numpy
    from tpusparse.levels import Level

    spr, nhl, ngrp = radix_geometry(kt, mode)
    align = 8 * spr
    W = S * spr
    assert rb % ngrp == 0, f"rb={rb} must be a multiple of ngrp={ngrp}"
    assert W > align, f"window S*spr={W} must exceed the alignment {align}"

    if isinstance(mat_or_ms, CooMatrix):
        rows = mat_or_ms.rows.astype(np.int64)
        cols = mat_or_ms.cols.astype(np.int64)
        vals = np.asarray(mat_or_ms.vals)
        row_num, col_num = mat_or_ms.shape
        rec = np.arange(row_num, dtype=np.int64)
        if out_rows is None:
            out_rows = row_num
    else:
        ms = mat_or_ms
        rows, cols, vals = ms.coo(sub)
        rows = rows.astype(np.int64)
        cols = cols.astype(np.int64)
        row_num = ms.row_num(sub)
        col_num = ms.col_num(sub)
        if ms.has(Level.ROW, "original_row_of_sorted", sub):
            rec = ms.get(Level.ROW, "original_row_of_sorted", sub)[:row_num]
        else:
            rec = np.arange(row_num, dtype=np.int64)
        assert out_rows is not None

    p_count = max(-(-row_num // rb), 1)
    # native/numpy chunkers align c0 to 8; leave headroom so the realign
    # to 8*spr below never pushes a column past the window
    span_budget = W - align

    if deal is None:
        deal = "length" if (balance and p_count > 1) else "blocks"
    assert deal in ("length", "index", "blocks"), deal

    if deal == "length" and row_num:
        lengths = np.bincount(rows, minlength=row_num)
        by_len = np.argsort(-lengths, kind="stable")
        p_of_row = np.empty(row_num, dtype=np.int64)
        lrow_of_row = np.empty(row_num, dtype=np.int64)
        ranks = np.arange(row_num)
        p_of_row[by_len] = ranks % p_count
        lrow_of_row[by_len] = ranks // p_count
        p_arr = p_of_row[rows]
        lrow_arr = lrow_of_row[rows]
        slot_of_local = p_of_row * rb + lrow_of_row
    elif deal == "index" and row_num:
        p_arr = rows % p_count
        lrow_arr = rows // p_count
        r = np.arange(row_num)
        slot_of_local = (r % p_count) * rb + r // p_count
    else:
        p_arr = rows // rb
        lrow_arr = rows % rb
        slot_of_local = (np.arange(row_num) // rb) * rb + np.arange(row_num) % rb
    order = np.lexsort((cols, p_arr))
    lrow_s, cols_s, vals_s = lrow_arr[order], cols[order], np.asarray(vals)[order]
    starts = np.searchsorted(p_arr[order], np.arange(p_count + 1))

    from tpusparse import native

    packed = None
    dest_sorted = None
    if native.available():
        packed = native.span_pack(cols_s, lrow_s, vals_s, starts, g,
                                  span_budget, want_dest=keep_perm)
    if packed is not None:
        if keep_perm:
            c0_2d, cols_f, lrow_f, vals_f, nc_arr, dest_sorted = packed
        else:
            c0_2d, cols_f, lrow_f, vals_f, nc_arr = packed
    else:
        c0_2d, cols_f, lrow_f, vals_f, dest_sorted, nc_arr = span_chunk_numpy(
            cols_s, lrow_s, vals_s, starts, g, span_budget, keep_perm=keep_perm
        )
    # realign window starts from the chunkers' 8 to 8*spr
    delta = (c0_2d % align).astype(np.int32)
    c0_2d = c0_2d - delta
    cols_f = cols_f + delta[:, :, None]
    nc = c0_2d.shape[1]

    slot_of_origrow = np.full(out_rows, -1, dtype=np.int32)
    keep = rec >= 0
    slot_of_origrow[rec[keep]] = slot_of_local[keep].astype(np.int32)

    # verify the affine unpack actually holds for the original row space
    # (a metadata-set sort permutes rec and breaks it -> gather fallback).
    # Rows with slot -1 (empty / absent) are fine iff their affine slot is
    # unoccupied: the scatter one-hot never writes there, so it reads 0.
    def _affine_ok(aff):
        if out_rows > p_count * rb:
            return False
        got = slot_of_origrow >= 0
        if not np.array_equal(slot_of_origrow[got], aff[got]):
            return False
        occ = np.zeros(p_count * rb, dtype=bool)
        occ[slot_of_origrow[got]] = True
        return not occ[aff[~got]].any()

    unpack = "arbitrary"
    ar = np.arange(out_rows, dtype=np.int64)
    if deal == "blocks" and _affine_ok(ar):
        unpack = "blocks"
    elif deal == "index" and _affine_ok((ar % p_count) * rb + ar // p_count):
        unpack = "index"

    return RadixFormat(
        c0=jnp.asarray(c0_2d[:, None, :]),
        cols=jnp.asarray(cols_f),
        lrow=jnp.asarray(lrow_f),
        vals=jnp.asarray(vals_f, dtype=jnp.float32),
        nc_p=jnp.asarray(np.asarray(nc_arr, np.int32).reshape(p_count, 1, 1)),
        slot_of_origrow=jnp.asarray(slot_of_origrow),
        n_programs=p_count,
        n_chunks=nc,
        chunk_g=g,
        rb=rb,
        S=S,
        kt=kt,
        mode=mode,
        shape=(out_rows, col_num),
        nnz_real=int(np.count_nonzero(vals_f)),
        perm_of_nz=(None if dest_sorted is None
                    else np.asarray(dest_sorted)[np.argsort(order, kind="stable")]),
        deal=unpack,
    )


def pack_brick_ell(
    ms,
    sub: int = 0,
    *,
    out_rows: int,
    rb: int = 1024,
    S: int = 128,
    g: int = 512,
    kt: int = 8,
    mode: str = "fp32x2",
) -> RadixFormat:
    """Brick-ELL packing: chunk nz in their STORED (ELL-padded, interleaved)
    order instead of column-sorted order — the reference's headline layout
    (col-pad-parent-to-max + interlance storage,
    data_transform_step.hpp:1385-1693), mapped to the radix kernel so the
    layout question is isolated with the kernel held constant.

    Expects the metadata set to have been run through SortOperator (length)
    + FixedIntervalRowBlockingOperator(8) + EllBlockPadOperator +
    InterleaveStorageOperator; programs are ``rb`` CONTIGUOUS sorted rows
    (bricks of 8 padded rows nest inside).  Chunks are cut greedily in
    storage order whenever the chunk's column RANGE exceeds the radix
    window or the count hits G — on matrices whose bricks touch scattered
    columns this shows up directly as chunk-count/padding inflation, which
    is the measured head-to-head vs span chunking (VERDICT r1 #1)."""
    from tpusparse.levels import Level

    spr, nhl, ngrp = radix_geometry(kt, mode)
    align = 8 * spr
    W = S * spr
    assert rb % ngrp == 0 and rb % 8 == 0
    budget = W - align

    rows, cols, vals = ms.coo(sub)  # storage order = interleaved ELL
    rows = rows.astype(np.int64)
    cols = cols.astype(np.int64)
    row_num = ms.row_num(sub)
    col_num = ms.col_num(sub)
    if ms.has(Level.ROW, "original_row_of_sorted", sub):
        rec = ms.get(Level.ROW, "original_row_of_sorted", sub)[:row_num]
    else:
        rec = np.arange(row_num, dtype=np.int64)

    p_count = max(-(-row_num // rb), 1)
    # deal BRICKS (8 length-sorted rows) round-robin to programs — the
    # reference's grid-stride work distribution; within-brick interleave
    # order is preserved by the stable sort
    brick_of_nz = rows // 8
    p_of_brick_all = np.arange(-(-row_num // 8) + 1, dtype=np.int64) % p_count
    slot_of_brick_all = np.arange(-(-row_num // 8) + 1, dtype=np.int64) // p_count
    p_of_nz = p_of_brick_all[brick_of_nz]
    order = np.argsort(p_of_nz, kind="stable")
    rows_s, cols_s, vals_s = rows[order], cols[order], np.asarray(vals)[order]
    lrow_s = slot_of_brick_all[rows_s // 8] * 8 + rows_s % 8
    starts = np.searchsorted(p_of_nz[order], np.arange(p_count + 1))

    chunks: list[list[tuple[int, int, int]]] = [[] for _ in range(p_count)]
    for p in range(p_count):
        lo, hi = int(starts[p]), int(starts[p + 1])
        i = lo
        while i < hi:
            cmin = cmax = int(cols_s[i])
            j = i + 1
            while j < hi and j - i < g:
                c = int(cols_s[j])
                nmin, nmax = min(cmin, c), max(cmax, c)
                if nmax - nmin > budget:
                    break
                cmin, cmax = nmin, nmax
                j += 1
            chunks[p].append((cmin & ~(align - 1), i, j))
            i = j

    nc = max(max((len(c) for c in chunks), default=1), 1)
    c0_2d = np.zeros((p_count, nc), dtype=np.int32)
    cols_f = np.zeros((p_count, nc, g), dtype=np.int32)
    lrow_f = np.zeros((p_count, nc, g), dtype=np.int32)
    vals_f = np.zeros((p_count, nc, g), dtype=np.float32)
    for p in range(p_count):
        for ci, (c0, i, j) in enumerate(chunks[p]):
            n = j - i
            c0_2d[p, ci] = c0
            cols_f[p, ci, :n] = cols_s[i:j] - c0
            lrow_f[p, ci, :n] = lrow_s[i:j]
            vals_f[p, ci, :n] = vals_s[i:j]

    slot_of_origrow = np.full(out_rows, -1, dtype=np.int32)
    keep = rec >= 0
    local = np.arange(row_num, dtype=np.int64)
    slot_local = (p_of_brick_all[local // 8] * rb
                  + slot_of_brick_all[local // 8] * 8 + local % 8)
    slot_of_origrow[rec[keep]] = slot_local[keep].astype(np.int32)

    return RadixFormat(
        c0=jnp.asarray(c0_2d[:, None, :]),
        cols=jnp.asarray(cols_f),
        lrow=jnp.asarray(lrow_f),
        vals=jnp.asarray(vals_f),
        nc_p=jnp.asarray(np.asarray([len(c) for c in chunks],
                                    np.int32).reshape(p_count, 1, 1)),
        slot_of_origrow=jnp.asarray(slot_of_origrow),
        n_programs=p_count,
        n_chunks=nc,
        chunk_g=g,
        rb=rb,
        S=S,
        kt=kt,
        mode=mode,
        shape=(out_rows, col_num),
        nnz_real=int(np.count_nonzero(vals_f)),
    )


def with_values(fmt: RadixFormat, new_vals) -> RadixFormat:
    """Values-only update (same pattern; requires pack_radix(keep_perm=True))."""
    assert fmt.perm_of_nz is not None, "pack_radix(..., keep_perm=True) required"
    new_vals = np.asarray(new_vals, dtype=np.float32)
    flat = np.zeros(fmt.n_programs * fmt.n_chunks * fmt.chunk_g, dtype=np.float32)
    flat[np.asarray(fmt.perm_of_nz)] = new_vals
    vals = flat.reshape(fmt.n_programs, fmt.n_chunks, fmt.chunk_g)
    return dataclasses.replace(
        fmt,
        vals=jnp.asarray(vals),
        nnz_real=int(np.count_nonzero(vals)),
    )


def _radix_kernel(c0_ref, cols_ref, lrow_ref, vals_ref, xp_ref, y_ref, *,
                  nc, g, rbs, ngrp, S, kt, mode, unroll, ktin=1):
    spr, nhl, _ = radix_geometry(kt, mode)
    bf16, f32 = jnp.bfloat16, jnp.float32
    iota_S = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    iota_rbs = jax.lax.broadcasted_iota(jnp.int32, (rbs, 1), 0)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    lane_slot = (lane128 % (spr * kt)) // kt   # gather layout: (hl, slot, k)
    lane_grp = lane128 // (nhl * kt)           # scatter layout: (grp, hl, k)
    # Two collapse formulations (same math, different intermediate shapes):
    #   nhl*kt >= 8  collapse to (nhl*kt, G), multiply/split there, tile to
    #                (128, G) — least VPU work (benches fastest at kt=8)
    #   nhl*kt < 8   sub-8-sublane intermediates make Mosaic's compile time
    #                explode (459 s at kt=1); instead collapse straight to
    #                the scatter layout with a (128, 128) matrix that folds
    #                hi/lo AND broadcasts x across (grp, hl) slots, keeping
    #                every shape at the full 128 sublanes (compiles in
    #                seconds, slightly more VPU work)
    wide = nhl * kt >= 8
    if wide:
        j_of_lane = (lane128 // (spr * kt)) * kt + lane128 % kt
        iota_j = jax.lax.broadcasted_iota(jnp.int32, (1, nhl * kt), 1)
        Csum = (j_of_lane == iota_j).astype(bf16)  # (128, nhl*kt)
    else:
        k_in = lane128 % kt
        k_out = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) % kt
        Cb = (k_in == k_out).astype(bf16)          # (128, 128)
        hl_sub = (lane128 // kt) % nhl             # scatter-layout hi/lo

    def chunk(j, acc):
        # shared across the ktin K-tiles: chunk DMA (cols/lrow/vals read
        # ONCE instead of per tile) and every one-hot/mask VPU build — only
        # the three dots + the product/select scale with ktin
        r0 = pl.multiple_of(c0_ref[0, 0, j] // spr, 8)
        colw = cols_ref[0, pl.ds(j, 1), :]     # (1, G)
        lrow = lrow_ref[0, pl.ds(j, 1), :]
        v = vals_ref[0, pl.ds(j, 1), :]
        sub = colw // spr
        slot = colw % spr
        RT = (iota_S == sub).astype(bf16)      # (S, G) row-group one-hot
        slot_mask = lane_slot == slot          # (128, G)
        grp = lrow % ngrp
        rhi = lrow // ngrp
        grp_mask = lane_grp == grp             # (128, G)
        rowhot = (iota_rbs == rhi).astype(bf16)           # (rbs, G)

        parts = []
        for ti in range(ktin):
            x2d = xp_ref[ti, pl.ds(r0, S), :]  # (S, 128)
            tmpT = jax.lax.dot_general(
                x2d, RT, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32)    # (128, G)
            tsel = jnp.where(slot_mask, tmpT, 0.0).astype(bf16)
            if wide:
                xg2 = jax.lax.dot_general(
                    Csum, tsel, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=f32)    # (nhl*kt, G)
                if mode == "fp32x2":
                    xg = xg2[:kt, :] + xg2[kt:, :]  # exact x recomposition
                    p = xg * v
                    phi, plo = _split_bf16(p)       # single rounding of v*x
                    c2 = jnp.concatenate([phi, plo], axis=0)   # (2kt, G)
                else:
                    c2 = (xg2 * v).astype(bf16)     # (kt, G)
                psel_pre = jnp.concatenate([c2] * ngrp, axis=0)  # (128, G)
            else:
                xb = jax.lax.dot_general(
                    Cb, tsel, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=f32)    # (128, G): x at every slot
                pb = xb * v                        # f32 product, single rounding
                if mode == "fp32x2":
                    phi, plo = _split_bf16(pb)
                    psel_pre = jnp.where(hl_sub == 0, phi, plo)
                else:
                    psel_pre = pb.astype(bf16)
            parts.append(jnp.where(grp_mask, psel_pre, bf16(0)))
        # one wide scatter dot covers all tiles: (rbs, G).(ktin*128, G)^T
        psel = parts[0] if ktin == 1 else jnp.concatenate(parts, axis=0)
        return acc + jax.lax.dot_general(
            rowhot, psel, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    # STATIC loop bounds: a dynamic per-program trip count (nc_p in SMEM)
    # was measured 30% SLOWER — it defeats Mosaic's software pipelining of
    # the chunk DMAs, which outweighs skipping the ~7% uniform-NC tail.
    # nc_p stays in the format as the honest compute-padding diagnostic.
    if unroll > 1:
        def body(i, accs):
            return tuple(chunk(i * unroll + u, accs[u]) for u in range(unroll))
        accs = jax.lax.fori_loop(0, nc // unroll, body,
                                 tuple(jnp.zeros((rbs, ktin * 128), f32) for _ in range(unroll)))
        acc = functools.reduce(jnp.add, accs)
        for r in range((nc // unroll) * unroll, nc):
            acc = chunk(r, acc)
    else:
        acc = jax.lax.fori_loop(0, nc, chunk, jnp.zeros((rbs, ktin * 128), f32))
    y_ref[0, 0, :, :] = acc


def pack_x_radix(x, mode: str, kt: int):
    """Pack padded X (rows multiple of 8*spr, cols multiple of kt) into the
    lane layout: (kt_count, N/spr, 128).

    The target lane index hl*64 + (row%spr)*kt + k is ROW-MAJOR in
    (row%spr, k), so each K-tile packs as a plain reshape (lane merge)
    plus one lane concat for the hi/lo halves — no element transpose.
    The original 5D-transpose formulation measured 285 us at the 32k
    headline (a third of the whole call); this one is a relayout XLA
    handles natively."""
    n, k = x.shape
    spr, nhl, _ = radix_geometry(kt, mode)
    kt_count = k // kt
    if mode == "fp32x2":
        xh, xl = _split_bf16(x)

        def tile(t):
            h = xh[:, t * kt:(t + 1) * kt].reshape(n // spr, 64)
            lo = xl[:, t * kt:(t + 1) * kt].reshape(n // spr, 64)
            return jnp.concatenate([h, lo], axis=1)

        xp = jnp.stack([tile(t) for t in range(kt_count)], 0)
    else:
        xb = x.astype(jnp.bfloat16)
        xp = jnp.stack([xb[:, t * kt:(t + 1) * kt].reshape(n // spr, 128)
                        for t in range(kt_count)], 0)
    return xp


@functools.partial(
    jax.jit,
    static_argnames=("n_programs", "nc", "g", "rb", "S", "kt", "mode",
                     "unroll", "ktin", "interpret"),
)
def _radix_call(c0, cols3, lrow3, vals3, x, *, n_programs, nc, g, rb,
                S, kt, mode, unroll, ktin, interpret):
    spr, nhl, ngrp = radix_geometry(kt, mode)
    rbs = rb // ngrp
    kt_count = x.shape[1] // kt
    assert kt_count % ktin == 0, (kt_count, ktin)
    ktg = kt_count // ktin
    xp = pack_x_radix(x, mode, kt)
    nr = xp.shape[1]
    u = unroll if unroll > 1 else 1
    kernel = functools.partial(_radix_kernel, nc=nc, g=g, rbs=rbs, ngrp=ngrp,
                               S=S, kt=kt, mode=mode, unroll=u, ktin=ktin)
    out = pl.pallas_call(
        kernel,
        grid=(n_programs, ktg),
        out_shape=jax.ShapeDtypeStruct((n_programs, ktg, rbs, ktin * 128),
                                       jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 1, nc), lambda p, t: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nc, g), lambda p, t: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, g), lambda p, t: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, g), lambda p, t: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ktin, nr, 128), lambda p, t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, rbs, ktin * 128), lambda p, t: (p, t, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(c0, cols3, lrow3, vals3, xp)
    # out lanes within a tile: (grp, hl, k); row = rhi*ngrp + grp, sum hl
    y = out.reshape(n_programs, ktg, rbs, ktin, ngrp, nhl, kt)
    if nhl == 2:
        y = y[..., 0, :] + y[..., 1, :]
    else:
        y = y[..., 0, :]
    # (P, Tg, rbs, ktin, ngrp, kt) -> (P, rbs, ngrp, Tg, ktin, kt) -> (P*rb, K)
    y = y.transpose(0, 2, 4, 1, 3, 5)
    return y.reshape(n_programs * rb, kt_count * kt)


def max_ktin(fmt: RadixFormat, kt_count: int, unroll: int) -> int:
    """Largest legal inner K-tile count: divides kt_count, keeps the
    resident xp block + chunk blocks within the VMEM budget, keeps the
    unrolled kernel body from blowing up Mosaic compile time, and stays
    on the wide-collapse formulation (the narrow one is kt<4 fp32x2 /
    kt<8 bf16, where kt_count>1 is not a tuned regime).

    NOTE auto stays at ktin=1: sharing the chunk DMA + one-hot builds
    across inner tiles was measured NEUTRAL-TO-NEGATIVE on v5e (K=32
    powerlaw 16k²: kt=8 ktin=4 18.1 vs ktin=1 18.9 GF/s; K=64 kt=32
    ktin=2 27.1 vs 28.9; one +9% case on a denser 32k matrix) — the VLIW
    pipeline already overlaps the VPU builds with the MXU dots, so the
    savings don't materialize while the wider scatter grows the working
    set.  The knob is kept for explicit use; callers pass ktin=."""
    spr, nhl, _ = radix_geometry(fmt.kt, fmt.mode)
    if nhl * fmt.kt < 8 or kt_count == 1:
        return 1
    n_pad = round_up(fmt.shape[1] + fmt.window, 8 * spr)
    xp_tile_bytes = (n_pad // spr) * 128 * 2
    chunk_bytes = fmt.n_chunks * fmt.chunk_g * 12
    best = 1
    for cand in (2, 4, 8):
        if kt_count % cand:
            continue
        if cand * xp_tile_bytes + chunk_bytes > 8 * 1024 * 1024:
            continue
        if cand * max(unroll, 1) > 16:  # kernel body replicas
            continue
        best = cand
    return best


def radix_spmm(
    fmt: RadixFormat,
    x: jnp.ndarray,
    *,
    unroll: int = 4,
    ktin: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Y[M, K] = A . X[N, K] with A in RadixFormat (kt/mode fixed at pack
    time; K > kt runs kt-wide tiles ``ktin`` at a time inside each program
    — sharing the chunk DMA and every one-hot build across the inner tiles
    — with the remaining tile groups on a grid axis)."""
    if interpret is None:
        interpret = kernel_backend_interpret()
    m, n_cols = fmt.shape
    k = x.shape[1]
    assert x.shape[0] == n_cols
    kt = fmt.kt
    spr, _, _ = radix_geometry(kt, fmt.mode)
    if k % kt:
        x = jnp.pad(x, ((0, 0), (0, kt - k % kt)))
    kt_count = x.shape[1] // kt
    if ktin is None:
        ktin = 1  # measured best default; see max_ktin for the evidence
    else:
        ktin = min(ktin, max_ktin(fmt, kt_count, unroll))
    if kt_count % ktin:
        ktin = 1
    # window [c0, c0+W) may read past N; rows must also hit 8*spr alignment
    x = pad_dense_rows(x.astype(jnp.float32),
                       round_up(n_cols + fmt.window, 8 * spr))
    y_rows = _radix_call(
        fmt.c0, fmt.cols, fmt.lrow, fmt.vals, x,
        n_programs=fmt.n_programs, nc=fmt.n_chunks, g=fmt.chunk_g,
        rb=fmt.rb, S=fmt.S, kt=kt, mode=fmt.mode, unroll=unroll, ktin=ktin,
        interpret=interpret,
    )
    if fmt.deal == "blocks":
        y = y_rows[:m]
    elif fmt.deal == "index":
        # slot = (r%P)*rb + r//P: invert with a free reshape+transpose
        P = fmt.n_programs
        y = (y_rows.reshape(P, fmt.rb, y_rows.shape[1])
             .transpose(1, 0, 2).reshape(P * fmt.rb, -1)[:m])
    else:
        slot = jnp.asarray(fmt.slot_of_origrow)
        oob = y_rows.shape[0]
        slot = jnp.where(slot < 0, oob, slot)
        y = jnp.take(y_rows, slot, axis=0, mode="fill", fill_value=0)
    return y[:, :k]
