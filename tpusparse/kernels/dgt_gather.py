"""dgt_gather — tile-pure-window dynamic-gather SpMM (dg v2).

Attacks the two measured VPU walls of dg_gather (PERF.md: per 2048-nz chunk
~190 vreg-ops of gather/selects and ~1000 of scatter mask builds):

  1. PER-TILE WINDOW PAIRS.  dg keeps a per-chunk window of ns 128-column
     tiles and selects among them per nz (ns gathers + ns compares + ns
     wheres per 128-lane tile).  dgt constrains every 128-lane tile of a
     chunk to at most TWO 128-column windows of X, chosen per tile by two
     scalars read from SMEM, with a 1-bit selector packed into bit 7 of the
     col plane: two dynamic-sublane slices of the resident X, two
     lane-gathers and one select per tile — no ns-way tree.  (One window
     per tile was measured first: the tail of every (program, window) run
     rounds up to 128 slots and fill drops to 0.74 on the 32k power-law
     headline; allowing a second window lets the greedy walk cross one run
     boundary per tile and fill recovers to 0.99.)

  2. STATIC RESIDUE SCATTER.  dg rebuilds the (128, G) group mask
     ``lane_grp == lrow % ngrp`` every chunk although lrow is pack-time
     constant.  dgt assigns each nz a lane slot with
     ``slot % ngrp == lrow % ngrp`` (every tile holds 128/ngrp slots per
     residue class), which turns the group mask into a loop-invariant
     pattern of iotas — the per-chunk i32 compare disappears.  The row
     one-hot keeps its dynamic compare but its operand is streamed
     pre-divided (lrow // ngrp), and with the residue fixed the correctness
     argument is: a slot of class c only ever carries a row with
     lrow % ngrp == c, so masking psel by the static class pattern routes
     every product to exactly its (row-hi, class) cell.

Measured v5e (32k^2 power-law 1M nnz, K=8 fp32x2): see PERF.md / bench.py —
this family exists because the dg headline (47.7 GF/s) was shown to be
VPU-mask-bound, not gather- or HBM-bound.

Reference counterpart: the generated inner nz loop with vectorized Load()
(total_BMT_result_reduce_to_one_register_token.cc:643-806); the pack-time
residue/window constraints play the role the reference's interleave +
padding operators play for GPU coalescing (operator.hpp:567, :598).
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
                                      pad_dense_rows)
from tpusparse.kernels.dg_gather import PRECISIONS, choose_kt_dg

DGT_KTS = (8, 16, 32)


def dgt_geometry(kt: int, mode: str) -> tuple[int, int]:
    """(nhl, ngrp): hi/lo planes and output lane groups."""
    assert kt in DGT_KTS, f"kt={kt} not in {DGT_KTS}"
    assert mode in PRECISIONS, mode
    nhl = 2 if mode == "fp32x2" else 1
    assert nhl * kt >= 8, (kt, mode)
    return nhl, 128 // (nhl * kt)


@dataclasses.dataclass
class DgtFormat:
    """Tile-pair-window chunked format (P programs, NC chunks, G nz,
    T = G/128 tiles per chunk, nw windows per tile):
      wins [P, NC, nw*T] int32  window tiles (col // 128) of each lane tile
      cols [P, NC, G] int32  lane within the window (col % 128) | sel << 7
      lrw  [P, NC, G] int32  resid: vrow // ngrp; else local virtual row
      vals [P, NC, G] f32
      nc_p [P, 1, 1]  int32  real chunk count (compute-padding diagnostic)
      slot_of_origrow [M] int32  PYRAMID index of each original row: heavy
                rows are split into 1/2/4/8 virtual rows (the nnz-direction
                blocking idea, operator.hpp:906) whose slots are CONSECUTIVE
                and size-aligned, so Y recovers every row with ONE gather
                from the concatenated pairwise-sum pyramid
                [y; fold2(y); fold4(y); fold8(y)] — measured: a chain of S
                row-gathers costs ~40 us per 32k rows each on v5e, the
                pyramid folds are 3 vector adds
    """

    wins: Any
    cols: Any
    lrw: Any
    vals: Any
    nc_p: Any
    slot_of_origrow: Any
    n_programs: int
    n_chunks: int
    chunk_g: int
    rb: int
    kt: int
    mode: str
    resid: bool
    nw: int
    shape: tuple[int, int]
    nnz_real: int
    split_levels: int = 1              # max pieces per row (1/2/4/8)
    perm_of_nz: Any = None
    deal: str = "arbitrary"

    @property
    def padding_rate(self) -> float:
        return self.n_programs * self.n_chunks * self.chunk_g / max(self.nnz_real, 1)

    @property
    def memory_bytes(self) -> int:
        return sum(np.asarray(a).nbytes
                   for a in (self.wins, self.cols, self.lrw, self.vals))


def auto_rb_dgt(m: int, n: int, nnz: int, *, nw: int = 4,
                ngrp: int = 8) -> int:
    """Rows-per-program for a target tile fill: a tile holds nz from an
    nw-consecutive-window span of ONE program, so programs must be few
    enough that nnz / (P * nwin) * nw ~ 1.5 * 128 (measured: rb=256 on a
    262k^2 40-avg matrix leaves ~19 nz per span -> pad 7.1; the 32k
    headline at the same rb fills fine).  Larger rb raises the row one-hot
    cost (rbs = rb/ngrp sublanes), so this is a floor-filling heuristic,
    not a universal optimum — the tuner sweeps around it."""
    nwin = max(-(-n // 128), 1)
    p = max(1, int(nnz * nw // (192 * nwin)))
    rb = max(256, -(-m // p))
    rb = -(-rb // (8 * ngrp)) * (8 * ngrp)
    return min(rb, 8192)


def _rank_within_groups(key: np.ndarray) -> np.ndarray:
    """rank of each element within its equal-key group (stable)."""
    n = key.size
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    ord2 = np.argsort(key, kind="stable")
    sk = key[ord2]
    new_grp = np.empty(n, dtype=bool)
    new_grp[0] = True
    np.not_equal(sk[1:], sk[:-1], out=new_grp[1:])
    grp_id = np.cumsum(new_grp) - 1
    first_pos = np.flatnonzero(new_grp)
    rank_sorted = np.arange(n, dtype=np.int64) - first_pos[grp_id]
    rank = np.empty(n, dtype=np.int64)
    rank[ord2] = rank_sorted
    return rank


def _dgt_fill(order, b_s, cols, lrow_arr, vals, gtile, pos, sel, cls_s,
              wins_b, wins_t, wins_w, tot_tiles, *, n_buckets, ngrp, cap, T,
              g, resid):
    """Shared walk tail: turn per-sorted-nz (tile, pos, sel) assignments into
    the device arrays (col plane encodes lane | sel<<7).

    A wide-span encoding (span-local index sel*128+lane, ONE take_along_axis
    over the tile's nw*128-lane slice) was built and REFUTED at the Mosaic
    level: the TPU gather lowering requires indices.shape == operand.shape
    (lowering.py _gather_lowering_rule), i.e. a lane gather cannot cross the
    128-lane register — verified on v5e.  The kernel's per-window
    gather+select tree is the hardware-shaped formulation."""
    nc_arr = np.maximum(-(-tot_tiles // T), 1)
    nc = max(int(nc_arr.max()) if n_buckets else 1, 1)
    lane = cls_s + ngrp * pos if resid else pos
    chunk = gtile // T
    slot = (gtile % T) * 128 + lane

    wins_flat = np.zeros(n_buckets * nc * T, dtype=np.int32)
    if len(wins_t):
        wins_flat[np.asarray(wins_b) * nc * T + np.asarray(wins_t)] = \
            np.asarray(wins_w, dtype=np.int32)
    wins_f = wins_flat.reshape(n_buckets, nc, T)

    cols_f = np.zeros((n_buckets, nc, g), dtype=np.int32)
    lrw_f = np.zeros((n_buckets, nc, g), dtype=np.int32)
    vals_f = np.zeros((n_buckets, nc, g), dtype=np.float32)
    flat = (b_s * nc + chunk) * g + slot
    cols_f.reshape(-1)[flat] = ((cols[order] % 128) | (sel << 7)).astype(np.int32)
    lrw_s = lrow_arr[order]
    lrw_f.reshape(-1)[flat] = ((lrw_s // ngrp) if resid else lrw_s).astype(np.int32)
    vals_f.reshape(-1)[flat] = vals[order].astype(np.float32)
    return wins_f, cols_f, lrw_f, vals_f, nc_arr, flat, order


def _dgt_walk_multi(bucket_arr, cols, lrow_arr, vals, *, n_buckets, col_span,
                    ngrp, cap, T, g, nw, resid, max_open=8):
    """Round-4 walk (VERDICT r3 #1b): tile runs close across MANY window
    boundaries.  The single-open walk abandons a tile's leftover per-class
    room the moment a fresh tile is created; here every tile with free room
    stays open while its window base is still within nw reach of the
    current run, so later windows' overflow classes top up earlier tiles.
    Measured effect on the 32k power-law headline: pack padding
    1.42 -> see PERF.md round-4 table."""
    nnz = cols.size
    nwin_mat = int(cdiv(col_span, 128))
    ncls = ngrp if resid else 1
    klass = (lrow_arr % ngrp) if resid else np.zeros(nnz, dtype=np.int64)
    order = np.lexsort((cols, bucket_arr))
    b_s = bucket_arr[order]
    win_s = (cols // 128)[order]
    cls_s = klass[order]
    run_key = b_s * nwin_mat + win_s
    uniq, run_id = np.unique(run_key, return_inverse=True)
    n_runs = uniq.size
    run_b = uniq // nwin_mat
    run_win = uniq % nwin_mat
    cnt = np.bincount(run_id * ncls + cls_s,
                      minlength=n_runs * ncls).reshape(n_runs, ncls)

    from tpusparse import native

    walked = native.dgt_runs_multi(run_b, run_win, cnt, cap, nw, n_buckets,
                                   max_open) if native.available() else None
    if walked is not None:
        (seg_run, seg_cls, seg_tile, seg_fill, seg_cnt, seg_sel,
         wins_b, wins_t, wins_w, tot_tiles) = walked
    else:
        seg_run, seg_cls, seg_tile, seg_fill, seg_cnt, seg_sel = \
            ([] for _ in range(6))
        wins_b, wins_t, wins_w = [], [], []
        tot_tiles = np.zeros(n_buckets, dtype=np.int64)
        cur_b = -1
        opens: list = []   # [window_base, tile_id, room(ncls)]
        ntiles = 0
        for r in range(n_runs):
            b = run_b[r]
            w = int(run_win[r])
            if b != cur_b:
                if cur_b >= 0:
                    tot_tiles[cur_b] = ntiles
                cur_b = b
                ntiles = 0
                opens = []
            left = cnt[r].copy()
            opens = [o for o in opens if o[0] > w - nw and int(o[2].sum()) > 0]
            for o in opens:
                if not left.any():
                    break
                t = np.minimum(o[2], left)
                if not t.any():
                    continue
                fill = cap - o[2]
                for c in np.flatnonzero(t):
                    seg_run.append(r)
                    seg_cls.append(int(c))
                    seg_tile.append(o[1])
                    seg_fill.append(int(fill[c]))
                    seg_cnt.append(int(t[c]))
                    seg_sel.append(w - o[0])
                o[2] = o[2] - t
                left = left - t
            lmax = int(left.max())
            if lmax > 0:
                n_new = -(-lmax // cap)
                for j in range(n_new):
                    tid = ntiles + j
                    room = np.full(ncls, cap, dtype=np.int64)
                    for c in range(ncls):
                        take_c = min(cap, max(int(left[c]) - j * cap, 0))
                        if take_c > 0:
                            seg_run.append(r)
                            seg_cls.append(c)
                            seg_tile.append(tid)
                            seg_fill.append(0)
                            seg_cnt.append(take_c)
                            seg_sel.append(0)
                            room[c] = cap - take_c
                    opens.append([w, tid, room])
                    wins_b.append(b)
                    wins_t.append(tid)
                    wins_w.append(w)
                ntiles += n_new
                if len(opens) > max_open:
                    opens = opens[-max_open:]
        if cur_b >= 0:
            tot_tiles[cur_b] = ntiles

    # expand segments to per-nz assignments: nz sorted stably by (run, cls)
    # align 1:1 with segments sorted stably by (run, cls) and repeated by
    # their counts — each (run, cls) group's rank order is consumed in
    # segment-append order (open tiles first, then fresh), like the
    # single-open walk's rank < take split
    seg_run = np.asarray(seg_run, dtype=np.int64)
    seg_cls = np.asarray(seg_cls, dtype=np.int64)
    seg_tile = np.asarray(seg_tile, dtype=np.int64)
    seg_fill = np.asarray(seg_fill, dtype=np.int64)
    seg_cnt = np.asarray(seg_cnt, dtype=np.int64)
    seg_sel = np.asarray(seg_sel, dtype=np.int64)
    sord = np.argsort(seg_run * ncls + seg_cls, kind="stable")
    cnts = seg_cnt[sord]
    total = int(cnts.sum())
    assert total == nnz, (total, nnz)
    nord = np.argsort(run_id * ncls + cls_s, kind="stable")
    gtile_e = np.repeat(seg_tile[sord], cnts)
    sel_e = np.repeat(seg_sel[sord], cnts)
    starts = np.concatenate([[0], np.cumsum(cnts)[:-1]])
    within = np.arange(total, dtype=np.int64) - np.repeat(starts, cnts)
    pos_e = np.repeat(seg_fill[sord], cnts) + within
    gtile = np.empty(nnz, dtype=np.int64)
    pos = np.empty(nnz, dtype=np.int64)
    sel = np.empty(nnz, dtype=np.int64)
    gtile[nord] = gtile_e
    pos[nord] = pos_e
    sel[nord] = sel_e

    return _dgt_fill(order, b_s, cols, lrow_arr, vals, gtile, pos, sel,
                     cls_s, wins_b, wins_t, wins_w, tot_tiles,
                     n_buckets=n_buckets, ngrp=ngrp, cap=cap, T=T, g=g,
                     resid=resid)


def _dgt_walk(bucket_arr, cols, lrow_arr, vals, *, n_buckets, col_span,
              ngrp, cap, T, g, nw, resid):
    """The dgt chunk walk over arbitrary nz buckets (single-chip: bucket =
    program; halo ring: bucket = (device, ring-chunk, program)).

    ``cols`` are LOCAL column indices within ``col_span``; ``lrow_arr``
    bucket-local rows.  Greedy nw-window tile packing: a tile's windows
    must be CONSECUTIVE — [base, base+nw) — so the kernel fetches all of
    them with ONE dynamic slice of the resident X (measured: per-chunk
    time scales with the count of scalar-addressed dynamic slices,
    100/200/358 ns at 8/16/32 slices).  A run first tops up the carried
    open tile (if its window is within the tile's reach), then fills fresh
    single-window tiles, the last of which becomes the new open tile.

    Returns (wins [B,NC,T], cols [B,NC,G], lrw, vals, nc_arr [B],
    flat destination slot per SORTED nz, the sort order)."""
    nnz = cols.size
    nwin_mat = int(cdiv(col_span, 128))
    ncls = ngrp if resid else 1
    klass = (lrow_arr % ngrp) if resid else np.zeros(nnz, dtype=np.int64)

    # (bucket, window) run id; stable nz order within: by column.
    order = np.lexsort((cols, bucket_arr))
    b_s = bucket_arr[order]
    win_s = (cols // 128)[order]
    cls_s = klass[order]
    run_key = b_s * nwin_mat + win_s
    uniq, run_id = np.unique(run_key, return_inverse=True)
    n_runs = uniq.size
    run_b = uniq // nwin_mat
    run_win = uniq % nwin_mat
    rank = _rank_within_groups(run_id * ncls + cls_s)  # rank in (run, class)
    cnt = np.bincount(run_id * ncls + cls_s,
                      minlength=n_runs * ncls).reshape(n_runs, ncls)

    from tpusparse import native

    walked = native.dgt_runs(run_b, run_win, cnt, cap, nw, n_buckets) \
        if native.available() else None
    if walked is not None:
        (take, open_tile, open_fill, join_pos, new_base, fresh_n,
         tot_tiles) = walked
    else:
        take = np.zeros((n_runs, ncls), dtype=np.int64)
        open_tile = np.zeros(n_runs, dtype=np.int64)
        open_fill = np.zeros((n_runs, ncls), dtype=np.int64)
        join_pos = np.zeros(n_runs, dtype=np.int64)
        new_base = np.zeros(n_runs, dtype=np.int64)
        fresh_n = np.zeros(n_runs, dtype=np.int64)
        tot_tiles = np.zeros(n_buckets, dtype=np.int64)
        cur_b = -1
        room = None
        open_w = -1  # window base of the carried open tile
        ntiles = 0
        for r in range(n_runs):
            b = run_b[r]
            if b != cur_b:
                if cur_b >= 0:
                    tot_tiles[cur_b] = ntiles
                cur_b = b
                ntiles = 0
                room = None
                open_w = -1
            c = cnt[r]
            w = int(run_win[r])
            joined = (room is not None and 0 <= w - open_w < nw
                      and int(np.minimum(room, c).sum()) > 0)
            if joined:
                t = np.minimum(room, c)
                take[r] = t
                open_tile[r] = ntiles - 1
                open_fill[r] = cap - room
                join_pos[r] = w - open_w
                room = room - t
            else:
                t = np.zeros(ncls, dtype=np.int64)
            left = c - t
            lmax = int(left.max())
            if lmax > 0:
                n_new = -(-lmax // cap)
                new_base[r] = ntiles
                fresh_n[r] = n_new
                ntiles += n_new
                room = cap - np.maximum(left - (n_new - 1) * cap, 0)
                open_w = w
        if cur_b >= 0:
            tot_tiles[cur_b] = ntiles

    nc_arr = np.maximum(-(-tot_tiles // T), 1)
    nc = max(int(nc_arr.max()) if n_buckets else 1, 1)

    t_of = take[run_id, cls_s]
    in_open = rank < t_of
    gtile = np.where(in_open, open_tile[run_id],
                     new_base[run_id] + (rank - t_of) // cap)
    pos = np.where(in_open, open_fill[run_id, cls_s] + rank,
                   (rank - t_of) % cap)
    lane = cls_s + ngrp * pos if resid else pos
    chunk = gtile // T
    slot = (gtile % T) * 128 + lane                # slot within chunk
    sel = np.where(in_open, join_pos[run_id], 0)

    # per-tile window base: fresh tiles carry their creator run's window;
    # joining runs sit at lane-selector (their window - base) < nw
    wins_flat = np.zeros(n_buckets * nc * T, dtype=np.int32)
    has_fresh = fresh_n > 0
    if has_fresh.any():
        fr = np.flatnonzero(has_fresh)
        base = run_b[fr] * nc * T + new_base[fr]
        idx = (np.repeat(base, fresh_n[fr])
               + _rank_within_groups(np.repeat(fr, fresh_n[fr])))
        wins_flat[idx] = np.repeat(run_win[fr], fresh_n[fr]).astype(np.int32)
    wins_f = wins_flat.reshape(n_buckets, nc, T)

    cols_f = np.zeros((n_buckets, nc, g), dtype=np.int32)
    lrw_f = np.zeros((n_buckets, nc, g), dtype=np.int32)
    vals_f = np.zeros((n_buckets, nc, g), dtype=np.float32)

    flat = (b_s * nc + chunk) * g + slot
    cols_f.reshape(-1)[flat] = ((cols[order] % 128) | (sel << 7)).astype(np.int32)
    lrw_s = lrow_arr[order]
    lrw_f.reshape(-1)[flat] = ((lrw_s // ngrp) if resid else lrw_s).astype(np.int32)
    vals_f.reshape(-1)[flat] = vals[order].astype(np.float32)
    return wins_f, cols_f, lrw_f, vals_f, nc_arr, flat, order


def pack_dgt(
    mat_or_ms,
    sub: int = 0,
    *,
    out_rows: int | None = None,
    rb: int = 256,
    g: int = 512,
    kt: int = 8,
    mode: str = "fp32x2",
    resid: bool = True,
    nw: int = 4,
    split: int | str | None = "auto",
    balance: bool = True,
    deal: str | None = None,
    keep_perm: bool = False,
    walk: str = "multi",
) -> DgtFormat:
    """Pack into DgtFormat.

    Heavy rows are first split into <= 8 virtual rows (``split`` nnz per
    piece, 'auto' = 8x the mean row length) so no residue class or program
    drowns — without this, every (program, window) run's class histogram is
    dominated by its heaviest row and the class caps force near-empty tiles
    (measured pad 4.9 -> 1.3 on the 32k power-law headline).  Virtual rows
    are length-dealt across programs like pack_dg; the chunk walk buckets nz
    per (program, 128-column window) and greedily packs 128-lane tiles that
    may host up to ``nw`` windows each (selector in col bits 7+), tiles
    concatenating freely into G-slot chunks.
    """
    from tpusparse.io.mtx import CooMatrix
    from tpusparse.levels import Level

    nhl, ngrp = dgt_geometry(kt, mode)
    cap = (128 // ngrp) if resid else 128  # slots per (class, tile)
    assert rb % ngrp == 0, f"rb={rb} must be a multiple of ngrp={ngrp}"
    assert g % 128 == 0, f"g={g} must be a multiple of the 128-lane tile"
    assert nw in (1, 2, 4, 8), nw
    T = g // 128

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

    nnz = rows.size
    if deal is None:
        deal = "length" if (balance and row_num > rb) else "blocks"
    assert deal in ("length", "index", "blocks"), deal

    # ---- virtual rows: split heavy rows into 1/2/4/8 pieces (length
    # dealing only — the affine deals exist for gather-free composition and
    # must stay 1:1).  Piece counts are powers of two and a unit's pieces
    # get CONSECUTIVE SIZE-ALIGNED slots in one program, so the output
    # recovers with one gather from the pairwise-sum pyramid.
    lengths = np.bincount(rows, minlength=row_num) if row_num else np.zeros(0, np.int64)
    if split == "auto":
        split = max(64, 8 * max(nnz // max(row_num, 1), 1))
    if deal != "length" or not split:
        pieces = np.ones(row_num, dtype=np.int64)
    else:
        raw = np.minimum(np.maximum(-(-lengths // int(split)), 1), 8)
        pieces = np.where(raw > 4, 8, np.where(raw > 2, 4, raw)).astype(np.int64)
    vrow_base = np.concatenate([[0], np.cumsum(pieces)]).astype(np.int64)
    mv = int(vrow_base[-1])
    if int(pieces.max(initial=1)) > 1:
        order0 = np.argsort(rows, kind="stable")
        row_start = np.concatenate([[0], np.cumsum(lengths)])
        rnk = np.arange(nnz, dtype=np.int64) - row_start[rows[order0]]
        vr = np.empty(nnz, dtype=np.int64)
        vr[order0] = vrow_base[rows[order0]] + rnk % pieces[rows[order0]]
    else:
        vr = rows
    smax = int(pieces.max(initial=1))
    assert rb % 8 == 0, rb

    if deal == "length" and mv:
        # per piece-size class, deal units (original rows) round-robin by
        # length; slot bases allocate descending size so alignment is free
        p_count = max(-(-mv // rb), 1)
        while True:
            per_p = sum(s * (-(-int((pieces == s).sum()) // p_count))
                        for s in (8, 4, 2, 1))
            if per_p <= rb or p_count >= max(mv, 1):
                break
            p_count += 1
        p_of_unit = np.zeros(row_num, dtype=np.int64)
        base_of_unit = np.zeros(row_num, dtype=np.int64)
        offset_p = np.zeros(p_count, dtype=np.int64)
        order_len = np.argsort(-lengths, kind="stable")
        for size in (8, 4, 2, 1):
            cls_units = order_len[pieces[order_len] == size]
            if cls_units.size == 0:
                continue
            # snake order: lengths are sorted descending, so alternating the
            # round-robin direction keeps per-program totals within one
            # unit-length of each other (plain i % P drifts: measured
            # 3.8k-10k nnz/program spread on the 32k headline)
            i = np.arange(cls_units.size)
            fwd = (i // p_count) % 2 == 0
            pp = np.where(fwd, i % p_count, p_count - 1 - i % p_count)
            p_of_unit[cls_units] = pp
            base_of_unit[cls_units] = offset_p[pp] + (i // p_count) * size
            offset_p += np.bincount(pp, minlength=p_count) * size
        assert int(offset_p.max(initial=0)) <= rb, (offset_p.max(), rb)
        unit_of_vr = np.repeat(np.arange(row_num), pieces)
        p_of_vr = p_of_unit[unit_of_vr]
        lrow_of_vr = (base_of_unit[unit_of_vr]
                      + np.arange(mv) - vrow_base[unit_of_vr])
        p_arr = p_of_vr[vr]
        lrow_arr = lrow_of_vr[vr]
    elif deal == "index" and mv:
        p_count = max(-(-mv // rb), 1)
        p_arr = vr % p_count
        lrow_arr = vr // p_count
    else:
        p_count = max(-(-mv // rb), 1)
        p_arr = vr // rb
        lrow_arr = vr % rb

    assert walk in ("multi", "single"), walk
    if walk == "multi":
        wins_f, cols_f, lrw_f, vals_f, nc_arr, flat, order = _dgt_walk_multi(
            p_arr, cols, lrow_arr, np.asarray(vals), n_buckets=p_count,
            col_span=col_num, ngrp=ngrp, cap=cap, T=T, g=g, nw=nw,
            resid=resid)
    else:
        wins_f, cols_f, lrw_f, vals_f, nc_arr, flat, order = _dgt_walk(
            p_arr, cols, lrow_arr, np.asarray(vals), n_buckets=p_count,
            col_span=col_num, ngrp=ngrp, cap=cap, T=T, g=g, nw=nw, resid=resid)
    nc = cols_f.shape[1]

    # pyramid index: row -> one gather position in [y; fold2; fold4; fold8]
    if deal == "length":
        slot0_of_unit = p_of_unit * rb + base_of_unit
    elif deal == "index":
        u = np.arange(row_num, dtype=np.int64)
        slot0_of_unit = (u % p_count) * rb + u // p_count
    else:
        slot0_of_unit = np.arange(row_num, dtype=np.int64)
    nslots = p_count * rb
    lvl_of_unit = np.log2(pieces).astype(np.int64) if row_num else pieces
    lvl_off = np.array([0, nslots, nslots + nslots // 2,
                        nslots + nslots // 2 + nslots // 4], dtype=np.int64)
    pyr_idx = lvl_off[lvl_of_unit] + (slot0_of_unit >> lvl_of_unit)

    slot_of_origrow = np.full(out_rows, -1, dtype=np.int32)
    keep = rec >= 0
    kept_rows = np.flatnonzero(keep)
    slot_of_origrow[rec[kept_rows]] = pyr_idx[kept_rows].astype(np.int32)

    def _affine_ok(aff):
        if out_rows > p_count * rb or smax != 1:
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

    perm = None
    if keep_perm:
        # dest slot of nz i (original COO order)
        dest = np.empty(nnz, dtype=np.int64)
        dest[order] = flat
        perm = dest

    return DgtFormat(
        wins=jnp.asarray(wins_f),
        cols=jnp.asarray(cols_f),
        lrw=jnp.asarray(lrw_f),
        vals=jnp.asarray(vals_f),
        nc_p=jnp.asarray(np.asarray(nc_arr, np.int32).reshape(p_count, 1, 1)),
        slot_of_origrow=jnp.asarray(slot_of_origrow),
        split_levels=smax,
        n_programs=p_count,
        n_chunks=nc,
        chunk_g=g,
        rb=rb,
        kt=kt,
        mode=mode,
        nw=nw,
        resid=resid,
        shape=(out_rows, col_num),
        nnz_real=int(np.count_nonzero(vals_f)),
        perm_of_nz=perm,
        deal=unpack,
    )


def with_values(fmt: DgtFormat, new_vals) -> DgtFormat:
    """Values-only update (same pattern; requires pack_dgt(keep_perm=True))."""
    assert fmt.perm_of_nz is not None, "pack_dgt(..., keep_perm=True) required"
    new_vals = np.asarray(new_vals, dtype=np.float32)
    flat = np.zeros(fmt.n_programs * fmt.n_chunks * fmt.chunk_g, dtype=np.float32)
    flat[np.asarray(fmt.perm_of_nz)] = new_vals
    vals = flat.reshape(fmt.n_programs, fmt.n_chunks, fmt.chunk_g)
    return dataclasses.replace(
        fmt,
        vals=jnp.asarray(vals),
        nnz_real=int(np.count_nonzero(vals)),
    )


def _dgt_kernel(*refs, nc, g, rb, ngrp, kt, mode, resid, nw, unroll,
                stream_rowhot=False, scatter="select", fold=True,
                pipe=False, rowhot_i8=False):
    """Round-4 kernel variants (VERDICT r3 #1/#2), all oracle-checked:

    scatter='select'   (r3 baseline) psel = concat([c2]*ngrp) masked by the
                       loop-invariant class pattern; dot (rbs,G)x(128,G).
    scatter='fullrow'  the VERDICT's option (c): NO 128-lane replication —
                       the full-row one-hot (rb, G) contracts directly with
                       c2 (nhl*kt, G) into an (rb, nhl*kt) accumulator.  The
                       class masking is free (the row index IS lrw*ngrp +
                       static lane residue); cost moves into the bigger
                       rowhot compare.
    (option (b) — psel via pltpu.repeat * a bf16 0/1 plane instead of
    concat+select — was REFUTED at the Mosaic level: repeating the
    (nhl*kt, G) bf16 c2 to 128 sublanes crashes tpu_compile_helper on
    v5e, verified 2026-08-19.)
    fold               folds the hi+lo bf16 planes and the (grp, hl, k) ->
                       (grp, k) lane reorder into ONE in-kernel f32 dot
                       against a static 0/1 matrix (precision=HIGHEST — the
                       0/1 operand makes the 6-pass decomposition exact), so
                       the host epilogue is a pure reshape instead of
                       reshape+add+transpose materializing full Y twice.
    pipe               software-pipeline the VPU build against the MXU dot:
                       the (rowhot, psel) operands for chunk j are built in
                       iteration j-1 and carried, so each iteration's dot
                       (chunk j) and build (chunk j+1) share no data
                       dependency and the VLIW scheduler can overlap the two
                       units.  Motivation: the SoL table's nw4 row measures
                       0.218 cyc/nz ~= VPU floor 0.146 + MXU floor 0.072 —
                       the units run back-to-back in the unpipelined body
                       even though unrolled chunks are independent.
    (A 'wide' single-gather variant over the tile's nw*128-lane span was
    refuted at the Mosaic level — see _dgt_fill's docstring.)
    """
    if stream_rowhot:
        # VERDICT r2 #1 variant (i): the (rbs, G) row one-hot planes are
        # precomputed bf16 at pack time and DMA'd with the chunk instead of
        # rebuilt from lrw per chunk — trades 2*rbs bytes/nz of HBM for the
        # compare+convert VPU work
        wins_ref, cols_ref, lrw_ref, vals_ref, rh_ref, x3_ref, y_ref = refs
    else:
        wins_ref, cols_ref, lrw_ref, vals_ref, x3_ref, y_ref = refs
        rh_ref = None
    f32, bf16 = jnp.float32, jnp.bfloat16
    HI = jax.lax.Precision.HIGHEST
    T = g // 128
    rep = kt // 8
    nhl = 2 if mode == "fp32x2" else 1
    q = nhl * kt
    rbs = rb // ngrp
    iota_rbs = jax.lax.broadcasted_iota(jnp.int32, (rbs, 1), 0)
    if scatter == "fullrow":
        iota_rb = jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0)
        if resid:
            # slot lane = class + ngrp*pos within its 128-lane tile, and
            # 128 % ngrp == 0, so the per-slot class is g_index % ngrp
            laneres = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1) % ngrp
    elif resid:
        # loop-invariant class pattern: sublane group s//(nhl*kt) vs lane
        # residue g%ngrp — no per-chunk compare against lrow required.
        sgrp = jax.lax.broadcasted_iota(jnp.int32, (128, g), 0) // q
        lres = jax.lax.broadcasted_iota(jnp.int32, (128, g), 1) % ngrp
        static_mask = sgrp == lres
    else:
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        lane_grp = lane128 // q
    do_fold = fold and nhl == 2 and scatter == "select"
    if do_fold:
        # E[s=(grp,hl,k), o=(grp2,k2)] = (grp==grp2)&(k==k2): one HIGHEST
        # dot folds hi+lo and compacts lanes to (grp, k) row-major order
        si = jax.lax.broadcasted_iota(jnp.int32, (128, ngrp * kt), 0)
        oi = jax.lax.broadcasted_iota(jnp.int32, (128, ngrp * kt), 1)
        efold = ((si // q == oi // kt) & (si % kt == oi % kt)).astype(f32)

    def load_tiles(j):
        # ONE scalar-addressed dynamic slice per tile (the tile's nw
        # windows are consecutive by construction); issued one chunk AHEAD
        # through the loop carry so the scalar-load -> vector-slice stall
        # overlaps the previous chunk's compute (measured: per-chunk time
        # scales with in-loop dynamic-slice count, 100/200/358 ns at
        # 8/16/32 inline slices)
        return tuple(x3_ref[0, pl.ds(wins_ref[0, j, tt], nw)]
                     for tt in range(T))              # T x (nw, kt, 128)

    def build(j, xts):
        """VPU stage: gathers, products, scatter operands for chunk j."""
        lrw = lrw_ref[0, pl.ds(j, 1), :]             # (1, G)
        v = vals_ref[0, pl.ds(j, 1), :]
        colw = cols_ref[0, pl.ds(j, 1), :]
        colw8 = colw + jnp.zeros((8, 1), jnp.int32)  # (8, G): see dg_gather
        lidx8 = colw8 & 127                          # lane within window
        sel8 = colw8 >> 7                            # window offset of the nz
        parts = []
        for tt in range(T):
            xws = xts[tt]
            sl = slice(tt * 128, (tt + 1) * 128)
            li = jnp.concatenate([lidx8[:, sl]] * rep, axis=0)   # (kt,128)
            gt = jnp.take_along_axis(xws[0], li, axis=1)
            if nw > 1:
                se = jnp.concatenate([sel8[:, sl]] * rep, axis=0)
                for w in range(1, nw):
                    gw = jnp.take_along_axis(xws[w], li, axis=1)
                    gt = jnp.where(se == w, gw, gt)
            parts.append(gt)
        xg = jnp.concatenate(parts, axis=1)          # (kt, G) exact f32
        p = xg * v
        if mode == "fp32x2":
            phi, plo = _split_bf16(p)
            c2 = jnp.concatenate([phi, plo], axis=0)  # (nhl*kt, G)
        else:
            c2 = p.astype(bf16)
        if scatter == "fullrow":
            lfull = lrw * ngrp + laneres if resid else lrw
            rowfull = (iota_rb == lfull).astype(bf16)   # (rb, G)
            return rowfull, c2
        psel_pre = jnp.concatenate([c2] * ngrp, axis=0)  # (128, G)
        # round-5 C4 (bench/formulations.py): the one-hot cast can narrow
        # to int8 — Mosaic accepts an i8 x bf16 dot with f32 acc (verified
        # exact on v5e 2026-08-20) and the i8 plane is half the vregs of
        # bf16.  The compare itself must stay i32 (int8 vector compares
        # are Mosaic-rejected, CLAUDE.md).
        rh_dt = jnp.int8 if rowhot_i8 else bf16
        if resid:
            psel = jnp.where(static_mask, psel_pre, bf16(0))
            if rh_ref is not None:
                rowhot = rh_ref[0, j]                    # (rbs, G) bf16
            else:
                rowhot = (iota_rbs == lrw).astype(rh_dt)  # lrw=lrow//ngrp
        else:
            psel = jnp.where(lane_grp == lrw % ngrp, psel_pre, bf16(0))
            rowhot = (iota_rbs == lrw // ngrp).astype(rh_dt)
        return rowhot, psel

    def fire(pre, acc):
        """MXU stage: scatter dot of a built chunk into the accumulator."""
        a, b = pre
        return acc + jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    def chunk(j, xts, acc):
        return fire(build(j, xts), acc)

    def nxt(j):
        return jnp.minimum(j, nc - 1)

    acc0 = (jnp.zeros((rb, q), f32) if scatter == "fullrow"
            else jnp.zeros((rbs, 128), f32))
    if pipe:
        # carry invariant entering step j: pre = built(j), xts = tiles(j+1)
        xts = load_tiles(0)
        pre0 = build(0, xts)
        xts1 = load_tiles(nxt(1))
        if unroll > 1:
            def body(i, carry):
                accs, xts, pre = carry
                out = []
                for u in range(unroll):
                    j = i * unroll + u
                    a = fire(pre, accs[u])
                    pre = build(nxt(j + 1), xts)
                    xts = load_tiles(nxt(j + 2))
                    out.append(a)
                return tuple(out), xts, pre
            accs, xts, pre = jax.lax.fori_loop(
                0, nc // unroll, body,
                (tuple(acc0 for _ in range(unroll)), xts1, pre0))
            acc = functools.reduce(jnp.add, accs)
            # epilogue: skip the trailing build/load after the final fired
            # chunk — they would be dead values (clamped duplicate chunks
            # built but never accumulated).  The fori body above still
            # computes one dead build/load pair in its last iteration;
            # that is one chunk of wasted VPU work total, not O(nc).
            for r in range((nc // unroll) * unroll, nc):
                acc = fire(pre, acc)
                if r + 1 < nc:
                    pre = build(nxt(r + 1), xts)
                    xts = load_tiles(nxt(r + 2))
        else:
            def body(j, carry):
                acc, xts, pre = carry
                return (fire(pre, acc), load_tiles(nxt(j + 2)),
                        build(nxt(j + 1), xts))
            acc, _, _ = jax.lax.fori_loop(0, nc, body, (acc0, xts1, pre0))
    elif unroll > 1:
        def body(i, carry):
            accs, xts = carry
            out = []
            for u in range(unroll):
                j = i * unroll + u
                a = chunk(j, xts, accs[u])
                xts = load_tiles(nxt(j + 1))
                out.append(a)
            return tuple(out), xts
        accs, xts = jax.lax.fori_loop(
            0, nc // unroll, body,
            (tuple(acc0 for _ in range(unroll)), load_tiles(0)))
        acc = functools.reduce(jnp.add, accs)
        for r in range((nc // unroll) * unroll, nc):
            acc = chunk(r, xts, acc)
            xts = load_tiles(nxt(r + 1))
    else:
        def body(j, carry):
            acc, xts = carry
            return chunk(j, xts, acc), load_tiles(nxt(j + 1))
        acc, _ = jax.lax.fori_loop(0, nc, body, (acc0, load_tiles(0)))
    if do_fold:
        # exact: efold is 0/1, so each output is one f32 hi + one f32 lo
        acc = jax.lax.dot_general(
            acc, efold, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=HI)
    y_ref[0, 0, :, :] = acc


def _dgt_kernel_stream(wins_sref, cols_ref, lrw_ref, vals_ref, *rest,
                       g, rb, ngrp, kt, mode, nw, rowhot_i8=False):
    """Streamed-X variant (round-5, VERDICT r4 #4): chunks ride the GRID
    (P, kt_count, nc) and each chunk's T*nw window tiles arrive as their
    own (1, 1, kt, 128) X blocks selected by scalar-prefetch index_maps
    (the tile_onehot streaming machinery), double-buffered by the Pallas
    pipeline — X is never VMEM-resident, so N is unbounded by the 16MB
    residency cliff.  Cost structure: ~4KB of HBM per window tile serving
    ~128/T nz -> nw*32 B/nz of X traffic; the kernel is HBM-bound by
    design and exists for the large-N regime where the resident kernel
    cannot compile at all.  select+resid scatter only (the shipping
    config); hi/lo fold stays in the epilogue."""
    f32, bf16 = jnp.float32, jnp.bfloat16
    T = g // 128
    rep = kt // 8
    nhl = 2 if mode == "fp32x2" else 1
    q = nhl * kt
    rbs = rb // ngrp
    xrefs = rest[:T * nw]
    y_ref = rest[-1]
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    iota_rbs = jax.lax.broadcasted_iota(jnp.int32, (rbs, 1), 0)
    sgrp = jax.lax.broadcasted_iota(jnp.int32, (128, g), 0) // q
    lres = jax.lax.broadcasted_iota(jnp.int32, (128, g), 1) % ngrp
    static_mask = sgrp == lres

    lrw = lrw_ref[0, 0, 0, :][None, :]               # (1, G)
    v = vals_ref[0, 0, 0, :][None, :]
    colw = cols_ref[0, 0, 0, :][None, :]
    colw8 = colw + jnp.zeros((8, 1), jnp.int32)
    lidx8 = colw8 & 127
    sel8 = colw8 >> 7
    parts = []
    for tt in range(T):
        sl = slice(tt * 128, (tt + 1) * 128)
        li = jnp.concatenate([lidx8[:, sl]] * rep, axis=0)
        gt = jnp.take_along_axis(xrefs[tt * nw][0, 0], li, axis=1)
        if nw > 1:
            se = jnp.concatenate([sel8[:, sl]] * rep, axis=0)
            for w in range(1, nw):
                gw = jnp.take_along_axis(xrefs[tt * nw + w][0, 0], li,
                                         axis=1)
                gt = jnp.where(se == w, gw, gt)
        parts.append(gt)
    xg = jnp.concatenate(parts, axis=1)              # (kt, G)
    p = xg * v
    if mode == "fp32x2":
        phi, plo = _split_bf16(p)
        c2 = jnp.concatenate([phi, plo], axis=0)
    else:
        c2 = p.astype(bf16)
    psel = jnp.where(static_mask, jnp.concatenate([c2] * ngrp, axis=0),
                     bf16(0))
    rh_dt = jnp.int8 if rowhot_i8 else bf16
    rowhot = (iota_rbs == lrw).astype(rh_dt)
    y_ref[0, 0, :, :] += jax.lax.dot_general(
        rowhot, psel, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)


@functools.partial(
    jax.jit,
    static_argnames=("P", "nc", "g", "rb", "kt", "mode", "nw",
                     "interpret", "rowhot_i8"),
)
def _dgt_call_stream(wins, cols3, lrw3, vals3, x, *, P, nc, g, rb, kt,
                     mode, nw, interpret, rowhot_i8=False):
    """Streamed-X dgt: see _dgt_kernel_stream.  Same DgtFormat (resid
    packs only); X held in HBM, windows DMA'd per chunk."""
    n, k = x.shape
    nhl, ngrp = dgt_geometry(kt, mode)
    nwin = cdiv(n, 128) + nw
    rbs = rb // ngrp
    kt_count = k // kt
    T = g // 128
    xpad = pad_dense_rows(x.astype(jnp.float32), nwin * 128)
    x3 = xpad.reshape(nwin, 128, kt_count, kt).transpose(2, 0, 3, 1)
    cols4 = cols3.reshape(P, nc, 1, g)
    lrw4 = lrw3.reshape(P, nc, 1, g)
    vals4 = vals3.reshape(P, nc, 1, g)
    in_specs = [
        pl.BlockSpec((1, 1, 1, g), lambda p, t, j, w_s: (p, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, g), lambda p, t, j, w_s: (p, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, g), lambda p, t, j, w_s: (p, j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for tt in range(T):
        for w in range(nw):
            in_specs.append(pl.BlockSpec(
                (1, 1, kt, 128),
                lambda p, t, j, w_s, tt=tt, w=w: (t, w_s[p, j, tt] + w,
                                                  0, 0),
                memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P, kt_count, nc),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, rbs, 128),
                               lambda p, t, j, w_s: (p, t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_dgt_kernel_stream, g=g, rb=rb, ngrp=ngrp, kt=kt,
                          mode=mode, nw=nw, rowhot_i8=rowhot_i8),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, kt_count, rbs, 128), jnp.float32),
        interpret=interpret,
    )(wins, cols4, lrw4, vals4, *([x3] * (T * nw)))
    # lanes within a tile: (grp, hl, k); row = rhi*ngrp + grp, sum hl
    y = out.reshape(P, kt_count, rbs, ngrp, nhl, kt)
    y = y[..., 0, :] + y[..., 1, :] if nhl == 2 else y[..., 0, :]
    y = y.transpose(0, 2, 3, 1, 4)
    return y.reshape(P * rb, kt_count * kt)


@functools.partial(
    jax.jit,
    static_argnames=("P", "nc", "g", "rb", "kt", "mode", "resid", "nw",
                     "unroll", "interpret", "scatter", "fold", "pipe",
                     "rowhot_i8"),
)
def _dgt_call(wins, cols3, lrw3, vals3, x, rowhot=None, *, P, nc, g, rb, kt,
              mode, resid, nw, unroll, interpret, scatter="select",
              fold=True, pipe=False, rowhot_i8=False):
    n, k = x.shape
    nhl, ngrp = dgt_geometry(kt, mode)
    nwin = cdiv(n, 128) + nw  # nw zero tail windows: slices read [w0, w0+nw)
    rbs = rb // ngrp
    q = nhl * kt
    kt_count = k // kt
    xpad = pad_dense_rows(x.astype(jnp.float32), nwin * 128)
    x3 = xpad.reshape(nwin, 128, kt_count, kt).transpose(2, 0, 3, 1)
    x_spec = pl.BlockSpec((1, nwin, kt, 128), lambda p, t: (t, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    T = g // 128
    stream = rowhot is not None
    assert scatter in ("select", "fullrow"), scatter
    assert not (stream and scatter == "fullrow"), \
        "streamed rowhot pairs with the group-scatter kernels"
    in_specs = [
        pl.BlockSpec((1, nc, T), lambda p, t: (p, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, nc, g), lambda p, t: (p, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nc, g), lambda p, t: (p, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nc, g), lambda p, t: (p, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [wins, cols3, lrw3, vals3]
    if stream:
        in_specs.append(pl.BlockSpec((1, nc, rbs, g), lambda p, t: (p, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(rowhot)
    in_specs.append(x_spec)
    do_fold = fold and nhl == 2 and scatter == "select"
    if scatter == "fullrow":
        out_tile = (rb, q)
    elif do_fold:
        out_tile = (rbs, ngrp * kt)
    else:
        out_tile = (rbs, 128)
    out = pl.pallas_call(
        functools.partial(_dgt_kernel, nc=nc, g=g, rb=rb, ngrp=ngrp, kt=kt,
                          mode=mode, resid=resid, nw=nw, unroll=max(unroll, 1),
                          stream_rowhot=stream, scatter=scatter, fold=fold,
                          pipe=pipe, rowhot_i8=rowhot_i8),
        grid=(P, kt_count),
        out_shape=jax.ShapeDtypeStruct((P, kt_count) + out_tile, jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1) + out_tile, lambda p, t: (p, t, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args, x3)
    if scatter == "fullrow":
        # out rows are the local rows directly; lanes are (hl, k)
        y = out.reshape(P, kt_count, rb, nhl, kt)
        y = y[..., 0, :] + y[..., 1, :] if nhl == 2 else y[..., 0, :]
        y = y.transpose(0, 2, 1, 3)
        return y.reshape(P * rb, kt_count * kt)
    if do_fold:
        # hi+lo already folded in-kernel; lanes are (grp, k) row-major, so
        # local row rhi*ngrp+grp recovers with a pure reshape
        y = out.reshape(P, kt_count, rbs, ngrp, kt)
        y = y.transpose(0, 2, 3, 1, 4)
        return y.reshape(P * rb, kt_count * kt)
    # out lanes within a tile: (grp, hl, k); row = rhi*ngrp + grp, sum hl
    y = out.reshape(P, kt_count, rbs, ngrp, nhl, kt)
    if nhl == 2:
        y = y[..., 0, :] + y[..., 1, :]
    else:
        y = y[..., 0, :]
    y = y.transpose(0, 2, 3, 1, 4)
    return y.reshape(P * rb, kt_count * kt)


def pack_rowhot(fmt: DgtFormat):
    """(P, NC, rbs, G) bf16 row one-hot planes for the streamed-scatter
    variant (VERDICT r2 #1 option (i)): trades 2*rbs bytes/nz of HBM for
    the per-chunk compare+convert.  Dummy slots carry vals 0 so their
    spurious row-0 hit contributes nothing."""
    assert fmt.resid, "streamed rowhot pairs with the static-residue kernel"
    _, ngrp = dgt_geometry(fmt.kt, fmt.mode)
    rbs = fmt.rb // ngrp
    lrw = np.asarray(fmt.lrw)
    rh = lrw[:, :, None, :] == np.arange(rbs, dtype=np.int32)[None, None, :, None]
    return jnp.asarray(rh).astype(jnp.bfloat16)


def _unpack_rows(fmt: DgtFormat, y_rows):
    if fmt.deal == "blocks":
        return y_rows[: fmt.shape[0]]
    if fmt.deal == "index":
        P = fmt.n_programs
        return (y_rows.reshape(P, fmt.rb, *y_rows.shape[1:])
                .swapaxes(0, 1).reshape(P * fmt.rb, *y_rows.shape[1:])[: fmt.shape[0]])
    # split rows: Y[r] = sum over the row's consecutive aligned virtual-row
    # slots = ONE gather from the pairwise-sum pyramid (the TPU stand-in
    # for the reference's cross-block atomicAdd; a chain of S row-gathers
    # measured ~40 us each per 32k rows on v5e, the folds are vector adds)
    slot = jnp.asarray(fmt.slot_of_origrow)  # (M,) pyramid index
    pyr = [y_rows]
    for _ in range(fmt.split_levels.bit_length() - 1):
        prev = pyr[-1]
        pyr.append(prev.reshape(prev.shape[0] // 2, 2, *prev.shape[1:]).sum(1))
    # levels are laid out back-to-back: [y; fold2; fold4; fold8]
    y_src = jnp.concatenate(pyr, axis=0) if fmt.split_levels > 1 else y_rows
    oob = y_src.shape[0]
    slot = jnp.where(slot < 0, oob, slot)
    return jnp.take(y_src, slot, axis=0, mode="fill", fill_value=0)


def dgt_spmm(
    fmt: DgtFormat,
    x: jnp.ndarray,
    *,
    unroll: int = 8,
    rowhot=None,
    scatter: str = "select",
    fold: bool = True,
    pipe: bool = False,
    rowhot_i8: bool = False,
    stream_x: bool = False,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Y[M, K] = A . X[N, K] with A in DgtFormat (K > kt runs kt-wide tiles
    on a grid axis).  ``rowhot`` (from pack_rowhot) streams precomputed
    scatter planes instead of the per-chunk compare; ``scatter``/``fold``/
    ``pipe`` select the round-4 kernel variants (see _dgt_kernel);
    ``rowhot_i8`` narrows the scatter one-hot to int8 (round-5 C4);
    ``stream_x`` streams window tiles from HBM instead of holding X
    resident (round-5 large-N path; resid+select only)."""
    if interpret is None:
        interpret = kernel_backend_interpret()
    m, n_cols = fmt.shape
    k = x.shape[1]
    assert x.shape[0] == n_cols
    kt = fmt.kt
    if k % kt:
        x = jnp.pad(x, ((0, 0), (0, kt - k % kt)))
    if stream_x:
        assert fmt.resid and scatter == "select" and rowhot is None, \
            "stream_x pairs with the resid select kernel"
        # the scalar-prefetch wins array lives WHOLE in SMEM; above ~19-36KB
        # tpu_compile_helper dies (bisected on v5e 2026-08-20: 36.4KB fails,
        # 18.8KB compiles).  Split the chunk axis into sequential calls of
        # <= 16KB of scalars each and sum the partial Y planes.
        T = fmt.chunk_g // 128
        per_chunk = fmt.n_programs * T * 4
        step = max(int(16384 // max(per_chunk, 1)), 1)
        y_rows = None
        for s0 in range(0, fmt.n_chunks, step):
            sl = slice(s0, min(s0 + step, fmt.n_chunks))
            y = _dgt_call_stream(
                fmt.wins[:, sl], fmt.cols[:, sl], fmt.lrw[:, sl],
                fmt.vals[:, sl], x,
                P=fmt.n_programs, nc=sl.stop - sl.start, g=fmt.chunk_g,
                rb=fmt.rb, kt=kt, mode=fmt.mode, nw=fmt.nw,
                interpret=interpret, rowhot_i8=rowhot_i8,
            )
            y_rows = y if y_rows is None else y_rows + y
        return _unpack_rows(fmt, y_rows)[:, :k]
    y_rows = _dgt_call(
        fmt.wins, fmt.cols, fmt.lrw, fmt.vals, x, rowhot,
        P=fmt.n_programs, nc=fmt.n_chunks, g=fmt.chunk_g, rb=fmt.rb,
        kt=kt, mode=fmt.mode, resid=fmt.resid, nw=fmt.nw, unroll=unroll,
        interpret=interpret, scatter=scatter, fold=fold, pipe=pipe,
        rowhot_i8=rowhot_i8,
    )
    return _unpack_rows(fmt, y_rows)[:, :k]


def dgt_spmv(
    fmt: DgtFormat,
    x: jnp.ndarray,
    *,
    unroll: int = 8,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """y[M] = A . x[N]: SpMV through the kt-wide SpMM kernel (x zero-padded
    to kt columns).  The kt>=8 scatter geometry (ngrp=8 groups) measures
    FASTER per nz than the dedicated 64-group kt=1 kernel (PERF.md); the
    cost is an x3 resident of N*kt*4 bytes, so this path gates on VMEM and
    large-N problems stay on dg_spmv."""
    assert x.ndim == 1 and x.shape[0] == fmt.shape[1]
    y = dgt_spmm(fmt, x[:, None], unroll=unroll, interpret=interpret)
    return y[:, 0]
