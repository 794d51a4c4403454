"""dg_gather — dynamic-gather SpMM/SpMV (the VPU-gather champion).

The span/radix kernels realize the gather ``x[col]`` as one-hot MXU
contractions, whose cost is the contraction length per chunk: measured
0.8-1.2 cyc/nz (MICROBENCH.jsonl chunk_cost rows).  Mosaic on v5e lowers
``jnp.take_along_axis`` along the 128-lane dim to the VPU's dynamic-gather
instruction (f32/int32 operands, exactly 128 lanes, any sublane count;
along sublanes only within one 8-row vreg) — one instruction moves 128
gathered elements per sublane, turning the gather from ~1 cyc/nz of MXU
cells into ~0.01-0.05 cyc/nz of VPU work.  This kernel keeps the span
machinery (column-sorted chunks of G nz within a window, length-dealt row
blocks) and replaces radix's gather+collapse dots:

  X layout    x3[t, w, kk, l] = x[w*128 + l, t*kt + kk] — each 128-column
              window tile holds the kt-wide K-tile TRANSPOSED, so ONE
              lane-gather with the column index broadcast over kt sublanes
              fetches all kt K-values of a nz.
  gather      per 128-lane tile of the chunk: ns window tiles, each one
              take_along_axis + select by col//128 — ns*(G/128) VPU
              gathers/chunk replace the (S, G)-contraction MXU dot.
  scatter     unchanged from radix: products split hi/lo bf16 (single
              rounding of v*x — near-fp32 end-to-end, ~1e-5 class, vs
              radix's 2e-3: here the gather itself is EXACT f32), joint
              (grp, hl, k) lane encoding, one (rbs, G) one-hot MXU dot.

  SpMV (kt=1) window tiles are (8, 128) = 1024 x values; one lane-gather
              returns all 8 window-sublane candidates per nz, a select
              tree picks the live one, and a fixed (128, 16) bf16 dot
              collapses the window-sublane dim while fanning out the
              (grp, hl) scatter sublanes (everything stays >= 8 sublanes:
              sub-8 intermediates explode Mosaic compile time).

Measured on v5e (32k^2 power-law, 1M nnz, K=8 fp32x2): 39.5 GF/s vs the
radix champion's 14-20 and BCOO's 0.97; SpMV 262k^2 / 10M nnz: 2.1 Gnnz/s
vs radix kt=1's 1.25.  See PERF.md.

K <= 8 runs at kt=8 (zero-padded X columns): kt < 8 would create sub-8
sublane intermediates; kt in {16, 32} trades fewer grid K-tiles against a
bigger scatter contraction (rbs = rb*nhl*kt/128).

Reference counterpart: the generated gather loop + vectorized Load()
(total_BMT_result_reduce_to_one_register_token.cc:643-806) — the dynamic
lane-gather is the TPU analogue of the GPU's per-thread x[col[c]*K] loads,
with the window/chunk machinery standing in for the L1/ldg cache.
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
DG_KTS = (1, 8, 16, 32)


def choose_kt_dg(k: int) -> int:
    """Smallest supported K-tile covering k (k<=8 pads to kt=8: smaller
    tiles would put sub-8-sublane intermediates in the kernel, which
    explodes Mosaic compile time; K=1 has its own kernel)."""
    if k == 1:
        return 1
    for kt in (8, 16, 32):
        if k <= kt:
            return kt
    return 32


def dg_geometry(kt: int, mode: str) -> tuple[int, int, int]:
    """(wt, nhl, ngrp): window-tile width, hi/lo planes, output lane
    groups."""
    assert kt in DG_KTS, f"kt={kt} not in {DG_KTS}"
    assert mode in PRECISIONS, mode
    if kt == 1:
        assert mode == "fp32x2", "kt=1 runs the fp32x2 candidate-fold kernel"
        return 1024, 2, 64
    nhl = 2 if mode == "fp32x2" else 1
    assert nhl * kt >= 8, (kt, mode)
    return 128, nhl, 128 // (nhl * kt)


@dataclasses.dataclass
class DgFormat:
    """Aligned-window span-chunked format (P programs, NC chunks, G nz):
      c0    [P, 1, NC] int32  window start column (multiple of wt)
      cols  [P, NC, G] int32  column offset within the window (< ns*wt)
      lrow  [P, NC, G] int32  row local to the program (< RB)
      vals  [P, NC, G] f32
      nc_p  [P, 1, 1]  int32  real chunk count (compute-padding diagnostic)
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
    ns: int
    kt: int
    mode: str
    shape: tuple[int, int]
    nnz_real: int
    perm_of_nz: Any = None
    deal: str = "arbitrary"  # 'blocks' | 'index' | 'arbitrary' (see pack_radix)

    @property
    def padding_rate(self) -> float:
        return self.n_programs * self.n_chunks * self.chunk_g / max(self.nnz_real, 1)

    @property
    def memory_bytes(self) -> int:
        return sum(np.asarray(a).nbytes
                   for a in (self.c0, self.cols, self.lrow, self.vals))

    @property
    def window(self) -> int:
        wt, _, _ = dg_geometry(self.kt, self.mode)
        return self.ns * wt


def _aligned_chunk_numpy(cols_s, lrow_s, vals_s, starts, g, W, align, *,
                         keep_perm=False):
    """Numpy fallback for native.span_pack_aligned (same walk)."""
    p_count = len(starts) - 1
    chunks: list[list[tuple[int, int, int]]] = [[] for _ in range(p_count)]
    for p in range(p_count):
        lo, hi = int(starts[p]), int(starts[p + 1])
        colp = cols_s[lo:hi]
        i = lo
        while i < hi:
            c0 = int(cols_s[i]) & ~(align - 1)
            j_span = lo + int(np.searchsorted(colp, c0 + W, side="left"))
            j = min(i + g, j_span, hi)
            chunks[p].append((c0, i, j))
            i = j
    nc = max(max((len(c) for c in chunks), default=1), 1)
    c0_2d = np.zeros((p_count, nc), dtype=np.int32)
    cols_f = np.zeros((p_count, nc, g), dtype=np.int32)
    lrow_f = np.zeros((p_count, nc, g), dtype=np.int32)
    vals_f = np.zeros((p_count, nc, g), dtype=np.float32)
    dest = np.zeros(cols_s.size, dtype=np.int64) if keep_perm else None
    for p in range(p_count):
        for ci, (c0, i, j) in enumerate(chunks[p]):
            n = j - i
            c0_2d[p, ci] = c0
            cols_f[p, ci, :n] = cols_s[i:j] - c0
            lrow_f[p, ci, :n] = lrow_s[i:j]
            vals_f[p, ci, :n] = vals_s[i:j]
            if keep_perm:
                dest[i:j] = (p * nc + ci) * g + np.arange(n)
    nc_arr = np.asarray([len(c) for c in chunks], dtype=np.int64)
    return c0_2d, cols_f, lrow_f, vals_f, nc_arr, dest


def pack_dg(
    mat_or_ms,
    sub: int = 0,
    *,
    out_rows: int | None = None,
    rb: int = 1024,
    ns: int = 8,
    g: int = 512,
    kt: int = 8,
    mode: str = "fp32x2",
    balance: bool = True,
    deal: str | None = None,
    keep_perm: bool = False,
) -> DgFormat:
    """Pack into DgFormat (aligned-window chunking; row dealing and the
    affine-unpack detection follow pack_radix, radix_gather.py)."""
    from tpusparse.io.mtx import CooMatrix
    from tpusparse.levels import Level

    wt, nhl, ngrp = dg_geometry(kt, mode)
    W = ns * wt
    assert rb % ngrp == 0, f"rb={rb} must be a multiple of ngrp={ngrp}"
    assert g % 128 == 0, f"g={g} must be a multiple of the 128-lane tile"

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
        packed = native.span_pack_aligned(cols_s, lrow_s, vals_s, starts, g,
                                          W, wt, want_dest=keep_perm)
    if packed is not None:
        if keep_perm:
            c0_2d, cols_f, lrow_f, vals_f, nc_arr, dest_sorted = packed
        else:
            c0_2d, cols_f, lrow_f, vals_f, nc_arr = packed
    else:
        c0_2d, cols_f, lrow_f, vals_f, nc_arr, dest_sorted = _aligned_chunk_numpy(
            cols_s, lrow_s, vals_s, starts, g, W, wt, keep_perm=keep_perm)
    nc = c0_2d.shape[1]

    slot_of_origrow = np.full(out_rows, -1, dtype=np.int32)
    keep = rec >= 0
    slot_of_origrow[rec[keep]] = slot_of_local[keep].astype(np.int32)

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

    return DgFormat(
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
        ns=ns,
        kt=kt,
        mode=mode,
        shape=(out_rows, col_num),
        nnz_real=int(np.count_nonzero(vals_f)),
        perm_of_nz=(None if dest_sorted is None
                    else np.asarray(dest_sorted)[np.argsort(order, kind="stable")]),
        deal=unpack,
    )


def with_values(fmt: DgFormat, new_vals) -> DgFormat:
    """Values-only update (same pattern; requires pack_dg(keep_perm=True))."""
    assert fmt.perm_of_nz is not None, "pack_dg(..., keep_perm=True) required"
    new_vals = np.asarray(new_vals, dtype=np.float32)
    flat = np.zeros(fmt.n_programs * fmt.n_chunks * fmt.chunk_g, dtype=np.float32)
    flat[np.asarray(fmt.perm_of_nz)] = new_vals
    vals = flat.reshape(fmt.n_programs, fmt.n_chunks, fmt.chunk_g)
    return dataclasses.replace(
        fmt,
        vals=jnp.asarray(vals),
        nnz_real=int(np.count_nonzero(vals)),
    )


def _dg_kernel(c0_ref, cols_ref, lrow_ref, vals_ref, x3_ref, y_ref, *,
               nc, g, rbs, ngrp, ns, kt, mode, unroll):
    f32, bf16 = jnp.float32, jnp.bfloat16
    iota_rbs = jax.lax.broadcasted_iota(jnp.int32, (rbs, 1), 0)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    nhl = 2 if mode == "fp32x2" else 1
    lane_grp = lane128 // (nhl * kt)

    def chunk(j, acc):
        w0 = c0_ref[0, 0, j] // 128
        colw = cols_ref[0, pl.ds(j, 1), :]           # (1, G)
        lrow = lrow_ref[0, pl.ds(j, 1), :]
        v = vals_ref[0, pl.ds(j, 1), :]
        # Index math stays at EXACTLY 8 sublanes: Mosaic rejects the direct
        # vector.broadcast of a 1-sublane i32 vector, and lane-slicing i32
        # vectors at any sublane count other than 8 crashes its
        # vector_extract_strided_slice pass (v5e, verified) — so broadcast
        # (1,G)->(8,G) via an add, slice (8,128) tiles, and sublane-stack
        # to (kt,128) for the gather.
        colw8 = colw + jnp.zeros((8, 1), jnp.int32)
        lidx8 = colw8 % 128
        widx8 = colw8 // 128
        rep = kt // 8
        xws = [x3_ref[0, pl.ds(w0 + w, 1)][0] for w in range(ns)]  # (kt,128)
        parts = []
        for tt in range(g // 128):
            sl = slice(tt * 128, (tt + 1) * 128)
            li = jnp.concatenate([lidx8[:, sl]] * rep, axis=0)   # (kt,128)
            wi = jnp.concatenate([widx8[:, sl]] * rep, axis=0)
            xg_t = jnp.zeros((kt, 128), f32)
            for w in range(ns):
                gt = jnp.take_along_axis(xws[w], li, axis=1)
                xg_t = jnp.where(wi == w, gt, xg_t)
            parts.append(xg_t)
        xg = jnp.concatenate(parts, axis=1)          # (kt, G) exact f32
        p = xg * v                                   # single rounding
        if mode == "fp32x2":
            phi, plo = _split_bf16(p)
            c2 = jnp.concatenate([phi, plo], axis=0)  # (nhl*kt, G)
        else:
            c2 = p.astype(bf16)
        psel_pre = jnp.concatenate([c2] * ngrp, axis=0)  # (128, G)
        grp_mask = lane_grp == (lrow % ngrp)
        psel = jnp.where(grp_mask, psel_pre, bf16(0))
        rowhot = (iota_rbs == (lrow // ngrp)).astype(bf16)
        return acc + jax.lax.dot_general(
            rowhot, psel, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    # STATIC loop bounds (see radix_gather: dynamic trip counts defeat
    # Mosaic's chunk-DMA software pipelining, measured 30% slower)
    if unroll > 1:
        def body(i, accs):
            return tuple(chunk(i * unroll + u, accs[u]) for u in range(unroll))
        accs = jax.lax.fori_loop(0, nc // unroll, body,
                                 tuple(jnp.zeros((rbs, 128), f32) for _ in range(unroll)))
        acc = functools.reduce(jnp.add, accs)
        for r in range((nc // unroll) * unroll, nc):
            acc = chunk(r, acc)
    else:
        acc = jax.lax.fori_loop(0, nc, chunk, jnp.zeros((rbs, 128), f32))
    y_ref[0, 0, :, :] = acc


def _dg1_kernel(c0_ref, cols_ref, lrow_ref, vals_ref, x3_ref, y_ref, *,
                nc, g, rbs, ns, unroll):
    f32, bf16 = jnp.float32, jnp.bfloat16
    iota_rbs = jax.lax.broadcasted_iota(jnp.int32, (rbs, 1), 0)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    ngrp = 64
    # B[s, hl*8 + wsub] = (hl == s % 2): collapses the window-sublane dim
    # (exactly one live candidate per column) and fans out the hl parity
    s_i = jax.lax.broadcasted_iota(jnp.int32, (128, 16), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (128, 16), 1)
    B = ((c_i // 8) == (s_i % 2)).astype(bf16)
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def chunk(j, acc):
        w0 = c0_ref[0, 0, j] // 1024
        colw = cols_ref[0, pl.ds(j, 1), :]
        lrow = lrow_ref[0, pl.ds(j, 1), :]
        v = vals_ref[0, pl.ds(j, 1), :]
        colw8 = colw + jnp.zeros((8, 1), jnp.int32)  # (8, G)
        lidx = colw8 % 128
        sidx = (colw8 // 128) % 8
        widx = colw8 // 1024
        xws = [x3_ref[pl.ds(w0 + w, 1)][0] for w in range(ns)]  # (8,128)
        parts = []
        for tt in range(g // 128):
            sl = slice(tt * 128, (tt + 1) * 128)
            cand = jnp.zeros((8, 128), f32)
            for w in range(ns):
                gt = jnp.take_along_axis(xws[w], lidx[:, sl], axis=1)
                cand = jnp.where(widx[:, sl] == w, gt, cand)
            parts.append(cand)
        cand = jnp.concatenate(parts, axis=1)        # (8, G): 8 candidates
        csel = jnp.where(sidx == iota8, cand, 0.0)   # one live per column
        p = csel * v
        phi, plo = _split_bf16(p)
        c2 = jnp.concatenate([phi, plo], axis=0)     # (16, G)
        # NOTE: Mosaic requires a 32-bit matmul accumulator ('tpu.matmul op
        # Expected matmul acc to be 32-bit', v5e) — a bf16-preferred B-dot
        # that would let the group mask run on bf16 vregs is rejected.
        psel_pre = jax.lax.dot_general(
            B, c2, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32)              # (128, G)
        grp_mask = (lane128 // 2) == (lrow % ngrp)
        psel = jnp.where(grp_mask, psel_pre, 0.0).astype(bf16)
        rowhot = (iota_rbs == (lrow // ngrp)).astype(bf16)
        return acc + jax.lax.dot_general(
            rowhot, psel, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    if unroll > 1:
        def body(i, accs):
            return tuple(chunk(i * unroll + u, accs[u]) for u in range(unroll))
        accs = jax.lax.fori_loop(0, nc // unroll, body,
                                 tuple(jnp.zeros((rbs, 128), f32) for _ in range(unroll)))
        acc = functools.reduce(jnp.add, accs)
        for r in range((nc // unroll) * unroll, nc):
            acc = chunk(r, acc)
    else:
        acc = jax.lax.fori_loop(0, nc, chunk, jnp.zeros((rbs, 128), f32))
    y_ref[0, :, :] = acc


@functools.partial(
    jax.jit,
    static_argnames=("P", "nc", "g", "rb", "ns", "kt", "mode", "unroll",
                     "interpret"),
)
def _dg_call(c0, cols3, lrow3, vals3, x, *, P, nc, g, rb, ns, kt, mode,
             unroll, interpret):
    n, k = x.shape
    wt, nhl, ngrp = dg_geometry(kt, mode)
    W = ns * wt
    nwin = cdiv(n, 128) + ns * (wt // 128)
    rbs = rb // ngrp
    kt_count = k // kt
    xpad = pad_dense_rows(x.astype(jnp.float32), nwin * 128)
    x3 = xpad.reshape(nwin, 128, kt_count, kt).transpose(2, 0, 3, 1)
    out = pl.pallas_call(
        functools.partial(_dg_kernel, nc=nc, g=g, rbs=rbs, ngrp=ngrp, ns=ns,
                          kt=kt, mode=mode, unroll=max(unroll, 1)),
        grid=(P, kt_count),
        out_shape=jax.ShapeDtypeStruct((P, kt_count, rbs, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 1, nc), lambda p, t: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nc, g), lambda p, t: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, g), lambda p, t: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, g), lambda p, t: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nwin, kt, 128), lambda p, t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, rbs, 128), lambda p, t: (p, t, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(c0, cols3, lrow3, vals3, x3)
    # out lanes within a tile: (grp, hl, k); row = rhi*ngrp + grp, sum hl
    y = out.reshape(P, kt_count, rbs, ngrp, nhl, kt)
    if nhl == 2:
        y = y[..., 0, :] + y[..., 1, :]
    else:
        y = y[..., 0, :]
    y = y.transpose(0, 2, 3, 1, 4)
    return y.reshape(P * rb, kt_count * kt)


@functools.partial(
    jax.jit,
    static_argnames=("P", "nc", "g", "rb", "ns", "unroll", "interpret"),
)
def _dg1_call(c0, cols3, lrow3, vals3, x, *, P, nc, g, rb, ns, unroll,
              interpret):
    n = x.shape[0]
    W = ns * 1024
    nwin = cdiv(n, 1024) + ns
    rbs = rb // 64
    xpad = pad_dense_rows(x.astype(jnp.float32).reshape(-1, 1), nwin * 1024)
    x3 = xpad.reshape(nwin, 8, 128)
    out = pl.pallas_call(
        functools.partial(_dg1_kernel, nc=nc, g=g, rbs=rbs, ns=ns,
                          unroll=max(unroll, 1)),
        grid=(P,),
        out_shape=jax.ShapeDtypeStruct((P, rbs, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 1, nc), lambda p: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nc, g), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, g), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, g), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nwin, 8, 128), lambda p: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rbs, 128), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(c0, cols3, lrow3, vals3, x3)
    # lanes: (grp, hl): row = rhi*64 + grp, sum hl
    y = out.reshape(P, rbs, 64, 2)
    return (y[..., 0] + y[..., 1]).reshape(P * rb)


def _unpack_rows(fmt: DgFormat, y_rows):
    if fmt.deal == "blocks":
        return y_rows[: fmt.shape[0]]
    if fmt.deal == "index":
        P = fmt.n_programs
        return (y_rows.reshape(P, fmt.rb, *y_rows.shape[1:])
                .swapaxes(0, 1).reshape(P * fmt.rb, *y_rows.shape[1:])[: fmt.shape[0]])
    slot = jnp.asarray(fmt.slot_of_origrow)
    oob = y_rows.shape[0]
    slot = jnp.where(slot < 0, oob, slot)
    return jnp.take(y_rows, slot, axis=0, mode="fill", fill_value=0)


def dg_spmm(
    fmt: DgFormat,
    x: jnp.ndarray,
    *,
    unroll: int = 8,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Y[M, K] = A . X[N, K] with A in DgFormat (kt >= 8; K > kt runs
    kt-wide tiles on a grid axis)."""
    assert fmt.kt >= 8, "kt=1 formats run dg_spmv"
    if interpret is None:
        interpret = kernel_backend_interpret()
    m, n_cols = fmt.shape
    k = x.shape[1]
    assert x.shape[0] == n_cols
    kt = fmt.kt
    if k % kt:
        x = jnp.pad(x, ((0, 0), (0, kt - k % kt)))
    y_rows = _dg_call(
        fmt.c0, fmt.cols, fmt.lrow, fmt.vals, x,
        P=fmt.n_programs, nc=fmt.n_chunks, g=fmt.chunk_g, rb=fmt.rb,
        ns=fmt.ns, kt=kt, mode=fmt.mode, unroll=unroll, interpret=interpret,
    )
    return _unpack_rows(fmt, y_rows)[:, :k]


def dg_spmv(
    fmt: DgFormat,
    x: jnp.ndarray,
    *,
    unroll: int = 8,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """y[M] = A . x[N] with A in a kt=1 DgFormat."""
    assert fmt.kt == 1, "pack with kt=1 for SpMV"
    if interpret is None:
        interpret = kernel_backend_interpret()
    assert x.shape[0] == fmt.shape[1]
    y_rows = _dg1_call(
        fmt.c0, fmt.cols, fmt.lrow, fmt.vals, x.reshape(-1),
        P=fmt.n_programs, nc=fmt.n_chunks, g=fmt.chunk_g, rb=fmt.rb,
        ns=fmt.ns, unroll=unroll, interpret=interpret,
    )
    return _unpack_rows(fmt, y_rows)
