"""span_gather — span-chunked one-hot MXU SpMM (the small-K champion).

tile_onehot cuts nz into fixed column tiles: at low density most
(program, tile) segments are much smaller than the chunk size G, so padding
approaches 2x, and the one-hot windows must be wide (CT ~ 1024) to catch
enough nz.  This kernel instead sorts each program's nz BY COLUMN and cuts
chunks of exactly G in that order; each chunk records its own window start
``c0`` (the first column, rounded down to the sublane).  Sorted columns make
G consecutive nz span only ~N*G/nnz_p columns, so a much narrower window
(CT ~ 512) suffices and only the final chunk per program is padded:

  padding    ~1.0  (vs ~1.9 for fixed tiles)
  MXU cost   colhotT [CT, G] + rowhot [RB, G] dots ~ (CT+RB)*G/128^3
             tile-ops per chunk; both one-hots are built transposed and
             contracted with nonstandard dot_general dimension orders so
             every operand stays lane-major (onehot_chunk_contrib in
             kernels/common.py) — the naive orientation needs (G, 1)
             sublane loads whose relayouts cost as much as the math.

Scatter needs no ordering (rowhot handles arbitrary rows within the
program), so the column sort costs nothing on the output side; the
program's rows land in their stripe slots as usual.  Rows are dealt to
programs round-robin by descending length, so chunk counts balance and the
uniform NC pads only the tail.

X must be VMEM-resident ((N, xwidth) block) because window starts are
dynamic — the small/medium-K regime (~1-6 MB); larger N routes to the
span_colsplit schedule family (sum of column-range sub-plans) and larger K
to the streaming tile kernel.  Same precision modes as tile_onehot.
Measured on v5e (32k^2 power-law, 1M nnz): 9.2 GF/s at K=8 rising to
~46 GF/s at K=128 on one pack — see PERF.md.

Reference counterpart: the column-direction blocking family
(fixed_interval_col_direction_*_operator) fused with nnz-direction chunking
— a combination the reference cannot express but the schedule vocabulary
makes natural on TPU.
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

from tpusparse.kernels.common import (cdiv, kernel_backend_interpret,
                                      onehot_chunk_contrib, pad_dense_rows,
                                      round_up)
from tpusparse.kernels.tile_onehot import _prep_x

PRECISIONS = ("bf16", "fp32x2", "fp32")


@dataclasses.dataclass
class SpanFormat:
    """Per-program column-sorted chunks with dynamic window starts.

    Arrays (P programs, NC chunks each, G nz per chunk):
      c0    [P, 1, NC] int32  window start column (multiple of 8)
      cols  [P, NC, G] int32  column offset within the window (< CT)
      lrow  [P, NC, G] int32  row local to the program (< RB)
      vals  [P, NC, G] f32    value (0 for padding)
    All lane-major: the kernel builds both one-hots transposed and contracts
    with nonstandard dot_general dimension orders, so no (G, 1) sublane-major
    loads (and no in-register transposes) are ever needed.
      slot_of_origrow [M] int32
    """

    c0: Any
    cols: Any
    lrow: Any
    vals: Any
    slot_of_origrow: Any
    n_programs: int
    n_chunks: int
    chunk_g: int
    rb: int
    ct: int
    shape: tuple[int, int]
    nnz_real: int
    # optional: flat packed position per input nz (pack_span(keep_perm=True));
    # enables values-only updates via with_values
    perm_of_nz: Any = None

    @property
    def padding_rate(self) -> float:
        return self.n_programs * self.n_chunks * self.chunk_g / max(self.nnz_real, 1)

    @property
    def memory_bytes(self) -> int:
        return sum(np.asarray(a).nbytes
                   for a in (self.c0, self.cols, self.lrow, self.vals))


def span_chunk_numpy(cols_s, lrow_s, vals_s, starts, g, span_budget, *,
                     keep_perm=False):
    """Pure-numpy span chunker (fallback for native.span_pack): cut each
    program's column-sorted nz into chunks of <= G nz whose columns fit a
    ``span_budget``-wide window.  Returns (c0 [P, NC], cols/lrow [P, NC, G],
    vals [P, NC, G], dest_sorted or None, nc_per_program [P])."""
    p_count = len(starts) - 1
    chunks: list[list[tuple[int, int, int]]] = [[] for _ in range(p_count)]
    # build (c0, begin, end) chunk descriptors per program
    for p in range(p_count):
        lo, hi = int(starts[p]), int(starts[p + 1])
        colp = cols_s[lo:hi]
        i = lo
        while i < hi:
            c0 = int(cols_s[i]) & ~7
            # nz fitting this window, capped at G
            j_span = lo + int(np.searchsorted(colp, c0 + span_budget + 8, side="left"))
            j = min(i + g, j_span, hi)
            chunks[p].append((c0, i, j))
            i = j

    nc = max(max((len(c) for c in chunks), default=1), 1)
    c0_2d = np.zeros((p_count, nc), dtype=np.int32)
    cols_f = np.zeros((p_count, nc, g), dtype=np.int32)
    lrow_f = np.zeros((p_count, nc, g), dtype=np.int32)
    vals_f = np.zeros((p_count, nc, g), dtype=np.float32)
    dest_sorted = np.zeros(cols_s.size, dtype=np.int64) if keep_perm else None
    for p in range(p_count):
        for ci, (c0, i, j) in enumerate(chunks[p]):
            n = j - i
            c0_2d[p, ci] = c0
            cols_f[p, ci, :n] = cols_s[i:j] - c0
            lrow_f[p, ci, :n] = lrow_s[i:j]
            vals_f[p, ci, :n] = vals_s[i:j]
            if keep_perm:
                dest_sorted[i:j] = (p * nc + ci) * g + np.arange(n)
    nc_arr = np.asarray([len(c) for c in chunks], dtype=np.int64)
    return c0_2d, cols_f, lrow_f, vals_f, dest_sorted, nc_arr


def pack_span(
    mat_or_ms,
    sub: int = 0,
    *,
    out_rows: int | None = None,
    rb: int = 512,
    ct: int = 512,
    g: int = 128,
    balance: bool = True,
    val_dtype=None,
    keep_perm: bool = False,
) -> SpanFormat:
    """Pack a CooMatrix (or a MetaDataSet sub-matrix) into SpanFormat.

    ``balance`` deals rows to programs round-robin in descending-length
    order, so every program carries ~nnz/P work and the uniform chunk count
    NC pads only the tail (the reference's sort + balanced blocking combo,
    sort_operator + balanced_interval_*_operator, collapsed into the
    packer; output recovery is the usual slot gather)."""
    from tpusparse.io.mtx import CooMatrix
    from tpusparse.levels import Level

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
    span_budget = ct - 8  # window start is rounded down to a multiple of 8

    if balance and row_num:
        # deal rows (desc length) round-robin: program = rank % P
        lengths = np.bincount(rows, minlength=row_num)
        by_len = np.argsort(-lengths, kind="stable")
        p_of_row = np.empty(row_num, dtype=np.int64)
        lrow_of_row = np.empty(row_num, dtype=np.int64)
        ranks = np.arange(row_num)
        p_of_row[by_len] = ranks % p_count
        lrow_of_row[by_len] = ranks // p_count
        p_arr = p_of_row[rows]
        lrow_arr = lrow_of_row[rows]
        slot_of_local = p_of_row * rb + lrow_of_row  # slot per local row id
    else:
        p_arr = rows // rb
        lrow_arr = rows % rb
        slot_of_local = (np.arange(row_num) // rb) * rb + np.arange(row_num) % rb
    order = np.lexsort((cols, p_arr))
    lrow_s, cols_s, vals_s = lrow_arr[order], cols[order], np.asarray(vals)[order]
    p_s = p_arr[order]
    starts = np.searchsorted(p_s, np.arange(p_count + 1))

    from tpusparse import native

    packed = None
    dest_sorted = None
    if native.available():
        packed = native.span_pack(cols_s, lrow_s, vals_s, starts, g,
                                  span_budget, want_dest=keep_perm)
    if packed is not None:
        if keep_perm:
            c0_2d, cols_f, lrow_f, vals_f, _nc_arr, dest_sorted = packed
        else:
            c0_2d, cols_f, lrow_f, vals_f, _nc_arr = packed
        nc = c0_2d.shape[1]
        c0_arr = c0_2d[:, None, :]
    else:
        c0_2d, cols_f, lrow_f, vals_f, dest_sorted, _nc_arr = span_chunk_numpy(
            cols_s, lrow_s, vals_s, starts, g, span_budget, keep_perm=keep_perm
        )
        nc = c0_2d.shape[1]
        c0_arr = c0_2d[:, None, :]

    slot_of_origrow = np.full(out_rows, -1, dtype=np.int32)
    keep = rec >= 0
    slot_of_origrow[rec[keep]] = slot_of_local[keep].astype(np.int32)

    return SpanFormat(
        c0=jnp.asarray(c0_arr),
        cols=jnp.asarray(cols_f),
        lrow=jnp.asarray(lrow_f),
        # reference HALF mode maps to bf16 on TPU (val_dtype='bfloat16');
        # the kernel accumulates fp32 regardless
        vals=jnp.asarray(vals_f,
                         dtype=val_dtype if val_dtype is not None else jnp.float32),
        slot_of_origrow=jnp.asarray(slot_of_origrow),
        n_programs=p_count,
        n_chunks=nc,
        chunk_g=g,
        rb=rb,
        ct=ct,
        shape=(out_rows, col_num),
        nnz_real=int(np.count_nonzero(vals_f)),
        perm_of_nz=(None if dest_sorted is None
                    else np.asarray(dest_sorted)[np.argsort(order, kind="stable")]),
    )


def with_values(fmt: SpanFormat, new_vals) -> SpanFormat:
    """Values-only format update: same sparsity pattern, new values in the
    original nz order given to pack_span (requires keep_perm=True).  The
    index arrays and the compiled kernel are reused untouched (scipy's
    ``.data = ...`` idiom; the reference would re-run its whole pipeline)."""
    assert fmt.perm_of_nz is not None, "pack_span(..., keep_perm=True) required"
    new_vals = np.asarray(new_vals, dtype=np.float32)
    flat = np.zeros(fmt.n_programs * fmt.n_chunks * fmt.chunk_g, dtype=np.float32)
    flat[np.asarray(fmt.perm_of_nz)] = new_vals
    vals = flat.reshape(fmt.n_programs, fmt.n_chunks, fmt.chunk_g)
    return dataclasses.replace(
        fmt,
        vals=jnp.asarray(vals, dtype=np.asarray(fmt.vals).dtype),
        nnz_real=int(np.count_nonzero(vals)),
    )


def _span_kernel(c0_ref, cols_ref, lrow_ref, vals_ref, x_ref, y_ref, *,
                 nc, g, rb, ct, mode, unroll):
    kt = y_ref.shape[2]
    f32 = jnp.float32

    def chunk_contrib(j, acc):
        c0 = pl.multiple_of(c0_ref[0, 0, j], 8)
        cl = cols_ref[0, pl.ds(j, 1), :]          # (1, G)
        lr = lrow_ref[0, pl.ds(j, 1), :]          # (1, G)
        v = vals_ref[0, pl.ds(j, 1), :]           # (1, G)
        xwin = x_ref[pl.ds(c0, ct), :]
        return onehot_chunk_contrib(cl, lr, v, xwin, acc, rb=rb, ct=ct,
                                    mode=mode, kt=kt)

    if unroll > 1:
        def body(i, accs):
            return tuple(chunk_contrib(i * unroll + u, accs[u]) for u in range(unroll))
        accs = jax.lax.fori_loop(0, nc // unroll, body,
                                 tuple(jnp.zeros((rb, kt), f32) for _ in range(unroll)))
        acc = functools.reduce(jnp.add, accs)
        for r in range((nc // unroll) * unroll, nc):
            acc = chunk_contrib(r, acc)
    else:
        acc = jax.lax.fori_loop(0, nc, chunk_contrib, jnp.zeros((rb, kt), f32))
    y_ref[0, :, :] = acc


@functools.partial(
    jax.jit,
    static_argnames=("n_programs", "nc", "g", "rb", "ct", "ktile", "mode",
                     "unroll", "interpret"),
)
def _span_call(c0, cols3, lrow3, vals3, x, *, n_programs, nc, g, rb, ct, ktile,
               mode, unroll, interpret):
    n = x.shape[0]
    k = x.shape[1]
    kt_count = cdiv(k, ktile)
    xin, xwidth = _prep_x(x, mode, ktile)
    u = unroll if unroll > 1 else 1
    kernel = functools.partial(_span_kernel, nc=nc, g=g, rb=rb, ct=ct,
                               mode=mode, unroll=u)
    y = pl.pallas_call(
        kernel,
        grid=(n_programs, kt_count),
        out_shape=jax.ShapeDtypeStruct((n_programs, rb, kt_count * ktile), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 1, nc), lambda p, t: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nc, g), lambda p, t: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, g), lambda p, t: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, g), lambda p, t: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, xwidth), lambda p, t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, ktile), lambda p, t: (p, 0, t),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(c0, cols3, lrow3, vals3, xin)
    return y.reshape(n_programs * rb, kt_count * ktile)


def _span_kernel_stream(c0_ref, cols_ref, lrow_ref, vals_ref, x_ref, y_ref, *,
                        g, rb, ct, mode):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    kt = y_ref.shape[2]
    c0 = pl.multiple_of(c0_ref[0, 0, j], 8)
    cl = cols_ref[0, 0]              # (1, G) — DMA'd per chunk
    lr = lrow_ref[0, 0]              # (1, G)
    v = vals_ref[0, 0]               # (1, G)
    xwin = x_ref[pl.ds(c0, ct), :]
    y_ref[0, :, :] = onehot_chunk_contrib(cl, lr, v, xwin, y_ref[0, :, :],
                                          rb=rb, ct=ct, mode=mode, kt=kt)


@functools.partial(
    jax.jit,
    static_argnames=("n_programs", "nc", "g", "rb", "ct", "ktile", "mode", "interpret"),
)
def _span_call_stream(c0, colsT, lrow, valsT, x, *, n_programs, nc, g, rb, ct,
                      ktile, mode, interpret):
    n = x.shape[0]
    k = x.shape[1]
    kt_count = cdiv(k, ktile)
    xin, xwidth = _prep_x(x, mode, ktile)
    kernel = functools.partial(_span_kernel_stream, g=g, rb=rb, ct=ct, mode=mode)
    # trailing singleton: per-chunk (1, G) lane-major blocks (Mosaic rule:
    # last two block dims must divide (8, 128) or equal the array dims)
    cols4 = colsT.reshape(n_programs, nc, 1, g)
    lrow4 = lrow.reshape(n_programs, nc, 1, g)
    vals4 = valsT.reshape(n_programs, nc, 1, g)
    y = pl.pallas_call(
        kernel,
        grid=(n_programs, kt_count, nc),
        out_shape=jax.ShapeDtypeStruct((n_programs, rb, kt_count * ktile), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 1, nc), lambda p, t, j: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, g), lambda p, t, j: (p, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, g), lambda p, t, j: (p, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, g), lambda p, t, j: (p, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, xwidth), lambda p, t, j: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, ktile), lambda p, t, j: (p, 0, t),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(c0, cols4, lrow4, vals4, xin)
    return y.reshape(n_programs * rb, kt_count * ktile)


def span_spmm(
    fmt: SpanFormat,
    x: jnp.ndarray,
    *,
    ktile: int | None = None,
    precision: str = "fp32x2",
    unroll: int = 4,
    interpret: bool | None = None,
    stream: bool = False,
    vals=None,
) -> jnp.ndarray:
    """Y[M, K] = A . X[N, K] with A in SpanFormat.

    ``stream=True`` uses the grid-axis chunk variant (per-chunk index DMA);
    the default fori-loop variant keeps the whole chunk list VMEM-resident
    and benches slightly faster on v5e.  ``vals`` overrides the packed
    [P, NC, G] value plane (a traced array — the trainable-values path,
    kernels/sddmm.py)."""
    assert precision in PRECISIONS, precision
    if vals is None:
        vals = fmt.vals
    if interpret is None:
        interpret = kernel_backend_interpret()
    m, n_cols = fmt.shape
    k = x.shape[1]
    assert x.shape[0] == n_cols
    if ktile is None:
        ktile = k if k <= 128 else 128
    if k % ktile:
        x = jnp.pad(x, ((0, 0), (0, ktile - k % ktile)))
    # window [c0, c0+ct) may read past N: pad X rows by CT
    x = pad_dense_rows(x.astype(jnp.float32), round_up(n_cols, 8) + fmt.ct)
    if stream:
        y_rows = _span_call_stream(
            fmt.c0, fmt.cols, fmt.lrow, vals, x,
            n_programs=fmt.n_programs, nc=fmt.n_chunks, g=fmt.chunk_g,
            rb=fmt.rb, ct=fmt.ct, ktile=ktile, mode=precision,
            interpret=interpret,
        )
    else:
        y_rows = _span_call(
            fmt.c0, fmt.cols, fmt.lrow, vals, x,
            n_programs=fmt.n_programs, nc=fmt.n_chunks, g=fmt.chunk_g,
            rb=fmt.rb, ct=fmt.ct, ktile=ktile, mode=precision,
            unroll=unroll, interpret=interpret,
        )
    slot = jnp.asarray(fmt.slot_of_origrow)
    oob = y_rows.shape[0]
    slot = jnp.where(slot < 0, oob, slot)
    y = jnp.take(y_rows, slot, axis=0, mode="fill", fill_value=0)
    return y[:, :k]
