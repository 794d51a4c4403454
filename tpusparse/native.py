"""ctypes bindings for the native host library (csrc/tpusparse_host.cpp).

The reference's host runtime is C++ throughout (SURVEY §2.1); this module is
the TPU build's native layer for host-side hot paths — .mtx parsing,
merge-path partitioning, bucket packing.  The library is built on demand
(``make -C csrc``) and every entry point has a numpy fallback, so the
package works without a compiler; callers use :func:`available` or just get
``None`` from loaders.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")
_SO = os.path.join(_CSRC, "libtpusparse_host.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO):
            try:
                subprocess.run(
                    ["make", "-C", _CSRC, "-s"], check=True,
                    capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i64 = ctypes.c_int64
        pi64 = ctypes.POINTER(i64)
        pi32 = ctypes.POINTER(ctypes.c_int32)
        pf32 = ctypes.POINTER(ctypes.c_float)
        pf64 = ctypes.POINTER(ctypes.c_double)
        lib.ts_parse_mtx.restype = ctypes.c_int
        lib.ts_parse_mtx.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(pi64), ctypes.POINTER(pi64), ctypes.POINTER(pf64),
            pi64, pi64, pi64,
        ]
        lib.ts_free.restype = None
        lib.ts_free.argtypes = [ctypes.c_void_p]
        lib.ts_merge_path_cuts.restype = i64
        lib.ts_merge_path_cuts.argtypes = [pi64, i64, i64, i64, pi64, pi64]
        lib.ts_bucket_pack.restype = i64
        lib.ts_bucket_pack.argtypes = [pi64, i64, i64, i64, pi32, pi32, pf32,
                                       pi32, pi32, pf32]
        lib.ts_bucket_counts.restype = None
        lib.ts_bucket_counts.argtypes = [pi64, i64, i64, pi64]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def parse_mtx(path: str):
    """Native .mtx load -> (rows, cols, vals, (m, n)) row-major sorted, or
    None if the native library is unavailable.  Raises ValueError on a
    malformed file (mirrors the Python reader)."""
    lib = _load()
    if lib is None:
        return None
    rows_p = ctypes.POINTER(ctypes.c_int64)()
    cols_p = ctypes.POINTER(ctypes.c_int64)()
    vals_p = ctypes.POINTER(ctypes.c_double)()
    m = ctypes.c_int64()
    n = ctypes.c_int64()
    nnz = ctypes.c_int64()
    rc = lib.ts_parse_mtx(
        os.fsencode(path),
        ctypes.byref(rows_p), ctypes.byref(cols_p), ctypes.byref(vals_p),
        ctypes.byref(m), ctypes.byref(n), ctypes.byref(nnz),
    )
    if rc == -1:
        raise FileNotFoundError(path)
    if rc == -2:
        raise ValueError(f"malformed matrix file: {path}")
    if rc == -3:
        raise ValueError(f"entry index out of range in {path}")
    if rc == -5:
        raise ValueError(f"diagonal entry in skew-symmetric matrix: {path}")
    if rc != 0:
        return None
    k = nnz.value
    try:
        rows = np.ctypeslib.as_array(rows_p, shape=(max(k, 1),))[:k].copy()
        cols = np.ctypeslib.as_array(cols_p, shape=(max(k, 1),))[:k].copy()
        vals = np.ctypeslib.as_array(vals_p, shape=(max(k, 1),))[:k].copy()
    finally:
        lib.ts_free(rows_p)
        lib.ts_free(cols_p)
        lib.ts_free(vals_p)
    return rows, cols, vals, (int(m.value), int(n.value))


def merge_path_cuts(row_ptr: np.ndarray, nnz: int, work: int):
    """Merge-path cut points -> (first_rows, first_nzs), each n_cuts+1 long;
    None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    row_ptr = np.ascontiguousarray(row_ptr, dtype=np.int64)
    m = row_ptr.size - 1
    total = m + nnz
    n_cuts = max((total + work - 1) // work, 1) if work > 0 else 1
    out_r = np.zeros(n_cuts + 1, dtype=np.int64)
    out_z = np.zeros(n_cuts + 1, dtype=np.int64)
    got = lib.ts_merge_path_cuts(
        row_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        m, nnz, work,
        out_r.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out_z.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out_r[: got + 1], out_z[: got + 1]


def bucket_pack(key: np.ndarray, a: np.ndarray, b: np.ndarray, v: np.ndarray,
                n_buckets: int, cap: int):
    """Scatter payloads into padded [n_buckets, cap] arrays (stable order).
    Returns (out_a, out_b, out_v, max_fill) or None if unavailable.
    Raises ValueError if any bucket exceeds cap."""
    lib = _load()
    if lib is None:
        return None
    key = np.ascontiguousarray(key, dtype=np.int64)
    a = np.ascontiguousarray(a, dtype=np.int32)
    b = np.ascontiguousarray(b, dtype=np.int32)
    v = np.ascontiguousarray(v, dtype=np.float32)
    out_a = np.empty((n_buckets, cap), dtype=np.int32)
    out_b = np.empty((n_buckets, cap), dtype=np.int32)
    out_v = np.empty((n_buckets, cap), dtype=np.float32)
    got = lib.ts_bucket_pack(
        key.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        key.size, n_buckets, cap,
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_b.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if got < 0:
        raise ValueError(f"bucket overflow: occupancy exceeds cap {cap}")
    return out_a, out_b, out_v, int(got)


def bucket_counts(key: np.ndarray, n_buckets: int):
    lib = _load()
    if lib is None:
        return None
    key = np.ascontiguousarray(key, dtype=np.int64)
    out = np.zeros(n_buckets, dtype=np.int64)
    lib.ts_bucket_counts(
        key.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        key.size, n_buckets,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out


def span_pack(cols_sorted, lrow_sorted, vals_sorted, p_starts, g: int,
              span_budget: int, want_dest: bool = False):
    """Native span-format chunking+fill.  Returns (c0 [P, NC] int32,
    cols/lrow [P, NC, G] int32, vals [P, NC, G] f32, nc_per_program [P]
    int64[, dest [nnz] int64]) or None if the native library is
    unavailable.  ``dest`` is each input nz's flat packed position (for
    values-only updates)."""
    lib = _load()
    if lib is None:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    if not hasattr(lib, "_span_bound"):
        lib.ts_span_count.restype = ctypes.c_int64
        lib.ts_span_count.argtypes = [i64p, i64p, ctypes.c_int64,
                                      ctypes.c_int64, ctypes.c_int64, i64p]
        lib.ts_span_fill.restype = None
        lib.ts_span_fill.argtypes = [i64p, i64p, f32p, i64p, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_int64, i32p, i32p, i32p, f32p,
                                     i64p]
        lib._span_bound = True
    cols_sorted = np.ascontiguousarray(cols_sorted, dtype=np.int64)
    lrow_sorted = np.ascontiguousarray(lrow_sorted, dtype=np.int64)
    vals_sorted = np.ascontiguousarray(vals_sorted, dtype=np.float32)
    p_starts = np.ascontiguousarray(p_starts, dtype=np.int64)
    p_count = p_starts.size - 1
    nc_arr = np.zeros(p_count, dtype=np.int64)
    nc = int(lib.ts_span_count(
        cols_sorted.ctypes.data_as(i64p), p_starts.ctypes.data_as(i64p),
        p_count, g, span_budget, nc_arr.ctypes.data_as(i64p),
    ))
    c0 = np.zeros((p_count, nc), dtype=np.int32)
    out_cols = np.zeros((p_count, nc, g), dtype=np.int32)
    out_lrow = np.zeros((p_count, nc, g), dtype=np.int32)
    out_vals = np.zeros((p_count, nc, g), dtype=np.float32)
    dest = np.zeros(cols_sorted.size, dtype=np.int64) if want_dest else None
    lib.ts_span_fill(
        cols_sorted.ctypes.data_as(i64p), lrow_sorted.ctypes.data_as(i64p),
        vals_sorted.ctypes.data_as(f32p), p_starts.ctypes.data_as(i64p),
        p_count, g, span_budget, nc,
        c0.ctypes.data_as(i32p), out_cols.ctypes.data_as(i32p),
        out_lrow.ctypes.data_as(i32p), out_vals.ctypes.data_as(f32p),
        dest.ctypes.data_as(i64p) if want_dest else None,
    )
    if want_dest:
        return c0, out_cols, out_lrow, out_vals, nc_arr, dest
    return c0, out_cols, out_lrow, out_vals, nc_arr


def span_pack_aligned(cols_sorted, lrow_sorted, vals_sorted, p_starts,
                      g: int, window: int, align: int,
                      want_dest: bool = False):
    """Aligned-window chunking+fill (dg_gather family): c0 is aligned DOWN
    to ``align`` at chunk creation so the full ``window`` is usable.  Same
    return shape as :func:`span_pack`, or None without the native lib (the
    .so may also predate ts_span_count_al — rebuilt on make)."""
    lib = _load()
    if lib is None or not hasattr(lib, "ts_span_count_al"):
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    if not hasattr(lib, "_span_al_bound"):
        lib.ts_span_count_al.restype = ctypes.c_int64
        lib.ts_span_count_al.argtypes = [i64p, i64p, ctypes.c_int64,
                                         ctypes.c_int64, ctypes.c_int64,
                                         ctypes.c_int64, i64p]
        lib.ts_span_fill_al.restype = None
        lib.ts_span_fill_al.argtypes = [i64p, i64p, f32p, i64p,
                                        ctypes.c_int64, ctypes.c_int64,
                                        ctypes.c_int64, ctypes.c_int64,
                                        ctypes.c_int64, i32p, i32p, i32p,
                                        f32p, i64p]
        lib._span_al_bound = True
    cols_sorted = np.ascontiguousarray(cols_sorted, dtype=np.int64)
    lrow_sorted = np.ascontiguousarray(lrow_sorted, dtype=np.int64)
    vals_sorted = np.ascontiguousarray(vals_sorted, dtype=np.float32)
    p_starts = np.ascontiguousarray(p_starts, dtype=np.int64)
    p_count = p_starts.size - 1
    nc_arr = np.zeros(p_count, dtype=np.int64)
    nc = int(lib.ts_span_count_al(
        cols_sorted.ctypes.data_as(i64p), p_starts.ctypes.data_as(i64p),
        p_count, g, window, align, nc_arr.ctypes.data_as(i64p),
    ))
    c0 = np.zeros((p_count, nc), dtype=np.int32)
    out_cols = np.zeros((p_count, nc, g), dtype=np.int32)
    out_lrow = np.zeros((p_count, nc, g), dtype=np.int32)
    out_vals = np.zeros((p_count, nc, g), dtype=np.float32)
    dest = np.zeros(cols_sorted.size, dtype=np.int64) if want_dest else None
    lib.ts_span_fill_al(
        cols_sorted.ctypes.data_as(i64p), lrow_sorted.ctypes.data_as(i64p),
        vals_sorted.ctypes.data_as(f32p), p_starts.ctypes.data_as(i64p),
        p_count, g, window, align, nc,
        c0.ctypes.data_as(i32p), out_cols.ctypes.data_as(i32p),
        out_lrow.ctypes.data_as(i32p), out_vals.ctypes.data_as(f32p),
        dest.ctypes.data_as(i64p) if want_dest else None,
    )
    if want_dest:
        return c0, out_cols, out_lrow, out_vals, nc_arr, dest
    return c0, out_cols, out_lrow, out_vals, nc_arr


def dgt_runs_multi(run_b, run_win, cnt, cap: int, nw: int, n_buckets: int,
                   max_open: int):
    """Multi-open-tile dgt walk (kernels/dgt_gather._dgt_walk_multi inner
    loop): emits (seg_run, seg_cls, seg_tile, seg_fill, seg_cnt, seg_sel,
    wins_b, wins_t, wins_w, tot_tiles) or None without the native lib."""
    lib = _load()
    if lib is None or not hasattr(lib, "ts_dgt_runs_multi"):
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    if not getattr(lib, "_dgt_runs_multi_bound", False):
        lib.ts_dgt_runs_multi.restype = ctypes.c_int64
        lib.ts_dgt_runs_multi.argtypes = [i64p, i64p, i64p, ctypes.c_int64,
                                          ctypes.c_int64, ctypes.c_int64,
                                          ctypes.c_int64, ctypes.c_int64,
                                          ctypes.c_int64, ctypes.c_int64,
                                          i64p, i64p, i64p, i64p, i64p, i64p,
                                          i64p, i64p, i64p, i64p, i64p]
        lib._dgt_runs_multi_bound = True
    run_b = np.ascontiguousarray(run_b, dtype=np.int64)
    run_win = np.ascontiguousarray(run_win, dtype=np.int64)
    cnt = np.ascontiguousarray(cnt, dtype=np.int64)
    n_runs, ncls = cnt.shape
    nnz = int(cnt.sum())
    seg_cap = max(nnz, 1)  # every segment holds >= 1 nz
    segs = [np.zeros(seg_cap, dtype=np.int64) for _ in range(6)]
    wins_cap = seg_cap
    wins = [np.zeros(wins_cap, dtype=np.int64) for _ in range(3)]
    tot_tiles = np.zeros(max(n_buckets, 1), dtype=np.int64)
    counts = np.zeros(2, dtype=np.int64)  # n_segs, n_wins
    rc = lib.ts_dgt_runs_multi(
        run_b.ctypes.data_as(i64p), run_win.ctypes.data_as(i64p),
        cnt.ctypes.data_as(i64p), n_runs, ncls, cap, nw, n_buckets,
        max_open, seg_cap,
        *[a.ctypes.data_as(i64p) for a in segs],
        *[a.ctypes.data_as(i64p) for a in wins],
        tot_tiles.ctypes.data_as(i64p), counts.ctypes.data_as(i64p),
    )
    if rc != 0:
        return None
    ns, nw_out = int(counts[0]), int(counts[1])
    return (*[a[:ns] for a in segs], *[a[:nw_out] for a in wins], tot_tiles)


def dgt_runs(run_b, run_win, cnt, cap: int, nw: int, n_buckets: int):
    """The dgt greedy run walk (kernels/dgt_gather._dgt_walk inner loop) in
    native code — the one Python-loop hot spot of the dgt packer (a 10M-nnz
    262k-row pack walks ~2M runs).  Returns the per-run placement arrays or
    None without the native lib."""
    lib = _load()
    if lib is None or not hasattr(lib, "ts_dgt_runs"):
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    if not getattr(lib, "_dgt_runs_bound", False):
        lib.ts_dgt_runs.restype = None
        lib.ts_dgt_runs.argtypes = [i64p, i64p, i64p, ctypes.c_int64,
                                    ctypes.c_int64, ctypes.c_int64,
                                    ctypes.c_int64, ctypes.c_int64,
                                    i64p, i64p, i64p, i64p, i64p, i64p, i64p]
        lib._dgt_runs_bound = True
    run_b = np.ascontiguousarray(run_b, dtype=np.int64)
    run_win = np.ascontiguousarray(run_win, dtype=np.int64)
    cnt = np.ascontiguousarray(cnt, dtype=np.int64)
    n_runs, ncls = cnt.shape
    take = np.zeros((n_runs, ncls), dtype=np.int64)
    open_tile = np.zeros(n_runs, dtype=np.int64)
    open_fill = np.zeros((n_runs, ncls), dtype=np.int64)
    join_pos = np.zeros(n_runs, dtype=np.int64)
    new_base = np.zeros(n_runs, dtype=np.int64)
    fresh_n = np.zeros(n_runs, dtype=np.int64)
    tot_tiles = np.zeros(max(n_buckets, 1), dtype=np.int64)
    lib.ts_dgt_runs(
        run_b.ctypes.data_as(i64p), run_win.ctypes.data_as(i64p),
        cnt.ctypes.data_as(i64p), n_runs, ncls, cap, nw, n_buckets,
        take.ctypes.data_as(i64p), open_tile.ctypes.data_as(i64p),
        open_fill.ctypes.data_as(i64p), join_pos.ctypes.data_as(i64p),
        new_base.ctypes.data_as(i64p), fresh_n.ctypes.data_as(i64p),
        tot_tiles.ctypes.data_as(i64p),
    )
    return take, open_tile, open_fill, join_pos, new_base, fresh_n, tot_tiles
