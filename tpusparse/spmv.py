"""SpMV: y[M] = A . x[N]  (BASELINE.json north-star extension; the
reference's K=1 ``__ldg`` path, total_BMT_...token.cc K=1 branch).

TPU-native methods:

  'dg'       the dynamic-gather kernel at kt=1: one VPU lane-gather per
             128 nz returns all 8 window-sublane candidates of x, a fixed
             (128,16) dot fans the products out to the scatter layout —
             measured 2.1 Gnnz/s on a 10M-nnz power-law matrix (v5e),
             1.7x radix kt=1 (see kernels/dg_gather.py).
  'radix'    the radix lane-packed kernel at kt=1: 64 X rows share each
             128-lane word (hi/lo bf16), so the gather/collapse/scatter
             dots stay full even for a single dense column — measured
             1.25 Gnnz/s on a 10M-nnz power-law matrix (v5e), ~16x the
             segment path.
  'span'     the span one-hot kernel with x widened to 8 lanes (wastes
             7/8 lanes; kept for comparison / format reuse with SpMM).
  'segment'  XLA formulation: contrib = vals * take(x, cols) followed by
             segment_sum over rows.  No pack cost; the scalar gather is
             very slow on TPU, use only for one-shot products.
  'stripe'   the Pallas stripe kernel with x widened to the 8-sublane
             minimum — useful when the stripe format is already resident
             (amortized with SpMM calls on the same matrix).
  'auto'     'dg' when the padded x fits VMEM (N*4 bytes), else
             'segment'.

All validate against oracle.spmv_reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from tpusparse.io.mtx import CooMatrix


@functools.partial(jax.jit, static_argnames=("m",))
def _segment_spmv(rows, cols, vals, x, *, m):
    contrib = vals * jnp.take(x, cols, axis=0)
    return jax.ops.segment_sum(contrib, rows, num_segments=m)


def spmv_fn(mat: CooMatrix, method: str = "auto"):
    """Returns a jitted ``fn(x[N]) -> y[M]`` for repeated application.

    'auto' picks the span one-hot path (6x the segment path, pack cost
    amortized over calls) when the widened x fits VMEM, else 'segment'."""
    m, n = mat.shape
    if method == "auto":
        method = "dg" if n * 4 <= 6 * 1024 * 1024 else "segment"
    if method == "dg":
        from tpusparse.kernels.dg_gather import dg_spmv, pack_dg

        # rb=4096/g=2048 amortize per-program and per-chunk fixed costs;
        # ns=4 (4096-col window) keeps power-law padding ~1.02 (PERF.md)
        rb = 4096 if m >= 4096 else max(64, 64 * (-(-m // 64)))
        fmt = pack_dg(mat, rb=rb, ns=4, g=2048 if mat.nnz > 1 << 20 else 512,
                      kt=1, mode="fp32x2")

        def fn(x):
            assert x.shape == (n,), f"x shape {x.shape} != ({n},)"
            return dg_spmv(fmt, jnp.asarray(x, jnp.float32))

        return fn
    if method == "dgt8":
        # the SECOND SpMV design point (VERDICT r2 #8): run the kt=8 dgt
        # SpMM kernel on x zero-padded to 8 columns.  The 8-group scatter
        # geometry (static-residue masks) is structurally cheaper per nz
        # than the dedicated 64-group kt=1 kernel; the price is an X
        # resident of N*8*4 bytes, so it gates on VMEM.
        from tpusparse.kernels.dgt_gather import auto_rb_dgt, dgt_spmv, pack_dgt

        assert n * 32 <= 9 * 1024 * 1024, "x3 resident would bust VMEM"
        rb = auto_rb_dgt(m, n, mat.nnz) if m >= 256 else max(8, 8 * (-(-m // 8)))
        fmt = pack_dgt(mat, rb=rb, g=512, kt=8, mode="fp32x2", resid=True,
                       nw=4)

        def fn(x):
            assert x.shape == (n,), f"x shape {x.shape} != ({n},)"
            return dgt_spmv(fmt, jnp.asarray(x, jnp.float32))

        return fn
    if method == "radix":
        # kt=1 lane packing: spr=64 X rows per sublane word, full MXU lanes
        from tpusparse.kernels.radix_gather import pack_radix, radix_spmm

        # g=1024 amortizes per-chunk fixed costs at kt=1 (measured +55%)
        fmt = pack_radix(mat, rb=2048, S=128, g=1024, kt=1, mode="fp32x2")

        def fn(x):
            assert x.shape == (n,), f"x shape {x.shape} != ({n},)"
            return radix_spmm(fmt, jnp.asarray(x, jnp.float32)[:, None])[:, 0]

        return fn
    if method == "segment":
        rows = jnp.asarray(mat.rows, jnp.int32)
        cols = jnp.asarray(mat.cols, jnp.int32)
        vals = jnp.asarray(mat.vals, jnp.float32)

        def fn(x):
            assert x.shape == (n,), f"x shape {x.shape} != ({n},)"
            return _segment_spmv(rows, cols, vals, jnp.asarray(x, jnp.float32), m=m)

        return fn
    if method == "stripe":
        from tpusparse.generator import build_stripe_plan

        plan = build_stripe_plan(mat, work_per_stripe=1024, unroll=8)

        def fn(x):
            assert x.shape == (n,), f"x shape {x.shape} != ({n},)"
            xw = jnp.broadcast_to(jnp.asarray(x, jnp.float32)[:, None], (n, 8))
            return plan(xw)[:, 0]

        return fn
    if method == "span":
        # the MXU one-hot path with x widened to the 8-lane minimum; ~10x
        # the segment path when the format is reused across calls
        from tpusparse.schedule import Schedule, build_plan
        from tpusparse.tune import _span_configs

        rb, ct, g = _span_configs(mat.density)[0]
        plan = build_plan(mat, Schedule(family="span_onehot", rb=rb, ct=ct,
                                        g=g, unroll=4))

        def fn(x):
            assert x.shape == (n,), f"x shape {x.shape} != ({n},)"
            xw = jnp.broadcast_to(jnp.asarray(x, jnp.float32)[:, None], (n, 8))
            return plan(xw)[:, 0]

        return fn
    raise ValueError(f"unknown spmv method {method!r}")


def spmv(mat: CooMatrix, x, method: str = "auto"):
    return spmv_fn(mat, method)(jnp.asarray(x))


def spmv_multi_fn(mat: CooMatrix, n_vectors: int = 8,
                  col_split: int | None = None):
    """Returns ``fn(X[N, m]) -> Y[M, m]`` — m independent SpMVs fused into
    ONE K=m SpMM call (the common production shape; VERDICT r2 #8).  The
    kernel cost per nz is that of K=8 SpMM, so per-vector throughput is
    ~m times the single-vector rate.

    Large N (VERDICT r3 #5): the dgt kernel keeps X resident per program
    (N * kt * 4 bytes); ``col_split`` packs each column range as its own
    dgt format and the plan sums the partial products — the reference's
    column-direction blocking (fixed_interval_col_direction_*,
    operator.hpp:727) composed with the multi-vector fuse.

    MEASURED (BENCH_SUITE spmv_multi rows, ts 178721xxxx): splitting is a
    CAPABILITY, not a speed play — it loses wherever the unsplit kernel
    compiles.  262k (X=8MB): unsplit 9.02 vs split-2 6.96 Gnnz/s
    aggregate; 524k (X=16MB, past the throughput cliff): unsplit 1.96 vs
    split-2 1.56 (each range re-pays pack padding, a second pass over Y,
    and the partial-sum adds); 1M (X=32MB): unsplit FAILS to compile
    (tpu_compile_helper VMEM) and split-4 runs at 0.947.  A per-vector
    dg kt=1 loop was the plausible better route past the boundary (the
    262k single-vector rate is 2.07) and is REFUTED too: measured 0.339
    aggregate at 1M (spmv_multi/dgt_k8_1m_dgloop row — the kt=1 kernel
    itself degrades far below its 262k rate at this scale), so auto
    splits into dgt ranges of at most 8MB (ceil(x_bytes/8MB) ranges,
    min 2) past the measured 16MB compile boundary and stays unsplit
    below it."""
    import numpy as np

    from tpusparse.kernels.dgt_gather import auto_rb_dgt, dgt_spmm, pack_dgt

    m, n = mat.shape
    kt = 8
    assert 1 <= n_vectors <= kt, "pack with ktile > 8 for more vectors"
    if col_split is None:
        x_bytes = n * kt * 4
        col_split = (1 if x_bytes <= 16 * 1024 * 1024
                     else max(2, -(-x_bytes // (8 * 1024 * 1024))))

    def _pack(sub, width):
        rb = (auto_rb_dgt(m, width, sub.nnz) if m >= 256
              else max(8, 8 * (-(-m // 8))))
        return pack_dgt(sub, rb=rb, g=512, kt=kt, mode="fp32x2", resid=True,
                        nw=4)

    if col_split <= 1:
        fmt = _pack(mat, n)

        def fn(xs):
            assert xs.shape == (n, n_vectors), xs.shape
            return dgt_spmm(fmt, jnp.asarray(xs, jnp.float32))

        return fn

    width = -(-n // col_split)
    rows_a = np.asarray(mat.rows)
    cols_a = np.asarray(mat.cols)
    vals_a = np.asarray(mat.vals)
    fmts, ranges = [], []
    for s in range(col_split):
        lo, hi = s * width, min((s + 1) * width, n)
        sel = (cols_a >= lo) & (cols_a < hi)
        if not sel.any():
            continue
        sub = CooMatrix(rows_a[sel], cols_a[sel] - lo, vals_a[sel],
                        (m, hi - lo)).sort_row_major()
        fmts.append(_pack(sub, hi - lo))
        ranges.append((lo, hi))

    def fn(xs):
        assert xs.shape == (n, n_vectors), xs.shape
        xs = jnp.asarray(xs, jnp.float32)
        y = None
        for fmt, (lo, hi) in zip(fmts, ranges):
            part = dgt_spmm(fmt, xs[lo:hi])
            y = part if y is None else y + part
        return y

    fn.n_splits = len(fmts)
    return fn
