"""Multi-host SpMM with overlapped halo exchange (BASELINE.json config #5).

Strategy (north star; no reference counterpart — GeneralSparse is single
GPU): row-partition A over the mesh axis 'rows' AND shard the dense X by its
rows (the contraction dim).  Each device then needs every X chunk once, so
the chunks travel a `lax.ppermute` ring: at step s, device d multiplies its
local sub-format for column-chunk ((d - s) mod D) against the chunk it
currently holds while the next chunk is already in flight — XLA schedules
the ppermute and the Pallas stripe kernel concurrently because both depend
only on the current carry ("overlapped halo all-gather").

Format (HaloStripeFormat): the device's rows are cut into fixed row-interval
stripes *shared across chunks*, so per-chunk partial products accumulate
into the same (stripe, row) slots with no reshuffle:

  cols [D, C, P, 1, Cnz]  chunk-local column index      (C = D chunks)
  lrow [D, C, P, 1, Cnz]  stripe-local row index
  vals [D, C, P, 1, Cnz]
  slot_of_origrow [M]     (d * P + p) * RB + r  output recovery gather

Cnz is the max nnz over all (device, chunk, stripe) — the multi-chip
analogue of the reference's padding-for-uniform-work (SURVEY §7 hard parts:
"double-buffered all-gather chunks vs Pallas kernel granularity").
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpusparse.io.mtx import CooMatrix
from tpusparse.kernels.common import kernel_backend_interpret, round_up


@dataclasses.dataclass
class HaloStripeFormat:
    cols: Any  # [D, C, P, 1, Cnz] int32 (chunk-local)
    lrow: Any  # [D, C, P, 1, Cnz] int32 (stripe-local)
    vals: Any  # [D, C, P, 1, Cnz] f32
    slot_of_origrow: Any  # [M] int32
    shape: tuple[int, int]
    n_devices: int
    stripes_per_device: int
    rb: int            # rows per stripe
    stripe_nnz: int    # Cnz
    n_chunk_rows: int  # X rows per chunk (= padded N / D)

    @property
    def padding_rate(self) -> float:
        total = self.n_devices ** 2 * self.stripes_per_device * self.stripe_nnz
        nnz = int(np.count_nonzero(np.asarray(self.vals)))
        return total / max(nnz, 1)


def pack_halo_stripe(
    mat: CooMatrix,
    n_devices: int,
    *,
    rows_per_stripe: int = 64,
    nnz_multiple: int = 8,
) -> HaloStripeFormat:
    """Pack for the D-device ring.  Rows are dealt to devices in contiguous
    balanced-nnz ranges; each device's range is cut into fixed
    ``rows_per_stripe`` stripes shared by all column chunks."""
    m, n = mat.shape
    d = n_devices
    rb = rows_per_stripe
    rows = np.asarray(mat.rows)
    cols = np.asarray(mat.cols)
    vals = np.asarray(mat.vals, dtype=np.float32)

    # balanced-nnz contiguous row partition over devices (merge-path style)
    row_ptr = mat.to_csr_ptr()
    targets = (np.arange(1, d) * mat.nnz) // d
    cut_rows = np.searchsorted(row_ptr, targets, side="left")
    bounds = np.concatenate([[0], cut_rows, [m]]).astype(np.int64)
    bounds = np.maximum.accumulate(bounds)

    # chunk rows padded to the 8-row sublane multiple so X chunks tile cleanly
    n_chunk_rows = round_up(-(-max(n, 1) // d), 8)
    p_per_dev = max(int(np.max(np.diff(bounds), initial=1) + rb - 1) // rb, 1)

    # bucket nz by (device, chunk, stripe)
    dev_of_nz = np.searchsorted(bounds, rows, side="right") - 1
    local_row = rows - bounds[dev_of_nz]
    stripe_of_nz = local_row // rb
    lrow_of_nz = local_row % rb
    chunk_of_nz = cols // n_chunk_rows
    lcol_of_nz = cols % n_chunk_rows

    key = (dev_of_nz * d + chunk_of_nz) * p_per_dev + stripe_of_nz
    buckets = d * d * p_per_dev
    counts = np.bincount(key, minlength=buckets)
    cnz = round_up(max(int(counts.max(initial=1)), 1), max(nnz_multiple, 1))

    from tpusparse import native

    packed = None
    if native.available():
        packed = native.bucket_pack(key, lcol_of_nz, lrow_of_nz, vals, buckets, cnz)
    if packed is not None:
        out_cols, out_lrow, out_vals, _ = packed
    else:
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        out_cols = np.zeros((buckets, cnz), dtype=np.int32)
        out_lrow = np.zeros((buckets, cnz), dtype=np.int32)
        out_vals = np.zeros((buckets, cnz), dtype=np.float32)
        offs = np.zeros(buckets + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        pos = np.arange(key_s.size) - offs[key_s]
        out_cols[key_s, pos] = lcol_of_nz[order]
        out_lrow[key_s, pos] = lrow_of_nz[order]
        out_vals[key_s, pos] = vals[order]

    shape5 = (d, d, p_per_dev, 1, cnz)
    slot = np.full(m, -1, dtype=np.int32)
    r = np.arange(m)
    dev_of_row = np.searchsorted(bounds, r, side="right") - 1
    lr = r - bounds[dev_of_row]
    slot[:] = (dev_of_row * p_per_dev + lr // rb) * rb + lr % rb

    return HaloStripeFormat(
        cols=jnp.asarray(out_cols.reshape(shape5)),
        lrow=jnp.asarray(out_lrow.reshape(shape5)),
        vals=jnp.asarray(out_vals.reshape(shape5)),
        slot_of_origrow=jnp.asarray(slot),
        shape=(m, n),
        n_devices=d,
        stripes_per_device=p_per_dev,
        rb=rb,
        stripe_nnz=cnz,
        n_chunk_rows=n_chunk_rows,
    )


def build_halo_spmm(
    fmt: HaloStripeFormat,
    mesh: Mesh,
    *,
    ktile: int | None = None,
    unroll: int = 8,
    interpret: bool | None = None,
):
    """Returns (fn, put_inputs): ``fn(cols, lrow, vals, slot, x)`` jitted over
    ``mesh`` axis 'rows' with the ring-overlapped halo exchange of X."""
    from tpusparse.kernels.stripe_gather import _stripe_call

    if interpret is None:
        interpret = kernel_backend_interpret()
    d = fmt.n_devices
    assert mesh.shape["rows"] == d, (mesh.shape, d)
    p_loc = fmt.stripes_per_device
    rb = fmt.rb
    cnz = fmt.stripe_nnz
    perm = [(i, (i + 1) % d) for i in range(d)]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("rows"), P("rows"), P("rows"), P("rows", None)),
        out_specs=P("rows", None),
        check_vma=False,
    )
    def ring_kernel(cols, lrow, vals, x_chunk):
        # local leading dim 1 after sharding: [1, C, P, 1, Cnz]
        cols, lrow, vals = cols[0], lrow[0], vals[0]
        me = jax.lax.axis_index("rows")
        kt = x_chunk.shape[1] if x_chunk.shape[1] <= 128 else 128
        if ktile is not None:
            kt = ktile
        u = unroll if cnz % unroll == 0 else 1

        def step(s, carry):
            x_cur, y = carry
            # next chunk already in flight while we compute on x_cur
            x_next = jax.lax.ppermute(x_cur, "rows", perm)
            chunk = jax.lax.rem(me - s + d, d)
            sub_c = jax.lax.dynamic_index_in_dim(cols, chunk, 0, keepdims=False)
            sub_r = jax.lax.dynamic_index_in_dim(lrow, chunk, 0, keepdims=False)
            sub_v = jax.lax.dynamic_index_in_dim(vals, chunk, 0, keepdims=False)
            part = _stripe_call(
                sub_c, sub_r, sub_v, x_cur,
                n_stripes=p_loc, stripe_nnz=cnz, rb=rb,
                ktile=kt, unroll=u, interpret=interpret,
            )
            return x_next, y + part

        k_pad = x_chunk.shape[1]
        y0 = jnp.zeros((p_loc * rb, ((k_pad + kt - 1) // kt) * kt), jnp.float32)
        _, y = jax.lax.fori_loop(0, d, step, (x_chunk, y0))
        return y[:, :k_pad]

    @jax.jit
    def fn(cols, lrow, vals, slot, x):
        y_slots = ring_kernel(cols, lrow, vals, x)
        oob = y_slots.shape[0]
        slot = jnp.where(slot < 0, oob, slot)
        return jnp.take(y_slots, slot, axis=0, mode="fill", fill_value=0)

    def put_inputs(x):
        n_pad = d * fmt.n_chunk_rows
        x = jnp.asarray(x, jnp.float32)
        if x.shape[0] < n_pad:
            x = jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))
        row5 = NamedSharding(mesh, P("rows", None, None, None, None))
        return (
            jax.device_put(fmt.cols, row5),
            jax.device_put(fmt.lrow, row5),
            jax.device_put(fmt.vals, row5),
            jax.device_put(fmt.slot_of_origrow, NamedSharding(mesh, P())),
            jax.device_put(x, NamedSharding(mesh, P("rows", None))),
        )

    return fn, put_inputs


# ---------------------------------------------------------------------------
# Span-kernel halo ring (the fast per-chip path under the same exchange)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class HaloSpanFormat:
    """Ring-overlapped halo format carrying span-chunked sub-formats.

    Per (device d, X-chunk c): the device's rows are dealt to P programs
    (balanced round-robin over the device's full nz, shared across chunks so
    chunk partials accumulate in place); each program's chunk-c nz are
    column-sorted and cut into G-sized span chunks with chunk-local window
    starts.  NC is the max over (d, c, program).

      c0    [D, C, P, 1, NC] int32
      cols  [D, C, P, NC, G] int32 (window-local)
      lrow  [D, C, P, NC, G] int32 (program-local)
      vals  [D, C, P, NC, G] f32
      slot_of_origrow [M] int32  (d * P + p) * RB + r
    """

    c0: Any
    cols: Any
    lrow: Any
    vals: Any
    slot_of_origrow: Any
    shape: tuple[int, int]
    n_devices: int
    programs_per_device: int
    n_chunks_span: int   # NC
    chunk_g: int         # G
    rb: int
    ct: int
    n_chunk_rows: int    # X rows per ring chunk

    @property
    def padding_rate(self) -> float:
        total = (self.n_devices ** 2 * self.programs_per_device
                 * self.n_chunks_span * self.chunk_g)
        nnz = int(np.count_nonzero(np.asarray(self.vals)))
        return total / max(nnz, 1)


def pack_halo_span(
    mat: CooMatrix,
    n_devices: int,
    *,
    rows_per_program: int = 512,
    ct: int = 512,
    g: int = 256,
    align: int = 8,
) -> HaloSpanFormat:
    """``align`` > 8 packs for the radix ring kernel: window starts land on
    8*spr row boundaries (see pack_halo_radix)."""
    from tpusparse.kernels.common import round_up as _round_up

    m, n = mat.shape
    d = n_devices
    rb = rows_per_program
    rows = np.asarray(mat.rows)
    cols = np.asarray(mat.cols)
    vals = np.asarray(mat.vals, dtype=np.float32)

    # balanced-nnz contiguous row partition over devices
    row_ptr = mat.to_csr_ptr()
    targets = (np.arange(1, d) * mat.nnz) // d
    cut_rows = np.searchsorted(row_ptr, targets, side="left")
    bounds = np.maximum.accumulate(
        np.concatenate([[0], cut_rows, [m]]).astype(np.int64))

    n_chunk_rows = _round_up(-(-max(n, 1) // d), max(align, 8))
    span_budget = ct - align

    # within each device: deal rows round-robin by length (shared across chunks)
    lengths = np.bincount(rows, minlength=m)
    dev_of_row = np.searchsorted(bounds, np.arange(m), side="right") - 1
    p_of_row = np.zeros(m, dtype=np.int64)
    lrow_of_row = np.zeros(m, dtype=np.int64)
    p_max = 1
    for dd in range(d):
        sel = np.arange(bounds[dd], bounds[dd + 1])
        if sel.size == 0:
            continue
        p_cnt = max(-(-sel.size // rb), 1)
        p_max = max(p_max, p_cnt)
        by_len = sel[np.argsort(-lengths[sel], kind="stable")]
        ranks = np.arange(sel.size)
        p_of_row[by_len] = ranks % p_cnt
        lrow_of_row[by_len] = ranks // p_cnt
    p_loc = p_max

    dev_nz = dev_of_row[rows]
    chunk_nz = cols // n_chunk_rows
    prog_nz = p_of_row[rows]
    lcol_nz = cols % n_chunk_rows
    lrow_nz = lrow_of_row[rows]

    # sort by (dev, chunk, program, local col) and pack each bucket with the
    # span chunk walk
    key = (dev_nz * d + chunk_nz) * p_loc + prog_nz
    order = np.lexsort((lcol_nz, key))
    key_s = key[order]
    lcol_s = lcol_nz[order].astype(np.int64)
    lrow_s = lrow_nz[order].astype(np.int64)
    vals_s = vals[order]
    buckets = d * d * p_loc
    starts = np.searchsorted(key_s, np.arange(buckets + 1))

    from tpusparse import native

    packed = None
    if native.available():
        packed = native.span_pack(lcol_s, lrow_s, vals_s, starts, g, span_budget)
    if packed is None:
        from tpusparse.kernels.span_gather import span_chunk_numpy

        c0_2d, cols_f, lrow_f, vals_f, _, _nc = span_chunk_numpy(
            lcol_s, lrow_s, vals_s, starts, g, span_budget
        )
    else:
        c0_2d, cols_f, lrow_f, vals_f, _nc = packed
    if align > 8:
        # realign window starts from the chunkers' 8 to the radix 8*spr
        delta = (c0_2d % align).astype(np.int32)
        c0_2d = c0_2d - delta
        cols_f = cols_f + delta[:, :, None]
    nc = c0_2d.shape[1]

    shape5 = (d, d, p_loc)
    slot = np.full(m, -1, dtype=np.int32)
    slot[:] = ((dev_of_row * p_loc + p_of_row) * rb + lrow_of_row).astype(np.int32)

    return HaloSpanFormat(
        c0=jnp.asarray(c0_2d.reshape(*shape5, 1, nc)),
        cols=jnp.asarray(cols_f.reshape(*shape5, nc, g)),
        lrow=jnp.asarray(lrow_f.reshape(*shape5, nc, g)),
        vals=jnp.asarray(vals_f.reshape(*shape5, nc, g)),
        slot_of_origrow=jnp.asarray(slot),
        shape=(m, n),
        n_devices=d,
        programs_per_device=p_loc,
        n_chunks_span=nc,
        chunk_g=g,
        rb=rb,
        ct=ct,
        n_chunk_rows=n_chunk_rows,
    )


def build_halo_span_spmm(
    fmt: HaloSpanFormat,
    mesh: Mesh,
    *,
    ktile: int | None = None,
    precision: str = "fp32x2",
    unroll: int = 4,
    interpret: bool | None = None,
):
    """Span-kernel variant of build_halo_spmm: same ppermute ring, ~5x the
    per-chip throughput at small K.  A 2D ('rows', 'k') mesh additionally
    shards the dense operand's columns (tensor-parallel K: each K shard is
    independent on the contraction, so the ring runs per K column group)."""
    from tpusparse.kernels.span_gather import _span_call

    if interpret is None:
        interpret = kernel_backend_interpret()
    d = fmt.n_devices
    assert mesh.shape["rows"] == d, (mesh.shape, d)
    k_sharded = "k" in mesh.shape and mesh.shape["k"] > 1
    kspec = "k" if k_sharded else None
    p_loc = fmt.programs_per_device
    rb = fmt.rb
    nc = fmt.n_chunks_span
    g = fmt.chunk_g
    ct = fmt.ct
    perm = [(i, (i + 1) % d) for i in range(d)]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("rows"), P("rows"), P("rows"), P("rows"), P("rows", kspec)),
        out_specs=P("rows", kspec),
        check_vma=False,
    )
    def ring_kernel(c0, cols, lrow, vals, x_chunk):
        c0, cols, lrow, vals = c0[0], cols[0], lrow[0], vals[0]
        me = jax.lax.axis_index("rows")
        k_in = x_chunk.shape[1]
        kt = k_in if k_in <= 128 else 128
        if ktile is not None:
            kt = ktile
        # _span_call reshapes X as (n, kt_count, kt): pad the local K (which
        # per-shard need not divide kt, e.g. K=200 over 2 k-shards) up front
        if k_in % kt:
            x_chunk = jnp.pad(x_chunk, ((0, 0), (0, kt - k_in % kt)))

        def step(s, carry):
            x_cur, y = carry
            x_next = jax.lax.ppermute(x_cur, "rows", perm)
            chunk = jax.lax.rem(me - s + d, d)
            sub = [jax.lax.dynamic_index_in_dim(a, chunk, 0, keepdims=False)
                   for a in (c0, cols, lrow, vals)]
            # window may read past the chunk: X is padded by CT below
            part = _span_call(
                sub[0], sub[1], sub[2], sub[3], x_cur,
                n_programs=p_loc, nc=nc, g=g, rb=rb, ct=ct,
                ktile=kt, mode=precision, unroll=unroll, interpret=interpret,
            )
            return x_next, y + part

        y0 = jnp.zeros((p_loc * rb, x_chunk.shape[1]), jnp.float32)
        _, y = jax.lax.fori_loop(0, d, step, (x_chunk, y0))
        return y[:, :k_in]

    @jax.jit
    def fn(c0, cols, lrow, vals, slot, x):
        y_slots = ring_kernel(c0, cols, lrow, vals, x)
        oob = y_slots.shape[0]
        slot = jnp.where(slot < 0, oob, slot)
        return jnp.take(y_slots, slot, axis=0, mode="fill", fill_value=0)

    def put_inputs(x):
        n_pad = d * fmt.n_chunk_rows
        x = jnp.asarray(x, jnp.float32)
        if x.shape[0] < n_pad:
            x = jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))
        # per-device X chunk padded by CT rows so span windows never read OOB:
        # reshape to [D, chunk+ct, K] is not ring-shardable, so instead pad
        # every chunk by replicating zeros — achieved by storing chunks
        # disjointly with a CT-zero tail: [D * (chunk_rows + ct_pad), K]
        ct_pad = ((ct + 7) // 8) * 8
        xc = x.reshape(d, fmt.n_chunk_rows, -1)
        xc = jnp.pad(xc, ((0, 0), (0, ct_pad), (0, 0)))
        xflat = xc.reshape(d * (fmt.n_chunk_rows + ct_pad), -1)
        row5 = NamedSharding(mesh, P("rows", None, None, None, None))
        return (
            jax.device_put(fmt.c0, row5),
            jax.device_put(fmt.cols, row5),
            jax.device_put(fmt.lrow, row5),
            jax.device_put(fmt.vals, row5),
            jax.device_put(fmt.slot_of_origrow, NamedSharding(mesh, P())),
            jax.device_put(xflat, NamedSharding(mesh, P("rows", kspec))),
        )

    return fn, put_inputs


def pack_halo_radix(
    mat: CooMatrix,
    n_devices: int,
    *,
    rows_per_program: int = 1024,
    S: int = 128,
    g: int = 256,
    kt: int = 8,
    mode: str = "fp32x2",
) -> HaloSpanFormat:
    """Halo ring format for the radix kernel: span packing with window
    starts aligned to the 8*spr radix row-group boundary (ct = S*spr)."""
    from tpusparse.kernels.radix_gather import radix_geometry

    spr, _, ngrp = radix_geometry(kt, mode)
    assert rows_per_program % ngrp == 0
    return pack_halo_span(mat, n_devices, rows_per_program=rows_per_program,
                          ct=S * spr, g=g, align=8 * spr)


def build_halo_radix_spmm(
    fmt: HaloSpanFormat,
    mesh: Mesh,
    *,
    kt: int = 8,
    mode: str = "fp32x2",
    unroll: int = 4,
    interpret: bool | None = None,
):
    """Radix-kernel variant of the ppermute ring (the champion per-chip
    path at small K): same overlap structure as build_halo_span_spmm, each
    ring step lane-packs the resident X chunk and runs the 3-dot radix
    kernel on its sub-format."""
    from tpusparse.kernels.common import round_up as _round_up
    from tpusparse.kernels.radix_gather import _radix_call, radix_geometry

    if interpret is None:
        interpret = kernel_backend_interpret()
    spr, _, ngrp = radix_geometry(kt, mode)
    d = fmt.n_devices
    assert mesh.shape["rows"] == d, (mesh.shape, d)
    k_sharded = "k" in mesh.shape and mesh.shape["k"] > 1
    kspec = "k" if k_sharded else None
    p_loc = fmt.programs_per_device
    rb = fmt.rb
    nc = fmt.n_chunks_span
    g = fmt.chunk_g
    W = fmt.ct
    S = W // spr
    perm = [(i, (i + 1) % d) for i in range(d)]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("rows"), P("rows"), P("rows"), P("rows"), P("rows", kspec)),
        out_specs=P("rows", kspec),
        check_vma=False,
    )
    def ring_kernel(c0, cols, lrow, vals, x_chunk):
        c0, cols, lrow, vals = c0[0], cols[0], lrow[0], vals[0]
        me = jax.lax.axis_index("rows")
        k_in = x_chunk.shape[1]
        if k_in % kt:
            x_chunk = jnp.pad(x_chunk, ((0, 0), (0, kt - k_in % kt)))

        def step(s, carry):
            x_cur, y = carry
            x_next = jax.lax.ppermute(x_cur, "rows", perm)
            chunk = jax.lax.rem(me - s + d, d)
            sub = [jax.lax.dynamic_index_in_dim(a, chunk, 0, keepdims=False)
                   for a in (c0, cols, lrow, vals)]
            part = _radix_call(
                sub[0], sub[1], sub[2], sub[3], x_cur,
                n_programs=p_loc, nc=nc, g=g, rb=rb, S=S, kt=kt, mode=mode,
                unroll=unroll, ktin=1, interpret=interpret,
            )
            return x_next, y + part

        y0 = jnp.zeros((p_loc * rb, x_chunk.shape[1]), jnp.float32)
        _, y = jax.lax.fori_loop(0, d, step, (x_chunk, y0))
        return y[:, :k_in]

    @jax.jit
    def fn(c0, cols, lrow, vals, slot, x):
        y_slots = ring_kernel(c0, cols, lrow, vals, x)
        oob = y_slots.shape[0]
        slot = jnp.where(slot < 0, oob, slot)
        return jnp.take(y_slots, slot, axis=0, mode="fill", fill_value=0)

    def put_inputs(x):
        n_pad = d * fmt.n_chunk_rows
        x = jnp.asarray(x, jnp.float32)
        if x.shape[0] < n_pad:
            x = jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))
        # chunk tail pad >= W so windows never read past the shard, and the
        # per-shard row count stays a multiple of the 8*spr packing group
        w_pad = _round_up(W + 8 * spr, 8 * spr)
        xc = x.reshape(d, fmt.n_chunk_rows, -1)
        xc = jnp.pad(xc, ((0, 0), (0, w_pad), (0, 0)))
        xflat = xc.reshape(d * (fmt.n_chunk_rows + w_pad), -1)
        row5 = NamedSharding(mesh, P("rows", None, None, None, None))
        return (
            jax.device_put(fmt.c0, row5),
            jax.device_put(fmt.cols, row5),
            jax.device_put(fmt.lrow, row5),
            jax.device_put(fmt.vals, row5),
            jax.device_put(fmt.slot_of_origrow, NamedSharding(mesh, P())),
            jax.device_put(xflat, NamedSharding(mesh, P("rows", kspec))),
        )

    return fn, put_inputs


def pack_halo_dg(
    mat: CooMatrix,
    n_devices: int,
    *,
    rows_per_program: int = 1024,
    ns: int = 4,
    g: int = 256,
    kt: int = 8,
    mode: str = "fp32x2",
) -> HaloSpanFormat:
    """Halo ring format for the dynamic-gather kernel: span packing with
    window starts aligned to the 128-column tile (ct = ns*128; ns >= 2 so
    the chunk-then-realign walk keeps a positive budget)."""
    from tpusparse.kernels.dg_gather import dg_geometry

    wt, _, ngrp = dg_geometry(kt, mode)
    assert wt == 128 and ns >= 2, (wt, ns)
    assert rows_per_program % ngrp == 0
    assert g % 128 == 0, f"g={g} must be a multiple of the 128-lane tile"
    return pack_halo_span(mat, n_devices, rows_per_program=rows_per_program,
                          ct=ns * 128, g=g, align=128)


def build_halo_dg_spmm(
    fmt: HaloSpanFormat,
    mesh: Mesh,
    *,
    kt: int = 8,
    mode: str = "fp32x2",
    unroll: int = 4,
    interpret: bool | None = None,
):
    """Dynamic-gather variant of the ppermute ring (the champion per-chip
    path across K <= 128): same overlap structure as build_halo_radix_spmm;
    each ring step transposes the resident X chunk into window tiles and
    runs the VPU lane-gather kernel on its sub-format."""
    from tpusparse.kernels.dg_gather import _dg_call

    if interpret is None:
        interpret = kernel_backend_interpret()
    d = fmt.n_devices
    assert mesh.shape["rows"] == d, (mesh.shape, d)
    k_sharded = "k" in mesh.shape and mesh.shape["k"] > 1
    kspec = "k" if k_sharded else None
    p_loc = fmt.programs_per_device
    rb = fmt.rb
    nc = fmt.n_chunks_span
    g = fmt.chunk_g
    ns = fmt.ct // 128
    perm = [(i, (i + 1) % d) for i in range(d)]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("rows"), P("rows"), P("rows"), P("rows"), P("rows", kspec)),
        out_specs=P("rows", kspec),
        check_vma=False,
    )
    def ring_kernel(c0, cols, lrow, vals, x_chunk):
        c0, cols, lrow, vals = c0[0], cols[0], lrow[0], vals[0]
        me = jax.lax.axis_index("rows")
        k_in = x_chunk.shape[1]
        if k_in % kt:
            x_chunk = jnp.pad(x_chunk, ((0, 0), (0, kt - k_in % kt)))

        def step(s, carry):
            x_cur, y = carry
            x_next = jax.lax.ppermute(x_cur, "rows", perm)
            chunk = jax.lax.rem(me - s + d, d)
            sub = [jax.lax.dynamic_index_in_dim(a, chunk, 0, keepdims=False)
                   for a in (c0, cols, lrow, vals)]
            part = _dg_call(
                sub[0], sub[1], sub[2], sub[3], x_cur,
                P=p_loc, nc=nc, g=g, rb=rb, ns=ns, kt=kt, mode=mode,
                unroll=unroll, interpret=interpret,
            )
            return x_next, y + part

        y0 = jnp.zeros((p_loc * rb, x_chunk.shape[1]), jnp.float32)
        _, y = jax.lax.fori_loop(0, d, step, (x_chunk, y0))
        return y[:, :k_in]

    @jax.jit
    def fn(c0, cols, lrow, vals, slot, x):
        y_slots = ring_kernel(c0, cols, lrow, vals, x)
        oob = y_slots.shape[0]
        slot = jnp.where(slot < 0, oob, slot)
        return jnp.take(y_slots, slot, axis=0, mode="fill", fill_value=0)

    def put_inputs(x):
        n_pad = d * fmt.n_chunk_rows
        x = jnp.asarray(x, jnp.float32)
        if x.shape[0] < n_pad:
            x = jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))
        # chunk tail pad >= the window so tiles never read past the shard
        w_pad = ((fmt.ct + 127) // 128) * 128 + 128
        xc = x.reshape(d, fmt.n_chunk_rows, -1)
        xc = jnp.pad(xc, ((0, 0), (0, w_pad), (0, 0)))
        xflat = xc.reshape(d * (fmt.n_chunk_rows + w_pad), -1)
        row5 = NamedSharding(mesh, P("rows", None, None, None, None))
        return (
            jax.device_put(fmt.c0, row5),
            jax.device_put(fmt.cols, row5),
            jax.device_put(fmt.lrow, row5),
            jax.device_put(fmt.vals, row5),
            jax.device_put(fmt.slot_of_origrow, NamedSharding(mesh, P())),
            jax.device_put(xflat, NamedSharding(mesh, P("rows", kspec))),
        )

    return fn, put_inputs
