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

    # bucket nz by (device, chunk, stripe).  Stripes within a device are
    # dealt by the same greedy that fixed the other rings' padding
    # (VERDICT r2 #2 / r3 #4): rows descending by length, each placed on
    # the stripe minimizing the worst per-ring-chunk load — the r3
    # contiguous-row stripes floored this ring at pad 4.79 because cnz is
    # the max over ALL (device, chunk, stripe) buckets
    dev_of_nz = np.searchsorted(bounds, rows, side="right") - 1
    chunk_of_nz = cols // n_chunk_rows
    lcol_of_nz = cols % n_chunk_rows
    rc = np.zeros((m, d), dtype=np.int64)
    np.add.at(rc, (rows, chunk_of_nz), 1)
    stripe_of_row = np.zeros(m, dtype=np.int64)
    lrow_of_row = np.zeros(m, dtype=np.int64)
    big = np.iinfo(np.int64).max
    for dev in range(d):
        lo, hi = int(bounds[dev]), int(bounds[dev + 1])
        rr = np.arange(lo, hi)
        if rr.size == 0:
            continue
        order_r = rr[np.argsort(-(row_ptr[rr + 1] - row_ptr[rr]),
                                kind="stable")]
        loads = np.zeros((p_per_dev, d), dtype=np.int64)
        used = np.zeros(p_per_dev, dtype=np.int64)
        for u in order_r:
            feas = used < rb
            worst = np.where(feas, (loads + rc[u]).max(axis=1), big)
            s = int(np.argmin(worst))
            stripe_of_row[u] = s
            lrow_of_row[u] = used[s]
            used[s] += 1
            loads[s] += rc[u]
    stripe_of_nz = stripe_of_row[rows]
    lrow_of_nz = lrow_of_row[rows]

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
    r = np.arange(m)
    dev_of_row = np.searchsorted(bounds, r, side="right") - 1
    slot = ((dev_of_row * p_per_dev + stripe_of_row) * rb
            + lrow_of_row).astype(np.int32)

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


def _build_ring(
    mesh: Mesh,
    *,
    n_devices: int,
    arrays: tuple,
    slot_of_origrow,
    out_slots: int,
    n_chunk_rows: int,
    tail_pad: int,
    k_multiple,
    step_call,
    allow_k_shard: bool = True,
    fold_out=None,
):
    """The shared ppermute ring harness (VERDICT r2 #9: one ring, N kernels).

    ``arrays`` are the per-(device, ring-chunk) format planes, each shaped
    [D, C, ...].  At ring step s, device d computes on the X chunk it
    currently holds against its sub-format for chunk (d - s) mod D while the
    next chunk is already in flight: ``step_call(subs, x_cur)`` runs the
    per-chip kernel and returns the (out_slots, K') partial.  ``k_multiple``
    maps the local K width to the kernel's K padding multiple;
    ``tail_pad`` zero-rows are appended to every X chunk so column windows
    never read past the shard."""
    d = n_devices
    assert mesh.shape["rows"] == d, (mesh.shape, d)
    k_sharded = allow_k_shard and "k" in mesh.shape and mesh.shape["k"] > 1
    kspec = "k" if k_sharded else None
    n_arr = len(arrays)
    perm = [(i, (i + 1) % d) for i in range(d)]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=tuple([P("rows")] * n_arr) + (P("rows", kspec),),
        out_specs=P("rows", kspec),
        check_vma=False,
    )
    def ring_kernel(*args):
        # local leading dim 1 after sharding: [1, C, ...]
        planes = [a[0] for a in args[:-1]]
        x_chunk = args[-1]
        me = jax.lax.axis_index("rows")
        k_in = x_chunk.shape[1]
        km = k_multiple(k_in)
        if k_in % km:
            x_chunk = jnp.pad(x_chunk, ((0, 0), (0, km - k_in % km)))

        def step(s, carry):
            x_cur, y = carry
            # next chunk already in flight while we compute on x_cur
            x_next = jax.lax.ppermute(x_cur, "rows", perm)
            chunk = jax.lax.rem(me - s + d, d)
            subs = [jax.lax.dynamic_index_in_dim(a, chunk, 0, keepdims=False)
                    for a in planes]
            return x_next, y + step_call(subs, x_cur)

        y0 = jnp.zeros((out_slots, x_chunk.shape[1]), jnp.float32)
        _, y = jax.lax.fori_loop(0, d, step, (x_chunk, y0))
        return y[:, :k_in]

    @jax.jit
    def fn(*args):
        *planes, slot, x = args
        y_slots = ring_kernel(*planes, x)
        if fold_out is not None:
            y_slots = fold_out(y_slots)
        oob = y_slots.shape[0]
        slot = jnp.where(slot < 0, oob, slot)
        return jnp.take(y_slots, slot, axis=0, mode="fill", fill_value=0)

    def put_inputs(x):
        n_pad = d * n_chunk_rows
        x = jnp.asarray(x, jnp.float32)
        if x.shape[0] < n_pad:
            x = jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))
        if tail_pad:
            xc = x.reshape(d, n_chunk_rows, -1)
            xc = jnp.pad(xc, ((0, 0), (0, tail_pad), (0, 0)))
            x = xc.reshape(d * (n_chunk_rows + tail_pad), -1)
        out = [jax.device_put(a, NamedSharding(
            mesh, P(*(["rows"] + [None] * (a.ndim - 1))))) for a in arrays]
        out.append(jax.device_put(slot_of_origrow, NamedSharding(mesh, P())))
        out.append(jax.device_put(x, NamedSharding(mesh, P("rows", kspec))))
        return tuple(out)

    return fn, put_inputs


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
    p_loc = fmt.stripes_per_device
    cnz = fmt.stripe_nnz
    u = unroll if cnz % unroll == 0 else 1

    def k_multiple(k_in):
        return ktile if ktile is not None else (k_in if k_in <= 128 else 128)

    def step_call(subs, x_cur):
        kt = k_multiple(x_cur.shape[1])
        return _stripe_call(
            subs[0], subs[1], subs[2], x_cur,
            n_stripes=p_loc, stripe_nnz=cnz, rb=fmt.rb,
            ktile=kt, unroll=u, interpret=interpret,
        )

    return _build_ring(
        mesh,
        n_devices=fmt.n_devices,
        arrays=(fmt.cols, fmt.lrow, fmt.vals),
        slot_of_origrow=fmt.slot_of_origrow,
        out_slots=p_loc * fmt.rb,
        n_chunk_rows=fmt.n_chunk_rows,
        tail_pad=0,
        k_multiple=k_multiple,
        step_call=step_call,
        allow_k_shard=False,
    )


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

    n_chunk_rows = _round_up(-(-max(n, 1) // d), max(align, 8))
    span_budget = ct - align

    # Deal rows GLOBALLY to the d*P (device, program) bins, balancing the
    # PER-RING-CHUNK nnz vector, not just the row total (VERDICT r2 #2: the
    # global max over (device, chunk, program) buckets sets NC for every
    # bucket, so one program hot in one chunk forfeits scaling at pack
    # time).  Output rows are recovered by a slot gather regardless, so no
    # contiguity constraint applies.  Greedy: rows by total length
    # descending, each to the capacity-free bin whose worst chunk stays
    # smallest — the balanced-interval idea (operator.hpp:777-906) applied
    # per ring step.
    lengths = np.bincount(rows, minlength=m)
    chunk_of_nz_pre = cols // n_chunk_rows
    p_loc = max(-(-m // (d * rb)), 1)
    nbins = d * p_loc
    bin_of_row = np.zeros(m, dtype=np.int64)
    lrow_of_row = np.zeros(m, dtype=np.int64)
    if m and nbins > 1:
        rc = np.zeros((m, d), dtype=np.int64)
        np.add.at(rc, (rows, chunk_of_nz_pre), 1)
        by_len = np.argsort(-lengths, kind="stable")
        loads = np.zeros((nbins, d), dtype=np.int64)
        used = np.zeros(nbins, dtype=np.int64)
        big = np.iinfo(np.int64).max
        for r in by_len:
            v = rc[r]
            worst = np.where(used < rb, (loads + v).max(axis=1), big)
            b = int(np.argmin(worst))
            loads[b] += v
            bin_of_row[r] = b
            lrow_of_row[r] = used[b]
            used[b] += 1
    else:
        lrow_of_row[:] = np.arange(m)
    dev_of_row = bin_of_row // p_loc
    p_of_row = bin_of_row % p_loc

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
    p_loc = fmt.programs_per_device
    nc = fmt.n_chunks_span
    g = fmt.chunk_g
    ct = fmt.ct

    def k_multiple(k_in):
        if ktile is not None:
            return ktile
        return k_in if k_in <= 128 else 128

    def step_call(subs, x_cur):
        # window may read past the chunk: X is tail-padded by CT rows
        kt = k_multiple(x_cur.shape[1])
        return _span_call(
            subs[0], subs[1], subs[2], subs[3], x_cur,
            n_programs=p_loc, nc=nc, g=g, rb=fmt.rb, ct=ct,
            ktile=kt, mode=precision, unroll=unroll, interpret=interpret,
        )

    return _build_ring(
        mesh,
        n_devices=fmt.n_devices,
        arrays=(fmt.c0, fmt.cols, fmt.lrow, fmt.vals),
        slot_of_origrow=fmt.slot_of_origrow,
        out_slots=p_loc * fmt.rb,
        n_chunk_rows=fmt.n_chunk_rows,
        tail_pad=((ct + 7) // 8) * 8,
        k_multiple=k_multiple,
        step_call=step_call,
    )


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
    p_loc = fmt.programs_per_device
    nc = fmt.n_chunks_span
    g = fmt.chunk_g
    W = fmt.ct
    S = W // spr

    def step_call(subs, x_cur):
        return _radix_call(
            subs[0], subs[1], subs[2], subs[3], x_cur,
            n_programs=p_loc, nc=nc, g=g, rb=fmt.rb, S=S, kt=kt, mode=mode,
            unroll=unroll, ktin=1, interpret=interpret,
        )

    return _build_ring(
        mesh,
        n_devices=fmt.n_devices,
        arrays=(fmt.c0, fmt.cols, fmt.lrow, fmt.vals),
        slot_of_origrow=fmt.slot_of_origrow,
        out_slots=p_loc * fmt.rb,
        n_chunk_rows=fmt.n_chunk_rows,
        # chunk tail pad >= W so windows never read past the shard, and the
        # per-shard row count stays a multiple of the 8*spr packing group
        tail_pad=_round_up(W + 8 * spr, 8 * spr),
        k_multiple=lambda k_in: kt,
        step_call=step_call,
    )


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
    p_loc = fmt.programs_per_device
    nc = fmt.n_chunks_span
    g = fmt.chunk_g
    ns = fmt.ct // 128

    def step_call(subs, x_cur):
        return _dg_call(
            subs[0], subs[1], subs[2], subs[3], x_cur,
            P=p_loc, nc=nc, g=g, rb=fmt.rb, ns=ns, kt=kt, mode=mode,
            unroll=unroll, interpret=interpret,
        )

    return _build_ring(
        mesh,
        n_devices=fmt.n_devices,
        arrays=(fmt.c0, fmt.cols, fmt.lrow, fmt.vals),
        slot_of_origrow=fmt.slot_of_origrow,
        out_slots=p_loc * fmt.rb,
        n_chunk_rows=fmt.n_chunk_rows,
        # chunk tail pad >= the window so tiles never read past the shard
        tail_pad=((fmt.ct + 127) // 128) * 128 + 128,
        k_multiple=lambda k_in: kt,
        step_call=step_call,
    )


@dataclasses.dataclass
class HaloDgtFormat:
    """Ring halo format for the dgt kernel (round-3 champion): per
    (device, ring-chunk, program) bucket, the consecutive-window tile walk
    of kernels/dgt_gather; heavy rows split into <=8 aligned virtual rows
    whose outputs fold through the pairwise-sum pyramid before the slot
    gather (same machinery as single-chip pack_dgt)."""

    wins: Any   # [D, C, P, NC, T] int32
    cols: Any   # [D, C, P, NC, G] int32 (lane | sel<<7)
    lrw: Any    # [D, C, P, NC, G] int32
    vals: Any   # [D, C, P, NC, G] f32
    slot_of_origrow: Any  # [M] int32 pyramid index over D*P*rb slots
    shape: tuple[int, int]
    n_devices: int
    programs_per_device: int
    n_chunks: int
    chunk_g: int
    rb: int
    kt: int
    mode: str
    resid: bool
    nw: int
    split_levels: int
    n_chunk_rows: int

    @property
    def padding_rate(self) -> float:
        total = (self.n_devices ** 2 * self.programs_per_device
                 * self.n_chunks * self.chunk_g)
        nnz = int(np.count_nonzero(np.asarray(self.vals)))
        return total / max(nnz, 1)


def pack_halo_dgt(
    mat: CooMatrix,
    n_devices: int,
    *,
    rows_per_program: int = 256,
    g: int = 512,
    kt: int = 8,
    mode: str = "fp32x2",
    nw: int = 4,
    resid: bool = True,
    split: int | str | None = "auto",
    walk: str = "multi",
) -> HaloDgtFormat:
    """Halo ring format for the dgt kernel: virtual-row splits, then a
    greedy unit deal over the D*P (device, program) bins that balances the
    per-ring-chunk nnz vector under size-aligned slot allocation, then the
    dgt tile walk per (device, chunk, program) bucket.

    Round-4 (VERDICT r3 #4): the walk defaults to the multi-open-tile
    variant and ``resid=False`` is supported end-to-end (pair it with
    ``scatter='fullrow'`` in build_halo_dgt_spmm) — the residue class caps
    were the dominant source of the r3 ring's pad 2.74: with D**2 x P
    buckets each (bucket, window)-run is short, and rounding every class to
    its 128/ngrp-slot cap wastes most of each tile."""
    from tpusparse.kernels.common import round_up as _round_up
    from tpusparse.kernels.dgt_gather import (_dgt_walk, _dgt_walk_multi,
                                              dgt_geometry)

    nhl, ngrp = dgt_geometry(kt, mode)
    cap = (128 // ngrp) if resid else 128
    rb = rows_per_program
    assert rb % ngrp == 0 and rb % 8 == 0, rb
    assert g % 128 == 0, g
    T = g // 128
    m, n = mat.shape
    d = n_devices
    rows = np.asarray(mat.rows)
    cols = np.asarray(mat.cols)
    vals = np.asarray(mat.vals, dtype=np.float32)
    nnz = rows.size
    n_chunk_rows = _round_up(-(-max(n, 1) // d), 8)

    # virtual rows (pow2 pieces, see pack_dgt)
    lengths = np.bincount(rows, minlength=m) if m else np.zeros(0, np.int64)
    if split == "auto":
        split = max(64, 8 * max(nnz // max(m, 1), 1))
    if not split:
        pieces = np.ones(m, dtype=np.int64)
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

    # greedy unit deal over bins: per-chunk balance + aligned slots
    chunk_of_nz = cols // n_chunk_rows
    rc = np.zeros((m, d), dtype=np.int64)
    np.add.at(rc, (rows, chunk_of_nz), 1)
    order_u = np.lexsort((-lengths, -pieces))
    p_loc = max(-(-mv // (d * rb)), 1)
    big = np.iinfo(np.int64).max
    while True:
        nbins = d * p_loc
        bin_of_unit = np.zeros(m, dtype=np.int64)
        base_of_unit = np.zeros(m, dtype=np.int64)
        loads = np.zeros((nbins, d), dtype=np.int64)
        used = np.zeros(nbins, dtype=np.int64)
        ok = True
        for u in order_u:
            size = int(pieces[u])
            base_cand = -(-used // size) * size
            feasible = base_cand + size <= rb
            if not feasible.any():
                ok = False
                break
            worst = np.where(feasible, (loads + rc[u]).max(axis=1), big)
            b = int(np.argmin(worst))
            bin_of_unit[u] = b
            base_of_unit[u] = base_cand[b]
            used[b] = base_cand[b] + size
            loads[b] += rc[u]
        if ok:
            break
        p_loc += 1

    unit_of_vr = np.repeat(np.arange(m), pieces)
    lrow_of_vr = base_of_unit[unit_of_vr] + np.arange(mv) - vrow_base[unit_of_vr]
    bin_of_vr = bin_of_unit[unit_of_vr]
    dev_nz = bin_of_vr[vr] // p_loc
    prog_nz = bin_of_vr[vr] % p_loc
    lrow_nz = lrow_of_vr[vr]
    lcol_nz = cols % n_chunk_rows
    bucket = (dev_nz * d + chunk_of_nz) * p_loc + prog_nz

    walker = _dgt_walk_multi if walk == "multi" else _dgt_walk
    wins_f, cols_f, lrw_f, vals_f, nc_arr, _, _ = walker(
        bucket, lcol_nz, lrow_nz, vals, n_buckets=d * d * p_loc,
        col_span=n_chunk_rows, ngrp=ngrp, cap=cap, T=T, g=g, nw=nw,
        resid=resid)
    nc = cols_f.shape[1]
    shape5 = (d, d, p_loc)

    # pyramid index over the D*P*rb slot space
    nslots = d * p_loc * rb
    slot0_of_unit = bin_of_unit * rb + base_of_unit
    lvl_of_unit = np.log2(pieces).astype(np.int64) if m else pieces
    lvl_off = np.array([0, nslots, nslots + nslots // 2,
                        nslots + nslots // 2 + nslots // 4], dtype=np.int64)
    pyr_idx = (lvl_off[lvl_of_unit] + (slot0_of_unit >> lvl_of_unit)).astype(np.int32)

    return HaloDgtFormat(
        wins=jnp.asarray(wins_f.reshape(*shape5, nc, T)),
        cols=jnp.asarray(cols_f.reshape(*shape5, nc, g)),
        lrw=jnp.asarray(lrw_f.reshape(*shape5, nc, g)),
        vals=jnp.asarray(vals_f.reshape(*shape5, nc, g)),
        slot_of_origrow=jnp.asarray(pyr_idx),
        shape=(m, n),
        n_devices=d,
        programs_per_device=p_loc,
        n_chunks=nc,
        chunk_g=g,
        rb=rb,
        kt=kt,
        mode=mode,
        resid=resid,
        nw=nw,
        split_levels=smax,
        n_chunk_rows=n_chunk_rows,
    )


def build_halo_dgt_spmm(
    fmt: HaloDgtFormat,
    mesh: Mesh,
    *,
    unroll: int = 8,
    scatter: str = "select",
    fold: bool = True,
    interpret: bool | None = None,
):
    """dgt-kernel variant of the ppermute ring (the round-3 champion
    per-chip path): same overlap structure; split-row outputs fold through
    the pairwise-sum pyramid before the slot gather.  ``scatter='fullrow'``
    pairs with resid=False packs (the low-padding ring, VERDICT r3 #4)."""
    from tpusparse.kernels.dgt_gather import _dgt_call

    if interpret is None:
        interpret = kernel_backend_interpret()
    p_loc = fmt.programs_per_device

    def step_call(subs, x_cur):
        return _dgt_call(
            subs[0], subs[1], subs[2], subs[3], x_cur,
            P=p_loc, nc=fmt.n_chunks, g=fmt.chunk_g, rb=fmt.rb, kt=fmt.kt,
            mode=fmt.mode, resid=fmt.resid, nw=fmt.nw, unroll=unroll,
            scatter=scatter, fold=fold, interpret=interpret,
        )

    def fold_out(y_slots):
        pyr = [y_slots]
        for _ in range(fmt.split_levels.bit_length() - 1):
            prev = pyr[-1]
            pyr.append(prev.reshape(prev.shape[0] // 2, 2,
                                    *prev.shape[1:]).sum(1))
        return jnp.concatenate(pyr, axis=0) if fmt.split_levels > 1 else y_slots

    return _build_ring(
        mesh,
        n_devices=fmt.n_devices,
        arrays=(fmt.wins, fmt.cols, fmt.lrw, fmt.vals),
        slot_of_origrow=fmt.slot_of_origrow,
        out_slots=p_loc * fmt.rb,
        n_chunk_rows=fmt.n_chunk_rows,
        tail_pad=0,
        k_multiple=lambda k_in: fmt.kt,
        step_call=step_call,
        fold_out=fold_out,
    )
