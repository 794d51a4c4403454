"""tile_onehot — one-hot MXU SpMM kernel (the throughput path).

Per chunk of G nz (all in one column tile of width CT):

  gathered[G, kt] = ColHot[G, CT] . Xwin[CT, kt]        (MXU)
  contrib         = vals * gathered                      (VPU, fp32)
  acc[RB, kt]    += RowHot[RB, G] . contrib              (MXU)

where ColHot[g, c] = (cols[g] == c) and RowHot[r, g] = (lrow[g] == r) are
built with broadcast-iota compares on the VPU.  No per-nz scalar operations.

Precision modes (TPU MXU natively multiplies bf16; one-hot matrices are
exact in bf16, so precision costs apply only to the data operand):
  'bf16'    1-pass bf16 dots (X rounded to bf16)          — fastest
  'fp32x2'  X split into bf16 hi+lo outside the kernel; each gather is two
            1-pass dots; the row-scatter splits contrib likewise.  ~2^-16
            relative accuracy at ~1/3 the cost of full fp32.
  'fp32'    Precision.HIGHEST (6-pass) — bit-accurate fp32.

Reference counterpart: replaces the reference's per-thread nz loops +
vectorized Load() coarsening (total_BMT_...token.cc:643-806) with MXU
contractions — the idiomatic TPU formulation of "gather X rows by col
index".  The column-tile structure is the reference's col-direction blocking
(fixed_interval_col_direction_*_operator) put to TPU-native use: it bounds
the one-hot width so gather cost stays proportional to CT, not N.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusparse.format import TileFormat
from tpusparse.kernels.common import (_split_bf16, cdiv, kernel_backend_interpret,
                                      onehot_chunk_contrib, pad_dense_rows)

PRECISIONS = ("bf16", "fp32x2", "fp32")


def _tile_kernel(
    chunk_tile_ref, cols_ref, lrow_ref, vals_ref, xhi_ref, y_ref, *,
    nc, g, rb, ct, mode, unroll,
):
    kt = y_ref.shape[2]
    f32 = jnp.float32

    def chunk_contrib(j, acc):
        tile = chunk_tile_ref[0, 0, j]
        c0 = pl.multiple_of(tile * ct, ct)
        cl = cols_ref[0, pl.ds(j, 1), :]          # (1, G)
        lr = lrow_ref[0, pl.ds(j, 1), :]          # (1, G)
        v = vals_ref[0, pl.ds(j, 1), :]           # (1, G)
        xwin = xhi_ref[pl.ds(c0, ct), :]
        return onehot_chunk_contrib(cl, lr, v, xwin, acc, rb=rb, ct=ct,
                                    mode=mode, kt=kt)

    if unroll > 1:
        def body(i, accs):
            return tuple(
                chunk_contrib(i * unroll + u, accs[u]) for u in range(unroll)
            )
        accs = jax.lax.fori_loop(
            0, nc // unroll, body,
            tuple(jnp.zeros((rb, kt), f32) for _ in range(unroll)),
        )
        acc = functools.reduce(jnp.add, accs)
    else:
        acc = jax.lax.fori_loop(0, nc, chunk_contrib, jnp.zeros((rb, kt), f32))
    y_ref[0, :, :] = acc


def _prep_x(x, mode, ktile):
    """Pack X for the kernel: fp32x2 interleaves hi/lo bf16 halves per K-tile."""
    n, k = x.shape
    kt_count = cdiv(k, ktile)
    if mode == "fp32":
        return x, ktile
    if mode == "fp32x2":
        hi, lo = _split_bf16(x)
        # pack hi/lo per K-tile: [N, t*2kt : t*2kt+kt] = hi tile, then lo tile
        hi = hi.reshape(n, kt_count, ktile)
        lo = lo.reshape(n, kt_count, ktile)
        return jnp.stack([hi, lo], axis=2).reshape(n, kt_count * 2 * ktile), 2 * ktile
    return x.astype(jnp.bfloat16), ktile


@functools.partial(
    jax.jit,
    static_argnames=("n_programs", "nc", "g", "rb", "ct", "ktile", "mode", "unroll", "interpret"),
)
def _tile_call(chunk_tile, cols, lrow, vals, x, *, n_programs, nc, g, rb, ct, ktile, mode, unroll, interpret):
    n = x.shape[0]
    k = x.shape[1]
    kt_count = cdiv(k, ktile)
    xin, xwidth = _prep_x(x, mode, ktile)
    u = unroll if (unroll > 1 and nc % unroll == 0) else 1
    kernel = functools.partial(_tile_kernel, nc=nc, g=g, rb=rb, ct=ct, mode=mode, unroll=u)
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
        out_specs=pl.BlockSpec((1, rb, ktile), lambda p, t: (p, 0, t), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(chunk_tile, cols, lrow, vals, xin)
    return y.reshape(n_programs * rb, kt_count * ktile)


def _tile_kernel_stream(ct_ref, cols_ref, lrow_ref, vals_ref, xwin_ref, y_ref, *,
                        g, rb, mode):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    kt = y_ref.shape[2]
    ct = xwin_ref.shape[0]
    cl = cols_ref[0, 0, 0, :][None, :]   # (1, G)
    lr = lrow_ref[0, 0, 0, :][None, :]
    v = vals_ref[0, 0, 0, :][None, :]
    y_ref[0, :, :] = onehot_chunk_contrib(cl, lr, v, xwin_ref[...],
                                          y_ref[0, :, :], rb=rb, ct=ct,
                                          mode=mode, kt=kt)


@functools.partial(
    jax.jit,
    static_argnames=("n_programs", "nc", "g", "rb", "ct", "ktile", "mode", "interpret"),
)
def _tile_call_stream(chunk_tile, cols, lrow, vals, x, *, n_programs, nc, g, rb,
                      ct, ktile, mode, interpret):
    """Streaming variant for X too large for VMEM residency: chunk_tile is
    scalar-prefetched and the X BlockSpec index_map selects each chunk's
    (CT, xwidth) window, double-buffered by the Pallas pipeline."""
    k = x.shape[1]
    kt_count = cdiv(k, ktile)
    xin, xwidth = _prep_x(x, mode, ktile)
    kernel = functools.partial(_tile_kernel_stream, g=g, rb=rb, mode=mode)
    ct2d = chunk_tile.reshape(n_programs, nc)
    # trailing singleton so the per-chunk block's last two dims equal the
    # array dims (Mosaic block-shape rule)
    cols4 = cols.reshape(n_programs, nc, 1, g)
    lrow4 = lrow.reshape(n_programs, nc, 1, g)
    vals4 = vals.reshape(n_programs, nc, 1, g)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_programs, kt_count, nc),
        in_specs=[
            pl.BlockSpec((1, 1, 1, g), lambda p, t, j, ctr: (p, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, g), lambda p, t, j, ctr: (p, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, g), lambda p, t, j, ctr: (p, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, xwidth), lambda p, t, j, ctr: (ctr[p, j], t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, ktile), lambda p, t, j, ctr: (p, 0, t),
                               memory_space=pltpu.VMEM),
    )
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_programs, rb, kt_count * ktile), jnp.float32),
        interpret=interpret,
    )(ct2d, cols4, lrow4, vals4, xin)
    return y.reshape(n_programs * rb, kt_count * ktile)


# X blocks above this footprint use the streaming (scalar-prefetch) variant
_RESIDENT_X_BYTES = 6 * 1024 * 1024


def tile_spmm(
    fmt: TileFormat,
    x: jnp.ndarray,
    *,
    ktile: int | None = None,
    precision: str = "fp32x2",
    unroll: int = 2,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Y[M, K] = A . X[N, K] with A in TileFormat."""
    assert precision in PRECISIONS, precision
    if interpret is None:
        interpret = kernel_backend_interpret()
    m, n_cols = fmt.shape
    k = x.shape[1]
    assert x.shape[0] == n_cols
    if ktile is None:
        ktile = k if k <= 128 else 128
    if k % ktile:
        x = jnp.pad(x, ((0, 0), (0, ktile - k % ktile)))
    # pad X rows to full tiles so the (CT, kt) window never reads OOB
    n_tiles = cdiv(n_cols, fmt.ct)
    x = pad_dense_rows(x.astype(jnp.float32), n_tiles * fmt.ct)
    xwidth = 2 * ktile if precision == "fp32x2" else ktile
    item = 4 if precision == "fp32" else 2
    if x.shape[0] * xwidth * item > _RESIDENT_X_BYTES:
        y_rows = _tile_call_stream(
            fmt.chunk_tile, fmt.cols, fmt.lrow, fmt.vals, x,
            n_programs=fmt.n_programs, nc=fmt.n_chunks, g=fmt.chunk_g,
            rb=fmt.rb, ct=fmt.ct, ktile=ktile, mode=precision,
            interpret=interpret,
        )
    else:
        y_rows = _tile_call(
            fmt.chunk_tile, fmt.cols, fmt.lrow, fmt.vals, x,
            n_programs=fmt.n_programs,
            nc=fmt.n_chunks,
            g=fmt.chunk_g,
            rb=fmt.rb,
            ct=fmt.ct,
            ktile=ktile,
            mode=precision,
            unroll=unroll,
            interpret=interpret,
        )
    slot = jnp.asarray(fmt.slot_of_origrow)
    oob = y_rows.shape[0]
    slot = jnp.where(slot < 0, oob, slot)
    y = jnp.take(y_rows, slot, axis=0, mode="fill", fill_value=0)
    return y[:, :k]
