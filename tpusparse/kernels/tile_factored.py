"""tile_factored — factorized one-hot MXU SpMM (the small-K throughput path).

The plain one-hot kernel (tile_onehot.py) spends 2·kt·(CT+RB) MXU MACs per
nz; at small K the MXU tiles are mostly idle (output lane/row dims = kt).
This kernel factors each one-hot contraction into

  group stage (MXU):  one-hot over CT/F column *groups* of F — an
      [G, CT/F] x [CT/F, F·w] dot whose output packs all F group members
      along lanes, so both output dims are >=128 even at kt=8;
  member stage (VPU): F masked selects pick each nz's member slot.

and symmetrically for the row scatter (select-expand on VPU, then an
[RB/F, G] x [G, F·w] dot).  MXU tile-ops per chunk drop ~8x at kt=8 with
the window sizes (and therefore padding) unchanged; the selects ride the
VPU in parallel with the MXU.

Same TileFormat and precision semantics as tile_onehot ('bf16' and 'fp32x2'
hi/lo-split modes; one-hot matrices are exact in bf16).  Reference
counterpart: none — this is the TPU-native answer to the reference's
gather coarsening (total_BMT_...token.cc:643-806), restructured around the
128x128 systolic array.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusparse.format import TileFormat
from tpusparse.kernels.common import cdiv, kernel_backend_interpret, pad_dense_rows
from tpusparse.kernels.tile_onehot import _split_bf16

PRECISIONS = ("bf16", "fp32x2")


def _factored_kernel(
    chunk_tile_ref, cols_ref, lrow_ref, vals_ref, xg_ref, y_ref, *,
    nc, g, rb, ct, f, kt, mode, unroll,
):
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    ctf = ct // f
    rbf = rb // f
    w = 2 * kt if mode == "fp32x2" else kt   # per-member X payload width
    iota_ctf_lane = jax.lax.broadcasted_iota(jnp.int32, (1, ctf), 1)
    iota_rbf_sub = jax.lax.broadcasted_iota(jnp.int32, (rbf, 1), 0)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

    def chunk_contrib(j, acc):
        tile = chunk_tile_ref[0, 0, j]
        g0 = pl.multiple_of(tile * ctf, ctf)
        cl = cols_ref[0, pl.ds(j, 1), :].reshape(g, 1)     # (G, 1) int32
        lr_lane = lrow_ref[0, pl.ds(j, 1), :]              # (1, G)
        lr = lr_lane.reshape(g, 1)
        v = vals_ref[0, pl.ds(j, 1), :].reshape(g, 1).astype(f32)

        # ---- gather: group one-hot dot + member selects
        colhot = (cl // f == iota_ctf_lane).astype(bf16)   # (G, CT/F)
        grp = dot(colhot, xg_ref[pl.ds(g0, ctf), :])       # (G, F*w) f32
        lo_c = (cl % f).astype(f32)                        # (G, 1)
        gathered = None
        for m in range(f):
            part = jnp.where(lo_c == m, grp[:, m * w:(m + 1) * w], 0.0)
            gathered = part if gathered is None else gathered + part
        if mode == "fp32x2":
            gathered = gathered[:, :kt] + gathered[:, kt:]  # hi + lo halves
        contrib = v * gathered                              # (G, kt) f32

        # ---- scatter: member expand + group one-hot dot.  hi/lo is the
        # OUTER lane split so the final reduction is a plain lane slice
        # (Mosaic rejects 4D reshapes of vectors).
        lo_r = (lr % f).astype(f32)
        if mode == "fp32x2":
            chi, clo = _split_bf16(contrib)
            halves = [chi, clo]
        else:
            halves = [contrib.astype(bf16)]
        exp = jnp.concatenate(
            [jnp.where(lo_r == m, h, 0).astype(bf16) for h in halves for m in range(f)],
            axis=1,
        )                                                   # (G, H*F*kt)
        rowhot = (iota_rbf_sub == lr_lane // f).astype(bf16)  # (RB/F, G)
        return acc + dot(rowhot, exp)                       # (RB/F, H*F*kt)

    n_halves = 2 if mode == "fp32x2" else 1
    init = jnp.zeros((rbf, n_halves * f * kt), f32)
    if unroll > 1:
        def body(i, accs):
            return tuple(chunk_contrib(i * unroll + u, accs[u]) for u in range(unroll))
        accs = jax.lax.fori_loop(0, nc // unroll, body, (init,) * unroll)
        acc = functools.reduce(jnp.add, accs)
    else:
        acc = jax.lax.fori_loop(0, nc, chunk_contrib, init)

    if mode == "fp32x2":
        acc = acc[:, : f * kt] + acc[:, f * kt:]            # hi + lo (lane slice)
    # output stays packed (RB/F, F*kt); XLA unpacks outside the kernel
    y_ref[0, :, :] = acc


@functools.partial(
    jax.jit,
    static_argnames=("n_programs", "nc", "g", "rb", "ct", "f", "ktile", "mode",
                     "unroll", "interpret"),
)
def _factored_call(chunk_tile, cols, lrow, vals, x, *, n_programs, nc, g, rb, ct,
                   f, ktile, mode, unroll, interpret):
    n = x.shape[0]
    k_pad = x.shape[1]
    ktc = k_pad // ktile
    ngrp = n // f
    # group-packed X: row grp*F+m, K-tile t, [hi|lo] h, lane kk lands at
    # xg[grp, ((t*F + m)*H + h)*kt + kk]
    if mode == "fp32x2":
        hi, lo = _split_bf16(x)
        hi4 = hi.reshape(ngrp, f, ktc, ktile)
        lo4 = lo.reshape(ngrp, f, ktc, ktile)
        xg = jnp.stack([hi4, lo4], axis=3)                  # (ngrp, F, ktc, 2, kt)
        xg = jnp.transpose(xg, (0, 2, 1, 3, 4)).reshape(ngrp, ktc * f * 2 * ktile)
        xw = f * 2 * ktile
    else:
        xb = x.astype(jnp.bfloat16).reshape(ngrp, f, ktc, ktile)
        xg = jnp.transpose(xb, (0, 2, 1, 3)).reshape(ngrp, ktc * f * ktile)
        xw = f * ktile

    u = unroll if (unroll > 1 and nc % unroll == 0) else 1
    kernel = functools.partial(
        _factored_kernel, nc=nc, g=g, rb=rb, ct=ct, f=f, kt=ktile, mode=mode, unroll=u,
    )
    rbf = rb // f
    y = pl.pallas_call(
        kernel,
        grid=(n_programs, ktc),
        out_shape=jax.ShapeDtypeStruct((n_programs, rbf, ktc * f * ktile), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 1, nc), lambda p, t: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nc, g), lambda p, t: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, g), lambda p, t: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, g), lambda p, t: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ngrp, xw), lambda p, t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rbf, f * ktile), lambda p, t: (p, 0, t),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(chunk_tile, cols, lrow, vals, xg)
    # unpack packed slots [p, grp, (t, m, kk)] -> rows (p*rb + grp*f + m, t*kt + kk)
    y = y.reshape(n_programs, rbf, ktc, f, ktile)
    y = jnp.transpose(y, (0, 1, 3, 2, 4))
    return y.reshape(n_programs * rb, ktc * ktile)


def tile_factored_spmm(
    fmt: TileFormat,
    x: jnp.ndarray,
    *,
    ktile: int | None = None,
    precision: str = "fp32x2",
    factor: int = 8,
    unroll: int = 2,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Y[M, K] = A . X[N, K] with A in TileFormat, factorized one-hot path."""
    assert precision in PRECISIONS, precision
    assert fmt.ct % factor == 0 and fmt.rb % factor == 0, (fmt.ct, fmt.rb, factor)
    if interpret is None:
        interpret = kernel_backend_interpret()
    m, n_cols = fmt.shape
    k = x.shape[1]
    assert x.shape[0] == n_cols
    if ktile is None:
        ktile = k if k <= 128 else 128
    if k % ktile:
        x = jnp.pad(x, ((0, 0), (0, ktile - k % ktile)))
    n_tiles = cdiv(n_cols, fmt.ct)
    x = pad_dense_rows(x.astype(jnp.float32), n_tiles * fmt.ct)
    y_rows = _factored_call(
        fmt.chunk_tile, fmt.cols, fmt.lrow, fmt.vals, x,
        n_programs=fmt.n_programs, nc=fmt.n_chunks, g=fmt.chunk_g,
        rb=fmt.rb, ct=fmt.ct, f=factor, ktile=ktile, mode=precision,
        unroll=unroll, interpret=interpret,
    )
    slot = jnp.asarray(fmt.slot_of_origrow)
    oob = y_rows.shape[0]
    slot = jnp.where(slot < 0, oob, slot)
    y = jnp.take(y_rows, slot, axis=0, mode="fill", fill_value=0)
    return y[:, :k]
