"""stripe_gather — row-aligned gather SpMM kernel.

Reference counterpart: the *total-reduce* family
(total_BMT/total_warp/total_block_result_reduce_to_one_register_token,
reduction_token/*.cc): each execution unit owns whole rows, loops its nz
range, accumulates into registers, and stores Y exactly once — no atomics.

TPU mapping: one grid program = one stripe (the BMTB); the program loops its
uniform-C nz list (indices+values delivered to SMEM, the scalar memory),
gathers X rows from VMEM by dynamic sublane slice, and accumulates into its
(RB, ktile) VMEM output window.  The K dimension is tiled over a second grid
axis (the reference's ``blockIdx.y`` dense-column parallelism,
operator/grid_block_operator.cc).  ``unroll`` plays the role of the
reference's ``sparse_coarsen_factor`` vectorized Load() (SURVEY §2.4).

Output is written to *stripe slots* (p * RB + local_row); the caller gathers
``y_slots[slot_of_origrow]`` to undo sorting/blocking — the TPU replacement
for in-kernel sort recovery (code_generator.cc:1392-1525).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusparse.format import StripeFormat
from tpusparse.kernels.common import cdiv, kernel_backend_interpret, pad_dense_rows


def _stripe_kernel(cols_ref, lrow_ref, vals_ref, x_ref, y_ref, *, stripe_nnz,
                   unroll, lrow_info=None):
    y_ref[...] = jnp.zeros_like(y_ref)

    acc_dtype = y_ref.dtype

    def step(i):
        c = cols_ref[0, 0, i]
        if lrow_info is None:
            r = lrow_ref[0, 0, i]
        else:
            # model-driven index compression (arr_optimization.cc analogue):
            # the row index is computed, not loaded
            r = lrow_info.evaluate(i)
        v = vals_ref[0, 0, i].astype(acc_dtype)
        y_ref[0, pl.ds(r, 1), :] += v * x_ref[pl.ds(c, 1), :].astype(acc_dtype)

    if unroll <= 1:
        jax.lax.fori_loop(0, stripe_nnz, lambda i, _: (step(i), 0)[1], 0)
    else:
        def body(j, _):
            base = j * unroll
            for u in range(unroll):
                step(base + u)
            return 0

        jax.lax.fori_loop(0, stripe_nnz // unroll, body, 0)


@functools.partial(jax.jit, static_argnames=("n_stripes", "stripe_nnz", "rb", "ktile", "unroll", "interpret", "lrow_info"))
def _stripe_call(cols, lrow, vals, x, *, n_stripes, stripe_nnz, rb, ktile, unroll, interpret, lrow_info=None):
    n = x.shape[0]
    k = x.shape[1]
    kt = cdiv(k, ktile)
    grid = (n_stripes, kt)
    kernel = functools.partial(_stripe_kernel, stripe_nnz=stripe_nnz, unroll=unroll,
                               lrow_info=lrow_info)
    acc_dtype = jnp.float32  # fp32 accumulation on the VPU (SURVEY §7 hard parts)
    y_slots = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((n_stripes, rb, kt * ktile), acc_dtype),
        in_specs=[
            pl.BlockSpec((1, 1, stripe_nnz), lambda p, t: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, stripe_nnz), lambda p, t: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, stripe_nnz), lambda p, t: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((n, ktile), lambda p, t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, ktile), lambda p, t: (p, 0, t), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cols, lrow, vals, x)
    return y_slots.reshape(n_stripes * rb, kt * ktile)


def stripe_spmm(
    fmt: StripeFormat,
    x: jnp.ndarray,
    *,
    ktile: int | None = None,
    unroll: int = 8,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Y[M, K] = A . X[N, K] with A in StripeFormat."""
    if interpret is None:
        interpret = kernel_backend_interpret()
    m, n_cols = fmt.shape
    k = x.shape[1]
    assert x.shape[0] == n_cols, f"X rows {x.shape[0]} != A cols {n_cols}"
    if ktile is None:
        ktile = k if k <= 128 else 128
    elif ktile < k and ktile % 128:
        # Mosaic requires the X block's lane dim to be 128-divisible or
        # equal to the array dim; a sub-K tile that is neither cannot
        # lower, so fall back to the single-tile width
        ktile = k if k <= 128 else 128
    if k % ktile:
        x = jnp.pad(x, ((0, 0), (0, ktile - k % ktile)))
    # pad X rows so the highest padded col index (stripe padding repeats a
    # real col, so indices stay in range) plus sublane alignment is safe
    x = pad_dense_rows(x, -(-x.shape[0] // 8) * 8)
    u = unroll if fmt.stripe_nnz % unroll == 0 else 1
    # model-driven index compression: if every stripe's lrow follows one
    # shared closed form, the kernel computes it instead of loading it
    # (config MODEL_DRIVEN_INDEX_COMPRESS, reference arr_optimization.cc)
    lrow_info = None
    from tpusparse.config import get_config

    if get_config().model_driven_index_compress:
        from tpusparse.transforms.compress import detect_compression

        lrow_np = np.asarray(fmt.lrow)
        info = detect_compression(lrow_np[0, 0])
        if info.kind in ("constant", "linear", "cycle_linear", "cycle_increase"):
            same = all(
                detect_compression(lrow_np[p, 0]) == info
                for p in range(min(fmt.n_stripes, 64))
            ) and (fmt.n_stripes <= 64 or bool(
                (lrow_np == lrow_np[0:1]).all()
            ))
            if same:
                lrow_info = info
    y_slots = _stripe_call(
        fmt.cols, fmt.lrow, fmt.vals, x,
        n_stripes=fmt.n_stripes,
        stripe_nnz=fmt.stripe_nnz,
        rb=fmt.max_rows_per_stripe,
        ktile=ktile,
        unroll=u,
        interpret=interpret,
        lrow_info=lrow_info,
    )
    slot = jnp.asarray(fmt.slot_of_origrow)
    # -1 sentinels (rows absent from this sub-matrix) must yield zero rows;
    # jnp.take would wrap -1 to the last slot, so redirect to an OOB index
    # and use fill mode.
    oob = y_slots.shape[0]
    slot = jnp.where(slot < 0, oob, slot)
    y = jnp.take(y_slots, slot, axis=0, mode="fill", fill_value=0)
    return y[:, :k]


def _stripe_nested_kernel(cols_ref, lrow_ref, vals_ref, wnz_ref, wrow_ref,
                          x_ref, y_ref, *, n_warps, unroll):
    """Two-level loop: outer over WARP sub-blocks, inner over the warp's nz
    run — the reference's nested for-structure with parent-relative child
    indices (code_generator.cc:1655-1871); row = warp base + warp-local
    lrow recovers the absolute position (fused relative-index recursion,
    :1287-1390)."""
    y_ref[...] = jnp.zeros_like(y_ref)
    acc_dtype = y_ref.dtype

    def warp_body(w, _):
        lo = wnz_ref[0, 0, w]
        hi = wnz_ref[0, 0, w + 1]
        row0 = wrow_ref[0, 0, w]

        def step(i):
            c = cols_ref[0, 0, i]
            r = row0 + lrow_ref[0, 0, i]
            v = vals_ref[0, 0, i].astype(acc_dtype)
            y_ref[0, pl.ds(r, 1), :] += v * x_ref[pl.ds(c, 1), :].astype(acc_dtype)

        def inner(j, _):
            base = lo + j * unroll
            for u in range(unroll):
                step(base + u)
            return 0

        # warp runs are padded to ``unroll`` multiples at pack time
        jax.lax.fori_loop(0, (hi - lo) // unroll, inner, 0)
        return 0

    jax.lax.fori_loop(0, n_warps, warp_body, 0)


@functools.partial(jax.jit, static_argnames=(
    "n_stripes", "stripe_nnz", "n_warps", "rb", "ktile", "unroll", "interpret"))
def _stripe_nested_call(cols, lrow, vals, wnz, wrow, x, *, n_stripes,
                        stripe_nnz, n_warps, rb, ktile, unroll, interpret):
    n = x.shape[0]
    k = x.shape[1]
    kt = cdiv(k, ktile)
    kernel = functools.partial(_stripe_nested_kernel, n_warps=n_warps,
                               unroll=unroll)
    y_slots = pl.pallas_call(
        kernel,
        grid=(n_stripes, kt),
        out_shape=jax.ShapeDtypeStruct((n_stripes, rb, kt * ktile), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 1, stripe_nnz), lambda p, t: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, stripe_nnz), lambda p, t: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, stripe_nnz), lambda p, t: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_warps + 1), lambda p, t: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_warps + 1), lambda p, t: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((n, ktile), lambda p, t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, ktile), lambda p, t: (p, 0, t), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cols, lrow, vals, wnz, wrow, x)
    return y_slots.reshape(n_stripes * rb, kt * ktile)


def stripe_nested_spmm(fmt, x, *, ktile=None, unroll: int = 8,
                       interpret: bool | None = None):
    """Y = A . X with A in NestedStripeFormat (two-level TBLOCK⊃WARP)."""
    if interpret is None:
        interpret = kernel_backend_interpret()
    m, n_cols = fmt.shape
    k = x.shape[1]
    assert x.shape[0] == n_cols
    if ktile is None:
        ktile = k if k <= 128 else 128
    elif ktile < k and ktile % 128:
        # Mosaic requires the X block's lane dim to be 128-divisible or
        # equal to the array dim; a sub-K tile that is neither cannot
        # lower, so fall back to the single-tile width
        ktile = k if k <= 128 else 128
    if k % ktile:
        x = jnp.pad(x, ((0, 0), (0, ktile - k % ktile)))
    x = pad_dense_rows(x, -(-x.shape[0] // 8) * 8)
    y_slots = _stripe_nested_call(
        fmt.cols, fmt.lrow, fmt.vals, fmt.wnz, fmt.wrow, x,
        n_stripes=fmt.n_stripes, stripe_nnz=fmt.stripe_nnz,
        n_warps=fmt.n_warps, rb=fmt.max_rows_per_stripe, ktile=ktile,
        unroll=unroll, interpret=interpret,
    )
    slot = jnp.asarray(fmt.slot_of_origrow)
    oob = y_slots.shape[0]
    slot = jnp.where(slot < 0, oob, slot)
    y = jnp.take(y_slots, slot, axis=0, mode="fill", fill_value=0)
    return y[:, :k]
