"""SDDMM + transpose-apply over the span layout — trainable sparse values.

The reference is inference-only (its generated kernels bake values into the
format files); a TPU-native framework embedded in JAX training pipelines
needs the weight-gradient pair for ``Y = A(v) @ X`` with a FIXED sparsity
pattern and TRAINABLE values v (pruned-LLM fine-tuning):

  dv[nz=(r,c)] = sum_k dY[r,k] * X[c,k]          (SDDMM, sampled at A)
  dX[c,k]      = sum_{nz=(r,c)} v[nz] * dY[r,k]  (A^T @ dY, same layout)

Both reuse the span format's chunk structure (pack_span) so the value
PARAMETER is the packed [P, NC, G] plane itself — no per-step repacking and
no scalar gathers (XLA's jnp.take of nnz-sized index vectors needs minutes
on TPU; every gather here is a one-hot MXU contraction, the same trick as
the forward kernel, span_gather.py).

 - ``span_sddmm``: per chunk, gather X rows through colhotT [CT, G] and dY
   rows through rowhot [RB, G] (both lane-major bf16 hi/lo dots as in
   onehot_chunk_contrib), multiply the two [kt, G] gathers elementwise and
   sublane-reduce to the chunk's (1, G) value-gradient row.  Grid
   (P, kt_count) with t minor: K-tiles accumulate into the same [NC, G]
   block (consecutive revisits).
 - ``span_dx``: the transpose apply WITHOUT a transposed format: gather dY
   rows through rowhot, scale by v, and scatter into the [N, kt] output
   window through colhotT (dot_general over G).  TPU Pallas grids run
   sequentially on the core, so every program read-modify-writes the same
   resident [N_pad, kt] block (grid (kt_count, P), P minor) — the
   "scatter-add without atomics" idiom.  Needs X-sized VMEM residency, the
   same ~6 MB gate as span_onehot itself.

Reference counterpart: none (GeneralSparse has no training story); the
capability matches the north-star "framework a reference user can switch
to" bar for sparse-weight training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusparse.kernels.common import (_split_bf16, cdiv, kernel_backend_interpret,
                                      pad_dense_rows, round_up)
from tpusparse.kernels.span_gather import SpanFormat
from tpusparse.kernels.tile_onehot import _prep_x


def _gather_rows(win, hotT, *, mode, kt):
    """[w, G] = win^T . hotT with the mode's precision; fp32x2 folds hi+lo."""
    f32 = jnp.float32
    if mode == "fp32":
        gT = jax.lax.dot_general(
            win.astype(f32), hotT.astype(f32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST,
        )
        return gT
    gT = jax.lax.dot_general(
        win, hotT.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    if mode == "fp32x2":
        return gT[:kt, :] + gT[kt:, :]
    return gT


def _sddmm_kernel(c0_ref, cols_ref, lrow_ref, dy_ref, x_ref, dv_ref, *,
                  nc, g, rb, ct, mode):
    kt = dy_ref.shape[1]  # block width is static: kt (2*kt packed for fp32x2)
    if mode == "fp32x2":
        kt //= 2
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dv_ref[...] = jnp.zeros_like(dv_ref)

    iota_ct = jax.lax.broadcasted_iota(jnp.int32, (ct, 1), 0)
    iota_rb = jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0)

    def chunk(j, carry):
        c0 = pl.multiple_of(c0_ref[0, 0, j], 8)
        cl = cols_ref[0, pl.ds(j, 1), :]           # (1, G)
        lr = lrow_ref[0, pl.ds(j, 1), :]           # (1, G)
        xwin = x_ref[pl.ds(c0, ct), :]             # (CT, w)
        gx = _gather_rows(xwin, iota_ct == cl, mode=mode, kt=kt)   # (kt, G)
        gd = _gather_rows(dy_ref[...], iota_rb == lr, mode=mode, kt=kt)
        prod = gx * gd                             # (kt, G) fp32
        dv_ref[0, pl.ds(j, 1), :] += jnp.sum(prod, axis=0, keepdims=True)
        return carry

    jax.lax.fori_loop(0, nc, chunk, 0)


@functools.partial(
    jax.jit,
    static_argnames=("n_programs", "nc", "g", "rb", "ct", "ktile", "mode",
                     "interpret"),
)
def _sddmm_call(c0, cols3, lrow3, dy_slots, x, *, n_programs, nc, g, rb, ct,
                ktile, mode, interpret):
    n = x.shape[0]
    k = x.shape[1]
    kt_count = cdiv(k, ktile)
    xin, xwidth = _prep_x(x, mode, ktile)
    dyin, _ = _prep_x(dy_slots, mode, ktile)
    kernel = functools.partial(_sddmm_kernel, nc=nc, g=g, rb=rb, ct=ct,
                               mode=mode)
    dv = pl.pallas_call(
        kernel,
        grid=(n_programs, kt_count),
        out_shape=jax.ShapeDtypeStruct((n_programs, nc, g), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 1, nc), lambda p, t: (p, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nc, g), lambda p, t: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, g), lambda p, t: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, xwidth), lambda p, t: (p, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, xwidth), lambda p, t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nc, g), lambda p, t: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(c0, cols3, lrow3, dyin, xin)
    return dv


def span_sddmm(fmt: SpanFormat, dy_slots, x, *, ktile: int | None = None,
               precision: str = "fp32x2", interpret: bool | None = None):
    """dv[P, NC, G] = (dY . X^T) sampled at the format's chunk positions.

    ``dy_slots`` [P*RB, K] is dY permuted into slot order (autodiff wiring
    does the row gather once); ``x`` [N, K] the forward dense operand.
    Padding slots get garbage (their cols/lrow alias real positions) — the
    caller masks with ``occupancy_mask``."""
    if interpret is None:
        interpret = kernel_backend_interpret()
    k = x.shape[1]
    if ktile is None:
        ktile = k if k <= 128 else 128
    # Mosaic trap: < 8-sublane intermediates explode compile time (CLAUDE.md);
    # the (kt, G) gathers must keep kt >= 8, padding covers the K tail
    ktile = max(ktile, 8)
    if k % ktile:
        pad = ktile - k % ktile
        x = jnp.pad(x, ((0, 0), (0, pad)))
        dy_slots = jnp.pad(dy_slots, ((0, 0), (0, pad)))
    x = pad_dense_rows(x.astype(jnp.float32),
                       round_up(fmt.shape[1], 8) + fmt.ct)
    return _sddmm_call(
        fmt.c0, fmt.cols, fmt.lrow, dy_slots.astype(jnp.float32), x,
        n_programs=fmt.n_programs, nc=fmt.n_chunks, g=fmt.chunk_g,
        rb=fmt.rb, ct=fmt.ct, ktile=ktile, mode=precision,
        interpret=interpret,
    )


def _dx_kernel(c0_ref, cols_ref, lrow_ref, vals_ref, dy_ref, dx_ref, *,
               nc, g, rb, ct, mode):
    kt = dx_ref.shape[1]
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        dx_ref[...] = jnp.zeros_like(dx_ref)

    iota_ct = jax.lax.broadcasted_iota(jnp.int32, (ct, 1), 0)
    iota_rb = jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0)
    f32 = jnp.float32

    def chunk(j, carry):
        c0 = pl.multiple_of(c0_ref[0, 0, j], 8)
        cl = cols_ref[0, pl.ds(j, 1), :]           # (1, G)
        lr = lrow_ref[0, pl.ds(j, 1), :]           # (1, G)
        v = vals_ref[0, pl.ds(j, 1), :]            # (1, G)
        gd = _gather_rows(dy_ref[...], iota_rb == lr, mode=mode, kt=kt)
        cv = gd * v.astype(f32)                    # (kt, G)
        if mode == "fp32":
            contrib = jax.lax.dot_general(
                (iota_ct == cl).astype(f32), cv,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST,
            )                                      # (CT, kt)
        else:
            colhotT = (iota_ct == cl).astype(jnp.bfloat16)
            if mode == "fp32x2":
                chi, clo = _split_bf16(cv)
                c2 = jnp.concatenate([chi, clo], axis=0)   # (2kt, G)
                both = jax.lax.dot_general(
                    colhotT, c2, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=f32,
                )                                  # (CT, 2kt)
                contrib = both[:, :kt] + both[:, kt:]
            else:
                contrib = jax.lax.dot_general(
                    colhotT, cv.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=f32,
                )
        dx_ref[pl.ds(c0, ct), :] += contrib
        return carry

    jax.lax.fori_loop(0, nc, chunk, 0)


@functools.partial(
    jax.jit,
    static_argnames=("n_programs", "nc", "g", "rb", "ct", "n_pad", "ktile",
                     "mode", "interpret"),
)
def _dx_call(c0, cols3, lrow3, vals3, dy_slots, *, n_programs, nc, g, rb, ct,
             n_pad, ktile, mode, interpret):
    k = dy_slots.shape[1]
    kt_count = cdiv(k, ktile)
    dyin, xwidth = _prep_x(dy_slots, mode, ktile)
    kernel = functools.partial(_dx_kernel, nc=nc, g=g, rb=rb, ct=ct, mode=mode)
    dx = pl.pallas_call(
        kernel,
        # P minor: for a fixed K-tile every program revisits the same
        # resident [N_pad, kt] output block consecutively (sequential
        # scatter-add; TPU Pallas programs run in order on the core)
        grid=(kt_count, n_programs),
        out_shape=jax.ShapeDtypeStruct((n_pad, kt_count * ktile), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 1, nc), lambda t, p: (p, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nc, g), lambda t, p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, g), lambda t, p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, g), lambda t, p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, xwidth), lambda t, p: (p, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_pad, ktile), lambda t, p: (0, t),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(c0, cols3, lrow3, vals3, dyin)
    return dx


def span_dx(fmt: SpanFormat, vals, dy_slots, *, ktile: int | None = None,
            precision: str = "fp32x2", interpret: bool | None = None):
    """dX[N, K] = A(vals)^T . dY without a transposed format (see module
    docstring); ``vals`` is the packed [P, NC, G] plane, ``dy_slots`` is dY
    in slot order [P*RB, K]."""
    if interpret is None:
        interpret = kernel_backend_interpret()
    k = dy_slots.shape[1]
    if ktile is None:
        ktile = k if k <= 128 else 128
    ktile = max(ktile, 8)  # sub-8-sublane Mosaic compile trap (CLAUDE.md)
    if k % ktile:
        dy_slots = jnp.pad(dy_slots, ((0, 0), (0, ktile - k % ktile)))
    n_pad = round_up(fmt.shape[1], 8) + fmt.ct
    dx = _dx_call(
        fmt.c0, fmt.cols, fmt.lrow, jnp.asarray(vals, jnp.float32),
        dy_slots.astype(jnp.float32),
        n_programs=fmt.n_programs, nc=fmt.n_chunks, g=fmt.chunk_g,
        rb=fmt.rb, ct=fmt.ct, n_pad=n_pad, ktile=ktile, mode=precision,
        interpret=interpret,
    )
    return dx[: fmt.shape[1], :k]


def sddmm(mat, a, b, *, rb: int = 512, ct: int = 512, g: int = 128,
          precision: str = "fp32x2", interpret: bool | None = None
          ) -> np.ndarray:
    """Sampled dense-dense matmul: values of ``(a @ b.T)`` at ``mat``'s
    nz positions, returned in ``mat``'s nz order (the dgSPARSE/torch-sparse
    `sddmm` op, e.g. attention-score sampling over a fixed pattern).

    ``a`` [M, K] and ``b`` [N, K] with ``(M, N) == mat.shape``.  One-shot
    convenience: packs the pattern, runs the span-layout SDDMM kernel
    (module docstring), exports host-side.  For the iterate-many-times use
    (training), use ``autodiff.spmm_trainable`` — gradients reuse the same
    packing across steps.
    """
    from tpusparse.kernels.span_gather import pack_span

    m, n = mat.shape
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    assert a.shape[0] == m and b.shape[0] == n and a.shape[1] == b.shape[1], (
        f"a {a.shape} / b {b.shape} incompatible with pattern {mat.shape}")
    fmt = pack_span(mat, rb=rb, ct=ct, g=g, keep_perm=True)
    a_slots = jnp.take(a, jnp.asarray(origrow_of_slot(fmt)), axis=0,
                       mode="fill", fill_value=0)
    dv = span_sddmm(fmt, a_slots, b, precision=precision, interpret=interpret)
    return packed_to_nz(fmt, dv)


def occupancy_mask(fmt: SpanFormat) -> np.ndarray:
    """[P, NC, G] float32 1.0 where a real nz lives (0 = padding slot).
    Built from the packing permutation, NOT from vals != 0 — a stored zero
    value is still a real (trainable) position."""
    from tpusparse.kernels.span_gather import with_values

    assert fmt.perm_of_nz is not None, "pack_span(..., keep_perm=True) required"
    ones = np.ones(len(np.asarray(fmt.perm_of_nz)), dtype=np.float32)
    return np.asarray(with_values(fmt, ones).vals, dtype=np.float32)


def origrow_of_slot(fmt: SpanFormat) -> np.ndarray:
    """[P*RB] int32 inverse of slot_of_origrow; rows without a slot -> M
    (out of bounds, so jnp.take(mode='fill') zero-fills)."""
    m = fmt.shape[0]
    slot = np.asarray(fmt.slot_of_origrow)
    inv = np.full(fmt.n_programs * fmt.rb, m, dtype=np.int32)
    valid = slot >= 0
    inv[slot[valid]] = np.arange(m, dtype=np.int32)[valid]
    return inv


def packed_to_nz(fmt: SpanFormat, packed) -> np.ndarray:
    """Export: packed [P, NC, G] plane -> values in the original nz order
    given to pack_span (host-side; for checkpointing back to COO)."""
    assert fmt.perm_of_nz is not None, "pack_span(..., keep_perm=True) required"
    flat = np.asarray(packed, dtype=np.float32).reshape(-1)
    return flat[np.asarray(fmt.perm_of_nz)]
