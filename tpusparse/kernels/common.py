"""Shared kernel utilities."""

from __future__ import annotations


import jax
import jax.numpy as jnp


def kernel_backend_interpret() -> bool:
    """Pallas TPU kernels run compiled on TPU, interpreted elsewhere (CPU CI;
    SURVEY.md §7 'runs ... in Pallas interpret mode on CPU for CI')."""
    return jax.default_backend() != "tpu"


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def pad_dense_rows(x: jnp.ndarray, target_rows: int) -> jnp.ndarray:
    """Zero-pad the leading dim of X (dense operand) to a static size."""
    if x.shape[0] == target_rows:
        return x
    pad = [(0, target_rows - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def pad_dense_cols(x: jnp.ndarray, target_cols: int) -> jnp.ndarray:
    if x.shape[-1] == target_cols:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, target_cols - x.shape[-1])]
    return jnp.pad(x, pad)


def _split_bf16(x):
    """Split fp32 into (hi, lo) bf16 with hi + lo ~ x to ~16 mantissa bits.

    hi is produced by masking the low 16 mantissa bits (exactly representable
    in bf16) rather than by a bf16 round-trip: under
    --xla_allow_excess_precision (set on some TPU stacks) XLA may elide the
    ``x - f32(bf16(x))`` residual entirely, silently degrading the result to
    plain bf16."""
    x = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFF0000), jnp.float32)
    lo = x - hi
    return hi.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)



def onehot_chunk_contrib(cl, lr, v, xwin, acc, *, rb, ct, mode, kt):
    """One chunk's contribution, all lane-major (no in-register transposes):

      colhotT [CT, G] = (iota_ct_sub == cl)        cl (1, G)
      gT [w, G]       = xwin^T . colhotT            contract dim0/dim0
      cT [kt, G]      = (gT hi+lo) * v              v (1, G) lane-major!
      acc [RB, kt]   += rowhot . cT^T               contract dim1/dim1

    The nonstandard dot_general dimension orders lower efficiently on the
    MXU and eliminate the (G, 1) sublane-major loads the naive orientation
    needs — measured ~2.1x on v5e vs the reshape formulation."""
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    iota_ct_sub = jax.lax.broadcasted_iota(jnp.int32, (ct, 1), 0)
    iota_rb_sub = jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0)
    DEF = jax.lax.Precision.DEFAULT
    HI = jax.lax.Precision.HIGHEST

    if mode == "fp32":
        colhotT = (iota_ct_sub == cl).astype(f32)
        gT = jax.lax.dot_general(
            xwin.astype(f32), colhotT,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=HI,
        )                                             # (kt, G)
        cT = gT * v.astype(f32)
        rowhot = (iota_rb_sub == lr).astype(f32)
        return acc + jax.lax.dot_general(
            rowhot, cT, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=HI,
        )
    colhotT = (iota_ct_sub == cl).astype(bf16)
    gT = jax.lax.dot_general(
        xwin, colhotT, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                 # (w, G)
    if mode == "fp32x2":
        gT = gT[:kt, :] + gT[kt:, :]
    cT = gT * v.astype(f32)                           # (kt, G)
    rowhot = (iota_rb_sub == lr).astype(bf16)
    if mode == "fp32x2":
        chi, clo = _split_bf16(cT)
        c2 = jnp.concatenate([chi, clo], axis=0)      # (2kt, G)
        both = jax.lax.dot_general(
            rowhot, c2, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )                                             # (RB, 2kt)
        return acc + (both[:, :kt] + both[:, kt:])
    return acc + jax.lax.dot_general(
        rowhot, cT.astype(bf16), dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )


