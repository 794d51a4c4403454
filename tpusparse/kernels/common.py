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
