"""Batched SpMM (BASELINE.json config #4): one sparse A applied to a batch
of dense operands X[B, n_cols, K].

TPU-native formulation: fold the batch into the dense K axis — every kernel
family here tiles K over a grid axis, so Y[B] = A . X[B] for all B is a
single kernel launch over K' = B*K columns.  This is the reference's
``blockIdx.y`` dense-column parallelism (operator/grid_block_operator.cc)
scaled to batches, with zero extra format cost.
"""

from __future__ import annotations

import jax.numpy as jnp


def fold_batch(xb: jnp.ndarray) -> jnp.ndarray:
    """[B, n, k] -> [n, B*k] with batch-major column order."""
    b, n, k = xb.shape
    return jnp.transpose(xb, (1, 0, 2)).reshape(n, b * k)


def unfold_batch(y: jnp.ndarray, b: int) -> jnp.ndarray:
    """[m, B*k] -> [B, m, k]."""
    m = y.shape[0]
    k = y.shape[1] // b
    return jnp.transpose(y.reshape(m, b, k), (1, 0, 2))


def batched_spmm(spmm_fn, xb: jnp.ndarray) -> jnp.ndarray:
    """Apply ``spmm_fn: [n, K'] -> [m, K']`` to a batch X[B, n, k]."""
    b = xb.shape[0]
    return unfold_batch(spmm_fn(fold_batch(xb)), b)
