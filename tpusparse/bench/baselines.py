"""Baselines — the cuSPARSE analogues on TPU (SURVEY §6, BASELINE.md).

The reference benchmarks cuSPARSE CSR SpMM as its baseline
(baseline/base_cusparse/spmm.cu).  On TPU the comparable library baselines:

  dense_spmm_fn        jnp dense matmul of the densified matrix (what a user
                       does today when the sparse matrix fits)
  bcoo_spmm_fn         jax.experimental.sparse.BCOO @ dense — JAX's stock
                       sparse path (gather/scatter based)
  xla_segment_spmm_fn  hand-rolled XLA take + segment_sum — the best
                       no-Pallas formulation
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpusparse.io.mtx import CooMatrix


def dense_spmm_fn(mat: CooMatrix, dtype=jnp.float32):
    a = jnp.asarray(mat.to_dense(np.float32), dtype=dtype)

    # A must be a runtime argument, not a closure constant — closed-over
    # arrays get inlined into the HLO, which blows up compile payloads.
    # fp32 needs Precision.HIGHEST: TPU DEFAULT lowers fp32 dots through
    # bf16 passes (~1e-1 abs error on wide contractions).
    prec = (jax.lax.Precision.HIGHEST if jnp.dtype(dtype) == jnp.float32
            else jax.lax.Precision.DEFAULT)

    @jax.jit
    def _fn(a, x):
        return jnp.dot(a, x, preferred_element_type=jnp.float32, precision=prec)

    return lambda x: _fn(a, x)


def bcoo_spmm_fn(mat: CooMatrix, dtype=jnp.float32):
    from jax.experimental import sparse as jsparse

    indices = jnp.stack(
        [jnp.asarray(mat.rows, jnp.int32), jnp.asarray(mat.cols, jnp.int32)], axis=1
    )
    a = jsparse.BCOO(
        (jnp.asarray(mat.vals, dtype), indices), shape=mat.shape
    )

    @jax.jit
    def fn(x):
        return a @ x

    return fn


def xla_segment_spmm_fn(mat: CooMatrix, dtype=jnp.float32):
    rows = jnp.asarray(mat.rows, jnp.int32)
    cols = jnp.asarray(mat.cols, jnp.int32)
    vals = jnp.asarray(mat.vals, dtype)
    m = mat.shape[0]

    @jax.jit
    def fn(x):
        contrib = vals[:, None] * jnp.take(x, cols, axis=0)
        return jax.ops.segment_sum(contrib, rows, num_segments=m)

    return fn
