"""Differentiable SpMM: grad through the packed kernel matches dense."""

import jax
import jax.numpy as jnp
import numpy as np

from tpusparse.autodiff import spmm_fn
from tpusparse.io import builder


def test_spmm_grad_matches_dense():
    mat = builder.power_law_coo(120, 100, avg_nnz_per_row=5.0, seed=3)
    a = mat.to_dense(np.float32)
    x = np.random.default_rng(0).standard_normal((100, 8)).astype(np.float32)
    w = np.random.default_rng(1).standard_normal((120, 8)).astype(np.float32)

    fn = spmm_fn(mat)

    def loss_sparse(x):
        return jnp.sum(fn(x) * w)

    def loss_dense(x):
        return jnp.sum((a @ x) * w)

    gs = np.asarray(jax.grad(loss_sparse)(jnp.asarray(x)))
    gd = np.asarray(jax.grad(loss_dense)(jnp.asarray(x)))
    np.testing.assert_allclose(gs, gd, rtol=5e-3, atol=5e-3)


def test_spmm_value_and_jit():
    mat = builder.uniform_coo(64, 48, nnz_per_row=4, seed=1)
    fn = spmm_fn(mat)
    x = np.random.default_rng(2).standard_normal((48, 8)).astype(np.float32)
    y = np.asarray(jax.jit(fn)(jnp.asarray(x)))
    want = mat.to_dense(np.float64) @ x.astype(np.float64)
    np.testing.assert_allclose(y, want, rtol=5e-3, atol=5e-3)
