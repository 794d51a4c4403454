"""SparseLinear layer: all weight kinds vs dense reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.io import builder
from tpusparse.io.mtx import CooMatrix
from tpusparse.nn import SparseLinear


def _dense_ref(w, x, b=None):
    y = x @ w.T
    return y + b if b is not None else y


def test_from_coo_batched_dims():
    mat = builder.power_law_coo(96, 80, avg_nnz_per_row=5.0, seed=0)
    w = mat.to_dense(np.float32)
    b = np.random.default_rng(0).standard_normal(96).astype(np.float32)
    layer = SparseLinear.from_coo(mat, bias=b)
    x = np.random.default_rng(1).standard_normal((2, 3, 80)).astype(np.float32)
    y = np.asarray(layer(x))
    np.testing.assert_allclose(y, _dense_ref(w, x, b), rtol=5e-3, atol=5e-3)


def test_from_dense():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((64, 48)).astype(np.float32)
    w[np.abs(w) < 1.0] = 0.0
    layer = SparseLinear.from_dense(w)
    x = rng.standard_normal((5, 48)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(layer(x)), _dense_ref(w, x),
                               rtol=5e-3, atol=5e-3)


def test_from_nm():
    w = builder.nm_pruned_dense(64, 128, seed=3)
    layer = SparseLinear.from_nm(w, precision="fp32")
    x = np.random.default_rng(4).standard_normal((7, 128)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(layer(x)), _dense_ref(w, x),
                               rtol=1e-4, atol=1e-4)


def test_from_block():
    mat = builder.block_sparse_coo(256, 256, block=128, block_density=0.3, seed=5)
    layer = SparseLinear.from_block(mat, precision="fp32")
    w = mat.to_dense(np.float32)
    x = np.random.default_rng(6).standard_normal((4, 256)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(layer(x)), _dense_ref(w, x),
                               rtol=1e-4, atol=1e-3)


def test_differentiable_layer():
    mat = builder.uniform_coo(48, 32, nnz_per_row=4, seed=7)
    w = mat.to_dense(np.float32)
    layer = SparseLinear.from_coo(mat, differentiable=True)
    x = np.random.default_rng(8).standard_normal((6, 32)).astype(np.float32)

    g = jax.grad(lambda x: jnp.sum(layer(x) ** 2))(jnp.asarray(x))
    gd = jax.grad(lambda x: jnp.sum((x @ jnp.asarray(w).T) ** 2))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), np.asarray(gd), rtol=5e-3, atol=5e-3)


def test_shape_mismatch_raises():
    mat = builder.uniform_coo(16, 8, nnz_per_row=2, seed=9)
    layer = SparseLinear.from_coo(mat)
    with pytest.raises(AssertionError):
        layer(np.zeros((3, 7), np.float32))


def test_from_nm_throughput_mode():
    w = builder.nm_pruned_dense(64, 128, seed=13)
    layer = SparseLinear.from_nm(w, precision="fp32", mode="throughput")
    x = np.random.default_rng(14).standard_normal((5, 128)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(layer(x)), _dense_ref(w, x),
                               rtol=1e-4, atol=1e-4)


def test_from_block_differentiable():
    mat = builder.block_sparse_coo(256, 256, block=128, block_density=0.4, seed=15)
    w = mat.to_dense(np.float32)
    layer = SparseLinear.from_block(mat, precision="fp32", differentiable=True)
    x = jnp.asarray(np.random.default_rng(16).standard_normal((3, 256)), jnp.float32)
    g = jax.grad(lambda x: jnp.sum(layer(x) ** 2))(x)
    gd = jax.grad(lambda x: jnp.sum((x @ jnp.asarray(w).T) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gd), rtol=5e-3, atol=5e-3)


def test_sparse_linear_k_hint_picks_dg():
    from tpusparse.io import builder
    from tpusparse.nn import SparseLinear

    mat = builder.power_law_coo(128, 96, avg_nnz_per_row=5.0, seed=2)
    lyr = SparseLinear.from_coo(mat, k_hint=8)
    assert lyr.meta["schedule"]["family"] == "dg_span"
    x = np.random.default_rng(0).standard_normal((4, 96)).astype(np.float32)
    y = np.asarray(lyr(x))
    want = x @ mat.to_dense(np.float64).T
    np.testing.assert_allclose(y, want, rtol=2e-3, atol=1e-4)

    # differentiable path accepts the hint too
    import jax

    lyr_d = SparseLinear.from_coo(mat, k_hint=8, differentiable=True)
    g = jax.grad(lambda xx: lyr_d(xx).sum())(jnp.asarray(x))
    assert g.shape == x.shape
