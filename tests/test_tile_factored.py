"""Factorized one-hot MXU kernel vs oracle."""

import numpy as np
import pytest

from tpusparse.format import pack_tile
from tpusparse.io import builder
from tpusparse.meta.set import create_init_metadata_set
from tpusparse.kernels.tile_factored import tile_factored_spmm
from tpusparse.oracle import check_result, spmm_reference


def _fmt_x(m=200, n=300, k=8, rb=64, ct=128, g=32, seed=0, avg=5.0):
    mat = builder.power_law_coo(m, n, avg_nnz_per_row=avg, seed=seed)
    ms = create_init_metadata_set(mat)
    fmt = pack_tile(ms, 0, out_rows=m, rb=rb, ct=ct, g=g)
    x = np.random.default_rng(seed + 1).standard_normal((n, k)).astype(np.float32)
    return mat, fmt, x


@pytest.mark.parametrize("factor", [4, 8])
@pytest.mark.parametrize("k", [8, 16])
def test_factored_fp32x2(factor, k):
    mat, fmt, x = _fmt_x(k=k)
    y = np.asarray(tile_factored_spmm(fmt, x, precision="fp32x2", factor=factor))
    want = spmm_reference(mat, x.astype(np.float64))
    check_result(y, want, rtol=2e-3)


def test_factored_bf16():
    mat, fmt, x = _fmt_x(k=8, seed=3)
    y = np.asarray(tile_factored_spmm(fmt, x, precision="bf16"))
    want = spmm_reference(mat, x.astype(np.float64))
    # pure bf16 (two roundings, ~5-term rows): worst case a few x 2^-8
    check_result(y, want, rtol=5e-2)


def test_factored_multi_ktile():
    mat, fmt, x = _fmt_x(k=40, seed=5)
    y = np.asarray(tile_factored_spmm(fmt, x, precision="fp32x2", ktile=16))
    want = spmm_reference(mat, x.astype(np.float64))
    check_result(y, want, rtol=2e-3)


def test_factored_matches_plain():
    from tpusparse.kernels.tile_onehot import tile_spmm

    mat, fmt, x = _fmt_x(k=8, seed=7, avg=9.0)
    yf = np.asarray(tile_factored_spmm(fmt, x, precision="fp32x2"))
    yp = np.asarray(tile_spmm(fmt, x, precision="fp32x2"))
    np.testing.assert_allclose(yf, yp, rtol=1e-5, atol=1e-5)


def test_factored_unroll():
    mat, fmt, x = _fmt_x(k=8, seed=9)
    y = np.asarray(tile_factored_spmm(fmt, x, precision="fp32x2", unroll=2))
    want = spmm_reference(mat, x.astype(np.float64))
    check_result(y, want, rtol=2e-3)
