"""Dynamic-gather kernel (dg_gather) vs oracle."""

import numpy as np
import pytest

from tpusparse.io import builder
from tpusparse.kernels.dg_gather import (DG_KTS, DgFormat, choose_kt_dg,
                                         dg_geometry, dg_spmm, dg_spmv,
                                         pack_dg, with_values)
from tpusparse.oracle import check_result, spmm_reference


def _case(m=300, n=400, k=8, avg=6.0, seed=0):
    mat = builder.power_law_coo(m, n, avg_nnz_per_row=avg, seed=seed)
    x = np.random.default_rng(seed + 1).standard_normal((n, k)).astype(np.float32)
    return mat, x


@pytest.mark.parametrize("kt,k", [(8, 8), (16, 16), (32, 32)])
def test_dg_fp32x2_kts(kt, k):
    mat, x = _case(k=k)
    fmt = pack_dg(mat, rb=128, ns=4, g=128, kt=kt, mode="fp32x2")
    y = np.asarray(dg_spmm(fmt, x))
    # the gather is exact f32 and only v*x is hi/lo split: near-fp32 class
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=5e-4)


def test_dg_bf16():
    mat, x = _case(k=8, seed=4)
    fmt = pack_dg(mat, rb=128, ns=4, g=128, kt=8, mode="bf16")
    y = np.asarray(dg_spmm(fmt, x))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=8e-2)


def test_dg_small_k_pads_to_kt8():
    # K < 8 zero-pads X columns to the kt=8 tile
    mat, x = _case(k=3, seed=2)
    assert choose_kt_dg(3) == 8
    fmt = pack_dg(mat, rb=128, ns=4, g=128, kt=8)
    y = np.asarray(dg_spmm(fmt, x))
    assert y.shape == (mat.shape[0], 3)
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=5e-4)


def test_dg_k_tiling():
    # K > kt runs kt-wide tiles on a second grid axis
    mat, x = _case(k=40, seed=2)
    fmt = pack_dg(mat, rb=128, ns=4, g=128, kt=16, mode="fp32x2")
    y = np.asarray(dg_spmm(fmt, x))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=5e-4)


def test_dg_window_invariants():
    mat, _ = _case(seed=5)
    fmt = pack_dg(mat, rb=128, ns=4, g=128, kt=8)
    wt, _, ngrp = dg_geometry(8, "fp32x2")
    assert wt == 128 and fmt.window == 4 * 128
    c0 = np.asarray(fmt.c0)
    cols = np.asarray(fmt.cols)
    lrow = np.asarray(fmt.lrow)
    assert (c0 % wt == 0).all()
    assert cols.max() < fmt.window
    assert lrow.max() < fmt.rb
    # every real nz is represented exactly once: value sum preserved
    assert np.isclose(np.asarray(fmt.vals).sum(), np.asarray(mat.vals).sum())


@pytest.mark.parametrize("deal", ["length", "index", "blocks"])
def test_dg_deals(deal):
    mat, x = _case(seed=6)
    fmt = pack_dg(mat, rb=128, ns=4, g=128, kt=8, deal=deal)
    y = np.asarray(dg_spmm(fmt, x))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=5e-4)
    if deal == "blocks":
        assert fmt.deal == "blocks"
    if deal == "index":
        assert fmt.deal == "index"


def test_dg_spmv():
    mat, _ = _case(m=500, n=3000, k=1, avg=9.0, seed=7)
    x = np.random.default_rng(11).standard_normal(3000).astype(np.float32)
    fmt = pack_dg(mat, rb=128, ns=2, g=128, kt=1)
    y = np.asarray(dg_spmv(fmt, x))
    want = spmm_reference(mat, x.astype(np.float64).reshape(-1, 1)).reshape(-1)
    check_result(y.reshape(-1, 1), want.reshape(-1, 1), rtol=5e-4)


def test_dg_spmv_wide_window():
    # columns beyond one 1024-window exercise the ns select tree
    mat, _ = _case(m=200, n=9000, k=1, avg=20.0, seed=8)
    x = np.random.default_rng(12).standard_normal(9000).astype(np.float32)
    fmt = pack_dg(mat, rb=64, ns=4, g=128, kt=1)
    y = np.asarray(dg_spmv(fmt, x))
    want = spmm_reference(mat, x.astype(np.float64).reshape(-1, 1)).reshape(-1)
    check_result(y.reshape(-1, 1), want.reshape(-1, 1), rtol=5e-4)


def test_dg_with_values():
    mat, x = _case(seed=9)
    fmt = pack_dg(mat, rb=128, ns=4, g=128, kt=8, keep_perm=True)
    new_vals = np.asarray(mat.vals) * 3.0
    fmt2 = with_values(fmt, new_vals)
    y2 = np.asarray(dg_spmm(fmt2, x))
    # vs oracle (not 3*y1: the hi/lo split rounds 3*v*x differently)
    check_result(y2, 3.0 * spmm_reference(mat, x.astype(np.float64)), rtol=5e-4)


def test_dg_empty_and_single():
    from tpusparse.io.mtx import CooMatrix

    mat = CooMatrix(np.array([2]), np.array([7]), np.array([2.5]), (10, 20))
    x = np.random.default_rng(0).standard_normal((20, 8)).astype(np.float32)
    fmt = pack_dg(mat, rb=64, ns=2, g=128, kt=8)
    y = np.asarray(dg_spmm(fmt, x))
    want = np.zeros((10, 8))
    want[2] = 2.5 * x[7]
    np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-5)


def test_dg_numpy_chunker_matches_native():
    from tpusparse import native
    from tpusparse.kernels.dg_gather import _aligned_chunk_numpy

    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    cols = np.sort(rng.integers(0, 5000, 700))
    lrow = rng.integers(0, 64, 700)
    vals = rng.standard_normal(700).astype(np.float32)
    starts = np.array([0, 350, 700])
    a = native.span_pack_aligned(cols, lrow, vals, starts, 128, 1024, 128,
                                 want_dest=True)
    b = _aligned_chunk_numpy(cols, lrow, vals, starts, 128, 1024, 128,
                             keep_perm=True)
    for ai, bi in zip(a, b):
        np.testing.assert_array_equal(np.asarray(ai), np.asarray(bi))
