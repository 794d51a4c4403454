"""tile_onehot kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

from tpusparse.generator import build_tile_plan, prepare_tile_format
from tpusparse.io import builder
from tpusparse.oracle import check_result, spmm_reference


@pytest.mark.parametrize("k", [8, 100])
def test_tile_spmm_power_law(k, rng):
    mat = builder.power_law_coo(150, 130, avg_nnz_per_row=4.0, seed=4)
    x = rng.standard_normal((130, k)).astype(np.float32)
    plan = build_tile_plan(mat, rb=64, ct=64, g=32, precision="fp32x2")
    y = np.asarray(plan(x))
    want = spmm_reference(mat, x.astype(np.float64))
    check_result(y, want, rtol=1e-3)


@pytest.mark.parametrize("precision,tol", [("fp32", 1e-5), ("fp32x2", 1e-3), ("bf16", 5e-2)])
def test_tile_precisions(precision, tol, rng):
    mat = builder.uniform_coo(80, 70, 5, seed=2)
    x = rng.standard_normal((70, 16)).astype(np.float32)
    plan = build_tile_plan(mat, rb=32, ct=32, g=32, precision=precision)
    y = np.asarray(plan(x))
    want = spmm_reference(mat, x.astype(np.float64))
    check_result(y, want, rtol=tol)


def test_tile_unroll(rng):
    from tpusparse.kernels.tile_onehot import tile_spmm

    mat = builder.banded_coo(96, 96, 4, seed=5)
    x = rng.standard_normal((96, 8)).astype(np.float32)
    fmt, _ = prepare_tile_format(mat, rb=32, ct=32, g=16)
    want = spmm_reference(mat, x.astype(np.float64))
    for u in (1, 2, 4):
        y = np.asarray(tile_spmm(fmt, x, unroll=u))
        check_result(y, want, rtol=1e-3)


def test_tile_sorted(rng):
    mat = builder.power_law_coo(120, 100, avg_nnz_per_row=5.0, seed=7)
    x = rng.standard_normal((100, 8)).astype(np.float32)
    plan = build_tile_plan(mat, rb=32, ct=64, g=32, sort=True)
    y = np.asarray(plan(x))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=1e-3)


def test_tile_format_invariants():
    mat = builder.power_law_coo(200, 170, avg_nnz_per_row=5.0, seed=8)
    fmt, _ = prepare_tile_format(mat, rb=64, ct=64, g=32)
    cols = np.asarray(fmt.cols)
    lrow = np.asarray(fmt.lrow)
    assert cols.min() >= 0 and cols.max() < fmt.ct
    assert lrow.min() >= 0 and lrow.max() < fmt.rb
    # chunk purity: every chunk's nz lie in the chunk's tile by construction
    # (cols are tile-local) and padding vals are zero
    vals = np.asarray(fmt.vals)
    assert fmt.nnz_real == np.count_nonzero(vals)
    assert fmt.padding_rate >= 1.0
