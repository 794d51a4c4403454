"""Radix lane-packed 3-dot kernel vs oracle."""

import numpy as np
import pytest

from tpusparse.io import builder
from tpusparse.io.mtx import CooMatrix
from tpusparse.kernels.radix_gather import (RADIX_KTS, choose_kt,
                                            pack_radix, radix_geometry,
                                            radix_spmm, with_values)
from tpusparse.oracle import check_result, spmm_reference


def _case(m=300, n=400, k=8, avg=6.0, seed=0):
    mat = builder.power_law_coo(m, n, avg_nnz_per_row=avg, seed=seed)
    x = np.random.default_rng(seed + 1).standard_normal((n, k)).astype(np.float32)
    return mat, x


@pytest.mark.parametrize("kt,k", [(1, 1), (4, 4), (8, 8), (16, 16), (32, 32)])
def test_radix_fp32x2_kts(kt, k):
    mat, x = _case(k=k)
    fmt = pack_radix(mat, rb=128, S=16, g=128, kt=kt, mode="fp32x2")
    y = np.asarray(radix_spmm(fmt, x))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=2e-3)


def test_radix_bf16():
    mat, x = _case(k=8, seed=4)
    fmt = pack_radix(mat, rb=128, S=16, g=128, kt=8, mode="bf16")
    y = np.asarray(radix_spmm(fmt, x))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=8e-2)


def test_radix_k_tiling():
    # K > kt runs kt-wide tiles on a second grid axis
    mat, x = _case(k=40, seed=2)
    fmt = pack_radix(mat, rb=128, S=16, g=128, kt=16, mode="fp32x2")
    y = np.asarray(radix_spmm(fmt, x))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=2e-3)


def test_radix_ktin_inner_tiles():
    # ktin > 1 shares the chunk DMA + one-hot builds across inner K-tiles;
    # the result must be BITWISE identical to the grid path (ktin=1)
    mat, x = _case(k=32, seed=9)
    fmt = pack_radix(mat, rb=128, S=16, g=128, kt=8, mode="fp32x2")
    y1 = np.asarray(radix_spmm(fmt, x, ktin=1))
    for ktin in (2, 4):
        yn = np.asarray(radix_spmm(fmt, x, ktin=ktin))
        assert np.array_equal(y1, yn)
    check_result(y1, spmm_reference(mat, x.astype(np.float64)), rtol=2e-3)
    # non-dividing / narrow-formulation requests fall back to 1 safely
    fmt1 = pack_radix(mat, rb=128, S=16, g=128, kt=1, mode="fp32x2")
    xk = x[:, :2]
    check_result(np.asarray(radix_spmm(fmt1, xk, ktin=4)),
                 spmm_reference(mat, xk.astype(np.float64)), rtol=2e-3)


def test_max_ktin_guards():
    from tpusparse.kernels.radix_gather import max_ktin

    mat, _ = _case(k=32)
    fmt = pack_radix(mat, rb=128, S=16, g=128, kt=8, mode="fp32x2")
    assert max_ktin(fmt, 1, 4) == 1          # single tile
    assert max_ktin(fmt, 4, 4) in (2, 4)     # wide formulation, fits
    fmt1 = pack_radix(mat, rb=128, S=16, g=128, kt=1, mode="fp32x2")
    assert max_ktin(fmt1, 4, 4) == 1         # narrow formulation


def test_radix_k_smaller_than_kt():
    # K < kt: columns are zero-padded up to the packed tile
    mat, x = _case(k=3, seed=6)
    fmt = pack_radix(mat, rb=128, S=16, g=128, kt=8, mode="fp32x2")
    y = np.asarray(radix_spmm(fmt, x))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=2e-3)


def test_radix_format_invariants():
    mat, _ = _case()
    for mode in ("fp32x2", "bf16"):
        fmt = pack_radix(mat, rb=128, S=16, g=128, kt=8, mode=mode)
        spr, nhl, ngrp = radix_geometry(8, mode)
        c0 = np.asarray(fmt.c0)
        cols = np.asarray(fmt.cols)
        # window starts aligned to 8*spr; offsets inside the window
        assert (c0 % (8 * spr) == 0).all()
        assert cols.max() < fmt.S * spr
        assert fmt.rb % ngrp == 0
        # every real nz accounted once
        vals = np.asarray(fmt.vals)
        assert np.count_nonzero(vals) == fmt.nnz_real
        # slot map is injective over real rows
        slots = np.asarray(fmt.slot_of_origrow)
        live = slots[slots >= 0]
        assert np.unique(live).size == live.size


def test_radix_with_values():
    mat, x = _case(seed=8)
    fmt = pack_radix(mat, rb=128, S=16, g=128, kt=8, mode="fp32x2",
                     keep_perm=True)
    mat2 = CooMatrix(mat.rows, mat.cols, np.asarray(mat.vals) * -1.5, mat.shape)
    fmt2 = with_values(fmt, np.asarray(mat2.vals))
    y = np.asarray(radix_spmm(fmt2, x))
    check_result(y, spmm_reference(mat2, x.astype(np.float64)), rtol=2e-3)


def test_radix_empty_rows_and_unbalanced():
    # rows with zero nnz; balance=False path
    rng = np.random.default_rng(5)
    rows = np.repeat(np.array([0, 3, 7, 40, 41]), 6)
    cols = rng.integers(0, 300, rows.size)
    vals = rng.standard_normal(rows.size)
    mat = CooMatrix(rows, cols, vals, (64, 300)).sort_row_major().dedup()
    x = rng.standard_normal((300, 8)).astype(np.float32)
    for balance in (True, False):
        fmt = pack_radix(mat, rb=64, S=16, g=64, kt=8, balance=balance)
        y = np.asarray(radix_spmm(fmt, x))
        check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=2e-3)


def test_choose_kt():
    assert choose_kt(1) == 1
    assert choose_kt(3) == 4
    assert choose_kt(8) == 8
    assert choose_kt(33) == 32
    assert choose_kt(128) == 32
    for kt in RADIX_KTS:
        assert choose_kt(kt) == kt


def test_radix_schedule_family():
    from tpusparse.schedule import Schedule, build_plan

    mat, x = _case(seed=11)
    plan = build_plan(mat, Schedule(family="radix_span", rb=128, sublanes=16,
                                    g=128, unroll=4, ktile=8))
    y = np.asarray(plan(x))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=2e-3)
    assert plan.meta["padding_rate"] < 4.0


def test_radix_in_default_candidates():
    from tpusparse.tune import default_candidates

    mat, _ = _case()
    fams = {c.family for c in default_candidates(mat, 8)}
    assert "radix_span" in fams


def test_default_schedule_prefers_dg_small_k():
    from tpusparse.schedule import default_schedule

    mat, _ = _case()
    assert default_schedule(mat, 8).family == "dg_span"
    assert default_schedule(mat, 1).family == "dg_span"
    # large N at kt budget falls back
    big = CooMatrix(np.array([0]), np.array([0]), np.array([1.0]),
                    (100, 3_000_000))
    assert default_schedule(big, 8).family not in ("radix_span", "dg_span")


def test_spmv_radix_method():
    from tpusparse.oracle import spmv_reference
    from tpusparse.spmv import spmv

    mat, _ = _case(seed=13)
    x = np.random.default_rng(2).standard_normal(mat.shape[1]).astype(np.float32)
    y = np.asarray(spmv(mat, x, method="radix"))
    check_result(y, spmv_reference(mat, x.astype(np.float64)), rtol=2e-3)
    y2 = np.asarray(spmv(mat, x, method="auto"))
    check_result(y2, spmv_reference(mat, x.astype(np.float64)), rtol=2e-3)


def test_brick_ell_family():
    """The interleaved brick-ELL layout (reference col-pad-to-max +
    interlance storage) runs live through the radix kernel; the dormant
    operators are exercised via the executor pipeline."""
    from tpusparse.schedule import Schedule, build_plan

    for make in (
        lambda: builder.banded_coo(256, 256, bandwidth=12, seed=5),
        lambda: builder.power_law_coo(300, 400, avg_nnz_per_row=5.0, seed=3),
    ):
        mat = make()
        x = np.random.default_rng(1).standard_normal((mat.shape[1], 8)).astype(np.float32)
        plan = build_plan(mat, Schedule(family="brick_ell", sort=True, rb=128,
                                        sublanes=32, g=128, unroll=2, ktile=8))
        y = np.asarray(plan(x))
        check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=2e-3)
        hist = plan.meta["operator_history"]
        assert "interleave" in hist and "ell_block_pad" in hist


def test_brick_ell_in_candidates():
    from tpusparse.tune import default_candidates

    mat = builder.power_law_coo(200, 160, avg_nnz_per_row=6.0, seed=3)
    fams = {c.family for c in default_candidates(mat, 8)}
    assert "brick_ell" in fams


def test_tuner_full_and_budget():
    from tpusparse.tune import default_candidates, tune

    mat = builder.power_law_coo(200, 160, avg_nnz_per_row=6.0, seed=3)
    base = default_candidates(mat, 8)
    full = default_candidates(mat, 8, full=True)
    assert len(full) > 2 * len(base)
    # full sweeps unroll and precision within a family
    spans = [c for c in full if c.family == "span_onehot"]
    assert {c.unroll for c in spans} >= {2, 4, 8}
    assert {c.precision for c in spans} >= {"fp32x2", "bf16"}
    # budget caps the number of rows actually tried
    x = np.random.default_rng(0).standard_normal((160, 8)).astype(np.float32)
    res = tune(mat, x, budget=2, use_cache=False, iters=2)
    assert len(res.table) == 2


def test_tune_at_k1_covers_spmv():
    """SpMV folds into tune() as the K=1 schedule family (VERDICT r1 #2):
    radix kt=1 candidates are enumerated and win validation."""
    from tpusparse.tune import default_candidates, tune

    mat = builder.power_law_coo(256, 256, avg_nnz_per_row=6.0, seed=3)
    cands = default_candidates(mat, 1)
    radix = [c for c in cands if c.family == "radix_span"]
    assert radix and all(c.ktile == 1 for c in radix)
    x = np.random.default_rng(0).standard_normal((256, 1)).astype(np.float32)
    res = tune(mat, x, candidates=radix[:1], use_cache=False, iters=2)
    from tpusparse.oracle import spmm_reference
    check_result(np.asarray(res.best(x)),
                 spmm_reference(mat, x.astype(np.float64)), rtol=2e-3)


@pytest.mark.parametrize("deal", ["length", "index", "blocks"])
def test_radix_deal_modes(deal):
    # includes empty rows (rows 3, 17 unused) so the affine verification's
    # unoccupied-slot escape is exercised
    rng = np.random.default_rng(7)
    m, n, k = 260, 300, 8
    nnz = 1500
    rows = rng.integers(0, m, nnz)
    rows = rows[(rows != 3) & (rows != 17)]
    cols = rng.integers(0, n, rows.size)
    vals = rng.standard_normal(rows.size)
    mat = CooMatrix(rows, cols, vals, (m, n)).dedup()
    x = rng.standard_normal((n, k)).astype(np.float32)
    fmt = pack_radix(mat, rb=128, S=16, g=128, kt=8, deal=deal)
    if deal == "length":
        assert fmt.deal == "arbitrary"   # gather path (measured fastest)
    else:
        assert fmt.deal == deal          # affine unpack verified
    y = np.asarray(radix_spmm(fmt, x))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=2e-3)
    assert np.all(y[3] == 0) and np.all(y[17] == 0)


def test_radix_deal_affine_falls_back_after_sort():
    # a metadata-set row sort permutes the recovery map -> affine unpack
    # must be rejected and the gather fallback used
    from tpusparse.schedule import Schedule, build_plan

    mat, x = _case(m=300, n=300, k=8, seed=12)
    plan = build_plan(mat, Schedule(family="radix_span", rb=128, sublanes=16,
                                    g=128, ktile=8, sort=True),
                      interpret=True)
    assert plan.formats[0].deal == "arbitrary"
    check_result(np.asarray(plan(x)),
                 spmm_reference(mat, x.astype(np.float64)), rtol=2e-3)
