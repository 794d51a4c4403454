"""Oracle self-consistency tests (reference: kernel_lib.hpp:859-921)."""

import numpy as np
import pytest

from tpusparse.io import builder
from tpusparse.oracle import (
    batched_spmm_reference,
    check_result,
    spgemm_reference,
    spmm_reference,
    spmv_reference,
)


def test_spmm_matches_dense(small_coo, rng):
    x = rng.standard_normal((small_coo.shape[1], 8))
    y = spmm_reference(small_coo, x)
    y_dense = small_coo.to_dense(np.float64) @ x
    np.testing.assert_allclose(y, y_dense, rtol=1e-10)


def test_spmv(small_coo, rng):
    x = rng.standard_normal(small_coo.shape[1])
    y = spmv_reference(small_coo, x)
    np.testing.assert_allclose(y, small_coo.to_dense(np.float64) @ x, rtol=1e-10)


def test_spgemm(rng):
    a = builder.uniform_coo(40, 30, 3, seed=5)
    b = builder.uniform_coo(30, 20, 3, seed=6)
    c = spgemm_reference(a, b)
    np.testing.assert_allclose(
        c.to_dense(np.float64), a.to_dense(np.float64) @ b.to_dense(np.float64), rtol=1e-10
    )


def test_batched(small_coo, rng):
    x = rng.standard_normal((3, small_coo.shape[1], 4))
    y = batched_spmm_reference(small_coo, x)
    assert y.shape == (3, small_coo.shape[0], 4)
    np.testing.assert_allclose(y[1], spmm_reference(small_coo, x[1]), rtol=1e-12)


def test_min_plus_semiring():
    m = builder.uniform_coo(10, 10, 2, seed=2)
    x = np.zeros(10)
    y = spmm_reference(m, x, semiring="min_plus")
    dense = np.where(m.to_dense(np.float64) != 0, m.to_dense(np.float64), np.inf)
    want = dense.min(axis=1)
    # rows with no nnz stay +inf in both
    np.testing.assert_allclose(y, want)


def test_check_result_passes_and_fails():
    a = np.ones((4, 4))
    check_result(a, a)
    with pytest.raises(AssertionError):
        check_result(a + 1.0, a, rtol=1e-3)


def test_check_result_condition_scale():
    # a cancellation-heavy output: terms +100.0003, -100 -> want ~ 0.0003;
    # bf16-level rounding of the terms gives ~0.4 absolute error, which no
    # pure-relative tolerance passes but the |A|.|x| scale (200) admits
    want = np.array([[0.0003]])
    got = np.array([[0.4]])
    with pytest.raises(AssertionError):
        check_result(got, want, rtol=1e-2)
    check_result(got, want, rtol=1e-2, scale=np.array([[200.0]]))
    # the scale denominator still rejects genuinely wrong results
    with pytest.raises(AssertionError):
        check_result(np.array([[5.0]]), want, rtol=1e-2,
                     scale=np.array([[200.0]]))


def test_tune_bf16_candidate_uses_condition_scale():
    # a bf16 schedule whose representation error exceeds 1e-2 relative on
    # cancellation-heavy outputs must still validate (it shares the error
    # with every bf16 method), while fp32x2 candidates keep the tight gate
    from tpusparse.tune import tune

    mat = builder.power_law_col_coo(600, 600, avg_nnz_per_row=10.0,
                                    alpha=1.6, seed=3)
    x = np.random.default_rng(4).standard_normal((600, 8)).astype(np.float32)
    res = tune(mat, x, iters=2, validate=True, budget=4, use_cache=False,
               interpret=True)
    stats = {(r["schedule"]["family"], r["schedule"].get("precision")):
             r.get("ok") for r in res.table}
    assert any(ok for (fam, prec), ok in stats.items()
               if fam == "hybrid_cols" and prec == "bf16")
