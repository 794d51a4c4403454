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
