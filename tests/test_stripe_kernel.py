"""End-to-end stripe_gather kernel tests (interpret mode on CPU).

This is SURVEY §7 step 3: the minimum end-to-end slice, verified against the
oracle on an IG5-18-class fixture at K=8 fp32 (BASELINE.json config #1)."""

import numpy as np
import pytest

from tpusparse.generator import build_stripe_plan, prepare_stripe_format
from tpusparse.io import builder
from tpusparse.oracle import check_result, spmm_reference


@pytest.mark.parametrize("k", [1, 8, 32, 130])
def test_stripe_spmm_power_law(k, rng):
    mat = builder.power_law_coo(120, 100, avg_nnz_per_row=4.0, seed=4)
    x = rng.standard_normal((100, k)).astype(np.float32)
    plan = build_stripe_plan(mat, work_per_stripe=128, unroll=4)
    y = np.asarray(plan(x))
    want = spmm_reference(mat, x.astype(np.float64))
    check_result(y, want, rtol=1e-4)


def test_stripe_spmm_uniform(rng):
    mat = builder.uniform_coo(64, 48, nnz_per_row=4, seed=9)
    x = rng.standard_normal((48, 8)).astype(np.float32)
    plan = build_stripe_plan(mat, work_per_stripe=64, unroll=8)
    y = np.asarray(plan(x))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=1e-4)


def test_stripe_spmm_banded_no_sort(rng):
    mat = builder.banded_coo(100, 100, bandwidth=4, seed=2)
    x = rng.standard_normal((100, 16)).astype(np.float32)
    plan = build_stripe_plan(mat, work_per_stripe=128, sort=False, unroll=1)
    y = np.asarray(plan(x))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=1e-4)


def test_stripe_format_invariants():
    mat = builder.power_law_coo(400, 300, avg_nnz_per_row=6.0, seed=8)
    fmt, ms = prepare_stripe_format(mat, work_per_stripe=256)
    assert fmt.n_stripes * fmt.stripe_nnz >= mat.nnz
    assert fmt.padding_rate < 4.0  # config padding_rate_up_bound
    assert fmt.max_rows_per_stripe <= 256  # merge-path row bound
    slot = np.asarray(fmt.slot_of_origrow)
    real = slot[slot >= 0]
    assert np.unique(real).size == real.size  # slots are unique per row
    ms.logical_check()


def test_stripe_with_empty_rows_and_dups(rng):
    # matrix with many empty rows
    rows = np.array([5, 5, 5, 17, 63])
    cols = np.array([0, 3, 7, 2, 1])
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    from tpusparse.io.mtx import CooMatrix

    mat = CooMatrix(rows, cols, vals, (64, 8))
    x = rng.standard_normal((8, 8)).astype(np.float32)
    plan = build_stripe_plan(mat, work_per_stripe=16)
    y = np.asarray(plan(x))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=1e-4)


def test_stripe_bf16(rng):
    import jax.numpy as jnp

    mat = builder.pruned_weight_coo(64, 96, sparsity=0.9, seed=3)
    x = rng.standard_normal((96, 32)).astype(np.float32)
    plan = build_stripe_plan(mat, work_per_stripe=128, val_dtype=np.float32)
    xb = jnp.asarray(x, dtype=jnp.bfloat16)
    y = np.asarray(plan(xb).astype(jnp.float32))
    # oracle sees the same bf16-rounded inputs: we check kernel error, not
    # input quantization
    want = spmm_reference(mat, np.asarray(xb.astype(jnp.float32), dtype=np.float64))
    check_result(y, want, dtype="bfloat16")


def test_stripe_index_compression_matches(rng):
    """MODEL_DRIVEN_INDEX_COMPRESS: computed lrow == loaded lrow."""
    import numpy as np
    from tpusparse.config import config_override
    from tpusparse.generator import prepare_stripe_format
    from tpusparse.io import builder
    from tpusparse.kernels.stripe_gather import stripe_spmm
    from tpusparse.oracle import check_result, spmm_reference

    # uniform nnz per row -> lrow is an exact staircase in every stripe
    mat = builder.uniform_coo(128, 96, nnz_per_row=8, seed=4)
    fmt, _ = prepare_stripe_format(mat, work_per_stripe=128, nnz_multiple=8)
    x = rng.standard_normal((96, 8)).astype(np.float32)
    with config_override(model_driven_index_compress=True):
        y_on = np.asarray(stripe_spmm(fmt, x))
    with config_override(model_driven_index_compress=False):
        y_off = np.asarray(stripe_spmm(fmt, x))
    np.testing.assert_allclose(y_on, y_off, rtol=0, atol=0)
    check_result(y_on, spmm_reference(mat, x.astype(np.float64)), rtol=1e-4)
