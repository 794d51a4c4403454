"""Seeded fuzz: random small matrices x random schedules vs the oracle.

The reference relies on per-run runtime checks (OPERATOR_RUNTIME_CHECK +
the generated program's host oracle); this is the pytest equivalent swept
over the schedule space.
"""

import numpy as np
import pytest

from tpusparse.io import builder
from tpusparse.io.mtx import CooMatrix
from tpusparse.oracle import check_result, spmm_reference
from tpusparse.schedule import Schedule, build_plan


def _random_matrix(rng):
    kind = rng.integers(0, 5)
    m = int(rng.integers(16, 300))
    n = int(rng.integers(16, 300))
    seed = int(rng.integers(0, 1 << 30))
    if kind == 0:
        return builder.uniform_coo(m, n, nnz_per_row=int(rng.integers(1, 8)), seed=seed)
    if kind == 1:
        return builder.power_law_coo(m, n, avg_nnz_per_row=float(rng.uniform(1, 10)),
                                     alpha=float(rng.uniform(1.2, 2.5)), seed=seed)
    if kind == 2:
        return builder.banded_coo(m, n, bandwidth=int(rng.integers(2, 20)), seed=seed)
    if kind == 3:
        return builder.pruned_weight_coo(m, n, sparsity=float(rng.uniform(0.5, 0.98)),
                                         seed=seed)
    # degenerate-ish: very few nz
    k = int(rng.integers(0, 10))
    return CooMatrix(rng.integers(0, m, k), rng.integers(0, n, k),
                     rng.standard_normal(k), (m, n)).sort_row_major().dedup()


def _random_schedule(rng, mat):
    fam = ["span_onehot", "tile_onehot", "stripe_total", "nnz_segment",
           "dense", "span_colsplit", "bucketed", "radix_span", "brick_ell",
           "stripe_nested"][int(rng.integers(0, 10))]
    rb = int(2 ** rng.integers(4, 8))
    ct = int(2 ** rng.integers(5, 9))
    g = int(2 ** rng.integers(3, 7))
    kw = dict(family=fam, rb=rb, ct=ct, g=g,
              unroll=int(rng.integers(1, 5)),
              precision=["fp32", "fp32x2"][int(rng.integers(0, 2))],
              sort=bool(rng.integers(0, 2)))
    if fam in ("radix_span", "brick_ell"):
        kw["rb"] = 128
        kw["sublanes"] = int(2 ** rng.integers(4, 6))
        kw["ktile"] = int(2 ** rng.integers(0, 5))
        kw["precision"] = "fp32x2"
        kw["sort"] = fam == "brick_ell"
    if fam == "stripe_nested":
        kw["work_per_block"] = int(2 ** rng.integers(6, 10))
        kw["precision"] = "fp32"
    if fam == "span_colsplit":
        kw["col_split"] = int(rng.integers(2, 5))
    if fam == "stripe_total":
        kw["blocking"] = ["merge_path", "balanced", "fixed_rows"][int(rng.integers(0, 3))]
        kw["work_per_block"] = int(2 ** rng.integers(5, 9))
    if fam == "nnz_segment":
        kw["work_per_block"] = int(2 ** rng.integers(5, 9))
    if fam == "bucketed":
        kw["bucket_bounds"] = (int(rng.integers(2, 30)),)
    if fam == "dense":
        kw["precision"] = "fp32"
    return Schedule(**kw)



@pytest.mark.parametrize("seed", range(8))
def test_fuzz_trainable_grads(seed):
    # the SDDMM gradient pair over random patterns (incl. empty rows and
    # near-empty matrices) vs the dense formulas
    import jax
    import jax.numpy as jnp

    from tpusparse.autodiff import spmm_trainable
    from tpusparse.kernels.sddmm import packed_to_nz

    rng = np.random.default_rng(5000 + seed)
    mat = _random_matrix(rng)
    if mat.nnz == 0:
        pytest.skip("empty pattern")
    k = int(rng.integers(1, 24))
    x = jnp.asarray(rng.standard_normal((mat.shape[1], k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((mat.shape[0], k)), jnp.float32)
    fn, v0 = spmm_trainable(mat, rb=int(2 ** rng.integers(4, 7)),
                            ct=int(2 ** rng.integers(5, 8)),
                            g=int(2 ** rng.integers(4, 7)))
    dv, dx = jax.grad(lambda v, x: jnp.sum(fn(v, x) * w), argnums=(0, 1))(v0, x)
    def close(got, want):
        # condition-aware floor: tiny entries of a large-magnitude tensor
        # carry the accumulation error of the big ones (fp32x2 rounding)
        floor = 1e-3 * (1.0 + np.abs(want).max())
        assert np.max(np.abs(got - want) / (np.abs(want) + floor)) < 3e-2

    dA = np.asarray(w) @ np.asarray(x).T
    close(packed_to_nz(fn.fmt, dv), dA[mat.rows, mat.cols])
    close(np.asarray(dx), mat.to_dense().T @ np.asarray(w))


@pytest.mark.parametrize("seed", range(24))
def test_fuzz_schedule_vs_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    mat = _random_matrix(rng)
    sched = _random_schedule(rng, mat)
    k = int(rng.integers(1, 40))
    x = rng.standard_normal((mat.shape[1], k)).astype(np.float32)
    try:
        plan = build_plan(mat, sched)
    except Exception as e:
        # invalid schedule combinations must fail loudly, not corrupt
        pytest.skip(f"{sched.family} rejected: {type(e).__name__}: {e}")
    y = np.asarray(plan(x))
    want = spmm_reference(mat, x.astype(np.float64))
    tol = 1e-4 if sched.precision == "fp32" else 5e-3
    check_result(y, want, rtol=tol)
