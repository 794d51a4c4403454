"""Hot-column hybrid family: dense MXU panel over the hot columns + sparse
remainder (column-direction nnz-bucket div composed with the dense path)."""

import numpy as np

from tpusparse.io import builder
from tpusparse.oracle import check_result, spmm_reference
from tpusparse.schedule import Schedule, build_plan
from tpusparse.tune import default_candidates


def _case(m=400, n=360, k=8, seed=3, alpha=1.4):
    mat = builder.power_law_col_coo(m, n, avg_nnz_per_row=7.0, alpha=alpha,
                                    seed=seed)
    x = np.random.default_rng(seed + 1).standard_normal((n, k)).astype(np.float32)
    return mat, x


def test_power_law_col_builder_skews_columns():
    mat = builder.power_law_col_coo(500, 400, avg_nnz_per_row=8.0, seed=1)
    counts = np.bincount(mat.cols, minlength=400)
    top = np.sort(counts)[-32:]
    assert top.sum() > 0.3 * mat.nnz  # a few columns carry a large share
    assert mat.shape == (500, 400)
    # rows are roughly uniform (no row carries a large share)
    rl = mat.row_lengths()
    assert rl.max() < 0.05 * mat.nnz


def test_hybrid_cols_matches_oracle():
    mat, x = _case()
    want = spmm_reference(mat, x.astype(np.float64))
    for C in (128, 256):
        plan = build_plan(mat, Schedule(family="hybrid_cols", hot_cols=C,
                                        ktile=8))
        check_result(np.asarray(plan(x)), want, rtol=2e-3)
        assert plan.meta["covered_nnz"] > 0
        assert plan.meta["format_bytes"] >= mat.shape[0] * 128 * 4


def test_hybrid_cols_panel_covers_everything():
    # C >= n degenerates to the dense family (empty remainder)
    mat, x = _case(n=200)
    plan = build_plan(mat, Schedule(family="hybrid_cols", hot_cols=4096,
                                    ktile=8))
    assert plan.meta["n_subs"] == 1
    check_result(np.asarray(plan(x)),
                 spmm_reference(mat, x.astype(np.float64)), rtol=2e-3)


def test_hybrid_cols_k1():
    mat, x = _case(k=1)
    plan = build_plan(mat, Schedule(family="hybrid_cols", hot_cols=128,
                                    ktile=1))
    check_result(np.asarray(plan(x)),
                 spmm_reference(mat, x.astype(np.float64)), rtol=2e-3)


def test_hybrid_cols_bf16_mode():
    mat, x = _case(seed=9)
    plan = build_plan(mat, Schedule(family="hybrid_cols", hot_cols=128,
                                    ktile=8, precision="bf16"))
    check_result(np.asarray(plan(x)),
                 spmm_reference(mat, x.astype(np.float64)), rtol=8e-2)


def test_tuner_gates_hybrid_on_column_skew():
    mat, _ = _case(m=600, n=512)
    fams = [c.family for c in default_candidates(mat, 8)]
    assert "hybrid_cols" in fams
    # row-skewed (uniform columns) must NOT trigger the family
    row_skew = builder.power_law_coo(600, 512, avg_nnz_per_row=7.0, seed=3)
    fams2 = [c.family for c in default_candidates(row_skew, 8)]
    assert "hybrid_cols" not in fams2
    # ... unless full=True sweeps everything
    fams3 = [c.family for c in default_candidates(row_skew, 8, full=True)]
    assert "hybrid_cols" in fams3


def test_hybrid_cols_in_tune_loop():
    from tpusparse.tune import tune

    mat, x = _case(m=300, n=300)
    res = tune(mat, x,
               candidates=[Schedule(family="hybrid_cols", hot_cols=128, ktile=8)],
               use_cache=False, iters=2)
    check_result(np.asarray(res.best(x)),
                 spmm_reference(mat, x.astype(np.float64)), rtol=2e-3)
