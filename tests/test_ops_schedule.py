"""Operator layer + schedule/build_plan + tuner tests (CPU interpret)."""

import numpy as np
import pytest

from tpusparse.io import builder
from tpusparse.levels import Level
from tpusparse.meta import create_init_metadata_set
from tpusparse.oracle import check_result, spmm_reference
from tpusparse.ops import (
    BalancedNnzRowBlockingOperator,
    EllBlockPadOperator,
    FixedIntervalRowBlockingOperator,
    FixedNnzBlockingOperator,
    InvalidOperator,
    MergePathBlockingOperator,
    OperatorExecutor,
    RowNnzMatrixDivOperator,
    SegmentReduceOperator,
    SortOperator,
    Stage,
    ThreadTotalReduceOperator,
    UniformBlockPadOperator,
)
from tpusparse.schedule import Schedule, build_plan


@pytest.fixture
def ms_ex(small_coo):
    ms = create_init_metadata_set(small_coo)
    return ms, OperatorExecutor(ms)


def test_pipeline_runs_with_gates(ms_ex):
    ms, ex = ms_ex
    ex.add_and_run(SortOperator(0))
    ex.add_and_run(MergePathBlockingOperator(0, Level.TBLOCK, 128))
    ex.add_and_run(ThreadTotalReduceOperator(0, Level.TBLOCK))
    ex.add_and_run(UniformBlockPadOperator(0, Level.TBLOCK))
    assert len(ex.ctx.history) == 4
    assert "merge_path" in ex.ctx.convert_to_string()
    ms.logical_check()


def test_gate_rejects_double_blocking(ms_ex):
    ms, ex = ms_ex
    ex.add_and_run(BalancedNnzRowBlockingOperator(0, Level.TBLOCK, 64))
    with pytest.raises(InvalidOperator):
        ex.add_and_run(FixedIntervalRowBlockingOperator(0, Level.TBLOCK, 16))


def test_gate_rejects_sort_after_blocking(ms_ex):
    ms, ex = ms_ex
    ex.add_and_run(FixedIntervalRowBlockingOperator(0, Level.TBLOCK, 32))
    with pytest.raises(InvalidOperator):
        ex.add_and_run(SortOperator(0))


def test_gate_rejects_total_reduce_after_nnz_blocking(ms_ex):
    ms, ex = ms_ex
    ex.add_and_run(FixedNnzBlockingOperator(0, Level.TBLOCK, 32))
    with pytest.raises(InvalidOperator):
        ex.add_and_run(ThreadTotalReduceOperator(0, Level.TBLOCK))


def test_padding_rollback_reruns_blocking(ms_ex):
    """The reference's padding delete-and-re-run semantics
    (...thread_blocking_operator.cc:225-317)."""
    ms, ex = ms_ex
    ex.add_and_run(SortOperator(0))
    ex.add_and_run(FixedIntervalRowBlockingOperator(0, Level.TBLOCK, 8))
    assert ms.has(Level.TBLOCK, "first_nz_indices", 0)
    ex.add_and_run(EllBlockPadOperator(0, Level.TBLOCK))
    # blocking was dropped by the pad and re-run by the executor
    assert ms.has(Level.TBLOCK, "first_nz_indices", 0)
    rows, _, _ = ms.coo(0)
    lengths = np.bincount(rows, minlength=ms.row_num(0))
    fr = ms.get(Level.TBLOCK, "first_row_indices", 0)
    for b in range(fr.size - 1):
        seg = lengths[fr[b]:fr[b + 1]]
        if seg.size:
            assert seg.min() == seg.max()  # ELL holds under re-run blocking
    ms.logical_check()


def test_segment_reduce_operator(ms_ex):
    ms, ex = ms_ex
    ex.add_and_run(FixedNnzBlockingOperator(0, Level.TBLOCK, 32))
    ex.add_and_run(SegmentReduceOperator(0, Level.TBLOCK))
    assert ms.has(Level.TBLOCK, "bit_map_of_thread", 0)
    assert ms.has(Level.TBLOCK, "segment_ptr", 0)
    assert ms.get_scalar(Level.GLOBAL, "reduce_style", 0) == 1


def test_row_nnz_div_operator(ms_ex):
    ms, ex = ms_ex
    ex.add_and_run(SortOperator(0))
    div = RowNnzMatrixDivOperator(0, bounds=(8,))
    ex.add_and_run(div)
    assert len(div.new_sub_ids) >= 1
    ms.logical_check()


@pytest.mark.parametrize(
    "sched",
    [
        Schedule(family="stripe_total", blocking="merge_path", work_per_block=96, unroll=4),
        Schedule(family="stripe_total", blocking="balanced", work_per_block=96, sort=True, unroll=1),
        Schedule(family="stripe_total", blocking="fixed_rows", row_interval=32, unroll=1),
        Schedule(family="nnz_segment", work_per_block=64, unroll=4),
        Schedule(family="tile_onehot", rb=64, ct=64, g=32),
        Schedule(family="bucketed", bucket_bounds=(6,), rb=64, ct=64, g=32),
    ],
    ids=["merge", "balanced-sorted", "fixed", "segment", "tile", "bucketed"],
)
def test_build_plan_families(sched, small_coo, rng):
    x = rng.standard_normal((small_coo.shape[1], 8)).astype(np.float32)
    plan = build_plan(small_coo, sched)
    y = np.asarray(plan(x))
    want = spmm_reference(small_coo, x.astype(np.float64))
    check_result(y, want, rtol=2e-3)


def test_build_plan_dgt_rowhot_i8(small_coo, rng):
    """Round-5 C4: the int8 scatter one-hot plumbs through Schedule ->
    build_plan and stays bit-exact vs the bf16 plane (the one-hot's 0/1
    values are exact in both dtypes; the dot accumulates f32)."""
    x = rng.standard_normal((small_coo.shape[1], 8)).astype(np.float32)
    base = Schedule(family="dgt_span", rb=64, nw=4, g=128, ktile=8)
    y_bf = np.asarray(build_plan(small_coo, base)(x))
    i8 = Schedule(family="dgt_span", rb=64, nw=4, g=128, ktile=8,
                  rowhot_i8=True)
    y_i8 = np.asarray(build_plan(small_coo, i8)(x))
    np.testing.assert_array_equal(y_i8, y_bf)
    want = spmm_reference(small_coo, x.astype(np.float64))
    check_result(y_i8, want, rtol=2e-3)


def test_tuner(small_coo, rng, tmp_path):
    from tpusparse.config import config_override
    from tpusparse.tune import tune

    x = rng.standard_normal((small_coo.shape[1], 8)).astype(np.float32)
    cands = [
        Schedule(family="tile_onehot", rb=64, ct=64, g=32),
        Schedule(family="stripe_total", work_per_block=96, unroll=4),
        Schedule(family="stripe_total", work_per_block=100000),  # bad: one huge stripe
    ]
    with config_override(cache_dir=str(tmp_path)):
        res = tune(small_coo, x, candidates=cands, iters=2)
    assert res.best_seconds > 0
    assert sum(1 for r in res.table if r.get("ok")) >= 2
    y = np.asarray(res.best(x))
    check_result(y, spmm_reference(small_coo, x.astype(np.float64)), rtol=2e-3)
    assert (tmp_path / "results.jsonl").exists()


def test_tuner_rejects_impossible_timings(small_coo, rng, tmp_path,
                                          monkeypatch):
    """Round-5 guard regression: the committed zoo run produced a 239
    TF/s 'wide' row from a 1e-9 s memoized timing because
    gflops_up_bound sat 5x ABOVE the MXU physical peak.  Both guards —
    the peak-anchored GF/s bound and the dispatch-floor seconds bound —
    must reject such candidates instead of crowning them."""
    from tpusparse.bench import harness
    from tpusparse.config import config_override, get_config
    from tpusparse.tune import tune

    assert get_config().gflops_up_bound <= 2.0e5  # at/below MXU peak

    monkeypatch.setattr(harness, "time_fn",
                        lambda fn, x, iters=1, warmup=0: 1e-9)
    x = rng.standard_normal((small_coo.shape[1], 8)).astype(np.float32)
    cands = [Schedule(family="tile_onehot", rb=64, ct=64, g=32)]
    with config_override(cache_dir=str(tmp_path)):
        with pytest.raises(RuntimeError, match="no schedule candidate"):
            tune(small_coo, x, candidates=cands, iters=1, use_cache=False)
    # the rejection reason is recorded per-candidate in results.jsonl
    import json
    rows = [json.loads(l)
            for l in open(tmp_path / "results.jsonl")]
    assert any("implausible" in str(r.get("error", "")) for r in rows)


def test_dense_family(small_coo):
    import numpy as np
    from tpusparse.oracle import check_result, spmm_reference
    from tpusparse.schedule import Schedule, build_plan

    x = np.random.default_rng(2).standard_normal((small_coo.shape[1], 16)).astype(np.float32)
    plan = build_plan(small_coo, Schedule(family="dense", precision="fp32"))
    y = np.asarray(plan(x))
    check_result(y, spmm_reference(small_coo, x.astype(np.float64)), rtol=1e-4)


def test_block_ell_family():
    import numpy as np
    from tpusparse.io import builder
    from tpusparse.oracle import check_result, spmm_reference
    from tpusparse.schedule import Schedule, build_plan

    mat = builder.block_sparse_coo(384, 512, block=128, block_density=0.2, seed=1)
    x = np.random.default_rng(2).standard_normal((512, 16)).astype(np.float32)
    plan = build_plan(mat, Schedule(family="block_ell", precision="fp32", row_interval=128))
    y = np.asarray(plan(x))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=1e-4)


def test_tuner_picks_block_ell_candidate():
    from tpusparse.io import builder
    from tpusparse.tune import default_candidates

    mat = builder.block_sparse_coo(512, 512, block=128, block_density=0.3, seed=4)
    fams = {c.family for c in default_candidates(mat, k=16)}
    assert "block_ell" in fams


def test_bucketed_with_span_sub_schedules():
    import numpy as np
    from tpusparse.io import builder
    from tpusparse.oracle import check_result, spmm_reference
    from tpusparse.schedule import Schedule, build_plan

    mat = builder.power_law_coo(300, 240, avg_nnz_per_row=7.0, alpha=1.4, seed=6)
    x = np.random.default_rng(1).standard_normal((240, 8)).astype(np.float32)
    sub = Schedule(family="span_onehot", rb=64, ct=128, g=32)
    sched = Schedule(family="bucketed", bucket_bounds=(16,),
                     bucket_schedules=(sub, sub))
    plan = build_plan(mat, sched)
    assert plan.meta["n_subs"] == 2
    y = np.asarray(plan(x))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=2e-3)
