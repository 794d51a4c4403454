"""Artifact store (format persistence) and results aggregation."""

import json
import os

import numpy as np

from tpusparse.artifacts import (
    load_format,
    load_plan_artifact,
    save_format,
    save_plan_artifact,
)
from tpusparse.config import config_override
from tpusparse.io import builder
from tpusparse.kernels.span_gather import pack_span, span_spmm
from tpusparse.oracle import check_result, spmm_reference
from tpusparse.results import aggregate


def test_format_roundtrip(tmp_path):
    mat = builder.power_law_coo(100, 120, avg_nnz_per_row=5.0, seed=1)
    fmt = pack_span(mat, rb=64, ct=128, g=32)
    save_format(fmt, str(tmp_path / "f"))
    back = load_format(str(tmp_path / "f"))
    assert type(back).__name__ == "SpanFormat"
    assert back.rb == fmt.rb and back.ct == fmt.ct
    assert tuple(back.shape) == tuple(fmt.shape)
    np.testing.assert_array_equal(np.asarray(back.vals), np.asarray(fmt.vals))
    # the reloaded format still runs
    x = np.random.default_rng(0).standard_normal((120, 8)).astype(np.float32)
    y = np.asarray(span_spmm(back, x, precision="fp32"))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=1e-5)


def test_trainable_format_roundtrip(tmp_path):
    # keep_perm extras (perm_of_nz / slot_of_origrow) persist, so a
    # trainable layer's packing can be checkpointed and restored
    from tpusparse.kernels.sddmm import occupancy_mask, packed_to_nz

    mat = builder.power_law_coo(100, 120, avg_nnz_per_row=5.0, seed=3)
    fmt = pack_span(mat, rb=64, ct=128, g=32, keep_perm=True)
    save_format(fmt, str(tmp_path / "t"))
    back = load_format(str(tmp_path / "t"))
    np.testing.assert_array_equal(np.asarray(back.perm_of_nz),
                                  np.asarray(fmt.perm_of_nz))
    np.testing.assert_array_equal(occupancy_mask(back), occupancy_mask(fmt))
    np.testing.assert_allclose(packed_to_nz(back, back.vals),
                               np.asarray(mat.vals))


def test_plan_artifact_roundtrip(tmp_path):
    with config_override(cache_dir=str(tmp_path)):
        mat = builder.uniform_coo(64, 80, nnz_per_row=4, seed=2)
        fmt = pack_span(mat, rb=32, ct=64, g=16)
        d = save_plan_artifact("sig123", {"family": "span_onehot"}, [fmt],
                               perf={"seconds": 0.001, "gflops": 1.0})
        sched, formats, perf = load_plan_artifact(d)
        assert sched["family"] == "span_onehot"
        assert len(formats) == 1 and perf["gflops"] == 1.0


def test_results_aggregate(tmp_path):
    p = tmp_path / "results.jsonl"
    rows = [
        {"matrix": "m1", "k": 8, "ok": True, "gflops": 2.0, "seconds": 1e-3,
         "schedule": {"family": "a"}},
        {"matrix": "m1", "k": 8, "ok": True, "gflops": 5.0, "seconds": 4e-4,
         "schedule": {"family": "b"}},
        {"matrix": "m1", "k": 8, "ok": False, "error": "x"},
        {"matrix": "m2", "k": 32, "ok": True, "gflops": 3.0, "seconds": 1e-3,
         "schedule": {"family": "c"}},
    ]
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    best, n = aggregate([str(p)])
    assert n == 4
    assert best[("m1", 8)]["gflops"] == 5.0
    assert best[("m2", 32)]["schedule"]["family"] == "c"


def test_radix_and_nested_format_roundtrip(tmp_path):
    import numpy as np

    from tpusparse.artifacts import load_format, save_format
    from tpusparse.io import builder
    from tpusparse.kernels.radix_gather import pack_radix, radix_spmm

    mat = builder.power_law_coo(200, 160, avg_nnz_per_row=6.0, seed=3)
    fmt = pack_radix(mat, rb=128, S=16, g=64, kt=8)
    save_format(fmt, str(tmp_path / "r"))
    back = load_format(str(tmp_path / "r"))
    x = np.random.default_rng(1).standard_normal((160, 8)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(radix_spmm(back, x)),
                               np.asarray(radix_spmm(fmt, x)), rtol=1e-6)

    from tpusparse.format import pack_stripe_nested
    from tpusparse.kernels.stripe_gather import stripe_nested_spmm
    from tpusparse.levels import Level
    from tpusparse.meta.set import create_init_metadata_set
    from tpusparse.ops import (BalancedNnzRowBlockingOperator,
                               ChildOffsetsOperator,
                               GroupChildrenBlockingOperator,
                               OperatorExecutor, RelativeIndexOperator)

    ms = create_init_metadata_set(mat)
    ex = OperatorExecutor(ms)
    ex.add_and_run(BalancedNnzRowBlockingOperator(0, Level.WARP, 64))
    ex.add_and_run(GroupChildrenBlockingOperator(0, Level.TBLOCK, Level.WARP, 8))
    ex.add_and_run(ChildOffsetsOperator(0, Level.TBLOCK, Level.WARP))
    ex.add_and_run(RelativeIndexOperator(0, Level.WARP, Level.TBLOCK))
    nf = pack_stripe_nested(ms, 0, out_rows=200, unroll=4)
    save_format(nf, str(tmp_path / "n"))
    nback = load_format(str(tmp_path / "n"))
    np.testing.assert_allclose(np.asarray(stripe_nested_spmm(nback, x)),
                               np.asarray(stripe_nested_spmm(nf, x)), rtol=1e-6)
