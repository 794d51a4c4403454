"""Span-chunked one-hot kernel vs oracle."""

import numpy as np
import pytest

from tpusparse.io import builder
from tpusparse.kernels.span_gather import pack_span, span_spmm
from tpusparse.oracle import check_result, spmm_reference


def _case(m=300, n=400, k=8, avg=6.0, seed=0):
    mat = builder.power_law_coo(m, n, avg_nnz_per_row=avg, seed=seed)
    x = np.random.default_rng(seed + 1).standard_normal((n, k)).astype(np.float32)
    return mat, x


@pytest.mark.parametrize("rb,ct,g", [(64, 128, 32), (128, 64, 16)])
def test_span_fp32(rb, ct, g):
    mat, x = _case()
    fmt = pack_span(mat, rb=rb, ct=ct, g=g)
    y = np.asarray(span_spmm(fmt, x, precision="fp32"))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=1e-5)


def test_span_fp32x2():
    mat, x = _case(k=16, seed=3)
    fmt = pack_span(mat, rb=64, ct=128, g=32)
    y = np.asarray(span_spmm(fmt, x, precision="fp32x2"))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=2e-3)


def test_span_padding_near_one():
    # uniform matrix: only the final chunk per program should be padded
    mat = builder.uniform_coo(512, 512, nnz_per_row=16, seed=2)
    fmt = pack_span(mat, rb=128, ct=256, g=64)
    assert fmt.padding_rate < 1.3, fmt.padding_rate
    x = np.random.default_rng(0).standard_normal((512, 8)).astype(np.float32)
    y = np.asarray(span_spmm(fmt, x, precision="fp32"))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=1e-5)


def test_span_narrow_window_splits():
    # force window splits: columns spread over n >> ct within a chunk
    mat = builder.uniform_coo(64, 2048, nnz_per_row=32, seed=5)
    fmt = pack_span(mat, rb=64, ct=64, g=64)
    x = np.random.default_rng(1).standard_normal((2048, 8)).astype(np.float32)
    y = np.asarray(span_spmm(fmt, x, precision="fp32"))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=1e-5)
    # window constraint honored
    cols = np.asarray(fmt.cols)
    assert cols.max() < fmt.ct


def test_span_from_metadata_set():
    from tpusparse.meta.set import create_init_metadata_set
    from tpusparse.ops import OperatorExecutor, SortOperator

    mat, x = _case(seed=9)
    ms = create_init_metadata_set(mat)
    ex = OperatorExecutor(ms)
    ex.add_and_run(SortOperator(0))
    fmt = pack_span(ms, 0, out_rows=mat.shape[0], rb=64, ct=128, g=32)
    y = np.asarray(span_spmm(fmt, x, precision="fp32"))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=1e-5)


def test_span_bf16_vals_storage():
    """HALF-mode parity: values stored bf16, fp32 accumulation."""
    mat, x = _case(k=8, avg=8.0, seed=13)
    fmt = pack_span(mat, rb=64, ct=128, g=32, val_dtype="bfloat16")
    import numpy as np
    assert str(np.asarray(fmt.vals).dtype) == "bfloat16"
    y = np.asarray(span_spmm(fmt, x, precision="bf16"))
    want = spmm_reference(mat, x.astype(np.float64))
    check_result(y, want, rtol=5e-2)


def test_span_colsplit_family():
    import numpy as np
    from tpusparse.schedule import Schedule, build_plan
    from tpusparse.io import builder

    # wide matrix: many more cols than the per-split width
    mat = builder.power_law_coo(128, 1200, avg_nnz_per_row=6.0, seed=17)
    x = np.random.default_rng(3).standard_normal((1200, 8)).astype(np.float32)
    plan = build_plan(mat, Schedule(family="span_colsplit", col_split=4,
                                    rb=64, ct=128, g=32))
    assert plan.meta["n_subs"] == 4
    y = np.asarray(plan(x))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=2e-3)


def test_tuner_colsplit_candidate():
    from tpusparse.io import builder
    from tpusparse.tune import default_candidates

    # N large enough that resident span is gated out at K=128
    mat = builder.power_law_coo(1024, 300000, avg_nnz_per_row=3.0, seed=1)
    fams = {c.family for c in default_candidates(mat, k=128)}
    assert "span_colsplit" in fams and "span_onehot" not in fams


def test_segment_span_family():
    import numpy as np
    import pytest
    from tpusparse import native
    from tpusparse.io import builder
    from tpusparse.schedule import Schedule, build_plan

    if not native.available():
        pytest.skip("native library required")
    # extreme skew: one monster row that must split across nnz blocks
    mat = builder.power_law_coo(200, 300, avg_nnz_per_row=8.0, alpha=1.2, seed=21)
    x = np.random.default_rng(4).standard_normal((300, 8)).astype(np.float32)
    plan = build_plan(mat, Schedule(family="segment_span", work_per_block=128,
                                    ct=64, g=32))
    y = np.asarray(plan(x))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=2e-3)


def test_segment_span_monster_row():
    import numpy as np
    import pytest
    from tpusparse import native
    from tpusparse.io.mtx import CooMatrix
    from tpusparse.kernels.nnz_split import pack_segment_span, segment_span_spmm

    if not native.available():
        pytest.skip("native library required")
    # one row with 500 nz among 50 rows
    rng = np.random.default_rng(5)
    rows = np.concatenate([np.full(500, 7), rng.integers(0, 50, 100)])
    cols = rng.integers(0, 400, rows.size)
    vals = rng.standard_normal(rows.size)
    mat = CooMatrix(rows, cols, vals, (50, 400)).sort_row_major().dedup()
    x = rng.standard_normal((400, 8)).astype(np.float32)
    fmt = pack_segment_span(mat, block_nnz=64, ct=128, g=32)
    y = np.asarray(segment_span_spmm(fmt, x, precision="fp32"))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=1e-4)


def test_with_values_update():
    import numpy as np
    from tpusparse.kernels.span_gather import pack_span, span_spmm, with_values

    mat, x = _case(seed=23)
    fmt = pack_span(mat, rb=64, ct=128, g=32, keep_perm=True)
    y1 = np.asarray(span_spmm(fmt, x, precision="fp32"))
    check_result(y1, spmm_reference(mat, x.astype(np.float64)), rtol=1e-5)
    # same pattern, new values
    new_vals = np.asarray(mat.vals) * 3.0 + 1.0
    fmt2 = with_values(fmt, new_vals)
    from tpusparse.io.mtx import CooMatrix
    mat2 = CooMatrix(mat.rows, mat.cols, new_vals, mat.shape)
    y2 = np.asarray(span_spmm(fmt2, x, precision="fp32"))
    check_result(y2, spmm_reference(mat2, x.astype(np.float64)), rtol=1e-5)


def test_with_values_python_fallback():
    import numpy as np
    import tpusparse.native as nat
    from tpusparse.kernels.span_gather import pack_span, span_spmm, with_values

    mat, x = _case(seed=29)
    orig = nat.span_pack
    nat.span_pack = lambda *a, **k: None
    try:
        fmt = pack_span(mat, rb=64, ct=128, g=32, keep_perm=True)
    finally:
        nat.span_pack = orig
    fmt2 = with_values(fmt, np.asarray(mat.vals) * -2.0)
    from tpusparse.io.mtx import CooMatrix
    mat2 = CooMatrix(mat.rows, mat.cols, np.asarray(mat.vals) * -2.0, mat.shape)
    y = np.asarray(span_spmm(fmt2, x, precision="fp32"))
    check_result(y, spmm_reference(mat2, x.astype(np.float64)), rtol=1e-5)


def test_segment_span_empty_row_gap_bounds_rb():
    """A block spanning a long empty-row gap must NOT blow up rb: segment id
    is the row RANK within the block, not the row offset (ADVICE r1)."""
    import numpy as np
    from tpusparse.io.mtx import CooMatrix
    from tpusparse.kernels.nnz_split import pack_segment_span, segment_span_spmm

    rng = np.random.default_rng(9)
    # rows 0..9 and 9000..9009: a 9k-row gap inside one nnz block
    rows = np.concatenate([np.repeat(np.arange(10), 8),
                           np.repeat(np.arange(9000, 9010), 8)])
    cols = rng.integers(0, 200, rows.size)
    vals = rng.standard_normal(rows.size)
    mat = CooMatrix(rows, cols, vals, (9010, 200)).sort_row_major().dedup()
    fmt = pack_segment_span(mat, block_nnz=256, ct=128, g=32)
    # rb bounded by rows-per-block (<= block_nnz), not the 9k row span
    assert fmt.rb <= 256
    x = rng.standard_normal((200, 8)).astype(np.float32)
    y = np.asarray(segment_span_spmm(fmt, x, precision="fp32"))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=1e-4)


def test_segment_span_numpy_fallback(monkeypatch):
    """pack_segment_span works without the native library (numpy chunker)."""
    import numpy as np
    from tpusparse import native
    from tpusparse.io import builder
    from tpusparse.kernels.nnz_split import pack_segment_span, segment_span_spmm

    mat = builder.power_law_coo(120, 150, avg_nnz_per_row=6.0, alpha=1.2, seed=31)
    x = np.random.default_rng(6).standard_normal((150, 8)).astype(np.float32)
    fmt_native = pack_segment_span(mat, block_nnz=64, ct=64, g=32) if native.available() else None
    monkeypatch.setattr(native, "available", lambda: False)
    fmt = pack_segment_span(mat, block_nnz=64, ct=64, g=32)
    y = np.asarray(segment_span_spmm(fmt, x, precision="fp32"))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=1e-4)
    if fmt_native is not None:
        # numpy and native chunkers produce identical formats
        np.testing.assert_array_equal(np.asarray(fmt.c0), np.asarray(fmt_native.c0))
        np.testing.assert_array_equal(np.asarray(fmt.cols), np.asarray(fmt_native.cols))
        np.testing.assert_array_equal(np.asarray(fmt.vals), np.asarray(fmt_native.vals))


def test_default_schedule_vmem_gate():
    """default_schedule falls back when X cannot be VMEM-resident (ADVICE r1)."""
    from tpusparse.io.mtx import CooMatrix
    from tpusparse.schedule import default_schedule
    import numpy as np

    small = CooMatrix(np.array([0]), np.array([0]), np.array([1.0]), (100, 1000))
    big = CooMatrix(np.array([0]), np.array([0]), np.array([1.0]), (100, 2_000_000))
    assert default_schedule(small, 8).family == "dg_span"
    assert default_schedule(small, 64).family == "dg_span"  # kt=32 tiling
    assert default_schedule(small, 64).ktile == 32
    assert default_schedule(big, 8).family == "span_colsplit"
    assert default_schedule(big).family == "tile_onehot"   # K unknown: streaming-safe
    assert default_schedule(small, 512).family == "tile_onehot"
