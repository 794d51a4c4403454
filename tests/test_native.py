"""Native C++ host library (csrc/tpusparse_host.cpp) vs numpy fallbacks."""

import io

import numpy as np
import pytest

from tpusparse import native
from tpusparse.io import builder, mtx

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no compiler?)"
)


def test_native_parse_matches_python(tmp_path):
    mat = builder.power_law_coo(80, 60, avg_nnz_per_row=4.0, seed=2)
    p = tmp_path / "m.mtx"
    mtx.write_mtx(p, mat)
    got = native.parse_mtx(str(p))
    assert got is not None
    rows, cols, vals, shape = got
    with open(p) as f:
        want = mtx.read_mtx(io.StringIO(f.read()))  # Python reader path
    assert shape == want.shape
    np.testing.assert_array_equal(rows, want.rows)
    np.testing.assert_array_equal(cols, want.cols)
    np.testing.assert_allclose(vals, want.vals)


def test_native_parse_symmetric_pattern(tmp_path):
    p = tmp_path / "s.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate pattern symmetric\n"
        "3 3 2\n"
        "2 1\n"
        "3 3\n"
    )
    rows, cols, vals, shape = native.parse_mtx(str(p))
    assert shape == (3, 3)
    # (1,0) mirrored to (0,1); (2,2) diagonal not mirrored; row-major sorted
    np.testing.assert_array_equal(rows, [0, 1, 2])
    np.testing.assert_array_equal(cols, [1, 0, 2])
    np.testing.assert_allclose(vals, [1.0, 1.0, 1.0])


def test_native_parse_malformed(tmp_path):
    p = tmp_path / "bad.mtx"
    p.write_text("%%MatrixMarket matrix coordinate real general\nnot numbers\n")
    with pytest.raises(ValueError):
        native.parse_mtx(str(p))


def test_native_parse_out_of_range(tmp_path):
    p = tmp_path / "oob.mtx"
    p.write_text("%%MatrixMarket matrix coordinate real general\n2 2 1\n5 1 1.0\n")
    with pytest.raises(ValueError):
        native.parse_mtx(str(p))


def test_read_mtx_uses_native(tmp_path):
    mat = builder.uniform_coo(40, 30, nnz_per_row=3, seed=1)
    p = tmp_path / "u.mtx"
    mtx.write_mtx(p, mat)
    back = mtx.read_mtx(str(p))
    np.testing.assert_array_equal(back.rows, mat.rows)
    np.testing.assert_array_equal(back.cols, mat.cols)
    np.testing.assert_allclose(back.vals, mat.vals, rtol=1e-12)


def test_merge_path_cuts_matches_python():
    mat = builder.power_law_coo(200, 100, avg_nnz_per_row=6.0, seed=4)
    row_ptr = mat.to_csr_ptr()
    work = 64
    got = native.merge_path_cuts(row_ptr, mat.nnz, work)
    assert got is not None
    first_rows, first_nzs = got
    # invariants: cuts are every `work` merge items, monotone, end at (m, nnz)
    m = mat.shape[0]
    assert first_rows[0] == 0 and first_nzs[0] == 0
    assert first_rows[-1] == m and first_nzs[-1] == mat.nnz
    items = first_rows + first_nzs
    np.testing.assert_array_equal(
        items, np.minimum(np.arange(items.size) * work, m + mat.nnz)
    )
    # each cut obeys the merge-path invariant row_ptr[r] >= z >= row_ptr[r-1]
    for r, z in zip(first_rows[1:-1], first_nzs[1:-1]):
        assert row_ptr[r] >= z
        if r > 0:
            assert row_ptr[r - 1] <= z


def test_bucket_pack_matches_numpy():
    rng = np.random.default_rng(0)
    nnz, buckets, cap = 1000, 13, 128
    key = rng.integers(0, buckets, nnz)
    a = rng.integers(0, 1 << 20, nnz).astype(np.int32)
    b = rng.integers(0, 64, nnz).astype(np.int32)
    v = rng.standard_normal(nnz).astype(np.float32)
    out_a, out_b, out_v, maxfill = native.bucket_pack(key, a, b, v, buckets, cap)
    counts = np.bincount(key, minlength=buckets)
    assert maxfill == counts.max()
    for bk in range(buckets):
        sel = key == bk
        np.testing.assert_array_equal(out_a[bk, : counts[bk]], a[sel])
        np.testing.assert_array_equal(out_b[bk, : counts[bk]], b[sel])
        np.testing.assert_allclose(out_v[bk, : counts[bk]], v[sel])
        assert np.all(out_v[bk, counts[bk]:] == 0)


def test_bucket_pack_overflow():
    key = np.zeros(10, np.int64)
    a = b = np.zeros(10, np.int32)
    v = np.zeros(10, np.float32)
    with pytest.raises(ValueError):
        native.bucket_pack(key, a, b, v, n_buckets=2, cap=4)


def test_bucket_counts():
    key = np.array([0, 1, 1, 3, 3, 3], np.int64)
    counts = native.bucket_counts(key, 5)
    np.testing.assert_array_equal(counts, [1, 2, 0, 3, 0])


def test_span_pack_native_matches_python():
    import tpusparse.native as nat
    import tpusparse.kernels.span_gather as sg
    from tpusparse.io import builder

    mat = builder.power_law_coo(200, 300, avg_nnz_per_row=6.0, seed=11)
    fmt_native = sg.pack_span(mat, rb=64, ct=128, g=32)
    # force the python fallback
    orig = nat.span_pack
    nat.span_pack = lambda *a, **k: None
    try:
        fmt_py = sg.pack_span(mat, rb=64, ct=128, g=32)
    finally:
        nat.span_pack = orig
    assert fmt_native.n_chunks == fmt_py.n_chunks
    np.testing.assert_array_equal(np.asarray(fmt_native.c0), np.asarray(fmt_py.c0))
    np.testing.assert_array_equal(np.asarray(fmt_native.cols), np.asarray(fmt_py.cols))
    np.testing.assert_array_equal(np.asarray(fmt_native.lrow), np.asarray(fmt_py.lrow))
    np.testing.assert_allclose(np.asarray(fmt_native.vals), np.asarray(fmt_py.vals))


def test_dgt_runs_multi_matches_python():
    """The native multi-open walk must produce bitwise-identical formats to
    the Python fallback (round-4; the segment emission order is part of the
    contract — ranks are consumed in segment order)."""
    import tpusparse.native as nat
    import tpusparse.kernels.dgt_gather as dgt
    from tpusparse.io import builder

    assert nat.dgt_runs_multi(
        np.zeros((1,), np.int64), np.zeros((1,), np.int64),
        np.ones((1, 8), np.int64), 16, 4, 1, 8) is not None, \
        "native lib lacks ts_dgt_runs_multi"
    for seed, resid, nw in ((0, True, 4), (1, False, 8), (2, True, 1)):
        mat = builder.power_law_coo(400, 500, avg_nnz_per_row=7.0, seed=seed)
        fmt_nat = dgt.pack_dgt(mat, rb=64, g=256, kt=8, resid=resid, nw=nw,
                               walk="multi")
        orig = nat.dgt_runs_multi
        nat.dgt_runs_multi = lambda *a, **k: None
        try:
            fmt_py = dgt.pack_dgt(mat, rb=64, g=256, kt=8, resid=resid,
                                  nw=nw, walk="multi")
        finally:
            nat.dgt_runs_multi = orig
        assert fmt_nat.n_chunks == fmt_py.n_chunks
        for name in ("wins", "cols", "lrw", "vals"):
            np.testing.assert_array_equal(
                np.asarray(getattr(fmt_nat, name)),
                np.asarray(getattr(fmt_py, name)), err_msg=name)
