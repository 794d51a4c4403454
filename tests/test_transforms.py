"""Transform-layer tests: each transform must preserve the SpMM result under
the oracle (the reference's logical_check + generated-code oracle, SURVEY §4)."""

import numpy as np
import pytest

from tpusparse.io import builder
from tpusparse.levels import Level
from tpusparse.meta import create_init_metadata_set
from tpusparse.oracle import spmm_reference
from tpusparse import transforms as T
from tpusparse.io.mtx import CooMatrix


def reconstruct_y(ms, subs, x, m_total):
    """Compute Y from the (possibly sorted/divided/padded) metadata set and
    scatter rows back through original_row_of_sorted."""
    y = np.zeros((m_total, x.shape[1]), dtype=np.float64)
    for sub in subs:
        rows, cols, vals = ms.coo(sub)
        rec = (
            ms.get(Level.ROW, "original_row_of_sorted", sub)
            if ms.has(Level.ROW, "original_row_of_sorted", sub)
            else np.arange(ms.row_num(sub))
        )
        n = ms.row_num(sub)
        rec = rec[:n]  # trailing recovery entries beyond the (trimmed) row
        # count are empty rows; padding rows carry -1 sentinels
        local = np.zeros((n, x.shape[1]), dtype=np.float64)
        np.add.at(local, rows, vals[:, None] * x[cols])
        keep = rec >= 0
        np.add.at(y, rec[keep], local[keep])
    return y


@pytest.fixture
def ms_and_ref(small_coo, rng):
    ms = create_init_metadata_set(small_coo)
    x = rng.standard_normal((small_coo.shape[1], 8))
    want = spmm_reference(small_coo, x)
    return ms, x, want, small_coo.shape[0]


def check(ms, subs, x, want, m):
    ms.logical_check()
    got = reconstruct_y(ms, subs, x, m)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_sort_preserves_product(ms_and_ref):
    ms, x, want, m = ms_and_ref
    T.get_row_order_by_length(ms, 0)
    T.reorder_by_row_order(ms, 0)
    rows, _, _ = ms.coo(0)
    lengths = np.bincount(rows, minlength=ms.row_num(0))
    nonzero_lengths = lengths[lengths > 0]
    # descending by length => sorted rows with nnz come first & non-increasing
    assert np.all(np.diff(nonzero_lengths) <= 0) or nonzero_lengths.size <= 1
    T.remove_empty_rows_in_end(ms, 0)
    check(ms, [0], x, want, m)


def test_col_sort(ms_and_ref):
    ms, x, want, m = ms_and_ref
    T.get_row_order_by_col(ms, 0)
    T.reorder_by_row_order(ms, 0)
    check(ms, [0], x, want, m)


def test_double_sort_composes(ms_and_ref):
    ms, x, want, m = ms_and_ref
    T.get_row_order_by_length(ms, 0)
    T.reorder_by_row_order(ms, 0)
    T.get_row_order_by_col(ms, 0)
    T.reorder_by_row_order(ms, 0)
    check(ms, [0], x, want, m)


def test_fixed_div(ms_and_ref):
    ms, x, want, m = ms_and_ref
    subs = T.fixed_div_by_rows(ms, 0, 64)
    assert len(subs) == -(-m // 64)
    check(ms, subs, x, want, m)


def test_div_by_row_nnz(ms_and_ref):
    ms, x, want, m = ms_and_ref
    T.get_row_order_by_length(ms, 0)
    T.reorder_by_row_order(ms, 0)
    subs = T.div_by_row_nnz(ms, 0, [4, 16])
    assert 1 <= len(subs) <= 3
    check(ms, subs, x, want, m)


@pytest.mark.parametrize("level", [Level.TBLOCK, Level.WARP, Level.THREAD])
def test_fixed_interval_blocking(ms_and_ref, level):
    ms, x, want, m = ms_and_ref
    n = T.block_fixed_interval_rows(ms, 0, level, 16)
    assert n == -(-m // 16)
    check(ms, [0], x, want, m)


def test_balanced_blocking(ms_and_ref):
    ms, x, want, m = ms_and_ref
    T.block_balanced_nnz_rows(ms, 0, Level.TBLOCK, 64)
    fnz = ms.get(Level.TBLOCK, "first_nz_indices", 0)
    sizes = np.diff(fnz)
    # row-aligned balance: no block exceeds budget + max row length
    rows, _, _ = ms.coo(0)
    max_len = np.bincount(rows).max()
    assert sizes.max() <= 64 + max_len
    check(ms, [0], x, want, m)


def test_fixed_nnz_blocking(ms_and_ref):
    ms, x, want, m = ms_and_ref
    n = T.block_fixed_nnz(ms, 0, Level.THREAD, 32)
    fnz = ms.get(Level.THREAD, "first_nz_indices", 0)
    assert np.all(np.diff(fnz)[:-1] == 32)
    check(ms, [0], x, want, m)


def test_merge_path_blocking(ms_and_ref):
    ms, x, want, m = ms_and_ref
    T.block_merge_path(ms, 0, Level.TBLOCK, work_per_block=96, row_weight=1)
    fr = ms.get(Level.TBLOCK, "first_row_indices", 0)
    fnz = ms.get(Level.TBLOCK, "first_nz_indices", 0)
    work = np.diff(fnz) + np.diff(fr)
    rows, _, _ = ms.coo(0)
    max_len = np.bincount(rows).max()
    assert work.max() <= 96 + max_len + 1
    check(ms, [0], x, want, m)


def test_col_tiling(ms_and_ref):
    ms, x, want, m = ms_and_ref
    n = T.block_fixed_interval_cols(ms, 0, Level.TBLOCK, 64)
    fnz = ms.get(Level.TBLOCK, "first_nz_indices", 0)
    _, cols, _ = ms.coo(0)
    for t in range(n):
        seg = cols[fnz[t]:fnz[t + 1]]
        if seg.size:
            assert seg.min() >= t * 64 and seg.max() < (t + 1) * 64
    got = reconstruct_y(ms, [0], x, want.shape[0])
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_hierarchy_relative_and_offsets(ms_and_ref):
    ms, x, want, m = ms_and_ref
    T.block_fixed_interval_rows(ms, 0, Level.TBLOCK, 32)
    T.block_fixed_interval_rows(ms, 0, Level.WARP, 8)
    T.block_fixed_interval_rows(ms, 0, Level.THREAD, 2)
    T.add_child_offsets(ms, 0, Level.TBLOCK, Level.WARP)
    T.add_child_offsets(ms, 0, Level.TBLOCK, Level.THREAD)
    T.add_child_offsets(ms, 0, Level.WARP, Level.THREAD)
    T.add_relative_to_parent(ms, 0, Level.WARP, Level.TBLOCK)
    T.add_relative_to_parent(ms, 0, Level.THREAD, Level.WARP)
    T.add_block_sizes(ms, 0, Level.TBLOCK, Level.WARP)
    ms.logical_check()  # _check_relative validates abs == parent_abs + rel
    check(ms, [0], x, want, m)


def test_pad_empty_rows(ms_and_ref):
    ms, x, want, m = ms_and_ref
    T.pad_empty_rows(ms, 0)
    rows, _, _ = ms.coo(0)
    assert np.bincount(rows, minlength=ms.row_num(0)).min() >= 1
    check(ms, [0], x, want, m)


def test_pad_row_nnz_to_multiple(ms_and_ref):
    ms, x, want, m = ms_and_ref
    T.pad_row_nnz_to_multiple(ms, 0, 4)
    rows, _, _ = ms.coo(0)
    lengths = np.bincount(rows, minlength=ms.row_num(0))
    assert np.all(lengths % 4 == 0)
    check(ms, [0], x, want, m)


def test_ell_pad_and_interleave(ms_and_ref):
    ms, x, want, m = ms_and_ref
    T.get_row_order_by_length(ms, 0)
    T.reorder_by_row_order(ms, 0)
    T.block_fixed_interval_rows(ms, 0, Level.THREAD, 8)
    T.pad_block_rows_to_max(ms, 0, Level.THREAD)  # drops blocking
    T.block_fixed_interval_rows(ms, 0, Level.THREAD, 8)  # re-run (reference rollback)
    rows, _, _ = ms.coo(0)
    lengths = np.bincount(rows, minlength=ms.row_num(0))
    fr = ms.get(Level.THREAD, "first_row_indices", 0)
    for b in range(fr.size - 1):
        seg = lengths[fr[b]:fr[b + 1]]
        if seg.size:
            assert seg.min() == seg.max()  # ELL: uniform inside block
    T.interleave_storage(ms, 0, Level.THREAD)
    check(ms, [0], x, want, m)


def test_pad_blocks_to_uniform(ms_and_ref):
    ms, x, want, m = ms_and_ref
    T.block_balanced_nnz_rows(ms, 0, Level.TBLOCK, 64)
    c = T.pad_blocks_to_uniform_nnz(ms, 0, Level.TBLOCK)
    fnz = ms.get(Level.TBLOCK, "first_nz_indices", 0)
    assert np.all(np.diff(fnz) == c)
    check(ms, [0], x, want, m)


def test_bitmap_and_segments(ms_and_ref):
    ms, x, want, m = ms_and_ref
    T.block_fixed_nnz(ms, 0, Level.THREAD, 16)
    bm = T.thread_bit_map(ms, 0, Level.THREAD)
    rows, _, _ = ms.coo(0)
    # number of segments = rows touched per block summed
    fnz = ms.get(Level.THREAD, "first_nz_indices", 0)
    n_seg = sum(
        np.unique(rows[fnz[b]:fnz[b + 1]]).size for b in range(fnz.size - 1)
    )
    assert bm.sum() == n_seg
    ptr = T.segment_ptr(ms, 0, Level.THREAD)
    assert ptr[-1] == n_seg
    seg_rows = T.segment_offset(ms, 0, Level.THREAD)
    assert seg_rows.size == n_seg
    # combine pass reproduces the product
    seg_ids = np.cumsum(bm.astype(np.int64)) - 1
    _, cols, vals = ms.coo(0)
    partials = np.zeros((n_seg, x.shape[1]))
    np.add.at(partials, seg_ids, vals[:, None] * x[cols])
    y = np.zeros((m, x.shape[1]))
    np.add.at(y, seg_rows, partials)
    np.testing.assert_allclose(y, want, rtol=1e-9, atol=1e-9)


def test_detect_compression():
    D = T.detect_compression
    assert D(np.full(10, 7)).kind == "constant"
    li = D(np.arange(3, 43, 4))
    assert li.kind == "linear" and li.base == 3 and li.step == 4
    br = D(np.array([1, 1, 1, 5, 5, 9, 9, 9]))
    assert br.kind == "branch"
    np.testing.assert_array_equal(
        br.evaluate(np.arange(8)), np.array([1, 1, 1, 5, 5, 9, 9, 9])
    )
    cyc = D(np.tile(np.arange(0, 8, 2), 5))
    assert cyc.kind == "cycle_linear"
    np.testing.assert_array_equal(cyc.evaluate(np.arange(20)), np.tile(np.arange(0, 8, 2), 5))
    stair = D(np.repeat(np.arange(5) * 3, 4))
    assert stair.kind in ("cycle_increase", "branch")
    np.testing.assert_array_equal(stair.evaluate(np.arange(20)), np.repeat(np.arange(5) * 3, 4))
    rnd = D(np.array([5, 1, 9, 2, 8, 3, 1, 4, 4, 2, 7, 1]))
    assert rnd.kind == "none"


def test_padding_rate(ms_and_ref):
    ms, x, want, m = ms_and_ref
    nnz0 = ms.nnz(0)
    T.pad_row_nnz_to_multiple(ms, 0, 8)
    assert T.padding_rate(ms, 0, nnz0) >= 1.0


def test_merge_adjacent_blocks():
    import numpy as np
    from tpusparse.io import builder
    from tpusparse.levels import Level
    from tpusparse.meta.set import create_init_metadata_set
    from tpusparse.transforms.block import block_fixed_interval_rows, merge_adjacent_blocks

    mat = builder.uniform_coo(64, 40, nnz_per_row=4, seed=0)
    ms = create_init_metadata_set(mat)
    block_fixed_interval_rows(ms, 0, Level.THREAD, 4)   # 16 blocks of 16 nz
    n = merge_adjacent_blocks(ms, 0, Level.THREAD, max_nnz=32)
    assert n == 8
    nzs = ms.get(Level.THREAD, "first_nz_indices", 0)
    assert nzs[0] == 0 and nzs[-1] == mat.nnz
    sizes = np.diff(nzs)
    assert sizes.max() <= 32
    ms.logical_check()
