"""MetaDataSet + item tests (reference: metadata_set.cc, code_source_data.cc)."""

import numpy as np
import pytest

from tpusparse.levels import Level
from tpusparse.meta import MetaDataSet, create_init_metadata_set, narrow_dtype


def test_bootstrap(small_coo):
    ms = create_init_metadata_set(small_coo)
    assert ms.get_scalar(Level.GLOBAL, "origin_row_num", -1) == small_coo.shape[0]
    assert ms.get_scalar(Level.GLOBAL, "origin_nnz_num", -1) == small_coo.nnz
    rows, cols, vals = ms.coo(0)
    assert rows.size == small_coo.nnz
    ms.logical_check()
    assert len(ms.trace) == 1


def test_add_get_remove():
    ms = MetaDataSet()
    ms.add(Level.THREAD, "first_row_indices", 0, np.array([0, 2, 4]))
    assert ms.has(Level.THREAD, "first_row_indices", 0)
    with pytest.raises(KeyError):
        ms.add(Level.THREAD, "first_row_indices", 0, np.array([0]))
    ms.add(Level.THREAD, "first_row_indices", 0, np.array([0, 1]), replace=True)
    assert ms.get(Level.THREAD, "first_row_indices", 0).size == 2
    ms.remove(Level.THREAD, "first_row_indices", 0)
    assert not ms.has(Level.THREAD, "first_row_indices", 0)


def test_remove_level(small_coo):
    ms = create_init_metadata_set(small_coo)
    ms.add(Level.WARP, "first_nz_indices", 0, np.array([0, small_coo.nnz]))
    ms.add(Level.WARP, "first_row_indices", 0, np.array([0, small_coo.shape[0]]))
    removed = ms.remove_level(Level.WARP)
    assert len(removed) == 2
    assert not ms.has(Level.WARP, "first_nz_indices", 0)


def test_logical_check_catches_bad_block_boundaries(small_coo):
    ms = create_init_metadata_set(small_coo)
    ms.add(Level.THREAD, "first_nz_indices", 0, np.array([0, small_coo.nnz + 7]))
    with pytest.raises(AssertionError):
        ms.logical_check()


def test_logical_check_catches_unsorted_rows(small_coo):
    ms = create_init_metadata_set(small_coo)
    rows, cols, vals = ms.coo(0)
    rows = rows.copy()
    if rows.size > 2:
        rows[0], rows[-1] = rows[-1], rows[0]
    ms.set_coo(0, rows, cols, vals)
    with pytest.raises(AssertionError):
        ms.logical_check()


def test_narrow_dtype():
    a = np.arange(200, dtype=np.int64)
    assert narrow_dtype(a).dtype == np.int16  # 199 > int8 max
    b = np.arange(100, dtype=np.int64)
    assert narrow_dtype(b).dtype == np.int8
    c = np.arange(70000, dtype=np.int64)
    assert narrow_dtype(c).dtype == np.int32
    u = narrow_dtype(np.arange(200, dtype=np.int64), allow_unsigned=True)
    assert u.dtype == np.uint8
    f = np.ones(4, dtype=np.float32)
    assert narrow_dtype(f).dtype == np.float32


def test_format_cache(tmp_path, small_coo):
    ms = create_init_metadata_set(small_coo)
    ms.get_item(Level.ROW, "nz_row_indices", 0).needed_by_format = True
    ms.get_item(Level.VAL, "nz_vals", 0).needed_by_format = True
    ms.narrow_format_dtypes()
    path = ms.output_format_to_dir(tmp_path / "fmt")
    loaded = np.load(path)
    assert "row_nz_row_indices_0" in loaded
    assert "val_nz_vals_0" in loaded
    assert loaded["row_nz_row_indices_0"].dtype.itemsize <= 2


def test_copy_is_deep(small_coo):
    ms = create_init_metadata_set(small_coo)
    ms2 = ms.copy()
    ms2.get(Level.VAL, "nz_vals", 0)[:] = 0
    assert not np.all(ms.get(Level.VAL, "nz_vals", 0) == 0)
