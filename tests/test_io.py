"""Matrix I/O tests (reference behavior: struct.cc:49-130 COO reader)."""

import io

import numpy as np
import pytest

from tpusparse.io import (
    CooMatrix,
    banded_coo,
    block_sparse_coo,
    nm_pruned_dense,
    power_law_coo,
    pruned_weight_coo,
    read_mtx,
    uniform_coo,
    write_mtx,
)


MTX_GENERAL = """%%MatrixMarket matrix coordinate real general
% a comment
3 4 5
1 1 1.5
1 3 2.0
2 2 -1.0
3 1 4.0
3 4 0.5
"""

MTX_PATTERN_SYM = """%%MatrixMarket matrix coordinate pattern symmetric
3 3 3
1 1
2 1
3 2
"""

BARE_COO = """3 4 3
1 1 1.0
2 2 2.0
3 3 3.0
"""


def test_read_general():
    m = read_mtx(io.StringIO(MTX_GENERAL))
    assert m.shape == (3, 4)
    assert m.nnz == 5
    assert m.is_row_major_sorted()
    dense = m.to_dense()
    assert dense[0, 0] == 1.5 and dense[2, 3] == 0.5


def test_read_pattern_symmetric():
    m = read_mtx(io.StringIO(MTX_PATTERN_SYM))
    assert m.shape == (3, 3)
    # diagonal entry appears once; off-diagonals mirrored
    assert m.nnz == 5
    d = m.to_dense()
    assert d[0, 1] == 1.0 and d[1, 0] == 1.0
    assert np.all(d == d.T)


def test_read_bare_coo():
    m = read_mtx(io.StringIO(BARE_COO))
    assert m.shape == (3, 4) and m.nnz == 3


def test_write_read_roundtrip(tmp_path, small_coo):
    p = tmp_path / "m.mtx"
    write_mtx(p, small_coo)
    back = read_mtx(p)
    assert back.shape == small_coo.shape
    assert back.nnz == small_coo.nnz
    np.testing.assert_array_equal(back.rows, small_coo.rows)
    np.testing.assert_array_equal(back.cols, small_coo.cols)
    np.testing.assert_allclose(back.vals, small_coo.vals, rtol=1e-12)


def test_graph_modes():
    m = read_mtx(io.StringIO(MTX_GENERAL), graph_mode="bfs")
    assert m.shape == (4, 3)  # transposed
    m2 = read_mtx(io.StringIO(MTX_GENERAL), graph_mode="cc")
    assert np.all(m2.vals == 1.0)


def test_builders_basic():
    for m in (
        uniform_coo(32, 24, 3),
        power_law_coo(64, 64, 4.0),
        banded_coo(50, 50, 5),
        pruned_weight_coo(32, 32, 0.8),
        block_sparse_coo(64, 64, block=16, block_density=0.3),
    ):
        assert isinstance(m, CooMatrix)
        assert m.is_row_major_sorted()
        if m.nnz:
            assert m.rows.max() < m.shape[0]
            assert m.cols.max() < m.shape[1]


def test_pruned_weight_sparsity():
    m = pruned_weight_coo(100, 100, sparsity=0.9, seed=0)
    assert abs(m.nnz - 1000) <= 1


def test_nm_pruned_dense():
    w = nm_pruned_dense(16, 32, n_keep=2, group=4)
    wg = w.reshape(16, 8, 4)
    nnz_per_group = (wg != 0).sum(axis=2)
    assert nnz_per_group.max() <= 2


def test_csr_ptr(small_coo):
    ptr = small_coo.to_csr_ptr()
    assert ptr[0] == 0 and ptr[-1] == small_coo.nnz
    lengths = np.diff(ptr)
    np.testing.assert_array_equal(lengths, small_coo.row_lengths())


def test_scipy_interop():
    import numpy as np
    import scipy.sparse as sp
    from tpusparse.io.mtx import CooMatrix

    s = sp.random(30, 20, density=0.2, format="csr", random_state=1)
    mat = CooMatrix.from_scipy(s)
    np.testing.assert_allclose(mat.to_dense(np.float64), s.toarray())
    back = mat.to_scipy()
    np.testing.assert_allclose(back.toarray(), s.toarray())


def test_torch_interop():
    import numpy as np
    import torch
    from tpusparse.io import builder
    from tpusparse.io.mtx import CooMatrix

    m = builder.pruned_weight_coo(60, 50, sparsity=0.8, seed=1)
    back = CooMatrix.from_torch(m.to_torch())              # sparse COO
    np.testing.assert_allclose(back.to_dense(), m.to_dense())
    dense = torch.from_numpy(m.to_dense()).requires_grad_(True)
    np.testing.assert_allclose(CooMatrix.from_torch(dense).to_dense(),
                               m.to_dense())               # dense w/ grad
    np.testing.assert_allclose(
        CooMatrix.from_torch(m.to_torch().to_sparse_csr()).to_dense(),
        m.to_dense())                                      # CSR


def test_bcoo_interop():
    import numpy as np
    from tpusparse.io import builder
    from tpusparse.io.mtx import CooMatrix

    mat = builder.uniform_coo(24, 16, nnz_per_row=3, seed=2)
    b = mat.to_bcoo()
    back = CooMatrix.from_bcoo(b)
    np.testing.assert_allclose(back.to_dense(np.float64), mat.to_dense(np.float64))


MTX_SKEW = """%%MatrixMarket matrix coordinate real skew-symmetric
3 3 2
2 1 1.5
3 2 -2.0
"""


def test_read_skew_symmetric():
    m = read_mtx(io.StringIO(MTX_SKEW))
    d = m.to_dense(np.float64)
    # A = -A^T: the mirrored entries carry negated values
    assert d[1, 0] == 1.5 and d[0, 1] == -1.5
    assert d[2, 1] == -2.0 and d[1, 2] == 2.0
    np.testing.assert_allclose(d, -d.T)


def test_read_skew_symmetric_rejects_diagonal():
    bad = MTX_SKEW + "1 1 3.0\n"
    with pytest.raises(ValueError):
        read_mtx(io.StringIO(bad))


def test_read_skew_symmetric_native(tmp_path):
    from tpusparse import native

    if not native.available():
        pytest.skip("native library unavailable")
    p = tmp_path / "skew.mtx"
    p.write_text(MTX_SKEW)
    m = read_mtx(p)  # routes through the C++ parser
    d = m.to_dense(np.float64)
    np.testing.assert_allclose(d, -d.T)
    assert d[1, 0] == 1.5 and d[0, 1] == -1.5
    bad = tmp_path / "skew_bad.mtx"
    bad.write_text(MTX_SKEW + "1 1 3.0\n")
    with pytest.raises(ValueError):
        read_mtx(bad)


def test_sum_duplicates_and_from_bcoo_dups():
    import jax.numpy as jnp
    from jax.experimental import sparse as jsparse
    from tpusparse.io.mtx import CooMatrix

    # duplicate (0, 1) entries must SUM (BCOO semantics), not keep-first
    idx = jnp.asarray([[0, 1], [0, 1], [2, 0]], jnp.int32)
    data = jnp.asarray([2.0, 3.0, 4.0], jnp.float32)
    b = jsparse.BCOO((data, idx), shape=(3, 3))
    mat = CooMatrix.from_bcoo(b)
    d = mat.to_dense(np.float64)
    assert d[0, 1] == 5.0 and d[2, 0] == 4.0
    assert mat.nnz == 2
