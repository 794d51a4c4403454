"""Real-data extractors (io/realdata.py) — structure + correctness on tiny
caps (the suite runs the full-size versions on chip)."""

import numpy as np
import pytest

from tpusparse.io import realdata


def test_cooccurrence_structure():
    co = realdata.cooccurrence_coo(vocab_size=512, max_files=25)
    m, n = co.shape
    assert m == n == 512
    assert co.nnz > 100
    # symmetric by construction
    import scipy.sparse as sp

    a = sp.coo_matrix((co.vals, (co.rows, co.cols)), shape=co.shape)
    assert abs(a - a.T).max() < 1e-6
    # hub tokens exist (skewed degrees; the tiny 512 vocab caps the ratio)
    deg = np.bincount(co.rows, minlength=512)
    assert deg.max() > 4 * max(deg.mean(), 1)


def test_docterm_structure():
    dt = realdata.docterm_coo(vocab_size=512, max_files=40)
    n_files, vocab = dt.shape
    assert vocab == 512 and n_files > 10
    assert dt.nnz > 200
    assert (dt.vals > 0).all()


def test_import_graph_structure():
    g = realdata.import_graph_coo(max_files=400)
    m, n = g.shape
    assert m == n == 400
    assert g.nnz > 100
    # directed: edges are NOT symmetric (web-graph class, unlike cooc)
    fwd = set(zip(g.rows.tolist(), g.cols.tolist()))
    rev = {(c, r) for r, c in fwd}
    assert len(fwd - rev) > len(fwd) // 2
    # in-degree hubs dominate out-degree spread (import hubs: os/typing)
    indeg = np.bincount(g.cols, minlength=n)
    outdeg = np.bincount(g.rows, minlength=m)
    assert indeg.max() > 2 * outdeg.max()
    assert (g.rows != g.cols).all()  # no self-loops


def test_trained_pruned_weight_tiny():
    torch = pytest.importorskip("torch")
    w, meta = realdata.trained_pruned_weight(
        d_model=64, d_ff=128, steps=8, seq=64, batch=2, sparsity=0.9)
    assert w.shape == (128, 64)
    assert abs(meta["sparsity"] - 0.9) < 0.02
    assert meta["loss_last"] < meta["loss_first"]  # it actually trained
    assert w.nnz == pytest.approx(128 * 64 * 0.1, rel=0.15)
