"""SpMV, SpGEMM, and semiring/graph algorithms."""

import numpy as np
import pytest

from tpusparse.config import config_override
from tpusparse.graph import bfs, connected_components, pagerank, semiring_spmv
from tpusparse.io import builder
from tpusparse.io.mtx import CooMatrix
from tpusparse.oracle import spgemm_reference, spmm_reference, spmv_reference
from tpusparse.spgemm import spgemm
from tpusparse.spmv import spmv


@pytest.mark.parametrize("method", ["segment", "stripe", "span"])
def test_spmv(method, small_coo):
    x = np.random.default_rng(0).standard_normal(small_coo.shape[1]).astype(np.float32)
    y = np.asarray(spmv(small_coo, x, method=method))
    want = spmv_reference(small_coo, x.astype(np.float64))
    np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("col_split", [1, 3])
def test_spmv_multi_colsplit(col_split):
    """m fused vectors; col_split > 1 is the large-N composition
    (VERDICT r3 #5): per-range dgt formats, partial-product sum."""
    from tpusparse.spmv import spmv_multi_fn

    mat = builder.power_law_coo(500, 700, avg_nnz_per_row=6.0, seed=4)
    xs = np.random.default_rng(1).standard_normal((700, 8)).astype(np.float32)
    fn = spmv_multi_fn(mat, n_vectors=8, col_split=col_split)
    y = np.asarray(fn(xs))
    want = spmm_reference(mat, xs.astype(np.float64))
    np.testing.assert_allclose(y, want, rtol=2e-3, atol=2e-3)
    if col_split > 1:
        assert fn.n_splits > 1


def test_spmv_multi_auto_split_threshold():
    """Auto stays the fused unsplit kernel while it compiles (measured:
    splitting loses at every compiling scale — 262k 9.02 vs 6.96, 524k
    1.96 vs 1.56 Gnnz/s) and splits only past the measured 16MB
    resident-X compile boundary, where split-4 (0.947 at 1M) beats both
    the non-compiling unsplit kernel and the refuted dg kt=1 loop
    (0.339)."""
    from tpusparse.spmv import spmv_multi_fn

    mid = builder.power_law_coo(400, 524288, avg_nnz_per_row=2.0, seed=5)
    fn = spmv_multi_fn(mid, n_vectors=8)    # X = 16MB: at the boundary
    assert getattr(fn, "n_splits", 1) == 1
    big = builder.power_law_coo(400, 1048576, avg_nnz_per_row=1.0, seed=5)
    fn2 = spmv_multi_fn(big, n_vectors=8)   # X = 32MB: over the boundary
    assert getattr(fn2, "n_splits", 1) >= 2
    xs = np.random.default_rng(2).standard_normal((1048576, 8)).astype(np.float32)
    y = np.asarray(fn2(xs))
    want = spmm_reference(big, xs.astype(np.float64))
    np.testing.assert_allclose(y, want, rtol=2e-3, atol=2e-3)


def test_spgemm_matches_scipy():
    a = builder.power_law_coo(120, 90, avg_nnz_per_row=5.0, seed=1)
    b = builder.power_law_coo(90, 150, avg_nnz_per_row=4.0, seed=2)
    c = spgemm(a, b)
    want = spgemm_reference(a, b)
    np.testing.assert_allclose(
        c.to_dense(np.float64), want.to_dense(np.float64), rtol=1e-4, atol=1e-4
    )
    # structural zeros must not appear
    want_dense = want.to_dense(np.float64)
    got_dense = c.to_dense(np.float64)
    assert np.all((got_dense != 0) <= (want_dense != 0) | (np.abs(got_dense) < 1e-6))


def test_spgemm_tiled():
    a = builder.uniform_coo(64, 80, nnz_per_row=6, seed=3)
    b = builder.uniform_coo(80, 700, nnz_per_row=3, seed=4)
    c = spgemm(a, b, tile_cols=256)
    want = spgemm_reference(a, b)
    np.testing.assert_allclose(
        c.to_dense(np.float64), want.to_dense(np.float64), rtol=1e-4, atol=1e-4
    )


def test_spgemm_runner_reuse():
    # spgemm_fn builds once; the runner handles B's of different widths and
    # patterns, and the spgemm() wrapper hits the signature-keyed cache
    from tpusparse.spgemm import _RUNNER_CACHE, spgemm_fn

    a = builder.power_law_coo(100, 96, avg_nnz_per_row=5.0, seed=11)
    run = spgemm_fn(a, tile_cols=64)
    for seed, p in ((12, 130), (13, 70)):
        b = builder.power_law_coo(96, p, avg_nnz_per_row=4.0, seed=seed)
        c = run(b)
        want = spgemm_reference(a, b)
        np.testing.assert_allclose(
            c.to_dense(np.float64), want.to_dense(np.float64),
            rtol=1e-4, atol=1e-4)
    _RUNNER_CACHE.clear()
    b = builder.power_law_coo(96, 130, avg_nnz_per_row=4.0, seed=12)
    # method='device': the auto route sends sub-crossover products to host
    # scipy (no runner built) — this test is about device-runner reuse
    spgemm(a, b, tile_cols=64, method="device")
    n_runners = len(_RUNNER_CACHE)
    spgemm(a, b, tile_cols=64, method="device")  # same A: cached runner
    assert n_runners == 1 and len(_RUNNER_CACHE) == 1
    # and the auto route on this tiny product is host (documented crossover)
    from tpusparse.spgemm import HOST_CROSSOVER_FLOPS, spgemm_flops
    assert spgemm_flops(a, b) < HOST_CROSSOVER_FLOPS


def test_spgemm_tuned_a_plan():
    # tune_a=True routes A through the min-time tuner (budget-capped)
    a = builder.power_law_coo(120, 90, avg_nnz_per_row=5.0, seed=5)
    b = builder.power_law_coo(90, 150, avg_nnz_per_row=4.0, seed=6)
    c = spgemm(a, b, tune_a=True, tune_budget=2)
    want = spgemm_reference(a, b)
    np.testing.assert_allclose(
        c.to_dense(np.float64), want.to_dense(np.float64), rtol=1e-4, atol=1e-4
    )


def _path_graph(n):
    """Directed path 0->1->...->n-1 in push orientation ((u,v) = edge v->u)."""
    src = np.arange(n - 1, dtype=np.int64)
    return CooMatrix(src + 1, src, np.ones(n - 1), (n, n)).sort_row_major()


def test_semiring_spmv_matches_oracle(small_coo):
    x = np.random.default_rng(1).standard_normal(small_coo.shape[1])
    for sr in ("plus_times", "min_plus"):
        got = np.asarray(semiring_spmv(small_coo, x, sr), dtype=np.float64)
        want = spmm_reference(small_coo, x, semiring=sr)
        finite = np.isfinite(want)
        np.testing.assert_allclose(got[finite], want[finite], rtol=1e-4, atol=1e-4)
        assert np.all(np.isinf(got) == np.isinf(want))
    xb = np.random.default_rng(2).random(small_coo.shape[1]) > 0.5
    got = np.asarray(semiring_spmv(small_coo, xb, "or_and"))
    want = spmm_reference(small_coo, xb, semiring="or_and")
    np.testing.assert_array_equal(got, want)


def test_bfs_path():
    n = 12
    level = bfs(_path_graph(n), source=0)
    np.testing.assert_array_equal(level, np.arange(n))


def test_bfs_unreachable():
    # two disjoint paths; start in the first
    g = _path_graph(6)
    rows = np.concatenate([g.rows, [8, 9]])
    cols = np.concatenate([g.cols, [7, 8]])
    mat = CooMatrix(rows, cols, np.ones(rows.size), (10, 10)).sort_row_major()
    level = bfs(mat, source=0)
    assert list(level[:6]) == [0, 1, 2, 3, 4, 5]
    assert all(level[6:] == -1)


def test_pagerank_uniform_on_cycle():
    n = 8
    src = np.arange(n, dtype=np.int64)
    mat = CooMatrix((src + 1) % n, src, np.ones(n), (n, n)).sort_row_major()
    r = pagerank(mat, tol=1e-10)
    np.testing.assert_allclose(r, np.full(n, 1.0 / n), rtol=1e-4)
    np.testing.assert_allclose(r.sum(), 1.0, rtol=1e-4)


def test_connected_components():
    # components {0,1,2}, {3,4}, {5}
    rows = np.array([0, 1, 3], dtype=np.int64)
    cols = np.array([1, 2, 4], dtype=np.int64)
    mat = CooMatrix(rows, cols, np.ones(3), (6, 6)).sort_row_major()
    label = connected_components(mat)
    assert label[0] == label[1] == label[2]
    assert label[3] == label[4]
    assert label[5] == 5
    assert label[0] != label[3]


def test_graph_config_hooks():
    with config_override(performance_flag="graph", graph_algorithm="bfs", graph_max_iter=3):
        # max_iter truncates traversal
        level = bfs(_path_graph(10), source=0)
        assert level.max() == 3 and np.sum(level >= 0) == 4


def test_matvec_plan_semiring_hook():
    """The calculation_method metadata (CalculationMethodChooseOperator) is
    what selects the plan path — the reference's semiring hook, now live."""
    import jax.numpy as jnp

    from tpusparse import graph
    from tpusparse.io import builder

    mat = builder.power_law_coo(200, 200, avg_nnz_per_row=5.0, seed=2)
    x = np.random.default_rng(0).standard_normal(200).astype(np.float32)
    fn = graph.matvec_plan(mat, semiring="plus_times")
    assert fn.meta["calculation_method"] == 0
    assert fn.meta["method"] == "dg"  # packed champion path at this size
    y = np.asarray(fn(jnp.asarray(x)))
    want = np.zeros(200)
    np.add.at(want, mat.rows, np.asarray(mat.vals) * x[mat.cols])
    np.testing.assert_allclose(y, want, rtol=1e-2, atol=1e-4)
    # or_and: threshold of the counting matvec
    fb = graph.matvec_plan(mat, semiring="or_and")
    assert fb.meta["calculation_method"] == 2
    f0 = np.zeros(200, np.float32); f0[3] = 1.0
    got = np.asarray(fb(jnp.asarray(f0)))
    wantb = np.zeros(200)
    np.add.at(wantb, mat.rows, (np.asarray(mat.vals)[...] != 0) * (f0[mat.cols] != 0))
    np.testing.assert_array_equal(got > 0, wantb > 0)


def test_spgemm_device_resparsify_matches_scipy_style():
    from tpusparse.io import builder
    from tpusparse.spgemm import spgemm

    a = builder.power_law_coo(150, 120, avg_nnz_per_row=4.0, seed=5)
    b = builder.power_law_coo(120, 200, avg_nnz_per_row=4.0, seed=6)
    c = spgemm(a, b, tile_cols=64, method="device")
    want = a.to_dense(np.float64) @ b.to_dense(np.float64)
    got = c.to_dense(np.float64)
    # default plan precision is fp32x2 (~2e-3 relative class)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)


def test_sssp_path_graph():
    # path 0->1->...->4 with weight 2.0 per edge: d[i] = 2*i
    from tpusparse.graph import sssp

    n = 5
    g = _path_graph(n)
    g = CooMatrix(g.rows, g.cols, np.full(g.nnz, 2.0, np.float32), g.shape)
    d = sssp(g, 0)
    np.testing.assert_allclose(d, 2.0 * np.arange(n))


def test_sssp_matches_scipy():
    from scipy.sparse.csgraph import dijkstra

    from tpusparse.graph import sssp

    rng = np.random.default_rng(3)
    n, nnz = 60, 400
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.uniform(0.1, 5.0, nnz).astype(np.float32)
    keep = rows != cols
    # push orientation (u, v) = edge v->u; scipy wants (src, dst) so
    # dijkstra runs on the transpose
    mat = CooMatrix(rows[keep], cols[keep], vals[keep], (n, n)).dedup()
    d = sssp(mat, 7)
    want = dijkstra(mat.to_scipy().T.tocsr(), indices=7)
    np.testing.assert_allclose(d, want.astype(np.float32), rtol=1e-5)
