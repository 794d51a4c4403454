"""Multi-chip sharding: GSPMD stripe SpMM and the ring-overlapped halo path."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from tpusparse.dist import build_sharded_stripe_spmm, make_mesh
from tpusparse.dist.overlap import build_halo_spmm, pack_halo_stripe
from tpusparse.generator import prepare_stripe_format
from tpusparse.io import builder
from tpusparse.oracle import check_result, spmm_reference


def _mat_x(m=300, n=260, k=16, seed=0):
    mat = builder.power_law_coo(m, n, avg_nnz_per_row=5.0, seed=seed)
    x = np.random.default_rng(seed + 1).standard_normal((n, k)).astype(np.float32)
    return mat, x


@pytest.mark.parametrize("n_row,n_k", [(4, 2), (8, 1), (2, 1)])
def test_sharded_stripe_spmm(n_row, n_k):
    mat, x = _mat_x(k=16 * max(n_k, 1))
    fmt, _ = prepare_stripe_format(mat, work_per_stripe=256, nnz_multiple=8)
    mesh = make_mesh(n_row, n_k)
    fn, put_inputs = build_sharded_stripe_spmm(fmt, mesh, unroll=4)
    y = np.asarray(fn(*put_inputs(x)))[:, : x.shape[1]]
    want = spmm_reference(mat, x.astype(np.float64))
    check_result(y, want, rtol=1e-4)


@pytest.mark.parametrize("d", [2, 4, 8])
def test_halo_overlap_spmm(d):
    mat, x = _mat_x(m=280, n=300, k=24, seed=7)
    fmt = pack_halo_stripe(mat, d, rows_per_stripe=32)
    mesh = Mesh(np.array(jax.devices()[:d]), ("rows",))
    fn, put_inputs = build_halo_spmm(fmt, mesh, unroll=4)
    y = np.asarray(fn(*put_inputs(x)))[:, : x.shape[1]]
    want = spmm_reference(mat, x.astype(np.float64))
    check_result(y, want, rtol=1e-4)


def test_halo_format_invariants():
    mat, _ = _mat_x(m=100, n=90, seed=3)
    d = 4
    fmt = pack_halo_stripe(mat, d, rows_per_stripe=16)
    vals = np.asarray(fmt.vals)
    assert vals.shape[:2] == (d, d)
    # every nz accounted for exactly once
    assert np.count_nonzero(vals) == np.count_nonzero(mat.vals)
    # slot map covers all rows uniquely
    slot = np.asarray(fmt.slot_of_origrow)
    assert slot.min() >= 0
    assert len(np.unique(slot)) == mat.shape[0]


def test_halo_skewed_matrix():
    # heavy row skew exercises the balanced-nnz device partition
    mat = builder.power_law_coo(200, 150, avg_nnz_per_row=8.0, alpha=1.3, seed=11)
    x = np.random.default_rng(0).standard_normal((150, 8)).astype(np.float32)
    fmt = pack_halo_stripe(mat, 4, rows_per_stripe=16)
    mesh = Mesh(np.array(jax.devices()[:4]), ("rows",))
    fn, put_inputs = build_halo_spmm(fmt, mesh, unroll=4)
    y = np.asarray(fn(*put_inputs(x)))[:, :8]
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=1e-4)


@pytest.mark.parametrize("d", [2, 4])
def test_halo_span_spmm(d):
    from tpusparse import native
    if not native.available():
        pytest.skip("native library required for pack_halo_span")
    from tpusparse.dist.overlap import build_halo_span_spmm, pack_halo_span

    mat, x = _mat_x(m=280, n=300, k=24, seed=7)
    fmt = pack_halo_span(mat, d, rows_per_program=64, ct=64, g=32)
    mesh = Mesh(np.array(jax.devices()[:d]), ("rows",))
    fn, put_inputs = build_halo_span_spmm(fmt, mesh)
    y = np.asarray(fn(*put_inputs(x)))[:, : x.shape[1]]
    want = spmm_reference(mat, x.astype(np.float64))
    check_result(y, want, rtol=1e-3)


def test_halo_span_skewed():
    from tpusparse import native
    if not native.available():
        pytest.skip("native library required for pack_halo_span")
    from tpusparse.dist.overlap import build_halo_span_spmm, pack_halo_span

    mat = builder.power_law_coo(200, 150, avg_nnz_per_row=8.0, alpha=1.3, seed=11)
    x = np.random.default_rng(0).standard_normal((150, 8)).astype(np.float32)
    fmt = pack_halo_span(mat, 4, rows_per_program=32, ct=40, g=16)
    mesh = Mesh(np.array(jax.devices()[:4]), ("rows",))
    fn, put_inputs = build_halo_span_spmm(fmt, mesh)
    y = np.asarray(fn(*put_inputs(x)))[:, :8]
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=1e-3)


def test_halo_span_2d_mesh():
    from tpusparse import native
    if not native.available():
        pytest.skip("native library required")
    from tpusparse.dist.overlap import build_halo_span_spmm, pack_halo_span

    mat, _ = _mat_x(m=280, n=300, seed=7)
    k = 32  # divisible by the k-axis
    x = np.random.default_rng(9).standard_normal((300, k)).astype(np.float32)
    fmt = pack_halo_span(mat, 4, rows_per_program=64, ct=64, g=32)
    dev = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(dev, ("rows", "k"))
    fn, put_inputs = build_halo_span_spmm(fmt, mesh, ktile=16)
    y = np.asarray(fn(*put_inputs(x)))[:, :k]
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=1e-3)


def test_halo_radix_ring():
    """Radix-kernel ppermute ring (champion per-chip path) vs oracle on the
    virtual mesh, 1D and 2D (rows x k)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from tpusparse.dist.overlap import build_halo_radix_spmm, pack_halo_radix
    from tpusparse.io import builder
    from tpusparse.oracle import check_result, spmm_reference

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mat = builder.power_law_coo(512, 600, avg_nnz_per_row=6.0, seed=7)
    x = np.random.default_rng(1).standard_normal((600, 16)).astype(np.float32)
    want = spmm_reference(mat, x.astype(np.float64))

    fmt = pack_halo_radix(mat, 4, rows_per_program=128, S=16, g=64, kt=8)
    mesh = Mesh(np.array(jax.devices()[:4]), ("rows",))
    fn, put = build_halo_radix_spmm(fmt, mesh, kt=8)
    y = np.asarray(fn(*put(jnp.asarray(x))))[:, :16]
    check_result(y, want, rtol=2e-3)

    # 2D mesh: rows x k
    if len(jax.devices()) >= 8:
        mesh2 = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("rows", "k"))
        fn2, put2 = build_halo_radix_spmm(fmt, mesh2, kt=8)
        y2 = np.asarray(fn2(*put2(jnp.asarray(x))))[:, :16]
        check_result(y2, want, rtol=2e-3)


def test_train_step_dp_tp():
    # the driver-facing dp x tp training step: grads flow through the
    # sparse custom-VJP kernel inside shard_map; loss must decrease
    import __graft_entry__ as ge

    mat = builder.power_law_coo(128, 96, avg_nnz_per_row=6.0, seed=3)
    mesh = make_mesh(4, 2)
    losses = ge._train_step_dryrun(mesh, mat, steps=3)
    assert losses[-1] < losses[0], losses


@pytest.mark.parametrize("d", [2, 4, 8])
def test_halo_dgt_spmm(d):
    """The round-3 champion kernel under the ring: residue scatter +
    virtual-row splits + pyramid fold, all through the shared harness."""
    if len(jax.devices()) < d:
        pytest.skip("not enough virtual devices")
    from tpusparse.dist.overlap import build_halo_dgt_spmm, pack_halo_dgt

    mat, x = _mat_x(m=400, n=520, k=16, seed=9)
    fmt = pack_halo_dgt(mat, d, rows_per_program=64, g=128, kt=8)
    mesh = Mesh(np.array(jax.devices()[:d]), ("rows",))
    fn, put_inputs = build_halo_dgt_spmm(fmt, mesh)
    y = np.asarray(fn(*put_inputs(x)))[:, : x.shape[1]]
    want = spmm_reference(mat, x.astype(np.float64))
    check_result(y, want, rtol=1e-3)


def test_halo_dgt_split_rows():
    """A mega row must split and still sum exactly through the ring's
    pyramid fold."""
    from tpusparse.dist.overlap import build_halo_dgt_spmm, pack_halo_dgt

    rng = np.random.default_rng(3)
    rows = np.concatenate([np.zeros(300, np.int64), rng.integers(1, 256, 1500)])
    cols = np.concatenate([rng.permutation(512)[:300], rng.integers(0, 512, 1500)])
    vals = rng.standard_normal(rows.size).astype(np.float32)
    from tpusparse.io.mtx import CooMatrix
    order = np.lexsort((cols, rows))
    mat = CooMatrix(rows[order], cols[order], vals[order], (256, 512))
    x = rng.standard_normal((512, 8)).astype(np.float32)
    fmt = pack_halo_dgt(mat, 4, rows_per_program=64, g=128, kt=8, split=64)
    assert fmt.split_levels > 1
    mesh = Mesh(np.array(jax.devices()[:4]), ("rows",))
    fn, put_inputs = build_halo_dgt_spmm(fmt, mesh)
    y = np.asarray(fn(*put_inputs(x)))[:, :8]
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=1e-3)
