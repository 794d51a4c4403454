"""dgt_gather (tile-pure-window + static-residue scatter) vs oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpusparse.io.builder import banded_coo, power_law_coo, uniform_coo
from tpusparse.kernels.dgt_gather import (DgtFormat, dgt_spmm, dgt_spmv,
                                          pack_dgt, with_values)
from tpusparse.oracle import spmm_reference


def _coo(kind, m, n, nnz, seed=0):
    if kind == "power":
        return power_law_coo(m, n, nnz, seed=seed)
    if kind == "uniform":
        return uniform_coo(m, n, max(nnz // m, 1), seed=seed)
    return banded_coo(m, n, bandwidth=max(nnz // m, 4), seed=seed)


@pytest.mark.parametrize("kind", ["power", "uniform", "banded"])
@pytest.mark.parametrize("resid", [True, False])
def test_dgt_spmm_vs_oracle(kind, resid):
    m, n, nnz, k = 900, 1500, 7000, 8
    A = _coo(kind, m, n, nnz, seed=2)
    fmt = pack_dgt(A, rb=256, g=256, kt=8, mode="fp32x2", resid=resid)
    x = np.random.default_rng(0).standard_normal((n, k)).astype(np.float32)
    y = np.asarray(dgt_spmm(fmt, jnp.asarray(x)))
    ref = spmm_reference(A, x)
    np.testing.assert_allclose(y, ref, rtol=0, atol=1e-4 * np.abs(ref).max())


@pytest.mark.parametrize("resid", [True, False])
def test_dgt_rowhot_i8_matches_bf16(resid):
    """Round-5 C4 (bench/formulations.py): int8 scatter one-hot is exact
    (0/1 values are representable in every dtype; the dot accumulates
    f32)."""
    m, n, nnz, k = 900, 1500, 7000, 8
    A = _coo("power", m, n, nnz, seed=5)
    fmt = pack_dgt(A, rb=256, g=256, kt=8, mode="fp32x2", resid=resid)
    x = np.random.default_rng(1).standard_normal((n, k)).astype(np.float32)
    y8 = np.asarray(dgt_spmm(fmt, jnp.asarray(x), rowhot_i8=True))
    yb = np.asarray(dgt_spmm(fmt, jnp.asarray(x)))
    np.testing.assert_array_equal(y8, yb)
    ref = spmm_reference(A, x)
    np.testing.assert_allclose(y8, ref, rtol=0, atol=1e-4 * np.abs(ref).max())


@pytest.mark.parametrize("nw", [4, 8])
def test_dgt_stream_x_matches_resident(nw):
    """Round-5 streamed-X kernel (VERDICT r4 #4): same format, windows
    DMA'd per chunk instead of holding X resident."""
    m, n, nnz, k = 900, 1500, 7000, 8
    A = _coo("power", m, n, nnz, seed=7)
    fmt = pack_dgt(A, rb=256, g=256, kt=8, mode="fp32x2", resid=True,
                   nw=nw)
    x = np.random.default_rng(2).standard_normal((n, k)).astype(np.float32)
    ys = np.asarray(dgt_spmm(fmt, jnp.asarray(x), stream_x=True))
    yr = np.asarray(dgt_spmm(fmt, jnp.asarray(x), fold=False))
    np.testing.assert_allclose(ys, yr, rtol=0, atol=1e-5 * np.abs(yr).max())
    ref = spmm_reference(A, x)
    np.testing.assert_allclose(ys, ref, rtol=0, atol=1e-4 * np.abs(ref).max())


@pytest.mark.parametrize("kt,k", [(8, 3), (8, 8), (16, 16), (32, 40)])
def test_dgt_kt_variants(kt, k):
    m, n, nnz = 700, 1200, 6000
    A = _coo("power", m, n, nnz, seed=5)
    fmt = pack_dgt(A, rb=128, g=128, kt=kt, mode="fp32x2")
    x = np.random.default_rng(1).standard_normal((n, k)).astype(np.float32)
    y = np.asarray(dgt_spmm(fmt, jnp.asarray(x)))
    ref = spmm_reference(A, x)
    np.testing.assert_allclose(y, ref, rtol=0, atol=1e-4 * np.abs(ref).max())


def test_dgt_bf16_mode():
    m, n, nnz, k = 600, 800, 5000, 8
    A = _coo("uniform", m, n, nnz, seed=7)
    fmt = pack_dgt(A, rb=256, g=128, kt=8, mode="bf16")
    x = np.random.default_rng(2).standard_normal((n, k)).astype(np.float32)
    y = np.asarray(dgt_spmm(fmt, jnp.asarray(x)))
    ref = spmm_reference(A, x)
    np.testing.assert_allclose(y, ref, rtol=0, atol=4e-3 * np.abs(ref).max())


def test_dgt_spmv_via_k8():
    m, n, nnz = 800, 1300, 6000
    A = _coo("power", m, n, nnz, seed=9)
    fmt = pack_dgt(A, rb=256, g=128, kt=8, mode="fp32x2")
    x = np.random.default_rng(3).standard_normal(n).astype(np.float32)
    y = np.asarray(dgt_spmv(fmt, jnp.asarray(x)))
    ref = spmm_reference(A, x[:, None])[:, 0]
    np.testing.assert_allclose(y, ref, rtol=0, atol=1e-4 * np.abs(ref).max())


@pytest.mark.parametrize("deal", ["length", "index", "blocks"])
def test_dgt_deals(deal):
    m, n, nnz, k = 1024, 1024, 9000, 8
    A = _coo("power", m, n, nnz, seed=11)
    fmt = pack_dgt(A, rb=256, g=256, kt=8, deal=deal)
    x = np.random.default_rng(4).standard_normal((n, k)).astype(np.float32)
    y = np.asarray(dgt_spmm(fmt, jnp.asarray(x)))
    ref = spmm_reference(A, x)
    np.testing.assert_allclose(y, ref, rtol=0, atol=1e-4 * np.abs(ref).max())


def test_dgt_residue_invariant():
    """Pack-time invariant the static scatter mask relies on: every slot's
    lane residue equals its row's residue class (dummy slots have vals 0)."""
    A = _coo("power", 500, 900, 4000, seed=13)
    fmt = pack_dgt(A, rb=128, g=256, kt=8, mode="fp32x2", resid=True,
                   split=None, keep_perm=True)
    # reconstruct lrow % ngrp per live slot from the original COO
    from tpusparse.kernels.dgt_gather import dgt_geometry
    _, ngrp = dgt_geometry(8, "fp32x2")
    vals = np.asarray(fmt.vals).reshape(-1)
    perm = np.asarray(fmt.perm_of_nz)
    lanes = perm % 128
    # row residue of each nz: recover lrow from slot_of_origrow (no split
    # here, so the pyramid index IS the slot)
    assert fmt.split_levels == 1
    slot = np.asarray(fmt.slot_of_origrow)[A.rows]
    lrow = slot % fmt.rb
    assert np.array_equal(lanes % ngrp, lrow % ngrp)
    assert np.count_nonzero(vals) == fmt.nnz_real


def test_dgt_split_rows():
    """Virtual-row splitting: a matrix with one mega row still validates,
    and the slot matrix has multiple live columns for that row."""
    rng = np.random.default_rng(23)
    m, n, k = 600, 1200, 8
    # one row with 600 nz, the rest sparse
    rows = np.concatenate([np.zeros(600, np.int64),
                           rng.integers(1, m, 3000)])
    cols_ = np.concatenate([rng.permutation(n)[:600],
                            rng.integers(0, n, 3000)])
    vals = rng.standard_normal(rows.size).astype(np.float32)
    from tpusparse.io.mtx import CooMatrix
    order = np.lexsort((cols_, rows))
    A = CooMatrix(rows=rows[order], cols=cols_[order], vals=vals[order],
                  shape=(m, n))
    fmt = pack_dgt(A, rb=128, g=256, kt=8, split=64)
    assert fmt.split_levels > 1, "mega row should be split"
    # the mega row's pyramid index points past the level-0 slots
    assert int(np.asarray(fmt.slot_of_origrow)[0]) >= fmt.n_programs * fmt.rb
    x = rng.standard_normal((n, k)).astype(np.float32)
    y = np.asarray(dgt_spmm(fmt, jnp.asarray(x)))
    ref = spmm_reference(A, x)
    np.testing.assert_allclose(y, ref, rtol=0, atol=1e-4 * np.abs(ref).max())


def test_dgt_with_values_roundtrip():
    A = _coo("uniform", 400, 700, 3000, seed=17)
    fmt = pack_dgt(A, rb=128, g=128, kt=8, keep_perm=True)
    new_vals = np.random.default_rng(5).standard_normal(A.vals.size).astype(np.float32)
    fmt2 = with_values(fmt, new_vals)
    x = np.random.default_rng(6).standard_normal((700, 8)).astype(np.float32)
    y = np.asarray(dgt_spmm(fmt2, jnp.asarray(x)))
    import dataclasses
    A2 = dataclasses.replace(A, vals=new_vals) if hasattr(A, "__dataclass_fields__") else None
    if A2 is None:
        import copy
        A2 = copy.copy(A)
        A2.vals = new_vals
    ref = spmm_reference(A2, x)
    np.testing.assert_allclose(y, ref, rtol=0, atol=1e-4 * np.abs(ref).max())


def test_dgt_padding_reasonable():
    """Tile rounding + residue classes stay near-dense on the headline
    class (length-dealt rows spread classes by construction)."""
    A = power_law_coo(8192, 8192, avg_nnz_per_row=24.0, seed=19)
    fmt = pack_dgt(A, rb=1024, g=512, kt=8, resid=True)
    assert fmt.padding_rate < 1.6, fmt.padding_rate


def test_dgt_walk_native_matches_python():
    """The native ts_dgt_runs walk must reproduce the Python greedy
    bit-for-bit (same format arrays)."""
    from tpusparse import native

    if not native.available():
        pytest.skip("native library unavailable")
    from unittest import mock

    A = _coo("power", 1200, 2500, 9000, seed=31)
    f_native = pack_dgt(A, rb=256, g=256, kt=8, nw=4)
    with mock.patch.object(native, "dgt_runs", lambda *a, **k: None):
        f_python = pack_dgt(A, rb=256, g=256, kt=8, nw=4)
    for name in ("wins", "cols", "lrw", "vals", "nc_p", "slot_of_origrow"):
        got = np.asarray(getattr(f_native, name))
        want = np.asarray(getattr(f_python, name))
        assert np.array_equal(got, want), name


@pytest.mark.parametrize("scatter", ["select", "fullrow"])
@pytest.mark.parametrize("unroll", [1, 8])
def test_dgt_pipe_matches_base(scatter, unroll):
    """The software-pipelined body (build chunk j+1 while dotting chunk j)
    must be bitwise-identical math to the unpipelined loop."""
    A = _coo("power", 900, 1500, 7000, seed=3)
    fmt = pack_dgt(A, rb=256, g=256, kt=8, resid=(scatter == "select"))
    x = np.random.default_rng(4).standard_normal((1500, 8)).astype(np.float32)
    y0 = np.asarray(dgt_spmm(fmt, jnp.asarray(x), unroll=unroll,
                             scatter=scatter, pipe=False))
    y1 = np.asarray(dgt_spmm(fmt, jnp.asarray(x), unroll=unroll,
                             scatter=scatter, pipe=True))
    np.testing.assert_array_equal(y0, y1)
    ref = spmm_reference(A, x)
    np.testing.assert_allclose(y1, ref, rtol=0, atol=1e-4 * np.abs(ref).max())
