"""N:M structured-sparsity MXU kernel (config #4) + batched SpMM."""

import numpy as np
import pytest

from tpusparse.batched import batched_spmm
from tpusparse.io import builder
from tpusparse.kernels.nm_structured import NmFormat, nm_spmm, pack_nm


def _dense_and_x(m=96, n=256, k=24, n_keep=2, group=4, seed=0):
    dense = builder.nm_pruned_dense(m, n, n_keep=n_keep, group=group, seed=seed)
    x = np.random.default_rng(seed + 1).standard_normal((n, k)).astype(np.float32)
    return dense, x


def test_pack_nm_roundtrip():
    dense, _ = _dense_and_x()
    fmt = pack_nm(dense, dtype=np.float32)
    # reconstruct dense from the packed format
    from tpusparse.kernels.nm_structured import unpacked_offs

    vals = np.asarray(fmt.vals, dtype=np.float32)
    offs = unpacked_offs(fmt)  # 2:4 stores both 2-bit offsets in one byte
    assert fmt.packed_bits == 2 and fmt.offs.shape[0] == 1
    m, n = fmt.shape
    g = n // fmt.group
    rec = np.zeros((fmt.m_pad, fmt.g_pad * fmt.group), dtype=np.float32)
    for s in range(fmt.n_keep):
        rows, groups = np.nonzero(vals[s])
        rec[rows, groups * fmt.group + offs[s][rows, groups]] += vals[s][rows, groups]
    np.testing.assert_allclose(rec[:m, :n], dense, rtol=0, atol=0)
    assert rec[m:].sum() == 0 and rec[:, n:].sum() == 0


def test_pack_nm_rejects_violation():
    dense = np.ones((8, 16), np.float32)  # 4 nz per group of 4
    with pytest.raises(ValueError):
        pack_nm(dense, n_keep=2, group=4)


@pytest.mark.parametrize("n_keep,group", [(2, 4), (1, 4), (4, 8)])
def test_nm_spmm_fp32(n_keep, group):
    dense, x = _dense_and_x(n_keep=n_keep, group=group)
    fmt = pack_nm(dense, n_keep=n_keep, group=group, dtype=np.float32)
    y = np.asarray(nm_spmm(fmt, x, precision="fp32"))
    want = dense @ x
    np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-5)


def test_nm_spmm_bf16():
    dense, x = _dense_and_x(m=128, n=512, k=64)
    fmt = pack_nm(dense)
    y = np.asarray(nm_spmm(fmt, x, precision="bf16"))
    want = dense @ x
    err = np.abs(y - want).max() / max(np.abs(want).max(), 1e-30)
    assert err < 1e-2, f"bf16 rel err {err}"


def test_nm_spmm_gchunked():
    # force multiple G-chunks to exercise output revisiting accumulation
    dense, x = _dense_and_x(m=64, n=2048, k=16)
    fmt = pack_nm(dense, dtype=np.float32)
    y = np.asarray(nm_spmm(fmt, x, precision="fp32", gt=128))
    # fp32 summation-order difference over the 2048-wide contraction
    np.testing.assert_allclose(y, dense @ x, rtol=1e-4, atol=1e-3)


def test_nm_spmm_odd_shapes():
    # m not multiple of rb, k not multiple of ktile, groups not multiple of 128
    dense, x = _dense_and_x(m=50, n=4 * 37, k=9)
    fmt = pack_nm(dense, dtype=np.float32)
    y = np.asarray(nm_spmm(fmt, x, precision="fp32"))
    np.testing.assert_allclose(y, dense @ x, rtol=1e-5, atol=1e-5)


def test_batched_spmm_nm():
    dense, _ = _dense_and_x(m=64, n=128, k=8)
    fmt = pack_nm(dense, dtype=np.float32)
    xb = np.random.default_rng(7).standard_normal((3, 128, 8)).astype(np.float32)
    yb = np.asarray(batched_spmm(lambda x: nm_spmm(fmt, x, precision="fp32"), xb))
    want = np.einsum("nk,bkj->bnj", dense, xb)
    np.testing.assert_allclose(yb, want, rtol=1e-5, atol=1e-5)
