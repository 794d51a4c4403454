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


def test_nm_int8_w8a16_accuracy():
    import jax.numpy as jnp

    dense, x = _dense_and_x(k=40, seed=7)
    fmt = pack_nm(dense, dtype=jnp.int8)
    assert np.asarray(fmt.vals).dtype == np.int8
    assert fmt.row_scale is not None
    y = np.asarray(nm_spmm(fmt, x, precision="int8"))
    want = dense.astype(np.float64) @ x.astype(np.float64)
    # single (weight-only) int8 quantization + bf16 activation rounding:
    # compare against the row condition scale like the bf16 bound
    scale = np.abs(dense.astype(np.float64)) @ np.abs(x.astype(np.float64))
    err = (np.abs(y - want) / np.maximum(scale, 1e-30)).max()
    assert err < 2e-2, f"W8A16 rel-to-condition err {err}"
    # capacity: 2x1B vals + 1B packed offs per 4 cols = 0.375x dense bf16
    # (compare at the PADDED size; this tiny case pads rows 96->256)
    padded_dense_bf16 = fmt.m_pad * fmt.g_pad * fmt.group * 2
    assert fmt.memory_bytes == 0.375 * padded_dense_bf16


def test_nm_int8_layer_and_guards():
    import jax.numpy as jnp

    from tpusparse.nn import SparseLinear

    dense, x = _dense_and_x(k=8, seed=8)
    layer = SparseLinear.from_nm(dense, precision="int8")
    y = np.asarray(layer(x.T))
    want = (dense.astype(np.float64) @ x.astype(np.float64)).T
    scale = (np.abs(dense.astype(np.float64)) @ np.abs(x.astype(np.float64))).T
    err = (np.abs(y - want) / np.maximum(scale, 1e-30)).max()
    assert err < 2e-2, f"int8 layer err {err}"
    # float-packed format rejects precision='int8'
    fmt = pack_nm(dense)
    with pytest.raises(AssertionError, match="int8-packed"):
        nm_spmm(fmt, x, precision="int8")
    # int8-packed format rejects fp32 activations
    fmt8 = pack_nm(dense, dtype=jnp.int8)
    with pytest.raises(AssertionError, match="W8A16"):
        nm_spmm(fmt8, x, precision="fp32")
