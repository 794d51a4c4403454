"""Block-ELL (BSR) MXU dense-tile kernel."""

import numpy as np
import pytest

from tpusparse.io import builder
from tpusparse.kernels.block_ell import block_ell_spmm, pack_block_ell


def _case(m=384, n=512, bs=128, density=0.2, k=32, seed=0):
    mat = builder.block_sparse_coo(m, n, block=bs, block_density=density, seed=seed)
    x = np.random.default_rng(seed + 1).standard_normal((n, k)).astype(np.float32)
    return mat, x


def test_pack_block_ell_roundtrip():
    mat, _ = _case()
    fmt = pack_block_ell(mat, bs=128)
    dense = mat.to_dense(np.float32)
    rec = np.zeros((fmt.mb * fmt.bs, ((mat.shape[1] + fmt.bs - 1) // fmt.bs) * fmt.bs), np.float32)
    blkcol = np.asarray(fmt.blkcol)
    blkvals = np.asarray(fmt.blkvals, dtype=np.float32)
    for i in range(fmt.mb):
        for j in range(fmt.bmax):
            rec[i * fmt.bs:(i + 1) * fmt.bs,
                blkcol[i, j] * fmt.bs:(blkcol[i, j] + 1) * fmt.bs] += blkvals[i, j]
    np.testing.assert_allclose(rec[:mat.shape[0], :mat.shape[1]], dense)


@pytest.mark.parametrize("bs", [128, 64])
def test_block_ell_spmm_fp32(bs):
    mat, x = _case(bs=bs if bs == 128 else 128)  # pattern blocks 128; pack blocks bs
    fmt = pack_block_ell(mat, bs=bs)
    y = np.asarray(block_ell_spmm(fmt, x, precision="fp32"))
    want = mat.to_dense(np.float64) @ x.astype(np.float64)
    np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-3)


def test_block_ell_spmm_bf16():
    mat, x = _case(k=200)
    fmt = pack_block_ell(mat, bs=128, dtype="bfloat16")
    y = np.asarray(block_ell_spmm(fmt, x, precision="bf16"))
    want = mat.to_dense(np.float64) @ x.astype(np.float64)
    err = np.abs(y - want).max() / max(np.abs(want).max(), 1e-30)
    assert err < 1e-2, f"bf16 rel err {err}"


def test_block_ell_odd_shapes():
    # m, n not multiples of bs; k not multiple of ktile
    mat, _ = _case(m=300, n=450, k=8)
    x = np.random.default_rng(3).standard_normal((450, 8)).astype(np.float32)
    fmt = pack_block_ell(mat, bs=128)
    y = np.asarray(block_ell_spmm(fmt, x, precision="fp32"))
    want = mat.to_dense(np.float64) @ x.astype(np.float64)
    np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-3)


def test_block_ell_empty_rowblocks():
    # a matrix with an entirely empty row-block region
    mat, x = _case(m=512, density=0.08, seed=5)
    fmt = pack_block_ell(mat, bs=128)
    y = np.asarray(block_ell_spmm(fmt, x, precision="fp32"))
    want = mat.to_dense(np.float64) @ x.astype(np.float64)
    np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("method", ["xla", "pallas"])
def test_block_ell_methods_agree(method):
    mat, x = _case(m=384, n=512, k=24, seed=9)
    fmt = pack_block_ell(mat, bs=128)
    y = np.asarray(block_ell_spmm(fmt, x, precision="fp32", method=method))
    want = mat.to_dense(np.float64) @ x.astype(np.float64)
    np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-3)


def test_block_ell_int8_arithmetic_exact():
    # the int8 . int8 -> int32 einsum itself is exact: the kernel result
    # must equal a float64 recomputation from the DEQUANTIZED planes
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    mat, _ = _case(seed=3)
    x = rng.standard_normal((mat.shape[1], 16)).astype(np.float32)
    fmt = pack_block_ell(mat, bs=128, dtype=jnp.int8)
    assert np.asarray(fmt.blkvals).dtype == np.int8
    y = np.asarray(block_ell_spmm(fmt, x))

    # dequantized A (float64, no further rounding)
    q = np.asarray(fmt.blkvals, np.float64)
    rs = np.asarray(fmt.row_scale, np.float64)
    blkcol = np.asarray(fmt.blkcol)
    nbc = (mat.shape[1] + fmt.bs - 1) // fmt.bs
    a_deq = np.zeros((fmt.mb * fmt.bs, nbc * fmt.bs))
    for i in range(fmt.mb):
        for j in range(fmt.bmax):
            a_deq[i * fmt.bs:(i + 1) * fmt.bs,
                  blkcol[i, j] * fmt.bs:(blkcol[i, j] + 1) * fmt.bs] += (
                q[i, j] * rs[i][:, None])
    # dequantized X with the kernel's per-column scale
    xa = np.abs(x).max(axis=0)
    xs = np.where(xa > 0, xa / 127.0, 1.0).astype(np.float64)
    xq = np.clip(np.rint(x / xs), -127, 127)
    want = a_deq[:mat.shape[0]] @ (xq * xs)
    np.testing.assert_allclose(y, want, rtol=1e-6, atol=1e-5)


def test_block_ell_int8_accuracy_real_values():
    import jax.numpy as jnp

    mat, x = _case(k=64, seed=4)
    fmt = pack_block_ell(mat, bs=128, dtype=jnp.int8)
    y = np.asarray(block_ell_spmm(fmt, x, precision="int8"))
    want = mat.to_dense(np.float64) @ x.astype(np.float64)
    # two int8 quantizations: ~2/127 relative error class per term; compare
    # against the row-sum-of-|terms| scale like the bf16 condition bound
    scale = np.abs(mat.to_dense(np.float64)) @ np.abs(x.astype(np.float64))
    err = (np.abs(y - want) / np.maximum(scale, 1e-30)).max()
    assert err < 4e-2, f"int8 rel-to-condition err {err}"
    # memory: int8 plane is 1/4 the fp32 plane
    f32 = pack_block_ell(mat, bs=128)
    assert np.asarray(fmt.blkvals).nbytes * 4 == np.asarray(f32.blkvals).nbytes


def test_block_ell_int8_layer():
    from tpusparse.nn import SparseLinear

    mat, x = _case(k=8, seed=5)
    layer = SparseLinear.from_block(mat, bs=128, precision="int8")
    y = np.asarray(layer(x.T))
    want = (mat.to_dense(np.float64) @ x.astype(np.float64)).T
    scale = (np.abs(mat.to_dense(np.float64)) @ np.abs(x.astype(np.float64))).T
    err = (np.abs(y - want) / np.maximum(scale, 1e-30)).max()
    assert err < 4e-2, f"int8 layer err {err}"


def test_block_ell_int8_precision_guard():
    mat, x = _case(k=8, seed=6)
    fmt = pack_block_ell(mat, bs=128)  # float format
    with pytest.raises(AssertionError, match="int8-packed"):
        block_ell_spmm(fmt, x, precision="int8")
