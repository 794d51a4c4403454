"""block_ell — block-sparse (BSR/ELL) SpMM on the MXU dense-tile path.

Workload: matrices whose nonzeros cluster in dense BSxBS blocks (MegaBlocks /
block-pruned weights; builder.block_sparse_coo).  BASELINE.json config #4
mandates an MXU dense-tile path; this kernel is its block-sparse half
(nm_structured.py is the N:M half).

Format (ELL over blocks; MB row-blocks, BMAX block slots per row-block):
  blkcol  [MB, BMAX]         int32   block-column of each slot (0 if padded)
  blkvals [MB, BMAX, BS, BS] bf16/f32  dense block values (0 if padded)

Kernel: grid = (MB, K-tiles, BMAX) with ``blkcol`` as a *scalar-prefetch*
operand — the X BlockSpec's index_map reads it, so the Pallas pipeline
DMAs exactly the needed (BS, ktile) X tile per step, double-buffered.
Each step is one dense MXU dot accumulated fp32 into the revisited output
block.  This is the TPU-native equivalent of the reference's
fixed-interval col+row blocking producing dense sub-tiles (SURVEY §2.3),
with the pipeline replacing hand-written gather loops.

Reference counterpart for the hierarchy mapping: BMTB = grid row-block,
BMW/BMT = the MXU tile itself (no warp concept on TPU).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusparse.io.mtx import CooMatrix
from tpusparse.kernels.common import cdiv, kernel_backend_interpret, pad_dense_rows, round_up

PRECISIONS = ("bf16", "fp32", "int8")


@dataclasses.dataclass
class BlockEllFormat:
    blkcol: Any   # [MB, BMAX] int32
    blkvals: Any  # [MB, BMAX, BS, BS]  (int8 when row_scale is set)
    shape: tuple[int, int]
    bs: int
    n_blocks: int  # real (non-padding) blocks
    # int8 weight quantization: per-output-row symmetric scale so the
    # rescale commutes with the slot (j) sum — y = idot * row_scale[i,a]
    # * x_scale[k].  None for float storage.
    row_scale: Any = None  # [MB, BS] f32

    @property
    def mb(self) -> int:
        return self.blkcol.shape[0]

    @property
    def bmax(self) -> int:
        return self.blkcol.shape[1]

    @property
    def padding_rate(self) -> float:
        return (self.mb * self.bmax) / max(self.n_blocks, 1)

    @property
    def memory_bytes(self) -> int:
        return sum(np.asarray(a).nbytes for a in (self.blkcol, self.blkvals))


def pack_block_ell(mat: CooMatrix, *, bs: int = 128, dtype=jnp.float32) -> BlockEllFormat:
    """Pack a COO matrix into BlockEllFormat.  Efficient when nonzeros
    cluster into BSxBS blocks; the padding_rate property reports slot waste
    and block density should be checked by the caller/tuner.

    ``dtype=jnp.int8`` stores weights symmetric-quantized per OUTPUT ROW
    (scale_a = max|A[a, :]| / 127, kept in ``row_scale``): 0.25x the fp32
    HBM bytes, and the int8 . int8 -> int32 product runs the MXU's int8
    path (2x bf16 peak on v5e)."""
    m, n = mat.shape
    mb = cdiv(max(m, 1), bs)
    rows = np.asarray(mat.rows)
    cols = np.asarray(mat.cols)
    vals = np.asarray(mat.vals)
    br = rows // bs
    bc = cols // bs
    nb_cols = cdiv(max(n, 1), bs)
    blk_id = br * nb_cols + bc
    order = np.argsort(blk_id, kind="stable")
    blk_sorted = blk_id[order]
    uniq, starts = np.unique(blk_sorted, return_index=True)
    n_blocks = uniq.size
    # dense block storage
    dense_blocks = np.zeros((max(n_blocks, 1), bs, bs), dtype=np.float32)
    blk_of_nz = np.searchsorted(uniq, blk_sorted)
    r_in = (rows[order] % bs).astype(np.int64)
    c_in = (cols[order] % bs).astype(np.int64)
    np.add.at(dense_blocks, (blk_of_nz, r_in, c_in), vals[order].astype(np.float32))
    # ELL slots per row-block
    u_br = (uniq // nb_cols).astype(np.int64)
    u_bc = (uniq % nb_cols).astype(np.int64)
    counts = np.bincount(u_br, minlength=mb)
    bmax = max(int(counts.max(initial=0)), 1)
    blkcol = np.zeros((mb, bmax), dtype=np.int32)
    blkvals = np.zeros((mb, bmax, bs, bs), dtype=np.float32)
    slot = np.zeros(mb, dtype=np.int64)
    for i in range(n_blocks):
        rbl = u_br[i]
        s = slot[rbl]
        blkcol[rbl, s] = u_bc[i]
        blkvals[rbl, s] = dense_blocks[i]
        slot[rbl] = s + 1
    if dtype == jnp.int8:
        # per-output-row symmetric scale over every block the row touches
        row_amax = np.abs(blkvals).max(axis=(1, 3))          # [MB, BS]
        row_scale = np.where(row_amax > 0, row_amax / 127.0, 1.0)
        q = np.clip(np.rint(blkvals / row_scale[:, None, :, None]),
                    -127, 127).astype(np.int8)
        return BlockEllFormat(
            blkcol=jnp.asarray(blkcol),
            blkvals=jnp.asarray(q),
            shape=(m, n),
            bs=bs,
            n_blocks=n_blocks,
            row_scale=jnp.asarray(row_scale, dtype=jnp.float32),
        )
    return BlockEllFormat(
        blkcol=jnp.asarray(blkcol),
        blkvals=jnp.asarray(blkvals, dtype=dtype),
        shape=(m, n),
        bs=bs,
        n_blocks=n_blocks,
    )


def _bell_kernel(bc_ref, v_ref, x_ref, y_ref, *, mode):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    a = v_ref[0, 0]
    x = x_ref[...]
    if mode == "fp32":
        y_ref[...] += jnp.dot(
            a.astype(jnp.float32), x.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        y_ref[...] += jnp.dot(
            a.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )


@functools.partial(jax.jit, static_argnames=("bs", "ktile", "mode", "interpret"))
def _bell_call(blkcol, blkvals, x, *, bs, ktile, mode, interpret):
    mb, bmax = blkcol.shape
    k_pad = x.shape[1]
    grid = (mb, k_pad // ktile, bmax)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bs, bs), lambda i, t, j, bc: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, ktile), lambda i, t, j, bc: (bc[i, j], t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bs, ktile), lambda i, t, j, bc: (i, t),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_bell_kernel, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mb * bs, k_pad), jnp.float32),
        interpret=interpret,
    )(blkcol, blkvals, x)


@functools.partial(jax.jit, static_argnames=("bs", "mode"))
def _bell_xla(blkcol, blkvals, x, *, bs, mode):
    """XLA batched-matmul formulation: gather the needed X tiles and run one
    einsum over [MB, BMAX] blocks.  XLA's batched-matmul pipeline runs these
    (BS, BS) x (BS, K) products ~3x faster than per-block Pallas dots on
    v5e, which is what lets block sparsity actually beat the dense matmul
    (measured 33 us vs 43 us dense at 4096^2, 15% blocks, K=256)."""
    dt = jnp.float32 if mode == "fp32" else jnp.bfloat16
    prec = (jax.lax.Precision.HIGHEST if mode == "fp32"
            else jax.lax.Precision.DEFAULT)
    xb = x.reshape(-1, bs, x.shape[1]).astype(dt)        # [NB, BS, K]
    gx = jnp.take(xb, blkcol, axis=0)                    # [MB, BMAX, BS, K]
    y = jnp.einsum("ijab,ijbk->iak", blkvals.astype(dt), gx,
                   preferred_element_type=jnp.float32, precision=prec)
    return y.reshape(-1, x.shape[1])


@functools.partial(jax.jit, static_argnames=("bs",))
def _bell_xla_int8(blkcol, blkvals, row_scale, x, *, bs):
    """int8 batched-matmul: activations quantized per COLUMN on the fly
    (x_scale[k] = max|x[:, k]| / 127), weights pre-quantized per output row
    (pack_block_ell dtype=int8).  The int8 . int8 -> int32 einsum runs the
    MXU's int8 path; both scale vectors commute with the block (j) sum, so
    dequantization is one rank-1 rescale of the int32 result."""
    x_amax = jnp.abs(x).max(axis=0)                        # [K]
    x_scale = jnp.where(x_amax > 0, x_amax / 127.0, 1.0)
    xq = jnp.clip(jnp.rint(x / x_scale), -127, 127).astype(jnp.int8)
    xb = xq.reshape(-1, bs, x.shape[1])                    # [NB, BS, K]
    gx = jnp.take(xb, blkcol, axis=0)                      # [MB, BMAX, BS, K]
    idot = jnp.einsum("ijab,ijbk->iak", blkvals, gx,
                      preferred_element_type=jnp.int32)
    y = idot.astype(jnp.float32) * row_scale[:, :, None] * x_scale[None, None, :]
    return y.reshape(-1, x.shape[1])


def block_ell_spmm(
    fmt: BlockEllFormat,
    x: jnp.ndarray,
    *,
    ktile: int | None = None,
    precision: str = "bf16",
    interpret: bool | None = None,
    method: str = "xla",
) -> jnp.ndarray:
    """Y[M, K] = A . X[N, K] with A in BlockEllFormat.

    ``method='xla'`` (default) uses the batched-einsum formulation;
    ``'pallas'`` keeps the scalar-prefetch streaming kernel (useful when the
    gathered [MB, BMAX, BS, K] intermediate would not fit).  int8 formats
    (``pack_block_ell(dtype=jnp.int8)``) run the quantized einsum path
    regardless of ``precision``/``method``."""
    assert precision in PRECISIONS, precision
    if interpret is None:
        interpret = kernel_backend_interpret()
    m, n = fmt.shape
    k = x.shape[1]
    assert x.shape[0] == n, f"X rows {x.shape[0]} != A cols {n}"
    nb_cols = cdiv(max(n, 1), fmt.bs)
    if fmt.row_scale is not None:
        x = pad_dense_rows(jnp.asarray(x, jnp.float32), nb_cols * fmt.bs)
        y = _bell_xla_int8(fmt.blkcol, fmt.blkvals, fmt.row_scale, x,
                           bs=fmt.bs)
        return y[:m, :k]
    assert precision != "int8", (
        "precision='int8' needs an int8-packed format: "
        "pack_block_ell(dtype=jnp.int8)")
    if method == "xla":
        x = pad_dense_rows(x.astype(jnp.float32), nb_cols * fmt.bs)
        y = _bell_xla(fmt.blkcol, fmt.blkvals, x, bs=fmt.bs, mode=precision)
        return y[:m, :k]
    if ktile is None:
        ktile = min(round_up(k, 128), 512)
    if k % ktile:
        x = jnp.pad(x, ((0, 0), (0, ktile - k % ktile)))
    x = pad_dense_rows(x.astype(jnp.float32), nb_cols * fmt.bs)
    y = _bell_call(fmt.blkcol, fmt.blkvals, x,
                   bs=fmt.bs, ktile=ktile, mode=precision, interpret=interpret)
    return y[:m, :k]
