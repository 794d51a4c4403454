"""nm_structured — N:M structured-sparsity SpMM on the MXU (config #4).

Workload: weight matrices pruned so that every contiguous group of M columns
keeps at most N values (canonically 2:4).  The reference has no structured
path — its unstructured machinery would spend an index per nz — but the
north star (BASELINE.json config #4) mandates an MXU dense-tile path.

TPU-native design.  The TPU MXU has no sparse-tensor-core analogue, so the
win is *memory*, not FLOPs: SpMM at moderate K is weight-bandwidth bound, and
N:M lets us read A compactly.

Storage (slot-major; G = n_cols/group groups, S = n_keep slots):
  vals [S, M, G]  value of the s-th kept element of each group (0 if fewer)
  offs [1, M, G]  ALL slots' in-group offsets bit-packed into one int8
                  plane (slot s occupies bits [s*b, (s+1)*b), b =
                  ceil(log2(group))) whenever S*b <= 8 — the kernel
                  unpacks with int32 shifts, no lane relayout; the
                  unpacked [S, M, G] int8 layout remains as a fallback
                  for wider structures (flagged by packed_bits = 0)

HBM traffic for A at 2:4: S·M·G·2 (bf16) + M·G·1 (packed offsets) bytes
= 0.625x dense-bf16 (round 1 stored one int8 per slot: 0.75x).  FLOPs
equal dense.

Kernel (grid = rows x K-tiles x G-chunks):
  for o in range(group):                                # static unroll
      contrib_o[RB, GT] = sum_s vals[s] * (offs[s] == o)      (VPU)
      acc += contrib_o @ X[o::group][gchunk]                  (MXU)
X is pre-reshaped to [G, group, K] outside the kernel so the o-th strided
view is a static middle-axis slice.

Every contraction is a dense [RB, GT] x [GT, kt] MXU dot — the "dense-tile
path" — and accumulation is fp32 in VMEM across the G-chunk grid axis.
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

from tpusparse.kernels.common import cdiv, kernel_backend_interpret, round_up

PRECISIONS = ("bf16", "fp32")


@dataclasses.dataclass
class NmFormat:
    """Packed N:M structured weight (see module docstring for layout)."""

    vals: Any  # [S, M_pad, G_pad] bf16/f32 (int8 when row_scale is set)
    offs: Any  # [1, M_pad, G_pad] int8 bit-packed, or [S, ...] unpacked
    shape: tuple[int, int]  # original (M, n_cols)
    n_keep: int
    group: int
    packed_bits: int = 0  # bits per slot offset when bit-packed, else 0
    # weight-only int8 (W8A16): per-output-row symmetric scale; the kernel
    # dots the quantized integers (exact in bf16: |q| <= 127 < 2^8) against
    # UNquantized bf16 activations and the rescale happens once per row
    # after the kernel.  2:4 storage: 2x1B vals + 1B offs per 4 cols =
    # 0.375x dense-bf16 HBM bytes (bf16 vals: 0.625x).
    row_scale: Any = None  # [M_pad] f32

    @property
    def m_pad(self) -> int:
        return self.vals.shape[1]

    @property
    def g_pad(self) -> int:
        return self.vals.shape[2]

    @property
    def memory_bytes(self) -> int:
        return sum(np.asarray(a).nbytes for a in (self.vals, self.offs))

    @property
    def nnz(self) -> int:
        return int(np.count_nonzero(np.asarray(self.vals)))


def pack_nm(
    dense: np.ndarray,
    *,
    n_keep: int = 2,
    group: int = 4,
    rb: int = 256,
    dtype=jnp.bfloat16,
) -> NmFormat:
    """Pack a dense [M, n_cols] N:M-structured matrix (at most ``n_keep``
    nonzeros per ``group`` consecutive columns).  Raises if the structure is
    violated.  Rows are padded to a multiple of ``rb``, groups to a multiple
    of 128 (lane width)."""
    dense = np.asarray(dense)
    m, n_cols = dense.shape
    assert n_cols % group == 0, f"n_cols {n_cols} not a multiple of group {group}"
    g = n_cols // group
    wg = dense.reshape(m, g, group)
    nz = wg != 0
    counts = nz.sum(axis=2)
    if int(counts.max(initial=0)) > n_keep:
        bad = int((counts > n_keep).sum())
        raise ValueError(
            f"{bad} groups exceed {n_keep}:{group} structure (max {int(counts.max())})"
        )
    # stable in-group order: offset ascending; argsort pushes zeros last
    order = np.argsort(~nz, axis=2, kind="stable")[:, :, :n_keep]  # [M, G, S]
    svals = np.take_along_axis(wg, order, axis=2)  # [M, G, S]
    soffs = order.astype(np.int8)
    valid = np.take_along_axis(nz, order, axis=2)
    svals = np.where(valid, svals, 0.0)
    soffs = np.where(valid, soffs, 0).astype(np.int8)

    m_pad = round_up(max(m, 8), rb)
    g_pad = round_up(max(g, 128), 128)
    out_v = np.zeros((n_keep, m_pad, g_pad), dtype=np.float32)
    out_o = np.zeros((n_keep, m_pad, g_pad), dtype=np.int8)
    out_v[:, :m, :g] = np.moveaxis(svals, 2, 0)
    out_o[:, :m, :g] = np.moveaxis(soffs, 2, 0)
    row_scale = None
    if dtype == jnp.int8:
        # weight-only quantization, symmetric per output row
        row_amax = np.abs(out_v).max(axis=(0, 2))            # [M_pad]
        rs = np.where(row_amax > 0, row_amax / 127.0, 1.0)
        out_v = np.clip(np.rint(out_v / rs[None, :, None]),
                        -127, 127).astype(np.int8)
        row_scale = jnp.asarray(rs, dtype=jnp.float32)
        dtype = jnp.int8
    # bit-pack all slots' offsets into one int8 plane when they fit (2:4
    # needs 2 slots x 2 bits) — halves the index bytes with no relayout
    bits = max(int(np.ceil(np.log2(max(group, 2)))), 1)
    if n_keep * bits <= 8:
        packed = np.zeros((1, m_pad, g_pad), dtype=np.uint8)
        for s in range(n_keep):
            packed[0] |= (out_o[s].astype(np.uint8) << (s * bits))
        return NmFormat(
            vals=jnp.asarray(out_v, dtype=dtype),
            offs=jnp.asarray(packed.view(np.int8)),
            shape=(m, n_cols),
            n_keep=n_keep,
            group=group,
            packed_bits=bits,
            row_scale=row_scale,
        )
    return NmFormat(
        vals=jnp.asarray(out_v, dtype=dtype),
        offs=jnp.asarray(out_o),
        shape=(m, n_cols),
        n_keep=n_keep,
        group=group,
        row_scale=row_scale,
    )


def _nm_kernel(vals_ref, offs_ref, x_ref, y_ref, *, n_keep, group, mode,
               packed_bits):
    gi = pl.program_id(2)

    @pl.when(gi == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    f32 = jnp.float32
    if packed_bits:
        # int8 stays the HBM storage type; unpack with int32 shifts (Mosaic
        # v5e lacks int8 vector compares/shifts, int32 bitwise is fine)
        w = offs_ref[0].astype(jnp.int32)
        mask = (1 << packed_bits) - 1
        slot_offs = [(w >> (s * packed_bits)) & mask for s in range(n_keep)]
    else:
        slot_offs = [offs_ref[s].astype(jnp.int32) for s in range(n_keep)]
    acc = y_ref[...]
    for o in range(group):
        contrib = None
        for s in range(n_keep):
            v = vals_ref[s].astype(f32)
            hit = jnp.where(slot_offs[s] == o, v, 0.0)
            contrib = hit if contrib is None else contrib + hit
        xo = x_ref[:, o, :]
        if mode == "fp32":
            acc = acc + jax.lax.dot_general(
                contrib, xo.astype(f32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            acc = acc + jax.lax.dot_general(
                contrib.astype(jnp.bfloat16), xo,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
    y_ref[...] = acc


@functools.partial(
    jax.jit,
    static_argnames=("n_keep", "group", "rb", "gt", "ktile", "mode",
                     "packed_bits", "interpret"),
)
def _nm_call(vals, offs, xg, *, n_keep, group, rb, gt, ktile, mode,
             packed_bits, interpret):
    s, m_pad, g_pad = vals.shape
    so = offs.shape[0]  # 1 when bit-packed
    k_pad = xg.shape[2]
    grid = (m_pad // rb, k_pad // ktile, g_pad // gt)
    kernel = functools.partial(_nm_kernel, n_keep=n_keep, group=group,
                               mode=mode, packed_bits=packed_bits)
    xdtype = jnp.float32 if mode == "fp32" else jnp.bfloat16
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((m_pad, k_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec((s, rb, gt), lambda i, t, gi: (0, i, gi), memory_space=pltpu.VMEM),
            pl.BlockSpec((so, rb, gt), lambda i, t, gi: (0, i, gi), memory_space=pltpu.VMEM),
            pl.BlockSpec((gt, group, ktile), lambda i, t, gi: (gi, 0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, ktile), lambda i, t, gi: (i, t), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(vals, offs, xg.astype(xdtype))


def nm_spmm(
    fmt: NmFormat,
    x: jnp.ndarray,
    *,
    rb: int = 256,
    gt: int | None = None,
    ktile: int | None = None,
    precision: str = "bf16",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Y[M, K] = A . X[n_cols, K] with A in NmFormat.

    int8-packed formats (``pack_nm(dtype=jnp.int8)``) run W8A16: the kernel
    dots the quantized integers (exact in bf16) against bf16 activations
    and the per-row dequantization scale is applied once to the result."""
    if fmt.row_scale is not None:
        assert precision in ("bf16", "int8"), (
            "int8-packed N:M weights dot in bf16 (W8A16); fp32 activations "
            "are not supported on this path")
        precision = "bf16"
    else:
        assert precision != "int8", (
            "precision='int8' needs an int8-packed format: "
            "pack_nm(dtype=jnp.int8)")
    assert precision in PRECISIONS, precision
    if interpret is None:
        interpret = kernel_backend_interpret()
    m, n_cols = fmt.shape
    k = x.shape[1]
    assert x.shape[0] == n_cols, f"X rows {x.shape[0]} != A cols {n_cols}"
    if ktile is None:
        ktile = k if k <= 128 else 128
    ktile = min(round_up(ktile, 128), round_up(k, 128))
    if k % ktile:
        x = jnp.pad(x, ((0, 0), (0, ktile - k % ktile)))
    g = n_cols // fmt.group
    g_pad = fmt.g_pad
    # reshape X to [G_pad, group, K]: the o-th strided view is xg[:, o, :]
    xg = x.reshape(g, fmt.group, x.shape[1])
    if g_pad != g:
        xg = jnp.pad(xg, ((0, g_pad - g), (0, 0), (0, 0)))
    if gt is None:
        gt = g_pad if g_pad <= 2048 else 2048
    while g_pad % gt:
        gt //= 2
    rb = min(rb, fmt.m_pad)
    while fmt.m_pad % rb:
        rb //= 2
    y = _nm_call(
        fmt.vals, fmt.offs, xg,
        n_keep=fmt.n_keep, group=fmt.group,
        rb=rb, gt=gt, ktile=ktile, mode=precision,
        packed_bits=fmt.packed_bits, interpret=interpret,
    )
    if fmt.row_scale is not None:
        y = y * fmt.row_scale[:, None]
    return y[:m, :k]


def unpacked_offs(fmt: NmFormat) -> np.ndarray:
    """[S, M_pad, G_pad] int8 offsets, decoding the bit-packed plane."""
    offs = np.asarray(fmt.offs)
    if not fmt.packed_bits:
        return offs
    w = offs[0].view(np.uint8).astype(np.int32)
    mask = (1 << fmt.packed_bits) - 1
    return np.stack([((w >> (s * fmt.packed_bits)) & mask).astype(np.int8)
                     for s in range(fmt.n_keep)])
