"""Multi-chip / multi-host SpMM (no reference counterpart; spec from
BASELINE.json north star).

Strategy (SURVEY §2.6): row-partition A across devices — here, partition the
row-aligned *stripes* of StripeFormat, which are already nnz-balanced by the
merge-path transform, so device loads balance — replicate or K-shard the
dense X, and let each device produce its own stripe-slot rows.  The final
slot-gather (output recovery) runs under GSPMD, which inserts the all-gather
over ICI; X K-sharding adds a tensor-parallel axis with no communication on
the contraction (each K shard is independent).

The mesh is 2D: ('rows', 'k').  'rows' is the data-parallel-like axis
(scaling nnz/s); 'k' shards the dense operand's columns.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpusparse.format import StripeFormat
from tpusparse.kernels.common import kernel_backend_interpret


def make_mesh(n_row: int, n_k: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= n_row * n_k, (
        f"need {n_row * n_k} devices, have {len(devices)}"
    )
    dev = np.asarray(devices[: n_row * n_k]).reshape(n_row, n_k)
    return Mesh(dev, ("rows", "k"))


def shard_stripe_format(fmt: StripeFormat, n_row: int) -> StripeFormat:
    """Pad the stripe count to a multiple of the row-axis size (padding
    stripes are all-zero: val=0, col=0, lrow=0 — they contribute nothing)."""
    p = fmt.n_stripes
    target = -(-p // n_row) * n_row
    if target == p:
        return fmt
    padp = target - p
    c = fmt.stripe_nnz

    def padarr(a, fill=0):
        a = np.asarray(a)
        pad = np.full((padp,) + a.shape[1:], fill, dtype=a.dtype)
        return np.concatenate([a, pad], axis=0)

    return dataclasses.replace(
        fmt,
        cols=padarr(fmt.cols),
        lrow=padarr(fmt.lrow),
        vals=padarr(fmt.vals),
        n_stripes=target,
    )


def build_sharded_stripe_spmm(
    fmt: StripeFormat,
    mesh: Mesh,
    *,
    ktile: int | None = None,
    unroll: int = 8,
    interpret: bool | None = None,
):
    """Returns (fn, put_inputs): ``fn(cols, lrow, vals, slot, x) -> Y`` jitted
    over the mesh; ``put_inputs(x)`` device_puts the format + X with the right
    shardings."""
    from tpusparse.kernels.stripe_gather import _stripe_call

    if interpret is None:
        interpret = kernel_backend_interpret()
    n_row = mesh.shape["rows"]
    n_k = mesh.shape["k"]
    fmt = shard_stripe_format(fmt, n_row)
    p_local = fmt.n_stripes // n_row
    rb = fmt.max_rows_per_stripe
    c = fmt.stripe_nnz

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("rows", None, None), P("rows", None, None), P("rows", None, None), P(None, "k")),
        out_specs=P("rows", "k"),
        check_vma=False,  # pallas_call out_shape carries no vma info
    )
    def sharded_kernel(cols, lrow, vals, x):
        if ktile is None:
            kt = x.shape[1] if x.shape[1] <= 128 else 128
        else:
            kt = ktile
        assert x.shape[1] % kt == 0, "local K must divide ktile under k-sharding"
        u = unroll if c % unroll == 0 else 1
        return _stripe_call(
            cols, lrow, vals, x,
            n_stripes=p_local, stripe_nnz=c, rb=rb,
            ktile=kt, unroll=u, interpret=interpret,
        )

    @jax.jit
    def fn(cols, lrow, vals, slot, x):
        y_slots = sharded_kernel(cols, lrow, vals, x)
        oob = y_slots.shape[0]
        slot = jnp.where(slot < 0, oob, slot)
        # GSPMD turns this gather over row-sharded slots into the ICI
        # all-gather of the north star's "overlapped halo exchange".
        return jnp.take(y_slots, slot, axis=0, mode="fill", fill_value=0)

    def put_inputs(x):
        row_sharded = NamedSharding(mesh, P("rows", None, None))
        repl = NamedSharding(mesh, P())
        xsh = NamedSharding(mesh, P(None, "k"))
        return (
            jax.device_put(jnp.asarray(fmt.cols), row_sharded),
            jax.device_put(jnp.asarray(fmt.lrow), row_sharded),
            jax.device_put(jnp.asarray(fmt.vals), row_sharded),
            jax.device_put(jnp.asarray(fmt.slot_of_origrow), repl),
            jax.device_put(x, xsh),
        )

    return fn, put_inputs
