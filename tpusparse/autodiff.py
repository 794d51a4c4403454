"""Differentiable SpMM.

No reference counterpart (GeneralSparse has no training story); a TPU-native
framework embedded in JAX pipelines must compose with ``jax.grad``/``vjp``.
For Y = A @ X with A a constant sparse matrix, the X-cotangent is
dX = A^T @ dY — another SpMM with the transpose format.  ``spmm_fn``
builds both plans through the same schedule machinery (independently tuned
shapes: A is [M, N], A^T is [N, M]) and wires them with ``jax.custom_vjp``,
so the backward pass runs a packed TPU kernel instead of XLA's generic
scatter transpose.
"""

from __future__ import annotations

import jax

from tpusparse.io.mtx import CooMatrix


def spmm_fn(mat: CooMatrix, schedule=None, t_schedule=None, *, interpret=None,
            k_hint: int | None = None):
    """Returns a differentiable ``fn(x) -> A @ x``.

    ``schedule`` / ``t_schedule``: optional explicit Schedules for the
    forward (A) and backward (A^T) plans; defaults pick the benched family
    for ``k_hint`` (the expected dense width; plans build before the first
    call, so without a hint the default must be streaming-safe).
    """
    from tpusparse.schedule import build_plan, default_schedule

    if t_schedule is None:
        # mirror an explicit user schedule; default independently (A and A^T
        # have swapped shapes, so the VMEM gate can differ)
        t_schedule = (schedule if schedule is not None
                      else default_schedule(mat.transpose(), k_hint))
    if schedule is None:
        schedule = default_schedule(mat, k_hint)  # VMEM-safe default
    fwd_plan = build_plan(mat, schedule, interpret=interpret)
    bwd_plan = build_plan(mat.transpose().sort_row_major(), t_schedule,
                          interpret=interpret)

    @jax.custom_vjp
    def spmm(x):
        return fwd_plan(x)

    def fwd(x):
        return fwd_plan(x), None

    def bwd(_, dy):
        return (bwd_plan(dy),)

    spmm.defvjp(fwd, bwd)
    return spmm


def _auto_ktile(n: int, k: int, vmem_budget: int) -> int:
    """Largest K-tile whose span-family residency fits ``vmem_budget``:
    the forward/SDDMM X pack is N*2*kt*2 bytes (bf16 hi+lo) and span_dx
    keeps an [N_pad, kt] fp32 output block resident (N*kt*4 bytes)."""
    kt = max(k if k <= 128 else 128, 8)  # sub-8-sublane Mosaic trap floor
    while kt > 8 and n * kt * 4 > vmem_budget:
        kt = max((kt + 1) // 2, 8)  # halving from e.g. 20 must not pass 8
    if n * kt * 4 > vmem_budget:
        raise ValueError(
            f"trainable span residency {n * kt * 4 / 2**20:.1f} MB at kt={kt} "
            f"exceeds the VMEM budget ({vmem_budget / 2**20:.0f} MB); N={n} "
            "is too wide for the resident trainable path — shard the matrix "
            "column-wise (dist/overlap halo ring) or raise vmem_budget at "
            "your own risk")
    return kt


def spmm_trainable(mat: CooMatrix, *, rb: int = 512, ct: int = 512,
                   g: int = 128, precision: str = "fp32x2",
                   interpret=None, k_hint: int | None = None,
                   vmem_budget: int = 4 * 2**20):
    """Trainable-values SpMM: ``fn(v, x) -> A(v) @ x`` differentiable in
    BOTH arguments over a fixed sparsity pattern (pruned-LLM fine-tuning).

    Returns ``(fn, v0)`` where ``v0`` [P, NC, G] float32 is the packed
    value plane (the parameter — hand it to your optimizer) holding
    ``mat.vals``.  Gradients:

      dv = SDDMM(pattern; dY, X)   (kernels/sddmm.span_sddmm, masked)
      dX = A(v)^T @ dY             (kernels/sddmm.span_dx — the transpose
                                    apply over the SAME format, so v never
                                    needs repacking into a transposed layout)

    Checkpoint back to COO order with
    ``kernels.sddmm.packed_to_nz(fmt, v)``; the format is returned as
    ``fn.fmt``.  The K-tile auto-shrinks so the resident X pack and the
    span_dx output block fit ``vmem_budget`` (large N trades K-grid steps
    for residency; see ``_auto_ktile``).
    """
    import jax.numpy as jnp
    import numpy as np

    from tpusparse.kernels import sddmm as _sddmm
    from tpusparse.kernels.span_gather import pack_span, span_spmm

    del k_hint  # ktile follows x at call time, as in span_spmm
    fmt = pack_span(mat, rb=rb, ct=ct, g=g, keep_perm=True)
    mask = jnp.asarray(_sddmm.occupancy_mask(fmt))
    inv_slot = jnp.asarray(_sddmm.origrow_of_slot(fmt))
    v0 = jnp.asarray(fmt.vals, jnp.float32)
    n = mat.shape[1]

    @jax.custom_vjp
    def fn(v, x):
        kt = _auto_ktile(n, x.shape[1], vmem_budget)
        return span_spmm(fmt, x, ktile=kt, precision=precision,
                         interpret=interpret, vals=v * mask)

    def fwd(v, x):
        return fn(v, x), (v, x)

    def bwd(res, dy):
        v, x = res
        kt = _auto_ktile(n, x.shape[1], vmem_budget)
        # dY rows into slot order once; both grad kernels consume slots
        dy_slots = jnp.take(dy, inv_slot, axis=0, mode="fill", fill_value=0)
        dv = _sddmm.span_sddmm(fmt, dy_slots, x, ktile=kt,
                               precision=precision, interpret=interpret) * mask
        dx = _sddmm.span_dx(fmt, v * mask, dy_slots, ktile=kt,
                            precision=precision, interpret=interpret)
        return dv, dx

    fn.defvjp(fwd, bwd)
    fn.fmt = fmt
    return fn, v0
