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
