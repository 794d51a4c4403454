"""Multi-device scaling regression harness (BASELINE.json config #5:
">= 80% nnz/s scaling efficiency at 1 chip -> 1 host -> N hosts").

Runs the ring-overlapped halo SpMM at device counts 1, 2, 4, ... over
whatever mesh is available.  On real chips (a pod slice) the reported
ratio is a scaling efficiency; on VIRTUAL CPU devices (CI here — one
physical chip in this environment) it is interpreter WALL-CLOCK only, so
the field is named ``wallclock_ratio_cpu_interpret_NOT_PERF`` on CPU
backends (VERDICT r4 weak #7: a perf-shaped field name in a committed
JSON invites quoting).  The real config-#5 deliverable this environment
permits is the projection model in bench/projection.py.

Run: python -m tpusparse.bench.scaling [m] [n] [k] [avg_nnz]
"""

from __future__ import annotations

import json
import sys

import numpy as np


def measure_scaling(
    m: int = 8192,
    n: int = 8192,
    k: int = 32,
    avg_nnz_per_row: float = 32.0,
    device_counts=None,
    iters: int = 10,
    seed: int = 0,
    ring: str = "radix",
):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from tpusparse.bench.harness import time_fn
    from tpusparse.dist.overlap import build_halo_spmm, pack_halo_stripe
    from tpusparse.io import builder
    from tpusparse.oracle import check_result, spmm_reference

    n_avail = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_avail]
    mat = builder.power_law_coo(m, n, avg_nnz_per_row=avg_nnz_per_row, seed=seed)
    x = np.random.default_rng(seed + 1).standard_normal((n, k)).astype(np.float32)
    want = spmm_reference(mat, x.astype(np.float64))

    from tpusparse import native

    rows = []
    base = None
    for d in device_counts:
        if ring == "dgt":
            from tpusparse.dist.overlap import (build_halo_dgt_spmm,
                                                pack_halo_dgt)

            # r5 ring-bucket A/B (MULTICHIP_SCALING.json ring_bucket_ab):
            # select beats fullrow at every d (2: 116 vs 284 us, 4: 37 vs
            # 56, 8: 8.5 vs 25 — guarded median-of-3 bucket timings), so
            # the ring reverts to the resid/select pack; the r4 fullrow
            # choice was asserted from padding alone and is refuted.
            fmt = pack_halo_dgt(mat, d, rows_per_program=512, g=256, kt=8,
                                resid=True, nw=8, walk="multi")
            mesh = Mesh(np.array(jax.devices()[:d]), ("rows",))
            fn, put_inputs = build_halo_dgt_spmm(fmt, mesh, scatter="select")
        elif native.available():
            from tpusparse.dist.overlap import (build_halo_radix_spmm,
                                                pack_halo_radix)

            fmt = pack_halo_radix(mat, d, rows_per_program=1024, S=128,
                                  g=256, kt=8)
            mesh = Mesh(np.array(jax.devices()[:d]), ("rows",))
            fn, put_inputs = build_halo_radix_spmm(fmt, mesh, kt=8)
        else:
            fmt = pack_halo_stripe(mat, d, rows_per_stripe=64)
            mesh = Mesh(np.array(jax.devices()[:d]), ("rows",))
            fn, put_inputs = build_halo_spmm(fmt, mesh)
        args = put_inputs(jnp.asarray(x))
        y = np.asarray(fn(*args))[:, :k]
        check_result(y, want, rtol=1e-3)

        sec = time_fn(lambda xs, a=args: fn(*a[:-1], xs), args[-1], iters=iters)
        nnz_per_s = mat.nnz / sec
        if base is None:
            base = nnz_per_s
        ratio = nnz_per_s / (d * base)
        key = ("efficiency" if jax.default_backend() == "tpu"
               else "wallclock_ratio_cpu_interpret_NOT_PERF")
        rows.append({
            "devices": d,
            "seconds": sec,
            "nnz_per_s": nnz_per_s,
            key: ratio,
            "padding_rate": fmt.padding_rate,
        })
    return rows


def main():
    args = [int(a) for a in sys.argv[1:5]]
    kwargs = dict(zip(("m", "n", "k"), args[:3]))
    if len(args) > 3:
        kwargs["avg_nnz_per_row"] = float(args[3])
    rows = measure_scaling(**kwargs)
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
