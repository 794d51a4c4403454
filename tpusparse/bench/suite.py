"""Workload-class sweep bench (BASELINE.json configs #2-#4).

Sweeps the reference's workload classes — SuiteSparse-like (power-law,
banded, uniform) at K in {8, 32, 128}, pruned-LLM unstructured bf16 at
K=512, N:M (2:4) structured, and block-sparse — through the autotuner and
prints one JSON line per (workload, K) with the winning schedule, GFLOP/s,
and the baseline ratio.  Writes results to BENCH_SUITE.jsonl.

Run: python -m tpusparse.bench.suite [--quick]
"""

from __future__ import annotations

import json
import sys
import time


def run_suite(quick: bool = False, out_path: str = "BENCH_SUITE.jsonl"):

    import jax.numpy as jnp
    import numpy as np

    from tpusparse.bench.baselines import bcoo_spmm_fn
    from tpusparse.bench.harness import gflops, time_fn
    from tpusparse.io import builder
    from tpusparse.tune import tune
    from tpusparse.batched import batched_spmm
    from tpusparse.kernels.nm_structured import nm_spmm, pack_nm
    from tpusparse.kernels.block_ell import block_ell_spmm, pack_block_ell

    size = 8192 if quick else 16384
    rows = []

    def emit(row):
        row["ts"] = time.time()
        rows.append(row)
        print(json.dumps(row), flush=True)

    # ---- config #2: SuiteSparse-class sweep, fp32, K in {8, 32, 128}
    workloads = {
        "powerlaw": builder.power_law_coo(size, size, avg_nnz_per_row=16.0, seed=1),
        "uniform": builder.uniform_coo(size, size, nnz_per_row=12, seed=2),
        "banded": builder.banded_coo(size, size, bandwidth=48, seed=3),
    }
    for name, mat in workloads.items():
        for k in ([8] if quick else [8, 32, 128]):
            x = np.random.default_rng(0).standard_normal((mat.shape[1], k)).astype(np.float32)
            try:
                res = tune(mat, x, iters=5, validate=True)
                bfn = bcoo_spmm_fn(mat)
                bsec = time_fn(bfn, jnp.asarray(x), iters=5)
                emit({
                    "bench": f"suite/{name}", "k": k, "nnz": mat.nnz,
                    "gflops": round(gflops(mat.nnz, k, res.best_seconds), 3),
                    "seconds": res.best_seconds,
                    "schedule": res.best_schedule.family,
                    "vs_bcoo": round(bsec / res.best_seconds, 3),
                })
            except Exception as e:
                emit({"bench": f"suite/{name}", "k": k, "error": f"{type(e).__name__}: {e}"})

    # ---- config #3: pruned-LLM unstructured bf16, K=512
    w = builder.pruned_weight_coo(4096 if quick else 8192, 4096 if quick else 8192,
                                  sparsity=0.9, seed=7)
    k = 512
    x = np.random.default_rng(1).standard_normal((w.shape[1], k)).astype(np.float32)
    try:
        res = tune(w, x, iters=5, validate=False)
        emit({
            "bench": "pruned_llm_90", "k": k, "nnz": w.nnz,
            "gflops": round(gflops(w.nnz, k, res.best_seconds), 3),
            "schedule": res.best_schedule.family,
        })
    except Exception as e:
        emit({"bench": "pruned_llm_90", "k": k, "error": f"{type(e).__name__}: {e}"})

    # ---- config #4: N:M (2:4) structured, batched
    m = 2048 if quick else 4096
    dense = builder.nm_pruned_dense(m, m, n_keep=2, group=4, seed=5)
    fmt = pack_nm(dense)
    xb = np.random.default_rng(2).standard_normal((4, m, 128)).astype(np.float32)
    fn = lambda xx: nm_spmm(fmt, xx, precision="bf16")
    y = np.asarray(batched_spmm(fn, jnp.asarray(xb)))  # exercise batched path
    sec = time_fn(fn, jnp.asarray(xb[0]), iters=5)
    nnz = fmt.nnz
    emit({
        "bench": "nm_2_4_batched", "k": 128, "nnz": nnz,
        "gflops": round(gflops(nnz, 128, sec), 3),
        "batched_shape": list(y.shape),
    })

    # ---- config #4b: block-sparse MXU path
    bmat = builder.block_sparse_coo(m, m, block=128, block_density=0.15, seed=6)
    bfmt = pack_block_ell(bmat, bs=128, dtype="bfloat16")
    xB = np.random.default_rng(3).standard_normal((m, 256)).astype(np.float32)
    bfn = lambda xx: block_ell_spmm(bfmt, xx, precision="bf16")
    np.asarray(bfn(jnp.asarray(xB)))
    sec = time_fn(bfn, jnp.asarray(xB), iters=5)
    emit({
        "bench": "block_sparse_128", "k": 256, "nnz": bmat.nnz,
        "gflops": round(gflops(bmat.nnz, 256, sec), 3),
        "padding_rate": bfmt.padding_rate,
    })

    # ---- SpMV (K=1 path)
    from tpusparse.spmv import spmv_fn

    mv = workloads["powerlaw"]
    xv = np.random.default_rng(4).standard_normal(mv.shape[1]).astype(np.float32)
    for method in ("segment", "span"):
        vfn = spmv_fn(mv, method=method)
        np.asarray(vfn(jnp.asarray(xv)))
        sec = time_fn(vfn, jnp.asarray(xv), iters=10)
        emit({
            "bench": f"spmv_powerlaw/{method}", "k": 1, "nnz": mv.nnz,
            "gflops": round(gflops(mv.nnz, 1, sec), 3),
            "gnnz_per_s": round(mv.nnz / sec / 1e9, 3),
        })

    with open(out_path, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return rows


if __name__ == "__main__":
    run_suite(quick="--quick" in sys.argv)
