"""Matrix-zoo robustness sweep: run the autotuner across a grid of shapes
(square/tall/wide), densities, and structure classes, recording the winning
schedule and GFLOP/s per case.  Broader than suite.py (which covers the
BASELINE configs); this is the "does the tuner always find something sane"
harness.

Run: python -m tpusparse.bench.zoo [--quick]
"""

from __future__ import annotations

import json
import sys
import time


def zoo(quick: bool = False):
    from tpusparse.io import builder

    s = 4096 if quick else 8192
    cases = {
        "square_sparse": builder.power_law_coo(s, s, avg_nnz_per_row=4.0, seed=1),
        "square_mid": builder.power_law_coo(s, s, avg_nnz_per_row=32.0, seed=2),
        "square_denser": builder.pruned_weight_coo(s // 4, s // 4, sparsity=0.95, seed=3),
        "tall": builder.power_law_coo(4 * s, s // 4, avg_nnz_per_row=8.0, seed=4),
        "wide": builder.power_law_coo(s // 4, 4 * s, avg_nnz_per_row=8.0, seed=5),
        "extreme_skew": builder.power_law_coo(s, s, avg_nnz_per_row=16.0, alpha=1.2,
                                              seed=6),
        # web-graph class: power-law COLUMN popularity (in-link counts) —
        # the hybrid_cols family's home turf (hot-column dense MXU panel)
        "col_skew": builder.power_law_col_coo(s, s, avg_nnz_per_row=16.0,
                                              alpha=1.6, seed=9),
        "banded": builder.banded_coo(s, s, bandwidth=32, seed=7),
        "blocky": builder.block_sparse_coo(s // 2, s // 2, block=128,
                                           block_density=0.08, seed=8),
    }
    return cases


def run_zoo(quick: bool = False, ks=(8, 64), out_path: str = "BENCH_ZOO.jsonl",
            full: bool = False, budget: int | None = 10):
    import jax.numpy as jnp
    import numpy as np

    from tpusparse.bench.harness import gflops
    from tpusparse.tune import tune

    rows = []
    # per-session machine-window calibration (VERDICT r3 #3)
    from tpusparse.bench.microbench import session_probe

    probe = session_probe()
    probe["ts"] = time.time()
    rows.append(probe)
    print(json.dumps(probe), flush=True)
    with open(out_path, "a") as f:
        f.write(json.dumps(probe) + "\n")
    for name, mat in zoo(quick).items():
        for k in ks:
            x = np.random.default_rng(0).standard_normal(
                (mat.shape[1], k)).astype(np.float32)
            row = {"case": name, "shape": list(mat.shape), "nnz": mat.nnz,
                   "density": round(mat.density, 7), "k": k, "ts": time.time()}
            try:
                res = tune(mat, x, iters=5, validate=True, full=full, budget=budget)
                row.update(
                    gflops=round(gflops(mat.nnz, k, res.best_seconds), 3),
                    seconds=res.best_seconds,
                    schedule=res.best_schedule.family,
                    n_ok=sum(1 for r in res.table if r.get("ok")),
                    n_cand=len(res.table),
                )
                # window-normalized twin on the winner family's bound axis
                # (VERDICT r4 #2/#3)
                from tpusparse.bench.sol import bound_axis_for

                axis = bound_axis_for(res.best_schedule.family)
                key = {"vpu": "norm_vpu", "mxu": "norm",
                       "stream": "norm_stream"}[axis]
                norm = probe.get(key) or probe.get("norm_stream")
                if norm:
                    row.update(gflops_norm=round(row["gflops"] * norm, 3),
                               norm_axis=axis)
            except Exception as e:
                row["error"] = f"{type(e).__name__}: {e}"
            rows.append(row)
            print(json.dumps(row), flush=True)
            with open(out_path, "a") as f:
                f.write(json.dumps(row) + "\n")
    return rows


if __name__ == "__main__":
    run_zoo(quick="--quick" in sys.argv, full="--full" in sys.argv)
