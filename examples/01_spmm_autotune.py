"""Autotuned SpMM: the reference's `./token_test matrix.mtx K` flow.

Run: python examples/01_spmm_autotune.py [matrix.mtx] [K]
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from tpusparse.io import builder, read_mtx
from tpusparse.tune import tune

# interpret-mode kernels on CPU are slow: demo on a small matrix there
size = 8192 if jax.default_backend() == "tpu" else 1024
mat = read_mtx(sys.argv[1]) if len(sys.argv) > 1 else builder.power_law_coo(
    size, size, avg_nnz_per_row=16.0, seed=0)
k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
x = np.random.default_rng(0).standard_normal((mat.shape[1], k)).astype(np.float32)

res = tune(mat, x)                       # enumerate, verify, keep the min
y = res.best(x)                          # jitted SpMM
print("winner:", res.best_schedule.family, res.best_schedule.describe())
print("cost:", res.best.cost_summary(k=k))
print("Y:", np.asarray(y).shape)
