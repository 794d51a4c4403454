"""Tuner cache reuse and CLI smoke tests (CPU)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tpusparse.config import config_override
from tpusparse.io import builder


def test_tune_cache_reuse(tmp_path):
    from tpusparse.schedule import Schedule
    from tpusparse.tune import matrix_signature, tune

    mat = builder.uniform_coo(96, 64, nnz_per_row=4, seed=1)
    x = np.random.default_rng(0).standard_normal((64, 8)).astype(np.float32)
    cands = [
        Schedule(family="span_onehot", rb=32, ct=64, g=16),
        Schedule(family="stripe_total", blocking="balanced", work_per_block=64),
    ]
    with config_override(cache_dir=str(tmp_path)):
        res1 = tune(mat, x, candidates=cands, iters=2)
        sig = matrix_signature(mat)
        cache_file = tmp_path / f"tune_{sig}_k8.json"
        assert cache_file.exists()
        cached = json.loads(cache_file.read_text())
        assert cached["schedule"]["family"] == res1.best_schedule.family
        # second run with default candidates picks up the cached winner first
        res2 = tune(mat, x, iters=2)
        assert res2.table[0]["schedule"]["family"] == res1.best_schedule.family
        # results.jsonl accumulated and an artifact dir was written
        assert (tmp_path / "results.jsonl").exists()
        art = tmp_path / "artifacts" / sig
        assert art.exists() and any(art.iterdir())


@pytest.mark.parametrize("graph", [None, "cc"])
def test_cli_synthetic(graph, tmp_path):
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    cmd = [sys.executable, "-c",
           "import jax; jax.config.update('jax_platforms','cpu');"
           "from tpusparse.__main__ import main; import sys;"
           f"sys.exit(main({_args(graph)!r}.split()))"]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=500,
                       cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    if graph:
        assert out["algorithm"] == "cc"
    else:
        assert out["gflops"] > 0 and out["best_schedule"]["family"]


def _args(graph):
    if graph:
        # graph algorithms need a square adjacency
        return f"--synthetic uniform --m 256 --n 256 --avg-nnz 3 --graph {graph}"
    return "--synthetic uniform --m 256 --avg-nnz 3 --iters 2"
