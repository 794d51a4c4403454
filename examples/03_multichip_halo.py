"""Multi-device SpMM with the ring-overlapped halo exchange.

Run (virtual 8-device CPU mesh):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/03_multichip_halo.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

import numpy as np
from jax.sharding import Mesh

from tpusparse.dist.overlap import build_halo_spmm, pack_halo_stripe
from tpusparse.io import builder
from tpusparse.oracle import check_result, spmm_reference

d = min(len(jax.devices()), 8)
mat = builder.power_law_coo(2048, 2048, avg_nnz_per_row=12.0, seed=0)
x = np.random.default_rng(1).standard_normal((2048, 16)).astype(np.float32)

fmt = pack_halo_stripe(mat, d, rows_per_stripe=64)
mesh = Mesh(np.array(jax.devices()[:d]), ("rows",))
fn, put_inputs = build_halo_spmm(fmt, mesh)
y = np.asarray(fn(*put_inputs(x)))[:, :16]
check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=1e-3)
print(f"halo ring over {d} devices OK; Y {y.shape}")
