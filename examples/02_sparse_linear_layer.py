"""SparseLinear in a tiny model: pruned weights, batched dims, jax.grad.

Run: python examples/02_sparse_linear_layer.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from tpusparse.io import builder
from tpusparse.io.mtx import CooMatrix
from tpusparse.nn import SparseLinear

# 90%-magnitude-pruned weights, as from an LLM checkpoint.
# differentiable=True wires a packed A^T plan as the custom VJP, so
# jax.grad flows through the sparse kernels.
w1 = builder.pruned_weight_coo(1024, 768, sparsity=0.9, seed=0)
w2 = builder.pruned_weight_coo(256, 1024, sparsity=0.9, seed=1)
layer1 = SparseLinear.from_coo(w1, differentiable=True)
layer2 = SparseLinear.from_coo(w2, differentiable=True)

def model(x):
    return layer2(jax.nn.relu(layer1(x)))

x = jnp.asarray(np.random.default_rng(2).standard_normal((4, 16, 768)),
                jnp.float32)  # [batch, seq, features]
y = model(x)
g = jax.grad(lambda x: jnp.sum(model(x) ** 2))(x)
print("forward:", y.shape, "grad:", g.shape)

# inference-only N:M (2:4) structured layer on the MXU compact path
w_nm = builder.nm_pruned_dense(256, 1024, n_keep=2, group=4, seed=3)
head = SparseLinear.from_nm(w_nm, precision="bf16")
logits = head(jax.nn.relu(layer1(x)))
print("N:M head:", logits.shape)
