"""Fine-tune a pruned sparse weight matrix: fixed pattern, trainable values.

The pruned-LLM story end-to-end: the sparsity pattern is frozen (as pruning
left it) and the surviving values train.  Forward runs the span SpMM kernel;
the value gradient is an SDDMM sampled at the pattern and the input gradient
a transpose-apply over the SAME packed format (tpusparse/kernels/sddmm.py) —
no repacking per optimizer step.

Run: python examples/05_trainable_sparse_finetune.py   (CPU-friendly)
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpusparse.io import builder
from tpusparse.nn import TrainableSparseLinear

# a 90%-pruned weight, the reference's FlashLLM workload class
w = builder.pruned_weight_coo(256, 192, sparsity=0.9, seed=0)
layer = TrainableSparseLinear(w)
params = layer.init()

rng = np.random.default_rng(1)
x = jnp.asarray(rng.standard_normal((64, 192)), jnp.float32)
target = jnp.asarray(rng.standard_normal((64, 256)), jnp.float32)

opt = optax.adam(2e-2)
opt_state = opt.init(params)


@jax.jit
def step(params, opt_state):
    loss, grads = jax.value_and_grad(
        lambda p: jnp.mean((layer.apply(p, x) - target) ** 2))(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


for i in range(40):
    params, opt_state, loss = step(params, opt_state)
    if i % 10 == 0 or i == 39:
        print(f"step {i:3d}  loss {float(loss):.4f}")

# checkpoint: trained values back in the original COO nz order
trained = layer.export_vals(params)
print(f"exported {trained.shape[0]} trained values "
      f"(moved {np.abs(trained - np.asarray(w.vals)).mean():.3f} on average)")
