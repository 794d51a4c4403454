"""Two-layer GCN node classification through the packed SpMM kernels.

The canonical consumer of SpMM is the graph neural network: every GCN
layer is H' = act(Â · (H W)) with Â the symmetric-normalized adjacency
(Kipf & Welling).  The reference framework stops at the kernel; this
example shows the framework carrying a real model end to end —
`autodiff.spmm_fn` wires the packed forward kernel AND a packed
transpose kernel for the cotangent (dX = Âᵀ·dY), so both passes of
training run tuned Pallas kernels, not XLA scatter fallbacks.

The graph is a planted-partition (stochastic block model): C communities
with dense intra-community and sparse inter-community edges; the labels
are the planted communities and the features are noisy one-hot community
indicators, so a working GCN separates them in a few steps.

Run: python examples/06_gcn_node_classification.py [--nodes 4096]
     [--communities 8] [--steps 30] [--cpu]
(CPU interpret by default off-chip; add --cpu to force it.)
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def planted_partition(n, c, deg_in=12, deg_out=3, seed=0):
    """Symmetric SBM adjacency in COO + community labels."""
    from tpusparse.io.mtx import CooMatrix

    rng = np.random.default_rng(seed)
    label = rng.integers(0, c, n)
    order = np.argsort(label, kind="stable")  # contiguous communities
    label = label[order]
    starts = np.searchsorted(label, np.arange(c))
    ends = np.searchsorted(label, np.arange(c), side="right")
    rows, cols = [], []
    for ci in range(c):
        members = np.arange(starts[ci], ends[ci])
        if members.size < 2:
            continue
        e_in = deg_in * members.size // 2
        rows.append(rng.choice(members, e_in))
        cols.append(rng.choice(members, e_in))
        # out-edges are uniform over ALL nodes, so ~1/C of them land back
        # inside the source community (effective intra-degree is slightly
        # above deg_in) — fine for a demo SBM
        e_out = deg_out * members.size // 2
        rows.append(rng.choice(members, e_out))
        cols.append(rng.integers(0, n, e_out))
    r = np.concatenate(rows)
    cc = np.concatenate(cols)
    keep = r != cc
    r, cc = r[keep], cc[keep]
    # symmetrize
    r2 = np.concatenate([r, cc])
    c2 = np.concatenate([cc, r])
    m = CooMatrix(r2, c2, np.ones(r2.size, np.float32), (n, n))
    return m.sort_row_major().dedup(), label


def normalize_adj(mat):
    """Â = D^-1/2 (A + I) D^-1/2 on the host COO."""
    from tpusparse.io.mtx import CooMatrix

    n = mat.shape[0]
    rows = np.concatenate([mat.rows, np.arange(n)])
    cols = np.concatenate([mat.cols, np.arange(n)])
    vals = np.concatenate([np.asarray(mat.vals, np.float64), np.ones(n)])
    deg = np.bincount(rows, weights=vals, minlength=n)
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
    vals = (vals * dinv[rows] * dinv[cols]).astype(np.float32)
    return CooMatrix(rows, cols, vals, (n, n)).sort_row_major().dedup()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=4096)
    ap.add_argument("--communities", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import optax

    from tpusparse.autodiff import spmm_fn

    n, c = args.nodes, args.communities
    mat, label = planted_partition(n, c, seed=3)
    adj = normalize_adj(mat)
    print(f"graph: {n} nodes, {adj.nnz} normalized edges, "
          f"{c} communities, backend={jax.default_backend()}")

    # noisy community-indicator features
    rng = np.random.default_rng(1)
    feats = np.eye(c, dtype=np.float32)[label] + \
        0.5 * rng.standard_normal((n, c)).astype(np.float32)
    x = jnp.asarray(feats)
    y = jnp.asarray(label)
    train_mask = jnp.asarray(rng.random(n) < 0.3)

    h = args.hidden
    aspmm = spmm_fn(adj, k_hint=h)  # packed forward + packed transpose bwd
    params = {
        "w0": jnp.asarray(rng.standard_normal((c, h)).astype(np.float32)
                          / np.sqrt(c)),
        "w1": jnp.asarray(rng.standard_normal((h, c)).astype(np.float32)
                          / np.sqrt(h)),
    }

    def model(p, xin):
        h1 = jax.nn.relu(aspmm(xin @ p["w0"]))
        return aspmm(h1 @ p["w1"])

    def loss_fn(p):
        logits = model(p, x)
        ll = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        return jnp.where(train_mask, ll, 0.0).sum() / train_mask.sum()

    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    t0 = time.time()
    for i in range(args.steps):
        params, state, loss = step(params, state)
        if i % 5 == 0 or i == args.steps - 1:
            logits = model(params, x)
            acc = float((jnp.argmax(logits, -1) == y).mean())
            print(f"step {i:3d}: loss {float(loss):.4f}  acc {acc:.3f}")
    print(f"trained {args.steps} steps in {time.time()-t0:.1f}s")
    logits = model(params, x)
    test_acc = float((jnp.argmax(logits, -1) == y)[~train_mask].mean())
    print(f"held-out accuracy: {test_acc:.3f} (chance {1.0/c:.3f})")
    assert test_acc > 2.0 / c, "GCN failed to beat 2x chance"
    print("OK")


if __name__ == "__main__":
    main()
