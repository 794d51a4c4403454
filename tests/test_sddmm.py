"""Trainable sparse values: SDDMM value-grad + transpose-free input-grad.

Validates kernels/sddmm.py and autodiff.spmm_trainable against the dense
formulas  dL/dA = dY . X^T (sampled)  and  dL/dX = A^T . dY.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.autodiff import spmm_trainable
from tpusparse.io import builder
from tpusparse.kernels.sddmm import packed_to_nz
from tpusparse.oracle import check_result, spmm_reference


def _rel_err(got, want, floor=1e-3):
    got = np.asarray(got)
    want = np.asarray(want)
    return float(np.max(np.abs(got - want) / (np.abs(want) + floor)))


@pytest.mark.parametrize("k", [12, 20])
def test_trainable_grads_match_dense(k):
    mat = builder.power_law_coo(300, 260, avg_nnz_per_row=5.0, seed=0)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((260, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((300, k)), jnp.float32)

    fn, v0 = spmm_trainable(mat, rb=64, ct=128, g=64)
    want = spmm_reference(mat, np.asarray(x, np.float64))
    check_result(np.asarray(fn(v0, x)), want, rtol=1e-3)

    dv, dx = jax.grad(lambda v, x: jnp.sum(fn(v, x) * w), argnums=(0, 1))(v0, x)
    dA = np.asarray(w) @ np.asarray(x).T
    assert _rel_err(packed_to_nz(fn.fmt, dv), dA[mat.rows, mat.cols]) < 3e-2
    assert _rel_err(dx, mat.to_dense().T @ np.asarray(w)) < 3e-2
    # explicit-ktile grad coverage lives in test_sddmm_ktiled_accumulation


def test_sddmm_ktiled_accumulation():
    # K > ktile: the grad kernels accumulate over K-tile grid steps
    from tpusparse.kernels.sddmm import origrow_of_slot, span_dx, span_sddmm
    from tpusparse.kernels.span_gather import pack_span

    mat = builder.power_law_coo(200, 180, avg_nnz_per_row=4.0, seed=3)
    rng = np.random.default_rng(4)
    k = 24
    x = jnp.asarray(rng.standard_normal((180, k)), jnp.float32)
    dy = jnp.asarray(rng.standard_normal((200, k)), jnp.float32)
    fmt = pack_span(mat, rb=64, ct=128, g=64, keep_perm=True)
    dy_slots = jnp.take(dy, jnp.asarray(origrow_of_slot(fmt)), axis=0,
                        mode="fill", fill_value=0)

    dv = span_sddmm(fmt, dy_slots, x, ktile=8)
    dA = np.asarray(dy) @ np.asarray(x).T
    assert _rel_err(packed_to_nz(fmt, dv), dA[mat.rows, mat.cols]) < 3e-2

    dx = span_dx(fmt, fmt.vals, dy_slots, ktile=8)
    assert _rel_err(dx, mat.to_dense().T @ np.asarray(dy)) < 3e-2


def test_trainable_values_with_explicit_zero():
    # a stored zero is a real trainable position: its value-grad must be
    # kept (occupancy mask comes from the packing permutation, not vals!=0)
    rows = np.array([0, 0, 1, 2], dtype=np.int64)
    cols = np.array([0, 2, 1, 3], dtype=np.int64)
    vals = np.array([1.0, 0.0, 2.0, -1.0], dtype=np.float32)
    from tpusparse.io.mtx import CooMatrix

    mat = CooMatrix(rows=rows, cols=cols, vals=vals, shape=(3, 8))
    fn, v0 = spmm_trainable(mat, rb=8, ct=16, g=8)
    x = jnp.asarray(np.eye(8, 4, dtype=np.float32))
    dv = jax.grad(lambda v: jnp.sum(fn(v, x)))(v0)
    nz = packed_to_nz(fn.fmt, dv)
    # dL/dv[nz=(r,c)] = sum_k x[c, k]; col 2 has x[2, :4].sum() == 1
    assert nz[1] != 0.0


def test_auto_ktile_reduces_and_grads_match():
    # a tiny vmem_budget forces the K-tile down; gradients must still match
    from tpusparse.autodiff import _auto_ktile

    assert _auto_ktile(4096, 128, 4 * 2**20) == 128
    assert _auto_ktile(64 * 1024, 128, 4 * 2**20) == 16
    with pytest.raises(ValueError, match="exceeds the VMEM budget"):
        _auto_ktile(40_000_000, 128, 4 * 2**20)
    # halving from a non-power-of-two K must stop AT the 8-sublane floor,
    # never below it (20 -> 10 -> 8, not 5); unsatisfiable budgets raise
    assert _auto_ktile(120_000, 128, 4 * 2**20) == 8
    with pytest.raises(ValueError, match="exceeds the VMEM budget"):
        _auto_ktile(260, 20, 5200)  # kt=5 would "fit" but is illegal

    mat = builder.power_law_coo(300, 260, avg_nnz_per_row=5.0, seed=0)
    rng = np.random.default_rng(2)
    k = 20
    x = jnp.asarray(rng.standard_normal((260, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((300, k)), jnp.float32)
    budget = 260 * 10 * 4  # kt: 20 -> 10
    assert _auto_ktile(260, k, budget) == 10
    fn, v0 = spmm_trainable(mat, rb=64, ct=128, g=64, vmem_budget=budget)
    dv, dx = jax.grad(lambda v, x: jnp.sum(fn(v, x) * w), argnums=(0, 1))(v0, x)
    dA = np.asarray(w) @ np.asarray(x).T
    assert _rel_err(packed_to_nz(fn.fmt, dv), dA[mat.rows, mat.cols]) < 3e-2
    assert _rel_err(dx, mat.to_dense().T @ np.asarray(w)) < 3e-2


def test_public_sddmm_matches_dense():
    from tpusparse.kernels.sddmm import sddmm

    mat = builder.power_law_coo(220, 190, avg_nnz_per_row=5.0, seed=7)
    rng = np.random.default_rng(8)
    a = rng.standard_normal((220, 16)).astype(np.float32)
    b = rng.standard_normal((190, 16)).astype(np.float32)
    got = sddmm(mat, a, b, rb=64, ct=128, g=64)
    want = (a @ b.T)[mat.rows, mat.cols]
    assert _rel_err(got, want) < 3e-2


def test_trainable_dp_sharded_grads():
    # data-parallel fine-tuning: the SDDMM/custom-VJP path composes with
    # shard_map (batch sharded, params replicated, grads psum-reduced)
    import functools

    from jax.sharding import Mesh, PartitionSpec as P

    from tpusparse.nn import TrainableSparseLinear

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    w = builder.pruned_weight_coo(32, 24, sparsity=0.7, seed=8)
    layer = TrainableSparseLinear(w, rb=16, ct=32, g=16, bias=False)
    params = layer.init()
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((8, 24)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((8, 32)), jnp.float32)

    def loss(p, xs, ts):
        return jnp.sum((layer.apply(p, xs) - ts) ** 2)

    mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))

    @functools.partial(jax.shard_map, mesh=mesh, check_vma=False,
                       in_specs=(P(), P("dp"), P("dp")), out_specs=P())
    def grads_dp(p, xs, ts):
        g = jax.grad(loss)(p, xs, ts)
        return jax.tree.map(lambda a: jax.lax.psum(a, "dp"), g)

    gd = grads_dp(params, x, t)
    gs = jax.grad(loss)(params, x, t)
    np.testing.assert_allclose(np.asarray(gd["vals"]), np.asarray(gs["vals"]),
                               rtol=2e-4, atol=1e-4)


def test_flax_module_trains():
    import optax

    from tpusparse.nn import flax_sparse_linear

    w = builder.pruned_weight_coo(48, 40, sparsity=0.8, seed=5)
    mod = flax_sparse_linear(w, rb=16, ct=64, g=32)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((4, 5, 40)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((4, 5, 48)), jnp.float32)
    vs = mod.init(jax.random.PRNGKey(0), x)
    assert mod.apply(vs, x).shape == (4, 5, 48)

    opt = optax.adam(5e-2)
    st = opt.init(vs)

    @jax.jit
    def step(vs, st):
        l, gr = jax.value_and_grad(
            lambda v: jnp.mean((mod.apply(v, x) - t) ** 2))(vs)
        u, st = opt.update(gr, st, vs)
        return optax.apply_updates(vs, u), st, l

    l0 = None
    for _ in range(30):
        vs, st, l = step(vs, st)
        l0 = float(l) if l0 is None else l0
    assert float(l) < 0.7 * l0
    assert packed_to_nz(mod.fmt, vs["params"]["vals"]).shape == (w.nnz,)


def test_trainable_layer_trains():
    import optax

    from tpusparse.nn import TrainableSparseLinear

    w = builder.pruned_weight_coo(48, 40, sparsity=0.8, seed=5)
    layer = TrainableSparseLinear(w, rb=16, ct=64, g=32)
    params = layer.init()
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((4, 5, 40)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((4, 5, 48)), jnp.float32)

    opt = optax.adam(5e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: jnp.mean((layer.apply(p, x) - t) ** 2))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < 0.7 * losses[0], losses
    # exported values stay in COO order and differ from the originals
    out = layer.export_vals(params)
    assert out.shape == (w.nnz,)
    assert np.abs(out - np.asarray(w.vals)).max() > 1e-4


def test_trainable_checkpoint_resume_orbax(tmp_path):
    """Checkpoint/resume (SURVEY §5 analogue for the training story): save
    params + opt state with orbax mid-training, restore into a FRESH layer
    built from the same COO, and verify training continues bit-exactly."""
    import optax
    import orbax.checkpoint as ocp

    from tpusparse.nn import TrainableSparseLinear

    w = builder.pruned_weight_coo(48, 40, sparsity=0.8, seed=9)
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.standard_normal((8, 40)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((8, 48)), jnp.float32)
    opt = optax.adam(5e-2)

    def make_step(layer):
        @jax.jit
        def step(params, opt_state):
            loss, grads = jax.value_and_grad(
                lambda p: jnp.mean((layer.apply(p, x) - t) ** 2))(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss
        return step

    layer = TrainableSparseLinear(w, rb=16, ct=64, g=32)
    params = layer.init()
    opt_state = opt.init(params)
    step = make_step(layer)
    for _ in range(2):
        params, opt_state, _ = step(params, opt_state)

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(tmp_path / "ckpt", {"params": params, "opt_state": opt_state})

    # uninterrupted run: 2 more steps
    p_ref, s_ref = params, opt_state
    for _ in range(2):
        p_ref, s_ref, _ = step(p_ref, s_ref)

    # resumed run: fresh process state — new layer from the same matrix,
    # params/opt_state restored from disk (values land in the packed plane)
    layer2 = TrainableSparseLinear(w, rb=16, ct=64, g=32)
    restored = ckptr.restore(tmp_path / "ckpt")
    p2 = jax.tree.map(jnp.asarray, restored["params"])
    s2 = jax.tree.map(jnp.asarray, restored["opt_state"])
    # optax states are structured pytrees; rebuild the named structure by
    # grafting restored leaves onto a template init
    s2 = jax.tree.unflatten(jax.tree.structure(opt.init(layer2.init())),
                            jax.tree.leaves(s2))
    step2 = make_step(layer2)
    for _ in range(2):
        p2, s2, _ = step2(p2, s2)

    np.testing.assert_array_equal(np.asarray(p_ref["vals"]),
                                  np.asarray(p2["vals"]))
    np.testing.assert_array_equal(np.asarray(p_ref["bias"]),
                                  np.asarray(p2["bias"]))
