"""The ring halo SpMM's compiled program must carry the collective-permute
INSIDE the compute loop (the overlap structure, VERDICT r1 #7): each ring
step both computes the current shard's contribution and forwards the X
chunk.  Inspects the lowered HLO of the shard_map'd fn."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from tpusparse.io import builder


@pytest.mark.parametrize("kind", ["stripe", "span", "radix", "dg", "dgt"])
def test_ring_halo_loop_contains_permute_and_compute(kind):
    """All four ring variants, including the champion radix/dg kernels
    (VERDICT r2 #2: the deployed rings need the overlap assertion too)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mat = builder.power_law_coo(512, 512, avg_nnz_per_row=6.0, seed=3)
    x = np.random.default_rng(0).standard_normal((512, 16)).astype(np.float32)
    mesh = Mesh(np.array(jax.devices()[:4]), ("rows",))
    if kind == "stripe":
        from tpusparse.dist.overlap import build_halo_spmm, pack_halo_stripe

        fmt = pack_halo_stripe(mat, 4, rows_per_stripe=32)
        fn, put_inputs = build_halo_spmm(fmt, mesh)
    elif kind == "radix":
        from tpusparse.dist.overlap import (build_halo_radix_spmm,
                                            pack_halo_radix)

        fmt = pack_halo_radix(mat, 4, rows_per_program=64, S=16, g=32, kt=8)
        fn, put_inputs = build_halo_radix_spmm(fmt, mesh, kt=8)
    elif kind == "dg":
        from tpusparse.dist.overlap import build_halo_dg_spmm, pack_halo_dg

        fmt = pack_halo_dg(mat, 4, rows_per_program=64, ns=2, g=128, kt=8)
        fn, put_inputs = build_halo_dg_spmm(fmt, mesh, kt=8)
    elif kind == "dgt":
        from tpusparse.dist.overlap import build_halo_dgt_spmm, pack_halo_dgt

        fmt = pack_halo_dgt(mat, 4, rows_per_program=64, g=128, kt=8)
        fn, put_inputs = build_halo_dgt_spmm(fmt, mesh)
    else:
        from tpusparse.dist.overlap import (build_halo_span_spmm,
                                            pack_halo_span)

        fmt = pack_halo_span(mat, 4, rows_per_program=64, ct=128, g=64)
        fn, put_inputs = build_halo_span_spmm(fmt, mesh)
    args = put_inputs(jnp.asarray(x))
    text = jax.jit(fn).lower(*args).as_text()
    # the ring fori_loop lowers to a while whose body holds BOTH the
    # collective_permute (X forwarding) and the shard compute (dots)
    wi = text.find("stablehlo.while")
    assert wi >= 0, "ring loop did not lower to a while"
    body = text[wi:]
    assert "collective_permute" in body, "no collective inside the ring loop"
    # span compute = one-hot MXU dots; stripe compute (scalar interpret
    # path on CPU) = the per-nz gather/accumulate loop
    assert any(op in body for op in
               ("dot_general", "custom_call", "dynamic_update_slice")), \
        "no compute inside the ring loop"
