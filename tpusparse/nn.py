"""Sparse neural-network layers (the pruned-LLM serving surface).

The reference's target workload is pruned-LLM weight matrices
(matrix_example/README.md: FlashLLM magnitude/random-pruned weights) but it
exposes only a CLI over .mtx files.  Here the same capability is a layer a
JAX model can call: ``SparseLinear`` wraps a packed/tuned SpMM plan, folds
arbitrary leading batch/sequence dims into the dense-column grid axis, and
is differentiable w.r.t. its input (tpusparse.autodiff).

Weight orientation: a linear layer computes ``y = x @ W^T + b`` with
``W [out_features, in_features]``; tpusparse computes ``Y = A @ X`` with
``X [in, K]`` — so X is the folded, transposed activation batch and W is A.

Constructors:
  SparseLinear.from_coo(mat)           unstructured sparse W (CooMatrix)
  SparseLinear.from_dense(w)           prune-by-zeros dense W
  SparseLinear.from_nm(w, n, m)        N:M structured W (MXU compact path)
  SparseLinear.from_block(mat, bs)     block-sparse W (Block-ELL MXU path)
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from tpusparse.io.mtx import CooMatrix


class SparseLinear:
    """y[..., out] = x[..., in] @ W^T + b with sparse W.

    Layers are inference-only unless constructed with
    ``from_coo(..., differentiable=True)`` (which wires a packed A^T plan as
    the custom VJP) — Pallas kernels cannot be differentiated through
    directly, and jax.grad over a non-differentiable layer fails with an
    opaque Pallas tracing error."""

    def __init__(self, apply_fn, out_features: int, in_features: int,
                 bias: Any | None = None, meta: dict | None = None):
        self._apply = apply_fn  # X [in, K] -> Y [out, K]
        self.out_features = out_features
        self.in_features = in_features
        self.bias = None if bias is None else jnp.asarray(bias)
        self.meta = meta or {}

    @classmethod
    def from_coo(cls, mat: CooMatrix, *, schedule=None, bias=None,
                 differentiable: bool = False, interpret=None,
                 k_hint: int | None = None) -> "SparseLinear":
        """``k_hint``: the expected folded batch width (e.g. serving batch x
        sequence).  The plan is built before the first call, so without a
        hint the default must be streaming-safe (tile_onehot); a small-K
        hint unlocks the radix/span champions."""
        if differentiable:
            from tpusparse.autodiff import spmm_fn

            fn = spmm_fn(mat, schedule, interpret=interpret, k_hint=k_hint)
            meta = {"kind": "coo+vjp"}
        else:
            from tpusparse.schedule import build_plan, default_schedule

            if schedule is None:
                # K unknown at build time: VMEM-safe default (or the hint)
                schedule = default_schedule(mat, k_hint)
            plan = build_plan(mat, schedule, interpret=interpret)
            fn = plan.fn
            meta = {"kind": "coo", "schedule": plan.meta["schedule"]}
        m, n = mat.shape
        return cls(fn, m, n, bias=bias, meta=meta)

    @classmethod
    def from_dense(cls, w: np.ndarray, **kwargs) -> "SparseLinear":
        return cls.from_coo(CooMatrix.from_dense(np.asarray(w)), **kwargs)

    @classmethod
    def from_nm(cls, w: np.ndarray, *, n_keep: int = 2, group: int = 4,
                precision: str = "bf16", bias=None, interpret=None,
                mode: str = "compact") -> "SparseLinear":
        """N:M structured weight.  ``mode``:

        'compact'     the packed MXU kernel — 0.625x dense HBM *capacity*
                      (bf16 vals + int8 offsets; precision='int8' stores
                      W8A16 quantized vals for 0.375x), slower per call
                      than dense
        'throughput'  reconstruct dense bf16 on device — full dense-matmul
                      speed at full dense capacity.  On TPU (no sparse MXU)
                      2:4 cannot beat the dense product on throughput: the
                      4-offset decomposition is algebraically a permuted
                      dense matmul (see PERF.md).
        """
        import jax

        w = np.asarray(w)
        if mode == "throughput":
            dt = jnp.float32 if precision == "fp32" else jnp.bfloat16
            a = jnp.asarray(w, dt)
            prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
                    else jax.lax.Precision.DEFAULT)

            @jax.jit
            def _mm(a, x):
                return jnp.dot(a, x.astype(dt), preferred_element_type=jnp.float32,
                               precision=prec)

            m, n = w.shape
            return cls(lambda x: _mm(a, x), m, n, bias=bias,
                       meta={"kind": f"nm_{n_keep}_{group}:throughput"})

        from tpusparse.kernels.nm_structured import nm_spmm, pack_nm

        fmt = pack_nm(w, n_keep=n_keep, group=group,
                      dtype=(jnp.int8 if precision == "int8" else
                             jnp.float32 if precision == "fp32" else
                             jnp.bfloat16))

        def fn(x):
            return nm_spmm(fmt, x, precision=precision, interpret=interpret)

        m, n = fmt.shape
        return cls(fn, m, n, bias=bias,
                   meta={"kind": f"nm_{n_keep}_{group}", "precision": precision})

    @classmethod
    def from_block(cls, mat: CooMatrix, *, bs: int = 128, precision: str = "bf16",
                   bias=None, interpret=None,
                   differentiable: bool = False) -> "SparseLinear":
        import jax

        from tpusparse.kernels.block_ell import block_ell_spmm, pack_block_ell

        if precision == "int8":
            import jax.numpy as _jnp

            assert not differentiable, (
                "int8 block weights are a serving path; train in bf16/fp32")
            dt = _jnp.int8
        else:
            dt = "bfloat16" if precision == "bf16" else "float32"
        fmt = pack_block_ell(mat, bs=bs, dtype=dt)

        def fn(x):
            return block_ell_spmm(fmt, x, precision=precision, interpret=interpret)

        if differentiable:
            # backward = transposed Block-ELL plan (a transposed block-sparse
            # matrix is block-sparse with transposed blocks)
            fmt_t = pack_block_ell(mat.transpose().sort_row_major(), bs=bs, dtype=dt)

            fwd_inner = fn

            @jax.custom_vjp
            def fn(x):
                return fwd_inner(x)

            def _fwd(x):
                return fwd_inner(x), None

            def _bwd(_, dy):
                return (block_ell_spmm(fmt_t, dy, precision=precision,
                                       interpret=interpret),)

            fn.defvjp(_fwd, _bwd)

        m, n = mat.shape
        return cls(fn, m, n, bias=bias, meta={"kind": f"block_{bs}"})

    def __call__(self, x) -> jnp.ndarray:
        x = jnp.asarray(x)
        lead = x.shape[:-1]
        assert x.shape[-1] == self.in_features, (
            f"last dim {x.shape[-1]} != in_features {self.in_features}"
        )
        xk = x.reshape(-1, self.in_features).T  # [in, K]
        y = self._apply(xk).T                   # [K, out]
        y = y.reshape(*lead, self.out_features)
        if self.bias is not None:
            y = y + self.bias
        return y


class TrainableSparseLinear:
    """Fixed-pattern, trainable-values sparse layer (init/apply style).

    The pruned-LLM fine-tuning story: the sparsity PATTERN is frozen (as the
    pruning left it) and the surviving values train.  Parameters live in the
    span format's packed [P, NC, G] plane (kernels/sddmm.py), so the
    optimizer step touches device arrays only — no repacking, ever.

        layer = TrainableSparseLinear(w_coo)
        params = layer.init()                  # {'vals': ..., 'bias': ...}
        y = layer.apply(params, x)             # any leading batch dims
        grads = jax.grad(loss)(params, ...)    # dvals via the SDDMM kernel

    Export trained values in COO order with ``layer.export_vals(params)``.
    """

    def __init__(self, mat: CooMatrix, *, bias: bool = True,
                 rb: int = 512, ct: int = 512, g: int = 128,
                 precision: str = "fp32x2", interpret=None):
        from tpusparse.autodiff import spmm_trainable

        self._fn, self._v0 = spmm_trainable(
            mat, rb=rb, ct=ct, g=g, precision=precision, interpret=interpret)
        self.out_features, self.in_features = mat.shape
        self._with_bias = bias

    @property
    def fmt(self):
        return self._fn.fmt

    def init(self) -> dict:
        params = {"vals": self._v0}
        if self._with_bias:
            params["bias"] = jnp.zeros((self.out_features,), jnp.float32)
        return params

    def apply(self, params: dict, x) -> jnp.ndarray:
        x = jnp.asarray(x)
        lead = x.shape[:-1]
        assert x.shape[-1] == self.in_features, (
            f"last dim {x.shape[-1]} != in_features {self.in_features}")
        xk = x.reshape(-1, self.in_features).T        # [in, K]
        y = self._fn(params["vals"], xk).T            # [K, out]
        y = y.reshape(*lead, self.out_features)
        if self._with_bias:
            y = y + params["bias"]
        return y

    def export_vals(self, params: dict) -> np.ndarray:
        """Trained values in the original COO nz order (checkpointing)."""
        from tpusparse.kernels.sddmm import packed_to_nz

        return packed_to_nz(self.fmt, params["vals"])


def flax_sparse_linear(mat: CooMatrix, *, bias: bool = True,
                       rb: int = 512, ct: int = 512, g: int = 128,
                       precision: str = "fp32x2", interpret=None):
    """A ``flax.linen`` module over the trainable-values sparse layer.

    Drop-in for ``nn.Dense`` with a frozen sparsity pattern: the packed
    value plane registers as a flax param ("vals", plus "bias"), so
    ``model.init`` / ``model.apply`` / optax training loops work unchanged
    and gradients run the SDDMM kernel pair (kernels/sddmm.py).

        mod = flax_sparse_linear(w_coo)
        variables = mod.init(rng, x)
        y = mod.apply(variables, x)

    Export trained values in COO order with
    ``kernels.sddmm.packed_to_nz(mod.fmt, variables['params']['vals'])``.
    """
    import flax.linen as fnn

    from tpusparse.autodiff import spmm_trainable

    fn, v0 = spmm_trainable(mat, rb=rb, ct=ct, g=g, precision=precision,
                            interpret=interpret)
    out_f, in_f = mat.shape
    with_bias = bias

    class SparseDense(fnn.Module):
        fmt = fn.fmt

        @fnn.compact
        def __call__(self, x):
            v = self.param("vals", lambda rng: v0)
            lead = x.shape[:-1]
            xk = x.reshape(-1, in_f).T
            y = fn(v, xk).T.reshape(*lead, out_f)
            if with_bias:
                y = y + self.param("bias", fnn.initializers.zeros, (out_f,))
            return y

    return SparseDense()
