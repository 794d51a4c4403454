"""tpusparse — a TPU-native sparse linear-algebra framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of GeneralSparse
(reference: loyer-yuan/GeneralSparse): schedule-driven SpMM / SpMV / SpGEMM /
batched SpMM for unstructured and structured (N:M, block) sparse matrices.

The reference's architecture maps onto this package as follows (see SURVEY.md):

  reference (CUDA/C++)                      tpusparse (JAX/XLA/Pallas)
  ----------------------------------------  -----------------------------------
  config.cc global_config.json       (L0)   tpusparse.config.Config
  struct.cc matrix I/O               (L1)   tpusparse.io (mtx, builder)
  metadata_set.cc meta_data_set      (L2)   tpusparse.meta.MetaDataSet
  transform_step/ (118 steps)        (L3)   tpusparse.transforms (pure numpy fns)
  operator/ (25 operators)           (L4)   tpusparse.ops (validity-gated ops)
  code_generator + kernel/reduction  (L5)   tpusparse.kernels (Pallas kernels,
    tokens (CUDA string codegen)             parameterized by static schedule args)
  token_test.cc tuner driver         (L6)   tpusparse.schedule + tpusparse.tune
  data_source/<id> artifact cache    (L7)   tpusparse.meta.set format cache (npz)
  (absent in reference)                     tpusparse.dist (multi-chip shard_map)
"""

from tpusparse.config import Config, get_config, set_config, config_override
from tpusparse.levels import Level
from tpusparse.meta.set import MetaDataSet
from tpusparse.meta.item import MetaDataItem, narrow_dtype
from tpusparse.io.mtx import CooMatrix, read_mtx, write_mtx

__version__ = "0.1.0"


def spmm(mat, x, schedule=None, **kwargs):
    """One-shot SpMM: Y = A @ X.  With no schedule, picks the benched
    default for the K regime (dg_span at K<=32, span_onehot to K<=128,
    tile_onehot above, all VMEM-gated); pass a Schedule
    (tpusparse.Schedule) to control it, or use tpusparse.tune.tune for
    the autotuned path."""
    from tpusparse.schedule import build_plan, default_schedule

    if schedule is None:
        schedule = default_schedule(mat, x.shape[-1])
    plan = build_plan(mat, schedule, **kwargs)
    return plan(x)


def _lazy(name):
    import importlib

    mod, attr = name.rsplit(".", 1)
    return getattr(importlib.import_module(mod), attr)


def __getattr__(name):
    lazy_map = {
        "Schedule": "tpusparse.schedule.Schedule",
        "build_plan": "tpusparse.schedule.build_plan",
        "autotune": "tpusparse.tune.tune",
        "SpmmPlan": "tpusparse.generator.SpmmPlan",
        "SparseLinear": "tpusparse.nn.SparseLinear",
        "spmv": "tpusparse.spmv.spmv",
        "spgemm": "tpusparse.spgemm.spgemm",
        "spgemm_fn": "tpusparse.spgemm.spgemm_fn",
        "batched_spmm": "tpusparse.batched.batched_spmm",
        "spmm_fn": "tpusparse.autodiff.spmm_fn",
        "spmm_trainable": "tpusparse.autodiff.spmm_trainable",
        "sddmm": "tpusparse.kernels.sddmm.sddmm",
        "TrainableSparseLinear": "tpusparse.nn.TrainableSparseLinear",
        "flax_sparse_linear": "tpusparse.nn.flax_sparse_linear",
        "semiring_spmv": "tpusparse.graph.semiring_spmv",
    }
    if name in lazy_map:
        return _lazy(lazy_map[name])
    raise AttributeError(name)


__all__ = [
    "Config",
    "get_config",
    "set_config",
    "config_override",
    "Level",
    "MetaDataSet",
    "MetaDataItem",
    "narrow_dtype",
    "CooMatrix",
    "read_mtx",
    "write_mtx",
    "spmm",
    "Schedule",
    "build_plan",
    "autotune",
    "SpmmPlan",
]
