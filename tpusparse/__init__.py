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

from tpusparse.config import Config, get_config, set_config
from tpusparse.levels import Level
from tpusparse.meta.set import MetaDataSet
from tpusparse.meta.item import MetaDataItem, narrow_dtype

__version__ = "0.1.0"

__all__ = [
    "Config",
    "get_config",
    "set_config",
    "Level",
    "MetaDataSet",
    "MetaDataItem",
    "narrow_dtype",
]
