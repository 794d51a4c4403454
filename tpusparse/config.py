"""Typed configuration.

The reference keeps a single mutable JSON file (``global_config.json``) that is
re-parsed on *every* ``get_config()`` call and rewritten by ``set_config``
(reference: config.cc:1-41); the tuner mutates keys like ``VECTOR_WIDTH`` and
``DENSE_MATRIX_SIZE`` mid-run (token_test.cc:1043-1054).

TPU-native replacement: one typed dataclass with the keys that still make
sense, process-global with a context-manager override — no filesystem churn,
and schedules carry their own parameters explicitly instead of smuggling them
through global config (the reference's ``VECTOR_WIDTH`` trick).

Key mapping from ``global_config.json.bak`` (38 keys):

  DENSE_MATRIX_SIZE        -> dense_matrix_size (default K of the dense operand)
  HALF / PRECISE_OF_FLOAT  -> dtype / accum_dtype
  VECTOR_WIDTH             -> per-schedule parameter (Schedule.vector_width)
  FIXED_THREAD/WARP_COMBINE_SIZE -> per-schedule blocking params
  MAX_TBLOCK_NUM           -> max_grid_programs
  SHARED_MEM_TOTAL_SIZE    -> vmem_limit_bytes (TPU VMEM, not CUDA smem)
  KERNAL_REPEAT_TIME       -> bench_repeats
  PADDING_RATE_UP_BOUND    -> padding_rate_up_bound
  BRANCH_COMPRESS_MAX_SIZE -> branch_compress_max_size
  MODEL_DRIVEN_INDEX_COMPRESS -> model_driven_index_compress
  OPERATOR_RUNTIME_CHECK   -> operator_runtime_check
  PERFORMANCE_FLAG         -> performance_flag ('throughput'|'latency'|'graph')
  Semiring / Graph_Algorithm / GRAPH_MAX_ITER -> semiring / graph_algorithm / graph_max_iter
  ROOT_PATH_STR / DATA_SET -> cache_dir
  FLOAT_RATE               -> float_rate (FLOPs per nnz per dense column = 2)
  GFLOPS_UP_BOUND          -> gflops_up_bound (plausibility guard, executor.cc:51-55)
  SORT_THREAD_NUM          -> n/a (numpy sorts)
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import os
from typing import Any, Iterator


@dataclasses.dataclass
class Config:
    # Problem defaults
    dense_matrix_size: int = 8          # default K (reference DENSE_MATRIX_SIZE)
    dtype: str = "float32"              # value dtype ('float32' | 'bfloat16' | 'float16')
    accum_dtype: str = "float32"        # accumulation dtype (always fp32 on MXU/VPU)

    # Hardware / kernel limits
    max_grid_programs: int = 65535      # reference MAX_TBLOCK_NUM
    vmem_limit_bytes: int = 128 * 1024 * 1024
    lane_count: int = 128               # TPU lane width
    sublane_count: int = 8              # TPU f32 sublane count

    # Transform / schedule bounds
    padding_rate_up_bound: float = 4.0  # reject schedules that pad > 4x nnz
    branch_compress_max_size: int = 5
    model_driven_index_compress: bool = True
    operator_runtime_check: bool = True

    # Semiring / graph hooks (reference config stubs: Semiring, Graph_Algorithm)
    performance_flag: str = "throughput"  # 'throughput' | 'latency' | 'graph'
    semiring: str = "plus_times"          # 'plus_times' | 'min_plus' | 'or_and'
    graph_algorithm: str = "none"         # 'none' | 'bfs' | 'pr' | 'cc'
    graph_max_iter: int = 100

    # Bench / tuner
    bench_repeats: int = 100            # reference KERNAL_REPEAT_TIME (=10000)
    bench_warmup: int = 10
    float_rate: float = 2.0             # FLOPs per (nnz, dense col): mul+add
    # Plausibility guard (reference GFLOPS_UP_BOUND, executor.cc:51-55).
    # Counted sparse-equivalent FLOPs never exceed executed FLOPs, so no
    # row can honestly beat the v5e MXU bf16 peak (~197 TF/s); the old
    # 1.0e6 default sat 5x ABOVE that peak and let a 239 TF/s
    # memoized-timing artifact into a committed r5 zoo row.
    gflops_up_bound: float = 2.0e5
    seconds_floor: float = 2.0e-6       # timings under ~2us are dispatch-
                                        # impossible on any attached chip
    cache_dir: str = os.path.join(os.path.expanduser("~"), ".cache", "tpusparse")

    # Numeric tolerances (reference: rel 1e-2 half; we add strict fp32)
    tol_fp32: float = 1.0e-5
    tol_bf16: float = 1.0e-2

    def replace(self, **kwargs: Any) -> "Config":
        return dataclasses.replace(self, **kwargs)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "Config":
        data = json.loads(text)
        field_names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in data.items() if k in field_names})


_GLOBAL = Config()


def get_config() -> Config:
    """Current process-global config (immutable snapshot semantics)."""
    return _GLOBAL


def set_config(**kwargs: Any) -> Config:
    """Update the process-global config in place; returns the new config."""
    global _GLOBAL
    _GLOBAL = _GLOBAL.replace(**kwargs)
    return _GLOBAL


@contextlib.contextmanager
def config_override(**kwargs: Any) -> Iterator[Config]:
    """Scoped config override (the tuner uses this instead of the reference's
    mid-run global_config.json rewrites)."""
    global _GLOBAL
    saved = _GLOBAL
    _GLOBAL = _GLOBAL.replace(**kwargs)
    try:
        yield _GLOBAL
    finally:
        _GLOBAL = saved
