from tpusparse.bench.baselines import dense_spmm_fn, bcoo_spmm_fn, xla_segment_spmm_fn
from tpusparse.bench.harness import time_fn, gflops

__all__ = ["dense_spmm_fn", "bcoo_spmm_fn", "xla_segment_spmm_fn", "time_fn", "gflops"]
