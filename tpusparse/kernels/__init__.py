"""Pallas SpMM kernels (reference L5: code_generator + reduction tokens).

Where the reference *prints CUDA text* specialized per (matrix, schedule)
(token AST + reduction templates, SURVEY.md §2.4), tpusparse *traces Python
functions* specialized by static arguments — block shapes, coarsening,
reduce-kind — which is the idiomatic XLA/Mosaic equivalent of string codegen:
each (matrix, schedule) still gets its own compiled TPU binary, produced by
the Mosaic compiler from a parameterized kernel.

Kernel families and their reference reduction-template counterparts:

  stripe_gather   total_BMT/total_warp/total_block_..._to_one_register:
                  row-aligned stripes, one owner per row, direct store.
  nnz_split       thread_bit_map_reduce_to_two_register + warp/tblock bitmap
                  & segment tokens: nnz-direction chunks, per-segment
                  partials + combine pass (TPU has no atomics).
  brick_ell       interleaved ELL + vectorized Load() coarsening: dense
                  8 x bw bricks, one dynamic X-slice + small matmul each.
  bsr_mxu         (no direct reference counterpart; the MXU dense-tile path
                  mandated by BASELINE.json for block/N:M sparsity)
"""

from tpusparse.kernels.common import kernel_backend_interpret

__all__ = ["kernel_backend_interpret"]
