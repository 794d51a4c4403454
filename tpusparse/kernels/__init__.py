"""Pallas SpMM kernels (reference L5: code_generator + reduction tokens).

Where the reference *prints CUDA text* specialized per (matrix, schedule)
(token AST + reduction templates, SURVEY.md §2.4), tpusparse *traces Python
functions* specialized by static arguments — block shapes, coarsening,
reduce-kind — which is the idiomatic XLA/Mosaic equivalent of string codegen:
each (matrix, schedule) still gets its own compiled TPU binary, produced by
the Mosaic compiler from a parameterized kernel.

Kernel modules and their reference reduction-template counterparts:

  radix_gather    the small-K champion (and the SpMV path at kt=1):
                  lane-packed X + 3 full-lane one-hot dots per chunk; the
                  lane packing is the TPU realization of the reference's
                  interleaved storage (interlance_storage_operator), and
                  pack_brick_ell runs the literal ELL-pad + interleave
                  layout through the same kernel for the measured
                  head-to-head (schedule families: radix_span, brick_ell).
  span_gather     column-sorted dynamic-window one-hot chunks (families:
                  span_onehot, span_colsplit; fp32 HIGHEST mode lives here).
  tile_onehot     fixed column tiles, streaming-X variant for large N
                  (family: tile_onehot).
  stripe_gather   total_BMT/total_warp/total_block_..._to_one_register:
                  row-aligned stripes, one owner per row, direct store —
                  flat (stripe_total) and two-level nested (stripe_nested)
                  with parent-relative warp offsets.
  nnz_split       thread_bit_map_reduce_to_two_register + warp/tblock bitmap
                  & segment tokens: nnz-direction chunks, per-segment
                  partials + combine pass (TPU has no atomics); families
                  nnz_segment and segment_span.
  dg_gather       dynamic-gather SpMM/SpMV (K<=128 champion and the SpMV
                  default): Mosaic's 128-lane VPU dynamic-gather replaces
                  the gather/collapse one-hot MXU dots; scatter stays the
                  joint-encoded one-hot dot.  Near-fp32 accuracy (the
                  gather is exact; only v*x is hi/lo split).
  block_ell       dense-block MXU path (BASELINE.json block sparsity;
                  XLA batched-einsum formulation — beats dense at >=15%
                  block fill).  W8A8 int8 serving mode: per-row weight +
                  per-column activation scales, int8·int8→int32 einsum
                  (pack_block_ell(dtype=int8)).
  nm_structured   N:M (2:4) structured sparsity on the MXU (capacity play;
                  see PERF.md for the honest throughput analysis).  W8A16
                  int8 serving mode: weight-only quantization, integer
                  values dot exactly in bf16, 0.375x dense-bf16 capacity
                  (pack_nm(dtype=int8)).
  sddmm           no reference counterpart (training story): span-layout
                  SDDMM value-grad + transpose-free input-grad powering
                  autodiff.spmm_trainable, plus the public sddmm() op.
"""

from tpusparse.kernels.common import kernel_backend_interpret

__all__ = ["kernel_backend_interpret"]
