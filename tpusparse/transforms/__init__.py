"""Data-transform steps (reference L3).

The reference implements 118 single-purpose array-rewrite classes under
``transform_step/`` (SURVEY.md §2.2).  Here each *group* collapses into one
vectorized numpy function over a :class:`~tpusparse.meta.set.MetaDataSet`;
every function records provenance on ``ms.trace``.

  reference group                         tpusparse module
  -------------------------------------   -----------------------------
  sort / reorder steps                    transforms.sort
  matrix div (fixed rows / row-nnz)       transforms.div
  BMTB/BMW/BMT blocking (all directions)  transforms.block
  padding steps                           transforms.pad
  interleave storage                      transforms.interleave
  bitmap / segment arrays                 transforms.segment
  merge-path partition                    transforms.block (merge_path)
  model-driven index compression          transforms.compress
"""

from tpusparse.transforms.sort import (
    get_row_order_by_length,
    get_row_order_by_col,
    reorder_by_row_order,
    remove_empty_rows_in_end,
)
from tpusparse.transforms.div import fixed_div_by_rows, div_by_row_nnz
from tpusparse.transforms.block import (
    block_fixed_interval_rows,
    block_balanced_nnz_rows,
    block_fixed_nnz,
    block_merge_path,
    block_fixed_interval_cols,
    block_group_children,
    add_relative_to_parent,
    add_child_offsets,
    add_block_sizes,
    merge_adjacent_blocks,
)
from tpusparse.transforms.pad import (
    padding_rate,
    pad_rows_to_multiple,
    pad_row_nnz_to_multiple,
    pad_block_rows_to_max,
    pad_empty_rows,
    pad_nnz_to_multiple,
    pad_blocks_to_uniform_nnz,
)
from tpusparse.transforms.interleave import interleave_storage
from tpusparse.transforms.segment import (
    thread_bit_map,
    parent_bit_map_of_thread,
    segment_ptr,
    segment_offset,
)
from tpusparse.transforms.compress import detect_compression, CompressInfo

__all__ = [
    "get_row_order_by_length",
    "get_row_order_by_col",
    "reorder_by_row_order",
    "remove_empty_rows_in_end",
    "fixed_div_by_rows",
    "div_by_row_nnz",
    "block_fixed_interval_rows",
    "block_balanced_nnz_rows",
    "block_fixed_nnz",
    "block_merge_path",
    "block_fixed_interval_cols",
    "block_group_children",
    "add_relative_to_parent",
    "add_child_offsets",
    "add_block_sizes",
    "merge_adjacent_blocks",
    "pad_rows_to_multiple",
    "pad_row_nnz_to_multiple",
    "pad_block_rows_to_max",
    "pad_empty_rows",
    "pad_nnz_to_multiple",
    "pad_blocks_to_uniform_nnz",
    "padding_rate",
    "interleave_storage",
    "thread_bit_map",
    "parent_bit_map_of_thread",
    "segment_ptr",
    "segment_offset",
    "detect_compression",
    "CompressInfo",
]
