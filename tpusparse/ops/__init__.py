"""Operators (reference L4) — the tuning/schedule vocabulary.

Each operator bundles a coherent group of transform steps behind two validity
gates (reference: basic_operator::is_valid_according_to_metadata /
is_valid_according_to_operator, operator.hpp:64-189) and runs through an
executor that records history and implements the padding rollback
(operator_executer.{hpp,cc}; rollback semantics from
fixed_interval_row_direction_thread_blocking_operator.cc:225-317).
"""

from tpusparse.ops.base import Stage, BasicOperator, OperatorContext, OperatorExecutor, InvalidOperator
from tpusparse.ops.converting import (
    SortOperator,
    FixedIntervalRowMatrixDivOperator,
    RowNnzMatrixDivOperator,
    EmptyRowPadOperator,
    RowPadToMultipleOperator,
    InterleaveStorageOperator,
    CalculationMethodChooseOperator,
)
from tpusparse.ops.distributing import (
    FixedIntervalRowBlockingOperator,
    FixedIntervalColBlockingOperator,
    BalancedNnzRowBlockingOperator,
    FixedNnzBlockingOperator,
    MergePathBlockingOperator,
    RelativeIndexOperator,
    ChildOffsetsOperator,
    GroupChildrenBlockingOperator,
    MergeAdjacentBlocksOperator,
)
from tpusparse.ops.implementing import (
    UniformBlockPadOperator,
    EllBlockPadOperator,
    ThreadTotalReduceOperator,
    SegmentReduceOperator,
    TileOneHotImplementOperator,
    GridBlockOperator,
)

__all__ = [
    "Stage",
    "BasicOperator",
    "OperatorContext",
    "OperatorExecutor",
    "InvalidOperator",
    "SortOperator",
    "FixedIntervalRowMatrixDivOperator",
    "RowNnzMatrixDivOperator",
    "EmptyRowPadOperator",
    "RowPadToMultipleOperator",
    "InterleaveStorageOperator",
    "CalculationMethodChooseOperator",
    "FixedIntervalRowBlockingOperator",
    "FixedIntervalColBlockingOperator",
    "BalancedNnzRowBlockingOperator",
    "FixedNnzBlockingOperator",
    "MergePathBlockingOperator",
    "GroupChildrenBlockingOperator",
    "MergeAdjacentBlocksOperator",
    "RelativeIndexOperator",
    "ChildOffsetsOperator",
    "UniformBlockPadOperator",
    "EllBlockPadOperator",
    "ThreadTotalReduceOperator",
    "SegmentReduceOperator",
    "TileOneHotImplementOperator",
    "GridBlockOperator",
]
