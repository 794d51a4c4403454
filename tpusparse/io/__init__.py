from tpusparse.io.mtx import CooMatrix, read_mtx, write_mtx
from tpusparse.io.builder import (
    uniform_coo,
    power_law_coo,
    banded_coo,
    pruned_weight_coo,
    nm_pruned_dense,
    block_sparse_coo,
)

__all__ = [
    "CooMatrix",
    "read_mtx",
    "write_mtx",
    "uniform_coo",
    "power_law_coo",
    "banded_coo",
    "pruned_weight_coo",
    "nm_pruned_dense",
    "block_sparse_coo",
]
