"""Two-level (TBLOCK⊃WARP) nested stripe schedule: parent-relative indices
and child offsets packed into a device format, kernel loops warps inside
each program (VERDICT r1 #3)."""

import numpy as np
import pytest

from tpusparse.io import builder
from tpusparse.oracle import check_result, spmm_reference
from tpusparse.schedule import Schedule, build_plan


@pytest.mark.parametrize("work", [128, 512])
def test_stripe_nested_vs_oracle(work):
    mat = builder.power_law_coo(300, 400, avg_nnz_per_row=6.0, seed=7)
    x = np.random.default_rng(1).standard_normal((400, 8)).astype(np.float32)
    plan = build_plan(mat, Schedule(family="stripe_nested",
                                    work_per_block=work, unroll=4))
    y = np.asarray(plan(x))
    check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=1e-5)
    hist = plan.meta["operator_history"]
    for tok in ("balanced_nnz_blocking", "merge_adjacent_blocks",
                "group_children_blocking", "child_offsets", "relative_index",
                "grid_block"):
        assert tok in hist, tok


def test_stripe_nested_format_invariants():
    from tpusparse.format import pack_stripe_nested
    from tpusparse.meta.set import create_init_metadata_set
    from tpusparse.levels import Level
    from tpusparse.ops import (BalancedNnzRowBlockingOperator,
                               ChildOffsetsOperator,
                               GroupChildrenBlockingOperator,
                               OperatorExecutor, RelativeIndexOperator)

    mat = builder.uniform_coo(256, 300, nnz_per_row=6, seed=4)
    ms = create_init_metadata_set(mat)
    ex = OperatorExecutor(ms)
    ex.add_and_run(BalancedNnzRowBlockingOperator(0, Level.WARP, 64))
    ex.add_and_run(GroupChildrenBlockingOperator(0, Level.TBLOCK, Level.WARP, 8))
    ex.add_and_run(ChildOffsetsOperator(0, Level.TBLOCK, Level.WARP))
    ex.add_and_run(RelativeIndexOperator(0, Level.WARP, Level.TBLOCK))
    fmt = pack_stripe_nested(ms, 0, out_rows=256, unroll=8)
    wnz = np.asarray(fmt.wnz)
    wrow = np.asarray(fmt.wrow)
    # warp offsets: monotone, unroll-aligned, within the stripe budget
    assert (np.diff(wnz[:, 0, :], axis=1) >= 0).all()
    assert (wnz % 8 == 0).all()
    assert wnz.max() <= fmt.stripe_nnz
    # relative row offsets stay inside the stripe
    assert wrow.min() >= 0 and wrow.max() <= fmt.max_rows_per_stripe
    # warp-local lrow is small (the point of relative indices)
    assert np.asarray(fmt.lrow).max() < fmt.max_rows_per_stripe


def test_grid_block_operator_is_live():
    """GridBlockOperator's ktile/k_unroll metadata is what the kernels
    consume (not a side channel)."""
    from tpusparse.levels import Level
    from tpusparse.meta.set import create_init_metadata_set
    from tpusparse.ops import GridBlockOperator, OperatorExecutor

    mat = builder.power_law_coo(100, 80, avg_nnz_per_row=4.0, seed=1)
    ms = create_init_metadata_set(mat)
    ex = OperatorExecutor(ms)
    ex.add_and_run(GridBlockOperator(0, ktile=64, unroll=2))
    assert int(ms.get(Level.GLOBAL, "ktile", 0)) == 64
    assert int(ms.get(Level.GLOBAL, "k_unroll", 0)) == 2
    # plan honors the metadata: history shows grid_block before packing
    plan = build_plan(mat, Schedule(family="stripe_total", work_per_block=64,
                                    unroll=2))
    assert "grid_block" in plan.meta["operator_history"]


def test_merge_adjacent_blocks_transform():
    from tpusparse.levels import Level
    from tpusparse.meta.set import create_init_metadata_set
    from tpusparse import transforms as T

    mat = builder.power_law_coo(200, 160, avg_nnz_per_row=6.0, seed=3)
    ms = create_init_metadata_set(mat)
    n0 = T.block_balanced_nnz_rows(ms, 0, Level.WARP, 16)
    n1 = T.merge_adjacent_blocks(ms, 0, Level.WARP, 64)
    assert n1 < n0
    nzs = ms.get(Level.WARP, "first_nz_indices", 0)
    assert (np.diff(nzs) <= 64).all() or (np.diff(nzs) > 0).all()


def test_stripe_ktile_not_lane_divisible_sanitized():
    """A user ktile smaller than K that is not 128-divisible cannot lower
    on Mosaic (X block lane dim rule); the stripe paths fall back to the
    single-tile width (found by on-chip fuzz)."""
    from tpusparse.schedule import Schedule, build_plan

    mat = builder.power_law_coo(200, 160, avg_nnz_per_row=6.0, seed=3)
    x = np.random.default_rng(1).standard_normal((160, 32)).astype(np.float32)
    for fam in ("stripe_total", "stripe_nested"):
        plan = build_plan(mat, Schedule(family=fam, work_per_block=256,
                                        unroll=4, ktile=8))
        y = np.asarray(plan(x))
        check_result(y, spmm_reference(mat, x.astype(np.float64)), rtol=1e-4)
