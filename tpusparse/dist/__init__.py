from tpusparse.dist.shard import (
    make_mesh,
    shard_stripe_format,
    build_sharded_stripe_spmm,
)

__all__ = ["make_mesh", "shard_stripe_format", "build_sharded_stripe_spmm"]
