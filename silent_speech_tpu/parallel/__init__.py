"""Device-mesh parallelism: sharding rules and batch placement."""

from .mesh import (
    make_mesh,
    param_partition_spec,
    batch_sharding,
    shard_params,
    shard_batch,
)

__all__ = [
    "make_mesh", "param_partition_spec", "batch_sharding", "shard_params",
    "shard_batch",
]
