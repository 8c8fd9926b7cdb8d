"""Parallelism layer (SURVEY.md §2.6/§5.8): device mesh + sharding rules."""

from sstts.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)

__all__ = ["batch_sharding", "make_mesh", "replicated_sharding", "shard_batch"]
