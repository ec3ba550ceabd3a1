"""Parallelism: device meshes + data-parallel training utilities."""

from .mesh import (
    batch_sharding,
    initialize_distributed,
    data_parallel_mesh,
    replicate,
    shard_batch_pytree,
)

__all__ = ["batch_sharding", "data_parallel_mesh",
           "initialize_distributed", "replicate", "shard_batch_pytree"]
