"""Parallelism: device meshes + data-parallel training utilities."""

from .tp import dp_tp_mesh, param_shardings, param_spec, shard_model_params
from .mesh import (
    batch_sharding,
    initialize_distributed,
    data_parallel_mesh,
    replicate,
    shard_batch_pytree,
)

__all__ = ["batch_sharding", "data_parallel_mesh", "dp_tp_mesh",
           "param_shardings", "param_spec", "shard_model_params",
           "initialize_distributed", "replicate", "shard_batch_pytree"]
