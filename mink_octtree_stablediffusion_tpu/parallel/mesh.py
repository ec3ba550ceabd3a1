"""Device meshes and data-parallel sharding.

TPU-native replacement for the reference's distribution strategy: DDP over
NCCL (`examples/multigpu_ddp.py:75-125`, Lightning
``strategy='ddp_find_unused_parameters_true'``) becomes single-program
data-parallel `jit` over a `jax.sharding.Mesh` — parameters replicated,
batch rows sharded on the ``data`` axis, gradients averaged by XLA `psum`
riding ICI.  SyncBatchNorm (`MinkowskiNormalization.py:105-195`) is the
``axis_name`` argument of `nn.BatchNorm` combined with `shard_map`-style
collectives; under plain `jit` + sharded batch, XLA's SPMD partitioner
inserts the same collectives automatically.

Multi-host: call `jax.distributed.initialize()` before `data_parallel_mesh`
and the same code spans hosts over DCN (standard JAX runtime; no custom
backend — the reference has none either, SURVEY.md §2.5).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(num_devices: Optional[int] = None,
                       axis_name: str = "data",
                       devices: Optional[Sequence[Any]] = None) -> Mesh:
    """1-D mesh over all (or the first N) local devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices is not None:
        if len(devs) < num_devices:
            raise ValueError(
                f"need {num_devices} devices, have {len(devs)}")
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (row/batch) axis across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, schedulers)."""
    return NamedSharding(mesh, P())


def shard_batch_pytree(batch: Any, mesh: Mesh, axis_name: str = "data"):
    """Place every array of a batch pytree with its leading axis sharded.

    For SparseTensor batches built per-device (each device holds its own
    instances), the capacity axis is the leading axis: rows of different
    devices never interact in conv/pool (kernel maps are per-shard), so
    sharding it is safe as long as each device's rows form whole instances —
    the collation layer guarantees that by building one fixed-capacity
    buffer per device and stacking.
    """
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up over DCN (replaces the reference's
    `dist.init_process_group(backend="nccl", tcp://...)`,
    `examples/multigpu_ddp.py:81-86`).  With no arguments, uses the standard
    JAX cluster auto-detection; afterwards the same single-program
    data-parallel code spans hosts."""
    import jax

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
