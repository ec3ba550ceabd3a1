"""Pooling / broadcast layer modules over sparse tensors.

Re-designs `MinkowskiEngine/MinkowskiPooling.py` and `MinkowskiBroadcast.py`
as functional flax modules: local pooling reuses the padded kernel maps,
global pooling and broadcast are masked segment ops on the batch column.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ..ops import (
    KernelSpec,
    RegionType,
    SparseGrid,
    broadcast_batch,
    global_pool,
    kernel_map,
    local_pool_apply,
    stride_grid,
)
from ..tensor import SparseTensor, cat

Size = Union[int, Tuple[int, ...]]


class LocalPool(nn.Module):
    """Sum/avg/max pooling over the kernel neighborhood (reference
    `MinkowskiAvgPooling`/`SumPooling`/`MaxPooling`,
    `MinkowskiPooling.py:195-440`)."""

    kernel_size: Size = 2
    stride: Size = 2
    dilation: Size = 1
    mode: str = "avg"
    region_type: RegionType = RegionType.HYPER_CUBE
    out_capacity: Optional[int] = None
    ndim: int = 3

    @nn.compact
    def __call__(self, x: SparseTensor, out_grid: Optional[SparseGrid] = None
                 ) -> SparseTensor:
        spec = KernelSpec(self.kernel_size, self.stride, self.dilation,
                          ndim=self.ndim, region_type=self.region_type)
        if out_grid is None:
            if all(s == 1 for s in spec.stride):
                out_grid = x.grid
            else:
                out_grid = stride_grid(x.grid, spec.stride,
                                       self.out_capacity or x.capacity)
        nbr = kernel_map(x.grid, out_grid, spec)
        out, _ = local_pool_apply(x.features, nbr, self.mode)
        return SparseTensor(grid=out_grid, features=out).mask_features()


class PoolTranspose(nn.Module):
    """Unpooling to a known finer grid (reference `MinkowskiPoolingTranspose`,
    `MinkowskiPooling.py:513-580`): each fine voxel averages its coarse
    kernel neighbors."""

    kernel_size: Size = 2
    stride: Size = 2
    dilation: Size = 1
    mode: str = "avg"
    ndim: int = 3

    @nn.compact
    def __call__(self, x: SparseTensor, out_grid: SparseGrid) -> SparseTensor:
        spec = KernelSpec(self.kernel_size, self.stride, self.dilation,
                          ndim=self.ndim, transpose=True)
        nbr = kernel_map(x.grid, out_grid, spec)
        out, _ = local_pool_apply(x.features, nbr, self.mode)
        return SparseTensor(grid=out_grid, features=out).mask_features()


def global_pool_features(x: SparseTensor, mode: str = "avg") -> jnp.ndarray:
    """Per-instance [B, C] reduction (reference `MinkowskiGlobalPooling`,
    `MinkowskiPooling.py:632-750`)."""
    out, _ = global_pool(x.features, x.grid.batch_ids(), x.batch_size,
                         x.valid, mode)
    return out


class GlobalPool(nn.Module):
    mode: str = "avg"

    def __call__(self, x: SparseTensor) -> jnp.ndarray:
        return global_pool_features(x, self.mode)


def broadcast_op(x: SparseTensor, per_batch: jnp.ndarray, op: str = "add"
                 ) -> SparseTensor:
    """Combine per-instance vectors with every voxel (reference
    `MinkowskiBroadcastAddition/Multiplication`, `MinkowskiBroadcast.py`)."""
    b = broadcast_batch(per_batch, x.grid.batch_ids(), x.valid)
    if op == "add":
        return x.with_features(x.features + b)
    if op == "mul":
        return x.with_features(x.features * b)
    if op == "copy":
        return x.with_features(b)
    raise ValueError(op)


def broadcast_concat(x: SparseTensor, per_batch: jnp.ndarray) -> SparseTensor:
    """`MinkowskiBroadcastConcatenation` (`MinkowskiBroadcast.py:218-253`)."""
    b = broadcast_batch(per_batch, x.grid.batch_ids(), x.valid)
    return x.with_features(jnp.concatenate([x.features, b], axis=-1))


class GlobalMaxAvgPool(nn.Module):
    """cat(global max, global avg) head used by the classification model
    (`examples/classification_modelnet40.py:221-231`)."""

    def __call__(self, x: SparseTensor) -> jnp.ndarray:
        mx = global_pool_features(x, "max")
        av = global_pool_features(x, "avg")
        return jnp.concatenate([mx, av], axis=-1)
