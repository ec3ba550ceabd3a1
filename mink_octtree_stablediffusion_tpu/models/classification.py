"""ModelNet40 classification models.

TPU-native re-design of `examples/classification_modelnet40.py`:
`MinkowskiFCNN` (TensorField → mlp → voxelize → conv/pool pyramid → slice back
to points → cat → embedding convs → global max+avg → MLP head) and
`MinkowskiSplatFCNN` (splat/interpolate variant).  ``slice`` is expressed as a
hashed lookup of each point's voxel at the pyramid tensor's stride — exact
parity with the reference's stride-composed inverse mapping
(`MinkowskiTensorField.py:408-450`).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.neighbors import grid_lookup
from ..ops.conv import gather_rows
from ..tensor import SparseTensor, TensorField
from ..nn.conv import SparseConv
from ..nn.norm import BatchNorm
from ..nn.pool import LocalPool, global_pool_features


def field_slice(tensor: SparseTensor, field: TensorField) -> jnp.ndarray:
    """Features of the voxel containing each field point [M, C]; zero for
    points whose voxel was pooled away (reference `.slice()` semantics)."""
    s = jnp.asarray(tensor.tensor_stride, jnp.int32)
    vox = jnp.concatenate(
        [field.coordinates[:, :1].astype(jnp.int32),
         (jnp.floor(field.coordinates[:, 1:] / s) * s).astype(jnp.int32)],
        axis=-1)
    idx = grid_lookup(tensor.grid, vox, field.valid)
    return gather_rows(tensor.features, idx)


class _MLPBlock(nn.Module):
    out_channels: int
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.with_features(nn.Dense(self.out_channels, use_bias=False)(x.features))
        x = BatchNorm(axis_name=self.axis_name)(x, train=train)
        return x.with_features(jax.nn.leaky_relu(x.features))


class _ConvBlock(nn.Module):
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    out_capacity: int | None = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: SparseTensor, train: bool = True) -> SparseTensor:
        x = SparseConv(self.out_channels, self.kernel_size, self.stride,
                       out_capacity=self.out_capacity)(x)
        x = BatchNorm(axis_name=self.axis_name)(x, train=train)
        return x.with_features(jax.nn.leaky_relu(x.features))


class MinkowskiFCNN(nn.Module):
    """`classification_modelnet40.py:68-218`."""

    out_channel: int = 40
    embedding_channel: int = 1024
    channels: Sequence[int] = (32, 48, 64, 96, 128)
    voxel_capacity: int = 4096
    axis_name: str | None = None

    @nn.compact
    def __call__(self, field: TensorField, train: bool = True,
                 dropout_rng: jax.Array | None = None) -> jnp.ndarray:
        ch = self.channels
        x = _MLPBlock(ch[0], self.axis_name, name="mlp1")(field, train)
        y, _ = x.sparse(capacity=self.voxel_capacity)

        # Level capacities by STRIDE level l (stride 2^l): sampled point
        # clouds merge <2x on the first stride doublings (512 points of a
        # unit sphere at 0.05 voxels occupy ~80% as many stride-2 cells),
        # so early levels keep the full budget and the decay starts at s8.
        # The old cap//8^level schedule overflowed the FIRST pool ~5x, and
        # overflow drops rows in key order — batch 0 sorts first, so every
        # other instance lost ALL its voxels and the classifier sat at
        # chance while batch 0 carried the loss (r2 debugging).
        def lcap(l: int) -> int:
            return max(self.voxel_capacity >> max(l - 2, 0), 128)

        pool = lambda l: LocalPool(kernel_size=3, stride=2, mode="max",
                                   out_capacity=lcap(l))
        y = _ConvBlock(ch[1], 3, 1, axis_name=self.axis_name, name="conv1")(y, train)
        y1 = pool(1)(y)                                              # s2
        y = _ConvBlock(ch[2], 3, 2, lcap(2), self.axis_name, name="conv2")(y1, train)
        y2 = pool(3)(y)                                              # s8
        y = _ConvBlock(ch[3], 3, 2, lcap(4), self.axis_name, name="conv3")(y2, train)
        y3 = pool(5)(y)                                              # s32
        y = _ConvBlock(ch[4], 3, 2, lcap(6), self.axis_name, name="conv4")(y3, train)
        y4 = pool(7)(y)                                              # s128

        feats = jnp.concatenate(
            [field_slice(t, field) for t in (y1, y2, y3, y4)], axis=-1)
        xcat = field.with_features(feats)
        y, _ = xcat.sparse(capacity=self.voxel_capacity)

        ec = self.embedding_channel
        y = _ConvBlock(ec // 4, 3, 2, lcap(1), self.axis_name, name="conv5_0")(y, train)
        y = _ConvBlock(ec // 2, 3, 2, lcap(2), self.axis_name, name="conv5_1")(y, train)
        y = _ConvBlock(ec, 3, 2, lcap(3), self.axis_name, name="conv5_2")(y, train)

        g = jnp.concatenate([global_pool_features(y, "max"),
                             global_pool_features(y, "avg")], axis=-1)
        h = nn.Dense(512, use_bias=False, name="final_0")(g)
        h = nn.BatchNorm(use_running_average=not train, name="final_bn0")(h)
        h = jax.nn.leaky_relu(h)
        h = nn.Dropout(0.5, deterministic=not train)(
            h, rng=dropout_rng) if train and dropout_rng is not None else h
        h = nn.Dense(512, use_bias=False, name="final_1")(h)
        h = nn.BatchNorm(use_running_average=not train, name="final_bn1")(h)
        h = jax.nn.leaky_relu(h)
        return nn.Dense(self.out_channel, name="final_out")(h)


class MinkowskiSplatFCNN(MinkowskiFCNN):
    """`classification_modelnet40.py:233-273`: splat the field onto lattice
    corners instead of nearest-voxel quantization."""

    @nn.compact
    def __call__(self, field: TensorField, train: bool = True,
                 dropout_rng: jax.Array | None = None) -> jnp.ndarray:
        ch = self.channels
        x = _MLPBlock(ch[0], self.axis_name, name="mlp1")(field, train)
        y = x.splat(capacity=self.voxel_capacity)

        # same stride-indexed schedule as MinkowskiFCNN (see the capacity
        # note there — the 8^level decay starved every instance but batch 0)
        def lcap(l: int) -> int:
            return max(self.voxel_capacity >> max(l - 2, 0), 128)

        pool = lambda l: LocalPool(kernel_size=3, stride=2, mode="max",
                                   out_capacity=lcap(l))
        y = _ConvBlock(ch[1], 3, 1, axis_name=self.axis_name, name="conv1")(y, train)
        y1 = pool(1)(y)
        y = _ConvBlock(ch[2], 3, 2, lcap(2), self.axis_name, name="conv2")(y1, train)
        y2 = pool(3)(y)
        y = _ConvBlock(ch[3], 3, 2, lcap(4), self.axis_name, name="conv3")(y2, train)
        y3 = pool(5)(y)
        y = _ConvBlock(ch[4], 3, 2, lcap(6), self.axis_name, name="conv4")(y3, train)
        y4 = pool(7)(y)

        from ..tensor import interpolate_at
        feats = jnp.concatenate(
            [interpolate_at(t, field.coordinates, field.valid)
             for t in (y1, y2, y3, y4)], axis=-1)
        xcat = field.with_features(feats)
        y = xcat.splat(capacity=self.voxel_capacity)

        ec = self.embedding_channel
        y = _ConvBlock(ec // 4, 3, 2, lcap(1), self.axis_name, name="conv5_0")(y, train)
        y = _ConvBlock(ec // 2, 3, 2, lcap(2), self.axis_name, name="conv5_1")(y, train)
        y = _ConvBlock(ec, 3, 2, lcap(3), self.axis_name, name="conv5_2")(y, train)

        g = jnp.concatenate([global_pool_features(y, "max"),
                             global_pool_features(y, "avg")], axis=-1)
        h = nn.Dense(512, use_bias=False, name="final_0")(g)
        h = nn.BatchNorm(use_running_average=not train, name="final_bn0")(h)
        h = jax.nn.leaky_relu(h)
        h = nn.Dense(512, use_bias=False, name="final_1")(h)
        h = nn.BatchNorm(use_running_average=not train, name="final_bn1")(h)
        h = jax.nn.leaky_relu(h)
        return nn.Dense(self.out_channel, name="final_out")(h)
