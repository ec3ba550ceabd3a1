"""Sparse ResNet classifiers.

TPU-native re-design of `examples/resnet.py:53-235` (`ResNetBase` + 14/18/
34/50/101): conv k3 s2 stem → max-pool → four strided residual stages →
global avg pool → linear head.
"""

from __future__ import annotations

from typing import Sequence, Type

import flax.linen as nn
import jax

from ..tensor import SparseTensor
from ..nn.blocks import ResBasicBlock, ResBottleneck
from ..nn.conv import SparseConv
from ..nn.norm import BatchNorm
from ..nn.pool import LocalPool, global_pool_features


class ResNetBase(nn.Module):
    """`examples/resnet.py:53-140`."""

    out_channels: int = 40
    block: Type = ResBasicBlock
    layers: Sequence[int] = (1, 1, 1, 1)
    planes: Sequence[int] = (64, 128, 256, 512)
    init_dim: int = 64
    input_capacity: int = 4096
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: SparseTensor, train: bool = True):
        caps = [max(self.input_capacity // (8 ** (i + 1)), 64)
                for i in range(6)]
        x = SparseConv(self.init_dim, kernel_size=3, stride=2,
                       out_capacity=caps[0], name="conv1")(x)
        x = BatchNorm(axis_name=self.axis_name, name="bn1")(x, train)
        x = x.with_features(jax.nn.relu(x.features))
        x = LocalPool(kernel_size=2, stride=2, mode="max",
                      out_capacity=caps[1], name="pool")(x)
        for stage, (n, p) in enumerate(zip(self.layers, self.planes)):
            for i in range(n):
                x = self.block(
                    p, stride=2 if i == 0 else 1,
                    out_capacity=caps[min(stage + 2, 5)] if i == 0 else None,
                    axis_name=self.axis_name,
                    name=f"layer{stage + 1}_{i}",
                )(x, train=train)
        x = SparseConv(self.planes[3] * self.block.expansion, kernel_size=1,
                       use_bias=True, name="conv5")(x)
        g = global_pool_features(x, "avg")
        return nn.Dense(self.out_channels, name="final")(g)


class ResNet14(ResNetBase):
    layers: Sequence[int] = (1, 1, 1, 1)


class ResNet18(ResNetBase):
    layers: Sequence[int] = (2, 2, 2, 2)


class ResNet34(ResNetBase):
    layers: Sequence[int] = (3, 4, 6, 3)


class ResNet50(ResNetBase):
    block: Type = ResBottleneck
    layers: Sequence[int] = (3, 4, 6, 3)


class ResNet101(ResNetBase):
    block: Type = ResBottleneck
    layers: Sequence[int] = (3, 4, 23, 3)
