"""MinkUNet semantic-segmentation family.

TPU-native re-design of `examples/minkunet.py:35-246` (`MinkUNetBase` +
14/18/34/50/101 and channel variants incl. `MinkUNet34C`): conv k5 stem,
four k2-s2 down stages with residual blocks, four k2-s2 transpose-up stages
pinned to the matching skip grids with channel-concat, 1x1 head.
"""

from __future__ import annotations

from typing import Sequence, Type

import flax.linen as nn
import jax

from ..tensor import SparseTensor, cat
from ..nn.blocks import ResBasicBlock, ResBottleneck
from ..nn.conv import SparseConv, SparseConvTranspose
from ..nn.norm import BatchNorm


class MinkUNetBase(nn.Module):
    """`examples/minkunet.py:35-180`."""

    out_channels: int
    block: Type = ResBasicBlock
    layers: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2)
    planes: Sequence[int] = (32, 64, 128, 256, 256, 128, 96, 96)
    init_dim: int = 32
    input_capacity: int = 16384
    axis_name: str | None = None

    def _cba(self, x, ch, stride, cap, name, train, transpose=False,
             out_grid=None):
        if transpose:
            x = SparseConvTranspose(ch, kernel_size=2, stride=2,
                                    name=f"{name}_conv")(x, out_grid)
        else:
            x = SparseConv(ch, kernel_size=2, stride=stride, out_capacity=cap,
                           name=f"{name}_conv")(x)
        x = BatchNorm(axis_name=self.axis_name, name=f"{name}_bn")(x, train)
        return x.with_features(jax.nn.relu(x.features))

    def _stage(self, x, stage, planes, n, train):
        for i in range(n):
            x = self.block(planes, stride=1, axis_name=self.axis_name,
                           name=f"block{stage}_{i}")(x, train=train)
        return x

    @nn.compact
    def __call__(self, x: SparseTensor, train: bool = True) -> SparseTensor:
        p, L = self.planes, self.layers
        caps = [max(self.input_capacity // (8 ** i), 64) for i in range(5)]
        out = SparseConv(self.init_dim, kernel_size=5, name="conv0")(x)
        out = BatchNorm(axis_name=self.axis_name, name="bn0")(out, train)
        out_p1 = out.with_features(jax.nn.relu(out.features))

        out = self._cba(out_p1, self.init_dim, 2, caps[1], "conv1", train)
        out_b1 = self._stage(out, 1, p[0], L[0], train)
        out = self._cba(out_b1, p[0] * self.block.expansion, 2, caps[2],
                        "conv2", train)
        out_b2 = self._stage(out, 2, p[1], L[1], train)
        out = self._cba(out_b2, p[1] * self.block.expansion, 2, caps[3],
                        "conv3", train)
        out_b3 = self._stage(out, 3, p[2], L[2], train)
        out = self._cba(out_b3, p[2] * self.block.expansion, 2, caps[4],
                        "conv4", train)
        out = self._stage(out, 4, p[3], L[3], train)

        out = self._cba(out, p[4], 2, None, "convtr4", train, transpose=True,
                        out_grid=out_b3.grid)
        out = cat(out, out_b3)
        out = self._stage(out, 5, p[4], L[4], train)
        out = self._cba(out, p[5], 2, None, "convtr5", train, transpose=True,
                        out_grid=out_b2.grid)
        out = cat(out, out_b2)
        out = self._stage(out, 6, p[5], L[5], train)
        out = self._cba(out, p[6], 2, None, "convtr6", train, transpose=True,
                        out_grid=out_b1.grid)
        out = cat(out, out_b1)
        out = self._stage(out, 7, p[6], L[6], train)
        out = self._cba(out, p[7], 2, None, "convtr7", train, transpose=True,
                        out_grid=out_p1.grid)
        out = cat(out, out_p1)
        out = self._stage(out, 8, p[7], L[7], train)
        return SparseConv(self.out_channels, kernel_size=1, use_bias=True,
                          name="final")(out)


class MinkUNet14(MinkUNetBase):
    layers: Sequence[int] = (1, 1, 1, 1, 1, 1, 1, 1)


class MinkUNet18(MinkUNetBase):
    layers: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2)


class MinkUNet34(MinkUNetBase):
    layers: Sequence[int] = (2, 3, 4, 6, 2, 2, 2, 2)


class MinkUNet50(MinkUNetBase):
    block: Type = ResBottleneck
    layers: Sequence[int] = (2, 3, 4, 6, 2, 2, 2, 2)


class MinkUNet101(MinkUNetBase):
    block: Type = ResBottleneck
    layers: Sequence[int] = (2, 3, 4, 23, 2, 2, 2, 2)


class MinkUNet34A(MinkUNet34):
    planes: Sequence[int] = (32, 64, 128, 256, 256, 128, 64, 64)


class MinkUNet34B(MinkUNet34):
    planes: Sequence[int] = (32, 64, 128, 256, 256, 128, 64, 32)


class MinkUNet34C(MinkUNet34):
    """`examples/minkunet.py:244-246` — the ScanNet segmentation default."""

    planes: Sequence[int] = (32, 64, 128, 256, 256, 128, 96, 96)
