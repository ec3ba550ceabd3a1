"""Generative reconstruction & shape-completion networks.

TPU-native re-design of `examples/reconstruction.py:313-430` (`GenerativeNet`:
a 6-level generative-transpose + pruning pyramid growing a full shape from one
seed voxel per class one-hot) and `examples/completion.py:152-456`
(`CompletionNet`: encoder-decoder completion with per-level pruning).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax

from ..ops import membership, prune, top_k_mask
from ..ops.coords import SparseGrid, stride_grid
from ..tensor import SparseTensor
from ..nn.conv import GenerativeConvTranspose, SparseConv
from ..nn.norm import BatchNorm


class _GenLevel(nn.Module):
    """gen-transpose k2s2 → bn → elu → conv k3 → bn → elu
    (`reconstruction.py:326-343` per level)."""

    channels: int
    out_capacity: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: SparseTensor, train: bool = True) -> SparseTensor:
        x = GenerativeConvTranspose(self.channels, self.out_capacity,
                                    kernel_size=2, stride=2, name="up")(x)
        x = BatchNorm(axis_name=self.axis_name, name="bn_up")(x, train)
        x = x.with_features(jax.nn.elu(x.features))
        x = SparseConv(self.channels, kernel_size=3, name="conv")(x)
        x = BatchNorm(axis_name=self.axis_name, name="bn_conv")(x, train)
        return x.with_features(jax.nn.elu(x.features))


def _prune_level(out: SparseTensor, logits: SparseTensor,
                 target_grid: SparseGrid, cap: int, train: bool):
    """occupancy keep = logits > 0 (∪ target during training), then prune —
    the shared pattern of `reconstruction.py:548-625` / `completion.py` /
    `ae_res.py:599-613`."""
    strided = stride_grid(target_grid, tuple(out.tensor_stride), capacity=cap)
    target = membership(out.grid, strided)
    keep = top_k_mask(logits.features[:, 0], out.valid, cap)
    if train:
        keep = keep | target
    grid, feats = prune(out.grid, out.features, keep)
    return SparseTensor(grid=grid, features=feats), target


class GenerativeNet(nn.Module):
    """`reconstruction.py:313-430`.  ``z`` is one seed voxel per instance at
    the coarsest stride (2^levels), features = class one-hot/embedding."""

    channels: Sequence[int] = (1024, 512, 256, 128, 64, 32, 16)
    level_capacities: Sequence[int] = (8, 64, 512, 2048, 8192, 32768)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, z: SparseTensor, target_grid: SparseGrid,
                 train: bool = True):
        out = z
        out_clss, targets = [], []
        for lvl in range(6):
            out = _GenLevel(self.channels[lvl], self.level_capacities[lvl],
                            self.axis_name, name=f"block{lvl + 1}")(out, train)
            if lvl == 0:  # block1 has a second conv pair (`:313-345`)
                out = SparseConv(self.channels[1], kernel_size=3,
                                 name="block1_conv2")(out)
                out = BatchNorm(axis_name=self.axis_name,
                                name="block1_bn2")(out, train)
                out = out.with_features(jax.nn.elu(out.features))
            logits = SparseConv(1, kernel_size=1, use_bias=True,
                                name=f"block{lvl + 1}_cls")(out)
            out, target = _prune_level(out, logits, target_grid,
                                       self.level_capacities[lvl], train)
            out_clss.append(logits)
            targets.append(target)
        return out_clss, targets, out


class CompletionNet(nn.Module):
    """`completion.py:152-456`: conv-down encoder (no latent sampling) +
    generative pruning decoder."""

    enc_channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    dec_channels: Sequence[int] = (256, 128, 64, 32, 16, 16)
    enc_capacities: Sequence[int] = (16384, 4096, 1024, 256, 64, 16)
    dec_capacities: Sequence[int] = (64, 256, 1024, 4096, 16384)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, sinput: SparseTensor, target_grid: SparseGrid,
                 train: bool = True):
        x = sinput
        for i, ch in enumerate(self.enc_channels):
            stride = 1 if i == 0 else 2
            cap = self.enc_capacities[i] if i > 0 else None
            x = SparseConv(ch, kernel_size=3, stride=stride, out_capacity=cap,
                           name=f"enc{i}")(x)
            x = BatchNorm(axis_name=self.axis_name, name=f"enc{i}_bn")(x, train)
            x = x.with_features(jax.nn.elu(x.features))

        out_clss, targets = [], []
        for lvl, ch in enumerate(self.dec_channels[:5]):
            x = _GenLevel(ch, self.dec_capacities[lvl], self.axis_name,
                          name=f"dec{lvl}")(x, train)
            logits = SparseConv(1, kernel_size=1, use_bias=True,
                                name=f"dec{lvl}_cls")(x)
            x, target = _prune_level(x, logits, target_grid,
                                     self.dec_capacities[lvl], train)
            out_clss.append(logits)
            targets.append(target)
        return out_clss, targets, x
