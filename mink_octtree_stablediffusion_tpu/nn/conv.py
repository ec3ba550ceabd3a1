"""Sparse convolution layer modules (flax.linen).

TPU-native re-design of the reference conv family
(`MinkowskiEngine/MinkowskiConvolution.py`): SparseConv /
SparseConvTranspose / GenerativeConvTranspose / UpsampleInterpolate /
ChannelwiseConv.  Geometry flows *functionally*: a stride-1 conv reuses the
input grid (same object → XLA CSE shares the hash table), a strided conv
derives the coarser grid in-graph, a transpose conv is *pinned* to an
explicitly provided output grid (the UNet keeps its skip grids around — the
reference gets the same effect from the coordinate manager's cache), and the
generative transpose grows the grid by kernel-offset expansion
(`MinkowskiConvolution.py:547-642`).

Kernel layout is (K, Cin, Cout) with fan_in = K * Cin kaiming-normal init —
identical to the reference (`MinkowskiConvolution.py:272-277`,
`utils/init.py:36`).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops import (
    KernelSpec,
    RegionType,
    SparseGrid,
    expand_grid,
    gather_rows,
    kernel_map,
    linear_apply,
    sparse_conv_apply,
    stride_grid,
)
from ..ops.dense_conv import (dense_conv_applicable, dense_conv_apply,
                              dense_conv_general_apply,
                              dense_no_growth_preferred,
                              dense_no_growth_preferred2)
from ..ops.conv import default_compute_dtype
from ..ops import onehot_conv as _oh
from ..ops import vol_conv as _vc
from ..tensor import SparseTensor

Size = Union[int, Tuple[int, ...]]


def _kaiming(key, shape, dtype=jnp.float32):
    """fan-in kaiming normal over (K*Cin) — reference `utils/init.py:28-41`."""
    if len(shape) == 3:
        fan = shape[0] * shape[1]
    else:
        fan = shape[0]
    std = np.sqrt(2.0 / fan)
    import jax

    return jax.random.normal(key, shape, dtype) * std


class SparseConv(nn.Module):
    """Generalized sparse convolution (reference `MinkowskiConvolution`).

    ``out_grid`` pins the output coordinates (the reference's explicit
    ``coordinates=`` argument); otherwise stride-1 reuses the input grid and
    stride>1 derives the coarsened grid with ``out_capacity`` rows.
    """

    out_channels: int
    kernel_size: Size = 3
    stride: Size = 1
    dilation: Size = 1
    use_bias: bool = False
    region_type: RegionType = RegionType.HYPER_CUBE
    out_capacity: Optional[int] = None
    ndim: int = 3
    dtype: Any = None  # None -> ops.conv.default_compute_dtype()

    @nn.compact
    def __call__(self, x: SparseTensor, out_grid: Optional[SparseGrid] = None
                 ) -> SparseTensor:
        spec = KernelSpec(self.kernel_size, self.stride, self.dilation,
                          ndim=self.ndim, region_type=self.region_type)
        cin = x.num_channels
        kernel = self.param("kernel", _kaiming, (spec.volume, cin, self.out_channels))
        cd = self.dtype or default_compute_dtype()
        bias = (self.param("bias", nn.initializers.zeros, (self.out_channels,))
                if self.use_bias else None)

        if spec.is_identity and out_grid is None:
            return x.with_features(linear_apply(x.features, kernel, bias))

        if out_grid is None:
            if all(s == 1 for s in spec.stride):
                out_grid = x.grid
            else:
                out_grid = stride_grid(x.grid, spec.stride,
                                       self.out_capacity or x.capacity)
        # no-growth densify: at coarse strides the dense cell count is no
        # larger than the sparse buffer, so scatter->lax.conv->gather does
        # strictly less work than any sparse schedule (ops.dense_conv)
        if out_grid is x.grid and dense_no_growth_preferred(spec, x.grid):
            out = dense_conv_apply(x.features, kernel, x.grid, spec, bias,
                                   compute_dtype=cd)
            return SparseTensor(grid=out_grid, features=out).mask_features()
        if (out_grid is not x.grid and
                dense_no_growth_preferred2(spec, x.grid, out_grid)):
            out = dense_conv_general_apply(x.features, kernel, x.grid,
                                           out_grid, spec, bias,
                                           compute_dtype=cd)
            return SparseTensor(grid=out_grid, features=out).mask_features()
        # Pallas dense-volume (brick) conv: at fine strides the occupied
        # set is locally dense and the bounded volume is small — one halo
        # window DMA per 8^3 tile + 27 MXU GEMMs beats the one-hot conv's
        # search + gather-as-matmul tax at narrow widths (ops.vol_conv)
        if (out_grid is x.grid and
                _vc.brick_preferred(spec, x.grid, cin, self.out_channels)):
            out = _vc.brick_pallas_conv(
                x.features, kernel, x.grid,
                compute_dtype=cd or x.features.dtype)
            if bias is not None:
                out = out + bias
            return SparseTensor(grid=out_grid, features=out).mask_features()
        # fused Pallas one-hot conv: kernel-map search + gather + GEMM in one
        # kernel — the TPU fast path for bounded grids (ops.onehot_conv)
        if _oh.enabled(x.grid):
            out = _oh.fused_sparse_conv(x.features, kernel, x.grid, out_grid,
                                        spec, bias, compute_dtype=cd)
            return SparseTensor(grid=out_grid, features=out).mask_features()
        # bounded stride-1 odd-kernel convs take the densify->MXU-conv path
        # (ops.dense_conv) — ~10x the gather-GEMM throughput on TPU
        if out_grid is x.grid and dense_conv_applicable(
                spec, x.grid, cin, self.out_channels):
            out = dense_conv_apply(x.features, kernel, x.grid, spec, bias,
                                   compute_dtype=cd)
            return SparseTensor(grid=out_grid, features=out).mask_features()
        nbr = kernel_map(x.grid, out_grid, spec)
        out = sparse_conv_apply(x.features, kernel, nbr, bias,
                                compute_dtype=cd)
        return SparseTensor(grid=out_grid, features=out).mask_features()


class SparseConvTranspose(nn.Module):
    """Upsampling transpose conv pinned to a known finer grid (reference
    `MinkowskiConvolutionTranspose`, `MinkowskiConvolution.py:462-544`).

    ``out_grid`` is mandatory: the functional design has no manager cache, so
    the caller supplies the target geometry (UNet skip grids / `coordinates=`)."""

    out_channels: int
    kernel_size: Size = 2
    stride: Size = 2
    dilation: Size = 1
    use_bias: bool = False
    region_type: RegionType = RegionType.HYPER_CUBE
    ndim: int = 3
    dtype: Any = None  # None -> ops.conv.default_compute_dtype()

    @nn.compact
    def __call__(self, x: SparseTensor, out_grid: SparseGrid) -> SparseTensor:
        spec = KernelSpec(self.kernel_size, self.stride, self.dilation,
                          ndim=self.ndim, region_type=self.region_type,
                          transpose=True)
        cin = x.num_channels
        kernel = self.param("kernel", _kaiming, (spec.volume, cin, self.out_channels))
        cd = self.dtype or default_compute_dtype()
        bias = (self.param("bias", nn.initializers.zeros, (self.out_channels,))
                if self.use_bias else None)
        if dense_no_growth_preferred2(spec, x.grid, out_grid):
            out = dense_conv_general_apply(x.features, kernel, x.grid,
                                           out_grid, spec, bias,
                                           compute_dtype=cd)
            return SparseTensor(grid=out_grid, features=out).mask_features()
        if _oh.enabled(x.grid):
            out = _oh.fused_sparse_conv(x.features, kernel, x.grid, out_grid,
                                        spec, bias, compute_dtype=cd)
            return SparseTensor(grid=out_grid, features=out).mask_features()
        nbr = kernel_map(x.grid, out_grid, spec)
        out = sparse_conv_apply(x.features, kernel, nbr, bias,
                                compute_dtype=cd)
        return SparseTensor(grid=out_grid, features=out).mask_features()


class GenerativeConvTranspose(nn.Module):
    """Octree-growth op (reference `MinkowskiGenerativeConvolutionTranspose`):
    output coordinates = union of input coords ⊕ kernel offsets at the finer
    stride; ``out_capacity`` is the static budget of the grown level."""

    out_channels: int
    out_capacity: int
    kernel_size: Size = 2
    stride: Size = 2
    dilation: Size = 1
    use_bias: bool = False
    ndim: int = 3
    dtype: Any = None  # None -> ops.conv.default_compute_dtype()

    @nn.compact
    def __call__(self, x: SparseTensor) -> SparseTensor:
        spec = KernelSpec(self.kernel_size, self.stride, self.dilation,
                          ndim=self.ndim, transpose=True)
        cin = x.num_channels
        kernel = self.param("kernel", _kaiming, (spec.volume, cin, self.out_channels))
        cd = self.dtype or default_compute_dtype()
        bias = (self.param("bias", nn.initializers.zeros, (self.out_channels,))
                if self.use_bias else None)
        out_stride = spec.out_stride(x.tensor_stride)
        offs = spec.absolute_offsets(x.tensor_stride)
        out_grid = expand_grid(x.grid, offs, out_stride, self.out_capacity)
        if dense_no_growth_preferred2(spec, x.grid, out_grid):
            out = dense_conv_general_apply(x.features, kernel, x.grid,
                                           out_grid, spec, bias,
                                           compute_dtype=cd)
            return SparseTensor(grid=out_grid, features=out).mask_features()
        if _oh.enabled(x.grid):
            out = _oh.fused_sparse_conv(x.features, kernel, x.grid, out_grid,
                                        spec, bias, compute_dtype=cd)
            return SparseTensor(grid=out_grid, features=out).mask_features()
        nbr = kernel_map(x.grid, out_grid, spec)
        out = sparse_conv_apply(x.features, kernel, nbr, bias,
                                compute_dtype=cd)
        return SparseTensor(grid=out_grid, features=out).mask_features()


class UpsampleInterpolate(nn.Module):
    """Exact nearest-neighbor octree upsample (fork-added
    `MinkowskiUpsampleInterpolate`, `MinkowskiConvolution.py:644-737`):
    generative k2-s2 transpose with a frozen identity kernel — every child
    voxel copies its parent's features.  Parameter-free here (the reference
    freezes the identity kernel; we skip the multiply entirely)."""

    out_capacity: int
    kernel_size: Size = 2
    stride: Size = 2
    ndim: int = 3

    @nn.compact
    def __call__(self, x: SparseTensor) -> SparseTensor:
        spec = KernelSpec(self.kernel_size, self.stride, ndim=self.ndim,
                          transpose=True)
        out_stride = spec.out_stride(x.tensor_stride)
        offs = spec.absolute_offsets(x.tensor_stride)
        out_grid = expand_grid(x.grid, offs, out_stride, self.out_capacity)
        nbr = kernel_map(x.grid, out_grid, spec)  # [K, N_out]
        # k2-s2 transpose: each output coord has exactly one parent among the
        # K offsets; sum of per-offset gathers == the parent's features.
        out = 0.0
        for k in range(spec.volume):
            out = out + gather_rows(x.features, nbr[k])
        return SparseTensor(grid=out_grid, features=out).mask_features()


class ChannelwiseConv(nn.Module):
    """Depthwise sparse conv (reference `MinkowskiChannelwiseConvolution.py`):
    ``out[j] += in[nbr_k(j)] * w_k`` with per-channel weights [K, C]."""

    kernel_size: Size = 3
    stride: Size = 1
    dilation: Size = 1
    use_bias: bool = False
    region_type: RegionType = RegionType.HYPER_CUBE
    out_capacity: Optional[int] = None
    ndim: int = 3

    @nn.compact
    def __call__(self, x: SparseTensor, out_grid: Optional[SparseGrid] = None
                 ) -> SparseTensor:
        spec = KernelSpec(self.kernel_size, self.stride, self.dilation,
                          ndim=self.ndim, region_type=self.region_type)
        c = x.num_channels
        kernel = self.param("kernel", _kaiming, (spec.volume, c))
        if out_grid is None:
            if all(s == 1 for s in spec.stride):
                out_grid = x.grid
            else:
                out_grid = stride_grid(x.grid, spec.stride,
                                       self.out_capacity or x.capacity)
        nbr = kernel_map(x.grid, out_grid, spec)
        out = 0.0
        for k in range(spec.volume):
            out = out + gather_rows(x.features, nbr[k]) * kernel[k][None, :]
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (c,))
        return SparseTensor(grid=out_grid, features=out).mask_features()


class Linear(nn.Module):
    """1x1 feature transform (reference `MinkowskiLinear`,
    `MinkowskiOps.py:40-67`); works on SparseTensor and TensorField alike."""

    out_channels: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        dense = nn.Dense(self.out_channels, use_bias=self.use_bias)
        return x.with_features(dense(x.features))
