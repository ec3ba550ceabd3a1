"""Reusable network blocks (flax.linen) over sparse tensors.

TPU-native re-design of `MinkowskiEngine/modules/`: the diffusion/VAE block
family (`diffusion_block.py`, `vae_block.py`), classic ResNet blocks
(`resnet_block.py`) and SE blocks (`senet_block.py`).  Geometry is explicit:
down/up-sampling heads take/produce grids functionally, and the last layer of
a ResNet stack can be pinned to a target grid for skip-connection alignment
(the reference's ``coordinates=`` path, `diffusion_block.py:239-266`).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import SparseGrid
from ..tensor import SparseTensor
from .act import get_act
from .attention import MortonWindowTransformer, SparseTransformer


def _per_instance_cells(grid) -> int:
    """Static per-instance dense cell bound of a bounded grid (∞-proxy for
    unbounded ones — windowed attention then always engages)."""
    if grid.extent is None:
        return 1 << 30
    import numpy as _np
    return int(_np.prod([-(-int(e) // int(s))
                         for e, s in zip(grid.extent, grid.stride)]))
from .conv import GenerativeConvTranspose, SparseConv, SparseConvTranspose, UpsampleInterpolate
from .norm import BatchNorm, StableInstanceNorm
from .pool import LocalPool, PoolTranspose, broadcast_op, global_pool_features


class _Norm(nn.Module):
    """batch-norm or group-averaged instance-norm, per the reference's
    ``norm="batch" if embedding_dim is None else "instance"`` switch."""

    kind: str = "batch"  # "batch" | "instance"
    group: int = 1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: SparseTensor, train: bool = True) -> SparseTensor:
        if self.kind == "batch":
            return BatchNorm(axis_name=self.axis_name)(x, train=train)
        return StableInstanceNorm(group=self.group)(x)


class BasicBlock(nn.Module):
    """Residual diffusion block (`diffusion_block.py:40-158`):
    conv3 → norm (+time-emb add or FiLM) → act → conv3 → norm → +residual
    → optional self-attn → optional cross-attn → act.

    ``prenorm=True`` switches to the pre-norm ordering of
    `diffusion_block_prenorm.py:64-146` (norm(x) before conv1, norms sized to
    the incoming width, SiLU default)."""

    channels: int
    use_time_emb: bool = False
    time_embedding_norm: str = "default"  # "default" | "scale_shift"
    group: int = 1
    with_attn: bool = False
    attn_max_len: int = 256
    with_cross_attn: bool = False
    cross_attention_dim: int = 768
    # when set, levels whose per-instance dense cell bound exceeds
    # attn_max_len run Morton-window SELF-attention (the reference's own
    # long-context machinery, `ae_res.py:344-416`) instead of full padded
    # attention — full attention is O(L²) and a res-256 stride-8 canvas
    # holds 32768 cells/instance.  Cross-attention stays full (O(L·S),
    # S = a few text/image tokens).
    attn_window: Optional[int] = None
    act_fn: str = "elu"
    prenorm: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: SparseTensor, emb: Optional[jnp.ndarray] = None,
                 encoder_hidden_state: Optional[jnp.ndarray] = None,
                 train: bool = True) -> SparseTensor:
        act = get_act("silu" if self.prenorm and self.act_fn == "elu"
                      else self.act_fn)
        p = self.channels
        norm_kind = "instance" if self.use_time_emb else "batch"
        residual = x

        if self.prenorm:
            out = _Norm(norm_kind, self.group, self.axis_name,
                        name="norm1")(x, train=train)
            out = SparseConv(p, kernel_size=3, name="conv1")(out)
        else:
            out = SparseConv(p, kernel_size=3, name="conv1")(x)
            out = _Norm(norm_kind, self.group, self.axis_name, name="norm1")(
                out, train=train)
        if self.use_time_emb:
            assert emb is not None
            e = jax.nn.elu(emb)  # reference applies F.elu before the proj
            if self.time_embedding_norm == "default":
                e = nn.Dense(p, name="time_emb_proj")(e)
                out = broadcast_op(out, e, "add")
            else:  # scale_shift FiLM: out*(1+scale)+shift (`diffusion_block.py:122-131`)
                e = nn.Dense(2 * p, name="time_emb_proj")(e)
                scale, shift = e[:, :p], e[:, p:]
                out = broadcast_op(out, 1.0 + scale, "mul")
                out = broadcast_op(out, shift, "add")
        out = out.with_features(act(out.features))

        if self.prenorm:
            out = _Norm(norm_kind, self.group, self.axis_name,
                        name="norm2")(out, train=train)
            out = SparseConv(p, kernel_size=3, name="conv2")(out)
        else:
            out = SparseConv(p, kernel_size=3, name="conv2")(out)
            out = _Norm(norm_kind, self.group, self.axis_name, name="norm2")(
                out, train=train)
        out = out + residual

        if self.with_attn:
            out = out.with_features(act(out.features))
            if (self.attn_window is not None
                    and _per_instance_cells(out.grid) > self.attn_max_len):
                out = MortonWindowTransformer(window_size=self.attn_window,
                                              name="attentions")(out)
            else:
                out = SparseTransformer(max_len=self.attn_max_len,
                                        name="attentions")(out)
            if self.with_cross_attn:
                out = out.with_features(act(out.features))
                out = SparseTransformer(
                    max_len=self.attn_max_len,
                    cross_attention_dim=self.cross_attention_dim,
                    name="cross_attention",
                )(out, encoder_hidden_state=encoder_hidden_state)
        return out.with_features(act(out.features))


class _HeadConvNormAct(nn.Module):
    """conv/transpose + norm + act head shared by Downsample / Upsample /
    Upsample_determine / adapt (`diffusion_block.py:270-342`)."""

    channels: int
    mode: str  # "down" | "up" | "up_determine" | "adapt"
    norm_kind: str = "batch"
    group: int = 1
    out_capacity: Optional[int] = None
    act_fn: str = "elu"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: SparseTensor, out_grid: Optional[SparseGrid] = None,
                 train: bool = True) -> SparseTensor:
        if self.mode == "down":
            out = SparseConv(self.channels, kernel_size=3, stride=2,
                             out_capacity=self.out_capacity, name="conv")(
                x, out_grid=out_grid)
        elif self.mode == "up":
            assert self.out_capacity is not None
            out = GenerativeConvTranspose(self.channels,
                                          out_capacity=self.out_capacity,
                                          kernel_size=2, stride=2,
                                          name="conv")(x)
        elif self.mode == "up_determine":
            assert out_grid is not None
            out = SparseConvTranspose(self.channels, kernel_size=2, stride=2,
                                      name="conv")(x, out_grid)
        else:  # adapt
            out = SparseConv(self.channels, kernel_size=3, name="conv")(
                x, out_grid=out_grid)
        out = _Norm(self.norm_kind, self.group, self.axis_name, name="norm")(
            out, train=train)
        return out.with_features(get_act(self.act_fn)(out.features))


class ResNetStack(nn.Module):
    """ResNet2/ResNet3 (`diffusion_block.py:162-375`): a geometry head
    (down / generative-up / pinned-up / adapt / pool variants) followed by
    ``layers - 1`` BasicBlocks, plus a trailing adapt when time-conditioned
    (the reference appends it to realign the coordinate key; here it also
    hosts the ``out_grid`` pinning for skips)."""

    out_channels: int
    layers: int = 2  # ResNet2; 3 → ResNet3
    # None | "downsample" | "upsample" | "upsample_determine" (conv heads,
    # `diffusion_block.py:189-207`) | "avg_pool" | "pool_transpose" |
    # "upsample_interpolate" (non-conv geometry ops, `diffusion_block.py:
    # 344-364` — the reference reaches the first and last via
    # ``use_conv=False``; ``pool_transpose`` is its defined-but-unwired
    # head class, selectable here directly)
    after: Optional[str] = None
    use_conv: bool = True  # False → avg-pool / interpolate geometry ops
    use_time_emb: bool = False
    time_embedding_norm: str = "default"
    group: int = 1
    with_attn: bool = False
    attn_max_len: int = 256
    with_cross_attn: bool = False
    cross_attention_dim: int = 768
    attn_window: Optional[int] = None  # see BasicBlock.attn_window
    out_capacity: Optional[int] = None
    act_fn: str = "elu"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: SparseTensor, emb: Optional[jnp.ndarray] = None,
                 out_grid: Optional[SparseGrid] = None,
                 encoder_hidden_state: Optional[jnp.ndarray] = None,
                 train: bool = True) -> SparseTensor:
        norm_kind = "instance" if self.use_time_emb else "batch"
        has_tail = self.use_time_emb
        # normalize the geometry plan: `geom_op` is a trailing non-conv
        # geometry op (or None when a conv head carries the geometry).  The
        # reference's ``use_conv=False`` selects avg_pool / interpolate from
        # the down/up names; the explicit names select them directly.
        geom_op = self.after if self.after in (
            "avg_pool", "pool_transpose", "upsample_interpolate") else None
        if not self.use_conv:
            geom_op = {"downsample": "avg_pool",
                       "upsample": "upsample_interpolate",
                       "upsample_determine": "upsample_interpolate",
                       }.get(self.after, geom_op)
        conv_head = self.use_conv and geom_op is None

        # pin the final layer to out_grid (reference pins the *last* layer,
        # `diffusion_block.py:252-262`).  A pinned-transpose head is the only
        # geometry source for "upsample_determine", so it always receives the
        # target grid.
        if conv_head and self.after == "upsample_determine":
            head_grid = out_grid
        elif not has_tail and conv_head and self.after != "upsample":
            head_grid = out_grid
        else:
            head_grid = None

        if conv_head:
            mode = {"downsample": "down", "upsample": "up",
                    "upsample_determine": "up_determine"}.get(self.after, "adapt")
            x = _HeadConvNormAct(self.out_channels, mode, norm_kind, self.group,
                                 self.out_capacity, self.act_fn, self.axis_name,
                                 name="head")(x, out_grid=head_grid, train=train)
        else:
            x = _HeadConvNormAct(self.out_channels, "adapt", norm_kind,
                                 self.group, None, self.act_fn, self.axis_name,
                                 name="head")(x, train=train)

        for i in range(1, self.layers):
            x = BasicBlock(
                self.out_channels, use_time_emb=self.use_time_emb,
                time_embedding_norm=self.time_embedding_norm, group=self.group,
                with_attn=self.with_attn, attn_max_len=self.attn_max_len,
                with_cross_attn=self.with_cross_attn,
                cross_attention_dim=self.cross_attention_dim,
                attn_window=self.attn_window,
                act_fn=self.act_fn, axis_name=self.axis_name,
                name=f"block{i}",
            )(x, emb, encoder_hidden_state, train=train)

        if geom_op == "avg_pool":
            x = LocalPool(2, 2, mode="avg", out_capacity=self.out_capacity,
                          name="pool")(
                x, out_grid=None if has_tail else out_grid)
        elif geom_op == "pool_transpose":
            assert out_grid is not None, \
                "after='pool_transpose' needs the finer target grid"
            x = PoolTranspose(2, 2, name="pool_tr")(x, out_grid)
        elif geom_op == "upsample_interpolate":
            assert self.out_capacity is not None
            x = UpsampleInterpolate(self.out_capacity, name="up_interp")(x)

        if has_tail:
            x = _HeadConvNormAct(self.out_channels, "adapt", norm_kind,
                                 self.group, None, self.act_fn, self.axis_name,
                                 name="tail")(x, out_grid=out_grid, train=train)
        return x


def remat_stack():
    """`ResNetStack` with rematerialized backward (flax lifted
    `jax.checkpoint`): the standard TPU lever trading recompute FLOPs for
    activation HBM.  Callers MUST pass all five `__call__` arguments
    positionally — `train` (position 5) is the static argument, and lifted
    remat resolves static_argnums against the actual positional call.
    Parameter structure is identical to a plain `ResNetStack`."""
    return nn.remat(ResNetStack, static_argnums=(5,))


# ---------------------------------------------------------------------------
# Classic ResNet / SENet blocks (`modules/resnet_block.py`, `senet_block.py`)
# ---------------------------------------------------------------------------


class ResBasicBlock(nn.Module):
    """Upstream `BasicBlock` (`modules/resnet_block.py:29-68`):
    conv3-bn-relu-conv3-bn (+1x1 downsample residual) - relu."""

    planes: int
    stride: int = 1
    dilation: int = 1
    out_capacity: Optional[int] = None
    axis_name: Optional[str] = None
    expansion: int = 1

    @nn.compact
    def __call__(self, x: SparseTensor, train: bool = True) -> SparseTensor:
        out = SparseConv(self.planes, 3, self.stride, self.dilation,
                         out_capacity=self.out_capacity, name="conv1")(x)
        out = BatchNorm(axis_name=self.axis_name, name="norm1")(out, train)
        out = out.with_features(jax.nn.relu(out.features))
        out = SparseConv(self.planes, 3, 1, self.dilation, name="conv2")(out)
        out = BatchNorm(axis_name=self.axis_name, name="norm2")(out, train)
        if self.stride != 1 or x.num_channels != self.planes:
            res = SparseConv(self.planes, 1, 1, name="downsample_conv")(
                x, out_grid=out.grid)
            res = BatchNorm(axis_name=self.axis_name, name="downsample_norm")(
                res, train)
        else:
            res = x
        out = out + res
        return out.with_features(jax.nn.relu(out.features))


class ResBottleneck(nn.Module):
    """Upstream `Bottleneck` (`modules/resnet_block.py:71-121`)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    out_capacity: Optional[int] = None
    axis_name: Optional[str] = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x: SparseTensor, train: bool = True) -> SparseTensor:
        out = SparseConv(self.planes, 1, name="conv1")(x)
        out = BatchNorm(axis_name=self.axis_name, name="norm1")(out, train)
        out = out.with_features(jax.nn.relu(out.features))
        out = SparseConv(self.planes, 3, self.stride, self.dilation,
                         out_capacity=self.out_capacity, name="conv2")(out)
        out = BatchNorm(axis_name=self.axis_name, name="norm2")(out, train)
        out = out.with_features(jax.nn.relu(out.features))
        out = SparseConv(self.planes * self.expansion, 1, name="conv3")(out)
        out = BatchNorm(axis_name=self.axis_name, name="norm3")(out, train)
        if self.stride != 1 or x.num_channels != self.planes * self.expansion:
            res = SparseConv(self.planes * self.expansion, 1,
                             name="downsample_conv")(x, out_grid=out.grid)
            res = BatchNorm(axis_name=self.axis_name, name="downsample_norm")(
                res, train)
        else:
            res = x
        out = out + res
        return out.with_features(jax.nn.relu(out.features))


class SELayer(nn.Module):
    """Squeeze-excite over sparse tensors (`modules/senet_block.py:31-47`):
    global avg pool → fc bottleneck → sigmoid → broadcast multiply."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x: SparseTensor) -> SparseTensor:
        c = x.num_channels
        g = global_pool_features(x, "avg")
        g = jax.nn.relu(nn.Dense(c // self.reduction, name="fc1")(g))
        g = jax.nn.sigmoid(nn.Dense(c, name="fc2")(g))
        return broadcast_op(x, g, "mul")


class SEBasicBlock(nn.Module):
    """`SEBasicBlock` (`modules/senet_block.py:50-86`)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    reduction: int = 16
    out_capacity: Optional[int] = None
    axis_name: Optional[str] = None
    expansion: int = 1

    @nn.compact
    def __call__(self, x: SparseTensor, train: bool = True) -> SparseTensor:
        out = SparseConv(self.planes, 3, self.stride, self.dilation,
                         out_capacity=self.out_capacity, name="conv1")(x)
        out = BatchNorm(axis_name=self.axis_name, name="norm1")(out, train)
        out = out.with_features(jax.nn.relu(out.features))
        out = SparseConv(self.planes, 3, 1, self.dilation, name="conv2")(out)
        out = BatchNorm(axis_name=self.axis_name, name="norm2")(out, train)
        out = SELayer(self.reduction, name="se")(out)
        if self.stride != 1 or x.num_channels != self.planes:
            res = SparseConv(self.planes, 1, 1, name="downsample_conv")(
                x, out_grid=out.grid)
            res = BatchNorm(axis_name=self.axis_name, name="downsample_norm")(
                res, train)
        else:
            res = x
        out = out + res
        return out.with_features(jax.nn.relu(out.features))


class SEBottleneck(nn.Module):
    """`SEBottleneck` (`modules/senet_block.py:89-131`): the Bottleneck
    body with squeeze-excite on the expanded (planes*4) features before the
    residual add."""

    planes: int
    stride: int = 1
    dilation: int = 1
    reduction: int = 16
    out_capacity: Optional[int] = None
    axis_name: Optional[str] = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x: SparseTensor, train: bool = True) -> SparseTensor:
        out = SparseConv(self.planes, 1, name="conv1")(x)
        out = BatchNorm(axis_name=self.axis_name, name="norm1")(out, train)
        out = out.with_features(jax.nn.relu(out.features))
        out = SparseConv(self.planes, 3, self.stride, self.dilation,
                         out_capacity=self.out_capacity, name="conv2")(out)
        out = BatchNorm(axis_name=self.axis_name, name="norm2")(out, train)
        out = out.with_features(jax.nn.relu(out.features))
        out = SparseConv(self.planes * self.expansion, 1, name="conv3")(out)
        out = BatchNorm(axis_name=self.axis_name, name="norm3")(out, train)
        out = SELayer(self.reduction, name="se")(out)
        if self.stride != 1 or x.num_channels != self.planes * self.expansion:
            res = SparseConv(self.planes * self.expansion, 1,
                             name="downsample_conv")(x, out_grid=out.grid)
            res = BatchNorm(axis_name=self.axis_name, name="downsample_norm")(
                res, train)
        else:
            res = x
        out = out + res
        return out.with_features(jax.nn.relu(out.features))
