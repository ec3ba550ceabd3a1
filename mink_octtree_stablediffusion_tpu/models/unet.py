"""Sparse latent-diffusion UNet.

TPU-native re-design of the reference UNet (`examples/diffusion.py:89-265`):
conv_in → 3 down groups (2×ResNet3 each, first with a stride-2 head) → mid
(2×ResNet3) → 3 up groups (3×ResNet3 each, first with a generative-upsample
head, last pinned to the skip grid) with channel-concat skips → conv_out.
Timestep conditioning: sinusoidal `Timesteps` → `TimestepEmbedding` MLP fed to
every block's StableInstanceNorm/FiLM.  Attention (per-instance padded) on
groups 1, 2 and mid, exactly like the reference (`diffusion.py:101-137`).

The latent coordinate set is *fixed* during diffusion (reference behavior,
SURVEY.md §3.4), so every grid in the UNet is derived deterministically from
the input grid and the whole denoising loop jits as a `lax.scan`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..tensor import SparseTensor, cat
from ..nn.blocks import ResNetStack, remat_stack
from ..nn.conv import SparseConv
from ..nn.embed import TimestepEmbedding, timesteps_embedding


class UNet(nn.Module):
    """channels e.g. (4, 320, 640, 960) = (latent, s1, s2, s3) widths
    (`diffusion.py:746-747`); `out_channels` defaults to the latent width."""

    channels: Sequence[int] = (4, 320, 640, 960)
    out_channels: Optional[int] = None
    with_attn: bool = True
    attn_max_len: int = 512
    # Morton-window self-attention for levels whose dense cell bound
    # exceeds attn_max_len (res-256 canvases; see BasicBlock.attn_window)
    attn_window: Optional[int] = None
    time_embedding_norm: str = "default"  # | "scale_shift"
    group: int = 1
    with_cross_attn: bool = False
    cross_attention_dim: int = 768
    # static capacities of the three down levels (level 0 = input grid size)
    down_capacities: Sequence[int] = (256, 128, 64)
    # capacity of the grown (pre-pin) grids on the way up
    up_capacity_factor: int = 8
    axis_name: Optional[str] = None
    # rematerialize each ResNet stack in the backward pass (jax.checkpoint /
    # flax lifted remat): trades recompute FLOPs for activation HBM — the
    # standard TPU memory lever for scaling batch or resolution
    remat: bool = False
    # concat the conv_in activation into conv_out's input — a LEVEL-0 skip
    # around the s1 stride-2 bottleneck.  The reference architecture has
    # none (`diffusion.py:89-265`), and DESIGN §9 pins that as why its
    # default ε-prediction target cannot learn the high-SNR per-voxel
    # identity component; this flag is the constructive test of that
    # mechanism (VERDICT r4 item 6)
    level0_skip: bool = False
    # add a pooled projection of encoder_hidden_state to the timestep
    # embedding (AdaGN-style class conditioning: every FiLM/scale-shift
    # norm then carries the condition, not just the cross-attn layers).
    # Bias-free so a CFG-dropped all-zero condition leaves temb untouched
    # and the unconditional branch stays exactly unconditional.
    cond_into_time: bool = False

    def _group(self, out_ch: int, after: Optional[str], num_layers: int,
               with_attn: bool, cap: Optional[int], name: str):
        """A ModuleList-equivalent: `num_layers` ResNet3 stacks, the first
        carrying the geometry change (`diffusion.py:240-247` get_block)."""
        blocks = []
        stack_cls = remat_stack() if self.remat else ResNetStack
        for i in range(num_layers):
            blocks.append(stack_cls(
                out_ch, layers=3, after=after if i == 0 else None,
                use_time_emb=True, time_embedding_norm=self.time_embedding_norm,
                group=self.group, with_attn=with_attn,
                attn_max_len=self.attn_max_len,
                attn_window=self.attn_window,
                with_cross_attn=with_attn and self.with_cross_attn,
                cross_attention_dim=self.cross_attention_dim,
                out_capacity=cap if i == 0 else None,
                axis_name=self.axis_name, name=f"{name}_{i}",
            ))
        return blocks

    @nn.compact
    def __call__(self, x: SparseTensor, timesteps: jnp.ndarray,
                 encoder_hidden_state: Optional[jnp.ndarray] = None,
                 train: bool = True) -> SparseTensor:
        ch = self.channels
        temb = timesteps_embedding(timesteps, ch[0])
        temb = TimestepEmbedding(ch[0] * 4, name="time_embedding")(temb)
        if self.cond_into_time and encoder_hidden_state is not None:
            temb = temb + nn.Dense(ch[0] * 4, use_bias=False,
                                   name="cond_time_proj")(
                encoder_hidden_state.mean(axis=1))

        # Clamp every level capacity to the DENSE CELL BOUND of its stride:
        # a bounded grid at stride s holds at most B·prod(ceil(extent/s))
        # distinct cells, so any larger buffer is guaranteed padding that
        # every conv/norm/attention in the level still pays for.  At the
        # UNet's coarse latent strides this bound is tiny (stride-32 over a
        # 64³ extent: 8 cells/instance) while the naive `down_cap·8`
        # up-capacities were 16-128× it — profiled at 67% of the train
        # step in up-block convs running >90% padding rows.
        def cap_bound(level: int) -> Optional[int]:
            if x.grid.extent is None:
                return None
            s = np.asarray(x.grid.stride, np.int64) << level
            cells = int(np.prod([-(-int(e) // int(si))
                                 for e, si in zip(x.grid.extent, s)]))
            return max(x.grid.batch_size * cells, 8)

        def clamp(cap: int, level: int) -> int:
            b = cap_bound(level)
            return cap if b is None else min(cap, -(-b // 128) * 128)

        down_caps = [clamp(c, i + 1)
                     for i, c in enumerate(self.down_capacities)]

        x = SparseConv(ch[0], kernel_size=3, name="conv_in")(x)
        h0 = x  # level-0 activation for the optional skip

        def run(blocks, h, out_grid=None):
            for i, blk in enumerate(blocks):
                pin = out_grid if i == len(blocks) - 1 else None
                # positional: lifted remat needs static args by position
                h = blk(h, temb, pin, encoder_hidden_state, train)
            if out_grid is not None:
                # lifted remat re-flattens outputs into fresh pytree objects;
                # rebind the pinned grid so `cat`'s identity contract holds
                h = SparseTensor(grid=out_grid, features=h.features)
            return h

        out_s1 = run(self._group(ch[1], "downsample", 2, self.with_attn,
                                 down_caps[0], "block1"), x)
        out_s2 = run(self._group(ch[2], "downsample", 2, self.with_attn,
                                 down_caps[1], "block2"), out_s1)
        out_s3 = run(self._group(ch[3], "downsample", 2, False,
                                 down_caps[2], "block3"), out_s2)
        out = run(self._group(ch[3], None, 2, self.with_attn, None,
                              "res_mid"), out_s3)

        # up capacities: generative 2× upsample grows ≤8 children per voxel,
        # clamped to the TARGET level's dense cell bound (block3_tr lands on
        # the level-2 grid, block2_tr on level 1, block1_tr on level 0)
        up_caps = [c * self.up_capacity_factor for c in self.down_capacities]
        out = run(self._group(ch[2], "upsample", 3, False,
                              clamp(up_caps[1], 2), "block3_tr"),
                  out, out_grid=out_s2.grid)
        out = cat(out, out_s2)
        out = run(self._group(ch[1], "upsample", 3, self.with_attn,
                              clamp(up_caps[0], 1), "block2_tr"), out,
                  out_grid=out_s1.grid)
        out = cat(out, out_s1)
        out = run(self._group(ch[0], "upsample", 3, self.with_attn,
                              clamp(x.capacity * self.up_capacity_factor, 0),
                              "block1_tr"), out, out_grid=x.grid)
        if self.level0_skip:
            # identity path around the s1 bottleneck: the noisy input's
            # conv_in features reach conv_out directly (grid identity holds
            # — block1_tr is pinned to x.grid)
            out = cat(out, h0)
        out = SparseConv(self.out_channels or ch[0], kernel_size=3,
                         name="conv_out")(out)
        return out
