"""Dense 3D UNet baseline.

TPU-native re-design of the reference's dense-voxel mirror of the sparse
stack (`MinkowskiEngine/modules/resnet_block_dense.py:1229+` `UNet3DModel`
and `diffusion_block_dense.py`): a diffusers-UNet2D-style architecture over
dense [B, D, H, W, C] voxel grids — ResNet blocks with GroupNorm + SiLU and
time-embedding FiLM, stride-2 conv down / nearest-up + conv up, optional
self-attention at coarse resolutions.  Serves as the cross-check for the
sparse path on small dense grids (SURVEY.md §7.3) and as the
`diffusion_dense.py` / `unet_3d.py` baseline family.

Dense compute is exactly what the MXU wants: channel-last `lax.conv` with
bf16-friendly shapes; no sparse machinery involved.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.embed import TimestepEmbedding, timesteps_embedding


class ResnetBlock3D(nn.Module):
    """`resnet_block_dense.py:415+`: GN → SiLU → conv3 → (+temb) → GN → SiLU
    → conv3 → +shortcut."""

    out_channels: int
    groups: int = 8
    time_embedding_norm: str = "default"  # | "scale_shift"

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
        c = self.out_channels
        h = nn.GroupNorm(num_groups=min(self.groups, x.shape[-1]),
                         name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(c, (3, 3, 3), padding="SAME", name="conv1")(h)
        if temb is not None:
            e = nn.silu(temb)
            if self.time_embedding_norm == "default":
                e = nn.Dense(c, name="time_emb_proj")(e)
                h = h + e[:, None, None, None, :]
                h = nn.GroupNorm(num_groups=min(self.groups, c),
                                 name="norm2")(h)
            else:
                e = nn.Dense(2 * c, name="time_emb_proj")(e)
                scale, shift = jnp.split(e, 2, axis=-1)
                h = nn.GroupNorm(num_groups=min(self.groups, c),
                                 name="norm2")(h)
                h = h * (1 + scale[:, None, None, None, :]) + \
                    shift[:, None, None, None, :]
        else:
            h = nn.GroupNorm(num_groups=min(self.groups, c), name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(c, (3, 3, 3), padding="SAME", name="conv2")(h)
        if x.shape[-1] != c:
            x = nn.Conv(c, (1, 1, 1), name="conv_shortcut")(x)
        return x + h


class Attention3D(nn.Module):
    """Spatial self-attention over flattened voxels
    (`resnet_block_dense.py` AttnDownBlock3D internals)."""

    num_heads: int = 1
    groups: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        c = x.shape[-1]
        spatial = x.shape[1:-1]
        h = nn.GroupNorm(num_groups=min(self.groups, c), name="norm")(x)
        h = h.reshape(b, -1, c)
        qkv = nn.Dense(3 * c, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = c // self.num_heads
        L = h.shape[1]

        def heads(t):
            return t.reshape(b, L, self.num_heads, hd).transpose(0, 2, 1, 3)

        logits = heads(q) @ heads(k).transpose(0, 1, 3, 2) / jnp.sqrt(hd)
        w = jax.nn.softmax(logits, axis=-1)
        o = (w @ heads(v)).transpose(0, 2, 1, 3).reshape(b, L, c)
        o = nn.Dense(c, name="proj")(o)
        return x + o.reshape((b,) + spatial + (c,))


class Downsample3D(nn.Module):
    """`resnet_block_dense.py:186+`: stride-2 conv."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_channels, (3, 3, 3), strides=(2, 2, 2),
                       padding="SAME", name="conv")(x)


class Upsample3D(nn.Module):
    """`resnet_block_dense.py:74+`: nearest 2x upsample + conv."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * d, 2 * h, 2 * w, c), "nearest")
        return nn.Conv(self.out_channels, (3, 3, 3), padding="SAME",
                       name="conv")(x)


class UNet3DModel(nn.Module):
    """`resnet_block_dense.py:1229+` (UNet3DModel over dense voxels);
    default block types DownBlock3D / AttnDownBlock3D mirror `:1290-1296`."""

    out_channels: int = 1
    block_channels: Sequence[int] = (32, 64, 128)
    layers_per_block: int = 2
    attn_levels: Sequence[int] = (2,)
    groups: int = 8
    time_embedding_norm: str = "default"

    @nn.compact
    def __call__(self, x: jnp.ndarray, timesteps: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
        ch = self.block_channels
        temb = None
        if timesteps is not None:
            temb = timesteps_embedding(timesteps, ch[0])
            temb = TimestepEmbedding(ch[0] * 4, name="time_embedding")(temb)

        h = nn.Conv(ch[0], (3, 3, 3), padding="SAME", name="conv_in")(x)
        skips = [h]
        for lvl, c in enumerate(ch):
            for i in range(self.layers_per_block):
                h = ResnetBlock3D(c, self.groups, self.time_embedding_norm,
                                  name=f"down{lvl}_res{i}")(h, temb)
                if lvl in self.attn_levels:
                    h = Attention3D(groups=self.groups,
                                    name=f"down{lvl}_attn{i}")(h)
                skips.append(h)
            if lvl < len(ch) - 1:
                h = Downsample3D(c, name=f"down{lvl}_ds")(h)
                skips.append(h)

        h = ResnetBlock3D(ch[-1], self.groups, self.time_embedding_norm,
                          name="mid_res1")(h, temb)
        h = Attention3D(groups=self.groups, name="mid_attn")(h)
        h = ResnetBlock3D(ch[-1], self.groups, self.time_embedding_norm,
                          name="mid_res2")(h, temb)

        for lvl in reversed(range(len(ch))):
            c = ch[lvl]
            for i in range(self.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock3D(c, self.groups, self.time_embedding_norm,
                                  name=f"up{lvl}_res{i}")(h, temb)
                if lvl in self.attn_levels:
                    h = Attention3D(groups=self.groups,
                                    name=f"up{lvl}_attn{i}")(h)
            if lvl > 0:
                h = Upsample3D(ch[lvl - 1], name=f"up{lvl}_us")(h)

        h = nn.GroupNorm(num_groups=min(self.groups, h.shape[-1]),
                         name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3, 3), padding="SAME",
                       name="conv_out")(h)
