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


class DenseAttention(nn.Module):
    """Residual attention over dense tokens — the reference `denseAttention`
    (`diffusion_block_dense.py:566-683`): to_q / to_kv projections without
    bias, output projection with bias, LayerNorm + SiLU before to_out,
    residual connection; self-attention by default, cross-attention when
    ``encoder_hidden_state`` [B, S, D_cross] is given.

    Mirrors the structure of `nn.attention.SparseAttention` so a sparse↔
    dense cross-check can tie weights one-to-one.  (The torch original adds
    `nn.MultiheadAttention`'s redundant second set of in/out projections on
    top of to_q/to_kv — collapsed here exactly like the sparse side.)"""

    num_heads: int = 1
    cross_attention_dim: Optional[int] = None

    @nn.compact
    def __call__(self, tokens: jnp.ndarray,
                 encoder_hidden_state: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
        b, l, c = tokens.shape
        residual = tokens
        q = nn.Dense(c, use_bias=False, name="to_q")(tokens)
        if (encoder_hidden_state is not None
                and self.cross_attention_dim is not None):
            assert encoder_hidden_state.shape[-1] == self.cross_attention_dim, (
                f"encoder_hidden_state dim {encoder_hidden_state.shape[-1]} "
                f"!= declared cross_attention_dim {self.cross_attention_dim}")
        ctx = tokens if encoder_hidden_state is None else encoder_hidden_state
        kv = nn.Dense(2 * c, use_bias=False, name="to_kv")(ctx)
        k, v = jnp.split(kv, 2, axis=-1)
        hd = c // self.num_heads

        def heads(t):
            return t.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)

        logits = heads(q) @ heads(k).transpose(0, 1, 3, 2) / jnp.sqrt(hd)
        w = jax.nn.softmax(logits, axis=-1)
        o = (w @ heads(v)).transpose(0, 2, 1, 3).reshape(b, -1, c)
        o = nn.LayerNorm(name="norm1")(o)
        o = nn.silu(o)
        o = nn.Dense(c, use_bias=True, name="to_out")(o)
        return o + residual


class DenseTransformer3D(nn.Module):
    """Flatten a dense [B, D, H, W, C] grid to [B, L, C] tokens → attention
    → restore — the reference `denseTransformer`
    (`diffusion_block_dense.py:786-860`).  The torch original `view`s its
    channel-FIRST tensor to (B, L, C), which scrambles channels into the
    token axis; this channel-last flatten keeps tokens = voxels (the
    evident intent, and what the sparse path computes)."""

    num_heads: int = 1
    cross_attention_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 encoder_hidden_state: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
        b, c = x.shape[0], x.shape[-1]
        spatial = x.shape[1:-1]
        tokens = x.reshape(b, -1, c)
        out = DenseAttention(
            num_heads=self.num_heads,
            cross_attention_dim=self.cross_attention_dim,
            name="attn")(tokens, encoder_hidden_state)
        return out.reshape((b,) + spatial + (c,))


class UNet3DConditionModel(nn.Module):
    """Conditioned dense 3D UNet — the TPU equivalent of the reference's
    vendored diffusers `UNet3DConditionModel` (`examples/unet_3d.py:65`,
    used by `examples/diffusion_full.py:501`): UNet3DModel's conv backbone
    plus per-level self+cross attention transformers driven by
    ``encoder_hidden_states`` (CLIP text/image embeddings), mirroring the
    CrossAttnDownBlock3D / CrossAttnUpBlock3D layout and the
    (in_channels, block_out_channels, layers_per_block, cross_attention_dim,
    attention_head_dim, norm_num_groups) config surface."""

    out_channels: int = 4
    block_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    attention_head_dim: int = 64
    groups: int = 32
    # diffusers default: cross-attn on every level except the deepest down /
    # shallowest up (DownBlock3D last, UpBlock3D first)
    cross_attn_levels: Optional[Sequence[int]] = None
    time_embedding_norm: str = "default"

    @nn.compact
    def __call__(self, x: jnp.ndarray, timesteps: jnp.ndarray,
                 encoder_hidden_states: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
        ch = self.block_channels
        xattn_lvls = (tuple(range(len(ch) - 1))
                      if self.cross_attn_levels is None
                      else tuple(self.cross_attn_levels))
        temb = timesteps_embedding(timesteps, ch[0])
        temb = TimestepEmbedding(ch[0] * 4, name="time_embedding")(temb)

        def xattn(h, lvl, tag):
            if lvl not in xattn_lvls or encoder_hidden_states is None:
                return h
            heads = max(h.shape[-1] // self.attention_head_dim, 1)
            h = DenseTransformer3D(num_heads=heads, name=f"{tag}_self")(h)
            return DenseTransformer3D(
                num_heads=heads, cross_attention_dim=self.cross_attention_dim,
                name=f"{tag}_cross")(h, encoder_hidden_states)

        h = nn.Conv(ch[0], (3, 3, 3), padding="SAME", name="conv_in")(x)
        skips = [h]
        for lvl, c in enumerate(ch):
            for i in range(self.layers_per_block):
                h = ResnetBlock3D(c, self.groups, self.time_embedding_norm,
                                  name=f"down{lvl}_res{i}")(h, temb)
                h = xattn(h, lvl, f"down{lvl}_attn{i}")
                skips.append(h)
            if lvl < len(ch) - 1:
                h = Downsample3D(c, name=f"down{lvl}_ds")(h)
                skips.append(h)

        h = ResnetBlock3D(ch[-1], self.groups, self.time_embedding_norm,
                          name="mid_res1")(h, temb)
        h = xattn(h, xattn_lvls[0] if xattn_lvls else -1, "mid_attn")
        h = ResnetBlock3D(ch[-1], self.groups, self.time_embedding_norm,
                          name="mid_res2")(h, temb)

        for lvl in reversed(range(len(ch))):
            c = ch[lvl]
            for i in range(self.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock3D(c, self.groups, self.time_embedding_norm,
                                  name=f"up{lvl}_res{i}")(h, temb)
                h = xattn(h, lvl, f"up{lvl}_attn{i}")
            if lvl > 0:
                h = Upsample3D(ch[lvl - 1], name=f"up{lvl}_us")(h)

        h = nn.GroupNorm(num_groups=min(self.groups, h.shape[-1]),
                         name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3, 3), padding="SAME",
                       name="conv_out")(h)
