"""Timestep / positional embeddings for the diffusion stack.

Re-implements the `diffusers` pieces the reference imports
(`examples/diffusion.py:98,150-154`: `Timesteps` + `TimestepEmbedding`) plus
the fork's `LinearPositionalEncoding`
(`MinkowskiEngine/modules/diffusion_block.py:377-397`) — no dependency on
torch/diffusers.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..tensor import SparseTensor


def timesteps_embedding(timesteps: jnp.ndarray, dim: int,
                        flip_sin_to_cos: bool = True,
                        downscale_freq_shift: float = 0.0,
                        max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep features [B, dim] — diffusers `Timesteps` math
    (defaults match `examples/diffusion.py:98`: flip_sin_to_cos=True,
    freq_shift=0)."""
    half = dim // 2
    exponent = -np.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class TimestepEmbedding(nn.Module):
    """2-layer SiLU MLP lifting sinusoidal features to the conditioning dim —
    diffusers `TimestepEmbedding` (used at `examples/diffusion.py:150-154`)."""

    embedding_dim: int

    @nn.compact
    def __call__(self, sample: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.embedding_dim, name="linear_1")(sample)
        h = nn.silu(h)
        return nn.Dense(self.embedding_dim, name="linear_2")(h)


class LinearPositionalEncoding(nn.Module):
    """(x, y, z, stride) → Dense(d_model)
    (`diffusion_block.py:377-397`)."""

    d_model: int

    @nn.compact
    def __call__(self, x: SparseTensor) -> jnp.ndarray:
        s = float(x.tensor_stride[0])
        pos = jnp.concatenate(
            [x.C[:, 1:].astype(jnp.float32),
             jnp.full((x.capacity, 1), s, jnp.float32)], axis=-1)
        return nn.Dense(self.d_model)(pos)
