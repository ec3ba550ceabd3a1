"""VQ-VAE: vector-quantized octree autoencoder.

TPU-native re-design of `examples/VQVae_res.py:697-875`: the same
Encoder/Decoder as the VAE, with a codebook `Embedding(K, C)` initialized
U(−1/K, 1/K), nearest-code assignment by L2 distance, straight-through
estimator ``ze + sg(zq − ze)``, and the two commitment losses
``‖zq − sg(ze)‖² + ‖sg(zq) − ze‖²`` added to the per-level BCE.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.coords import SparseGrid
from ..tensor import SparseTensor
from .vae import Decoder, Encoder


class VectorQuantizer(nn.Module):
    """Nearest-code lookup + straight-through (`VQVae_res.py:708-732`)."""

    num_embeddings: int
    embedding_dim: int

    @nn.compact
    def __call__(self, ze: SparseTensor):
        k = self.num_embeddings
        codebook = self.param(
            "embedding",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1.0 / k, maxval=1.0 / k),
            (k, self.embedding_dim),
        )
        # ‖ze − e‖² = ‖ze‖² − 2 ze·e + ‖e‖²  (argmin over codes)
        d = (jnp.sum(ze.features ** 2, -1, keepdims=True)
             - 2.0 * ze.features @ codebook.T
             + jnp.sum(codebook ** 2, -1)[None, :])
        idx = jnp.argmin(d, axis=-1)
        zq = codebook[idx]
        # straight-through: decoder input carries ze's gradient
        st = ze.features + jax.lax.stop_gradient(zq - ze.features)
        v = ze.valid.astype(ze.features.dtype)[:, None]
        loss_zq = jnp.sum((zq - jax.lax.stop_gradient(ze.features)) ** 2 * v) \
            / jnp.maximum(jnp.sum(v) * self.embedding_dim, 1.0)
        loss_ze = jnp.sum((jax.lax.stop_gradient(zq) - ze.features) ** 2 * v) \
            / jnp.maximum(jnp.sum(v) * self.embedding_dim, 1.0)
        return ze.with_features(st), idx, loss_zq + loss_ze


class VQVAE(nn.Module):
    """`VQVae_res.py:697-760`."""

    channels: Sequence[int] = (32, 128, 512, 512, 4)
    num_embeddings: int = 512
    encoder_capacities: Sequence[int] = (16384, 8192, 2048, 2048, 2048)
    decoder_capacities: Sequence[int] = (2048, 8192, 16384, 32768)
    max_keep: Optional[int] = None
    axis_name: Optional[str] = None

    def setup(self):
        self.encoder = Encoder(self.channels, self.encoder_capacities,
                               axis_name=self.axis_name)
        self.decoder = Decoder(tuple(reversed(self.channels)),
                               self.decoder_capacities, self.max_keep,
                               self.axis_name)
        self.vq = VectorQuantizer(self.num_embeddings, self.channels[-1])

    def __call__(self, sinput: SparseTensor, target_grid: SparseGrid,
                 train: bool = True):
        ze, _ = self.encoder(sinput, train=train)
        zq, idx, vq_loss = self.vq(ze)
        out_clss, targets, sout = self.decoder(zq, target_grid, train=train)
        return out_clss, targets, sout, ze, idx, vq_loss
