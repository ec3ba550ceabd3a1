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
    """Nearest-code lookup + straight-through (`VQVae_res.py:708-732`).

    ``ema=True`` replaces the codebook-gradient loss with exponential-
    moving-average code updates (van den Oord App. A; the reference ships
    only the gradient form — this is the r5 codebook-engineering lever,
    VERDICT r4 item 9), and ``restart_dead=True`` re-seeds codes whose
    EMA usage decays below ``dead_floor`` with random encoder outputs
    from the current batch.  Both run as `batch_stats`-style state in a
    ``vq_stats`` collection (no gradients through the codebook)."""

    num_embeddings: int
    embedding_dim: int
    ema: bool = False
    ema_decay: float = 0.99
    ema_eps: float = 1e-5
    restart_dead: bool = False
    dead_floor: float = 0.1  # EMA cluster-size floor before restart
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, ze: SparseTensor, train: bool = True):
        k = self.num_embeddings

        def init_book(key, shape):
            return jax.random.uniform(key, shape, minval=-1.0 / k,
                                      maxval=1.0 / k)

        if self.ema:
            book_var = self.variable(
                "vq_stats", "embedding", init_book,
                jax.random.PRNGKey(11), (k, self.embedding_dim))
            cs_var = self.variable("vq_stats", "cluster_size",
                                   lambda: jnp.ones((k,)))
            sum_var = self.variable("vq_stats", "ema_sum",
                                    lambda: book_var.value)
            step_var = self.variable("vq_stats", "steps",
                                     lambda: jnp.zeros((), jnp.int32))
            codebook = book_var.value
        else:
            codebook = self.param("embedding", init_book,
                                  (k, self.embedding_dim))
        # ‖ze − e‖² = ‖ze‖² − 2 ze·e + ‖e‖²  (argmin over codes)
        d = (jnp.sum(ze.features ** 2, -1, keepdims=True)
             - 2.0 * ze.features @ codebook.T
             + jnp.sum(codebook ** 2, -1)[None, :])
        idx = jnp.argmin(d, axis=-1)
        zq = codebook[idx]
        # straight-through: decoder input carries ze's gradient
        st = ze.features + jax.lax.stop_gradient(zq - ze.features)
        v = ze.valid.astype(ze.features.dtype)[:, None]
        loss_ze = jnp.sum((jax.lax.stop_gradient(zq) - ze.features) ** 2 * v) \
            / jnp.maximum(jnp.sum(v) * self.embedding_dim, 1.0)

        if not self.ema:
            loss_zq = (jnp.sum((zq - jax.lax.stop_gradient(ze.features)) ** 2
                               * v)
                       / jnp.maximum(jnp.sum(v) * self.embedding_dim, 1.0))
            return ze.with_features(st), idx, loss_zq + loss_ze

        if train and not self.is_initializing():
            zf = jax.lax.stop_gradient(ze.features)
            onehot = jax.nn.one_hot(idx, k) * v  # invalid rows count 0
            counts = jnp.sum(onehot, 0)
            sums = onehot.T @ zf
            if self.axis_name is not None:  # dp: global statistics
                counts = jax.lax.psum(counts, self.axis_name)
                sums = jax.lax.psum(sums, self.axis_name)
            dcy = self.ema_decay
            cs = dcy * cs_var.value + (1 - dcy) * counts
            es = dcy * sum_var.value + (1 - dcy) * sums
            n = jnp.sum(cs)
            cs_smoothed = ((cs + self.ema_eps)
                           / (n + k * self.ema_eps) * n)
            book = es / cs_smoothed[:, None]
            if self.restart_dead:
                # re-seed dying codes from random valid encoder rows
                key = jax.random.fold_in(jax.random.PRNGKey(13),
                                         step_var.value)
                p = v[:, 0] / jnp.maximum(jnp.sum(v), 1.0)
                rows = jax.random.choice(key, zf.shape[0], (k,), p=p)
                dead = cs < self.dead_floor
                book = jnp.where(dead[:, None], zf[rows], book)
                es = jnp.where(dead[:, None], zf[rows], es)
                cs = jnp.where(dead, 1.0, cs)
            cs_var.value = cs
            sum_var.value = es
            book_var.value = book
            step_var.value = step_var.value + 1
        return ze.with_features(st), idx, loss_ze


class VQVAE(nn.Module):
    """`VQVae_res.py:697-760`."""

    channels: Sequence[int] = (32, 128, 512, 512, 4)
    num_embeddings: int = 512
    encoder_capacities: Sequence[int] = (16384, 8192, 2048, 2048, 2048)
    decoder_capacities: Sequence[int] = (2048, 8192, 16384, 32768)
    max_keep: Optional[int] = None
    ema: bool = False
    ema_decay: float = 0.99
    restart_dead: bool = False
    axis_name: Optional[str] = None

    def setup(self):
        self.encoder = Encoder(self.channels, self.encoder_capacities,
                               axis_name=self.axis_name)
        self.decoder = Decoder(tuple(reversed(self.channels)),
                               self.decoder_capacities, self.max_keep,
                               self.axis_name)
        self.vq = VectorQuantizer(self.num_embeddings, self.channels[-1],
                                  ema=self.ema, ema_decay=self.ema_decay,
                                  restart_dead=self.restart_dead,
                                  axis_name=self.axis_name)

    def __call__(self, sinput: SparseTensor, target_grid: SparseGrid,
                 train: bool = True):
        ze, _ = self.encoder(sinput, train=train)
        zq, idx, vq_loss = self.vq(ze, train=train)
        out_clss, targets, sout = self.decoder(zq, target_grid, train=train)
        return out_clss, targets, sout, ze, idx, vq_loss
