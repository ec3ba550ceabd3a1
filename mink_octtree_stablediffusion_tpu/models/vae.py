"""Octree sparse VAE: residual encoder + pruning/growing decoder.

TPU-native re-design of the reference's canonical pipeline
(`examples/ae_res.py:418-800`): Encoder = 3 stride-2 ResNet2 stages + 2
same-stride stages + mean/log-var conv heads (stride 8 latent); Decoder = one
same-stride ResNet2 then three generative-upsample ResNet2 stages, each
followed by a 1x1 occupancy head, a membership test against the strided
ground-truth coordinate set (`get_target`, `ae_res.py:556-570`), a top-k
capacity clamp (`ae_res.py:599-609`) and pruning.  During training the target
voxels are force-kept so deeper levels always receive supervision.

Everything is shape-static: each decoder level has a fixed capacity, and the
grown-then-pruned coordinate sets live in fixed buffers with validity masks —
the whole VAE jits as one XLA computation.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import membership, prune, top_k_mask
from ..ops.canvas import canvas_grid, expand_to_canvas
from ..tensor import SparseTensor
from ..nn.blocks import ResNetStack
from ..nn.conv import SparseConv
from ..ops.coords import SparseGrid, stride_grid


class Encoder(nn.Module):
    """`ae_res.py:418-481`.  channels = config.vae_channel, e.g.
    (32, 128, 512, 512, 4); three downsamples → latent tensor stride 8.
    ``with_window_attn`` enables the Morton-window transformer after block3
    (the reference builds it at `ae_res.py:453` with config.window_size)."""

    channels: Sequence[int] = (32, 128, 512, 512, 4)
    # surface law: levels shrink ~4x (see examples/train_vae.py capacities)
    level_capacities: Sequence[int] = (16384, 8192, 2048, 2048, 2048)
    with_window_attn: bool = False
    window_size: int = 50
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: SparseTensor, train: bool = True):
        ch = self.channels
        caps = self.level_capacities
        x = ResNetStack(ch[0], layers=2, after="downsample",
                        out_capacity=caps[0], axis_name=self.axis_name,
                        name="block1")(x, train=train)
        x = ResNetStack(ch[1], layers=2, after="downsample",
                        out_capacity=caps[1], axis_name=self.axis_name,
                        name="block2")(x, train=train)
        x = ResNetStack(ch[2], layers=2, after="downsample",
                        out_capacity=caps[2], axis_name=self.axis_name,
                        name="block3")(x, train=train)
        if self.with_window_attn:
            from ..nn.attention import MortonWindowTransformer

            x = MortonWindowTransformer(window_size=self.window_size,
                                        name="window_attn")(x)
        x = ResNetStack(ch[3], layers=2, after=None, axis_name=self.axis_name,
                        name="block4")(x, train=train)
        x = ResNetStack(ch[4], layers=2, after=None, axis_name=self.axis_name,
                        name="block5")(x, train=train)
        mean = SparseConv(ch[-1], kernel_size=3, name="mean_conv")(x)
        log_var = SparseConv(ch[-1], kernel_size=3, name="log_var_conv")(x)
        return mean, log_var


class Decoder(nn.Module):
    """`ae_res.py:485-707`.  channels are the encoder's reversed
    (e.g. (4, 512, 512, 128, 32)); three generative upsamples back to the
    input stride.  ``target_grid`` is the ground-truth (stride-1) coordinate
    set; per level the occupancy target is membership of the decoded coords in
    the stride-divided target."""

    channels: Sequence[int] = (4, 512, 512, 128, 32)
    # capacity of each decoded level (post-growth candidate set), coarse→
    # fine; sized for the ~4x-per-level surface law with growth slack
    level_capacities: Sequence[int] = (2048, 8192, 16384, 32768)
    max_keep: Optional[int] = None  # reference's self.max clamp
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, z: SparseTensor, target_grid: SparseGrid,
                 train: bool = True):
        ch = self.channels
        out = z
        out_clss, targets = [], []
        for lvl in range(4):
            after = None if lvl == 0 else "upsample"
            out = ResNetStack(
                ch[lvl + 1], layers=2, after=after,
                out_capacity=self.level_capacities[lvl],
                axis_name=self.axis_name, name=f"block{lvl + 1}",
            )(out, train=train)
            logits_t = SparseConv(1, kernel_size=1, use_bias=True,
                                  name=f"block{lvl + 1}_cls")(out)
            logits = logits_t.features[:, 0]
            # get_target: membership of decoded coords in the strided GT set
            strided_target = stride_grid(
                target_grid, tuple(out.tensor_stride),
                capacity=self.level_capacities[lvl],
            )
            target = membership(out.grid, strided_target)
            out_clss.append(logits_t)
            targets.append(target)
            keep = top_k_mask(
                logits, out.valid,
                self.max_keep or self.level_capacities[min(lvl + 1, 3)],
            )
            # training: force-keep ground-truth voxels (all levels but the
            # last — `ae_res.py:608-609` vs `:674-676`)
            if train and lvl < 3:
                keep = keep | target
            grid, feats = prune(out.grid, out.features, keep)
            out = SparseTensor(grid=grid, features=feats)
        return out_clss, targets, out


class VAE(nn.Module):
    """`ae_res.py:710-789`: encode → reparameterize → decode.

    Returns (out_clss, targets, sout, mean, log_var, z).  The reference's
    Morton re-sort of the latent (`:783`) is a no-op here — SparseGrids are
    canonically Morton-ordered by construction."""

    channels: Sequence[int] = (32, 128, 512, 512, 4)
    encoder_capacities: Sequence[int] = (16384, 8192, 2048, 2048, 2048)
    decoder_capacities: Sequence[int] = (2048, 8192, 16384, 32768)
    max_keep: Optional[int] = None
    with_window_attn: bool = False
    window_size: int = 50
    axis_name: Optional[str] = None
    # Dense-canvas latent (ops/canvas.py): scatter the latent onto the FULL
    # stride-8 grid before decoding, so diffusion can sample template-free
    # from pure noise on a data-independent canvas.  ``canvas_noise_std``
    # jitters the empty cells during training so the level-0 occupancy head
    # learns to prune from features, not from exact zeros.  Requires a
    # bounded input grid (extent=...).
    latent_canvas: bool = False
    canvas_noise_std: float = 1.0

    def setup(self):
        self.encoder = Encoder(
            self.channels, self.encoder_capacities,
            with_window_attn=self.with_window_attn,
            window_size=self.window_size, axis_name=self.axis_name)
        self.decoder = Decoder(
            tuple(reversed(self.channels)), self.decoder_capacities,
            self.max_keep, self.axis_name)

    def __call__(self, sinput: SparseTensor, target_grid: SparseGrid,
                 rng: jax.Array, train: bool = True):
        mean, log_var = self.encoder(sinput, train=train)
        r_eps, r_canvas = jax.random.split(rng)
        eps = jax.random.normal(r_eps, log_var.features.shape,
                                log_var.features.dtype)
        z = mean.with_features(
            mean.features + jnp.exp(0.5 * log_var.features) * eps)
        if self.latent_canvas:
            z = self.to_canvas(z, noise_rng=r_canvas if train else None)
        out_clss, targets, sout = self.decoder(z, target_grid, train=train)
        return out_clss, targets, sout, mean, log_var, z

    def to_canvas(self, z: SparseTensor,
                  noise_rng: Optional[jax.Array] = None) -> SparseTensor:
        """Scatter a sparse latent onto the full dense canvas at its stride."""
        assert z.grid.extent is not None, (
            "latent_canvas needs a bounded input grid (extent=...)")
        # an undersized level-0 buffer would make stride_grid/unique_coords
        # silently truncate the level-0 membership target (the repo's known
        # capacity-overflow class) — fail loudly instead (ADVICE r3)
        cells = z.batch_size * int(np.prod(
            [-(-e // s) for e, s in zip(z.grid.extent, z.grid.stride)]))
        assert self.decoder_capacities[0] >= cells, (
            f"latent_canvas needs decoder_capacities[0] >= batch*canvas "
            f"cells ({cells}); got {self.decoder_capacities[0]}")
        canvas = canvas_grid(z.batch_size, z.grid.extent, z.grid.stride,
                             z.grid.ndim)
        std = self.canvas_noise_std if noise_rng is not None else 0.0
        return expand_to_canvas(z, canvas, empty_noise_std=std, rng=noise_rng)

    def encode(self, sinput: SparseTensor, train: bool = False):
        return self.encoder(sinput, train=train)

    def decode(self, z: SparseTensor, target_grid: SparseGrid,
               train: bool = False):
        return self.decoder(z, target_grid, train=train)


def vae_loss(out_clss, targets, mean: SparseTensor, log_var: SparseTensor,
             kld_weight: float = 1e-6):
    """Per-level masked BCE-with-logits averaged over levels + KLD
    (`ae_res.py:830-848`)."""
    bce = 0.0
    for logits_t, target in zip(out_clss, targets):
        lo = logits_t.features[:, 0]
        v = logits_t.valid
        t = target.astype(lo.dtype)
        per = jnp.maximum(lo, 0.0) - lo * t + jnp.log1p(jnp.exp(-jnp.abs(lo)))
        bce = bce + jnp.sum(jnp.where(v, per, 0.0)) / jnp.maximum(
            jnp.sum(v.astype(lo.dtype)), 1.0)
    bce = bce / float(len(out_clss))
    vmask = mean.valid[:, None].astype(mean.features.dtype)
    kld = -0.5 * jnp.sum(
        (1 + log_var.features - mean.features ** 2 -
         jnp.exp(log_var.features)) * vmask
    ) / jnp.maximum(jnp.sum(vmask), 1.0)
    return bce + kld_weight * kld, {"bce": bce, "kld": kld}
