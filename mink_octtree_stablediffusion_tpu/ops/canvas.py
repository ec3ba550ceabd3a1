"""Dense latent canvas: a fully-occupied coarse grid as the diffusion medium.

The reference's sampling path denoises on the latent coordinate set of a
*data* batch (`examples/diffusion.py:597-629`) — generation therefore needs a
shape's coarse structure up front.  On TPU the natural medium is instead the
full dense stride-``s`` canvas: at stride 8 a res-64 canvas is only 8³ = 512
cells per instance, a perfectly static, MXU-friendly token set.  The VAE's
latent is scattered onto the canvas (absent cells → 0-features, optionally
jittered during VAE training so the pruning decoder learns to reject them
from *features*, not from exact zeros), the decoder's level-0 occupancy head
prunes the empty cells, and sampling becomes template-free: pure noise on a
data-independent canvas.  This is a deliberate architectural delta from the
reference (documented in docs/DESIGN.md) that upgrades its
structure-conditioned sampling to true unconditional generation.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .coords import SparseGrid, _tuplize
from .neighbors import grid_lookup


def canvas_grid(batch_size: int, resolution, stride, ndim: int = 3
                ) -> SparseGrid:
    """The full dense grid at tensor stride ``stride`` under ``resolution``
    extent, rows in canonical (batch, x, y, z) row-major order."""
    res = _tuplize(resolution, ndim)
    sa = _tuplize(stride, ndim)
    cells = tuple(-(-r // s) for r, s in zip(res, sa))
    axes = [np.arange(c, dtype=np.int32) * s for c, s in zip(cells, sa)]
    mesh = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, ndim)
    n = len(mesh)
    coords = np.concatenate(
        [np.repeat(np.arange(batch_size, dtype=np.int32), n)[:, None],
         np.tile(mesh, (batch_size, 1))], axis=1)
    return SparseGrid(coords=jnp.asarray(coords),
                      valid=jnp.ones((batch_size * n,), bool),
                      stride=sa, batch_size=batch_size, extent=res)


def expand_to_canvas(latent, canvas: SparseGrid,
                     empty_noise_std: float = 0.0,
                     rng: Optional[jax.Array] = None):
    """Scatter a sparse latent's features onto the dense canvas.

    Cells present in the latent keep their features; absent cells get zeros,
    plus N(0, empty_noise_std²) jitter when requested (VAE training — makes
    the level-0 occupancy classifier robust to the near-zero-but-not-zero
    features a diffusion model produces at empty cells)."""
    from ..tensor import SparseTensor

    idx = grid_lookup(latent.grid, canvas.coords, canvas.valid)
    feats = jnp.where((idx >= 0)[:, None],
                      latent.features[jnp.clip(idx, 0)], 0.0)
    if empty_noise_std > 0.0:
        assert rng is not None, "empty_noise_std needs an rng"
        noise = empty_noise_std * jax.random.normal(
            rng, feats.shape, feats.dtype)
        feats = jnp.where((idx >= 0)[:, None], feats, noise)
    return SparseTensor(grid=canvas, features=feats)
