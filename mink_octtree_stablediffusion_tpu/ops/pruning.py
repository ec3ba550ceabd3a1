"""Pruning and compaction of sparse tensors.

TPU-native replacement for the reference pruning natives
(`pybind/extern.hpp:397-428`, `MinkowskiPruning.py`): a boolean keep-mask
yields a new grid holding only the kept rows.  With static capacities the
"removal" is a stable compaction (kept rows first) — the canonical
(batch, morton) order is preserved because a subsequence of a sorted sequence
stays sorted.  Gradients flow to kept rows only, matching the reference's
backward scatter.
"""

from __future__ import annotations

import jax.numpy as jnp

from .coords import INVALID_COORD, SparseGrid


def prune(
    grid: SparseGrid,
    features: jnp.ndarray,
    keep: jnp.ndarray,
    capacity: int | None = None,
):
    """Keep rows where ``keep`` (and valid); returns (grid, features).

    ``capacity``: optional smaller output capacity (rows beyond it are
    dropped; the reference clamps with top-k the same way,
    `examples/ae_res.py:601-605`)."""
    cap = capacity or grid.capacity
    keep = keep & grid.valid
    order = jnp.argsort(~keep, stable=True)[:cap]
    new_valid = keep[order]
    new_coords = jnp.where(new_valid[:, None], grid.coords[order], INVALID_COORD)
    new_feats = features[order] * new_valid[:, None].astype(features.dtype)
    return (
        SparseGrid(
            coords=new_coords,
            valid=new_valid,
            stride=grid.stride,
            batch_size=grid.batch_size,
            extent=grid.extent,
        ),
        new_feats,
    )


def top_k_mask(logits: jnp.ndarray, valid: jnp.ndarray, k_max: int) -> jnp.ndarray:
    """keep = logits > 0, clamped to at most ``k_max`` rows by threshold — the
    decoder's capacity clamp (`examples/ae_res.py:599-609`) in static shape:
    keeps the k_max highest logits among the >0 set."""
    score = jnp.where(valid, logits, -jnp.inf)
    keep = (score > 0.0)
    n_keep = jnp.sum(keep.astype(jnp.int32))
    kth = jnp.sort(score)[::-1][jnp.minimum(k_max, score.shape[0]) - 1]
    clamped = score > jnp.maximum(kth, 0.0)
    return jnp.where(n_keep > k_max, clamped, keep)
