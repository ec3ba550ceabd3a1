"""Sparse pooling: local (kernel-neighborhood) and global (per-instance).

TPU-native replacement for the reference's pooling natives
(`pybind/extern.hpp:187-352`): local pooling reduces over the same padded
kernel maps as convolution; global pooling is a masked segment reduction over
the batch column (the reference's origin map becomes `segment_sum` on
``coords[:, 0]`` — batch segmentation is first-class on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .conv import gather_rows

_NEG_INF = -jnp.inf


def local_pool_apply(
    features: jnp.ndarray,  # [N_in, C]
    nbr_idx: jnp.ndarray,  # int32[K, N_out]
    mode: str = "avg",
):
    """Sum/avg/max over the kernel neighborhood of every output row.

    Returns (out [N_out, C], num_nonzero [N_out]) like the native pooling
    (`pybind/extern.hpp:187-245` returns (out_feat, num_nonzero))."""
    k, n_out = nbr_idx.shape
    present = (nbr_idx >= 0)
    num = jnp.sum(present.astype(features.dtype), axis=0)  # [N_out]
    if mode == "max":
        g = jax.vmap(lambda ix: gather_rows(features, ix))(nbr_idx)  # [K, N_out, C]
        g = jnp.where(present[:, :, None], g, _NEG_INF)
        out = jnp.max(g, axis=0)
        out = jnp.where(num[:, None] > 0, out, 0.0)
        return out, num
    acc = jnp.zeros((n_out, features.shape[1]), dtype=features.dtype)
    for kk in range(k):
        acc = acc + gather_rows(features, nbr_idx[kk])
    if mode == "sum":
        return acc, num
    if mode == "avg":
        return acc / jnp.maximum(num, 1.0)[:, None], num
    raise ValueError(mode)


def global_pool(
    features: jnp.ndarray,  # [N, C]
    batch_ids: jnp.ndarray,  # int32[N]; padding rows -> num_batches
    num_batches: int,
    valid: jnp.ndarray,
    mode: str = "avg",
):
    """Per-instance reduction to [B, C] (reference global pooling,
    `pybind/extern.hpp:315-352`).  Returns (pooled [B, C], counts [B]).

    sum/avg run as a one-hot MXU matmul over the few batch segments (fp32
    accumulation) rather than a segment scatter-add — on TPU the scatter
    lowering costs ~0.3 ms per call at 16k rows while the [B, N] x [N, C]
    matmul is microseconds, and its autodiff transpose is another matmul
    (the scatter's transpose re-gathers).  `max` keeps the segment path."""
    oh = _batch_onehot(batch_ids, num_batches, valid, features.dtype)
    counts = jnp.sum(oh, axis=1)
    if mode == "max":
        g = jnp.where(valid[:, None], features, _NEG_INF)
        out = jax.ops.segment_max(g, batch_ids, num_segments=num_batches + 1)[
            :num_batches
        ]
        out = jnp.where(counts[:, None] > 0, out, 0.0)
        return out, counts
    s = jax.lax.dot_general(
        oh, features, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(features.dtype)
    if mode == "sum":
        return s, counts
    if mode == "avg":
        return s / jnp.maximum(counts, 1.0)[:, None], counts
    raise ValueError(mode)


def _batch_onehot(batch_ids, num_batches, valid, dtype):
    """[B, N] masked one-hot of the batch column."""
    seg = jnp.where(valid, batch_ids, num_batches)
    return (seg[None, :] == jnp.arange(num_batches)[:, None]).astype(dtype)


def broadcast_batch(
    per_batch: jnp.ndarray,  # [B, C]
    batch_ids: jnp.ndarray,  # int32[N]
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Broadcast per-instance vectors back to every voxel row [N, C]
    (reference Broadcast natives, `pybind/extern.hpp:357-392`).

    One-hot matmul rather than a row gather: the [N, B] x [B, C] matmul and
    its transpose both stay on the MXU (the gather's autodiff transpose is a
    scatter-add — the measured cost of the instance norms' backward)."""
    b = per_batch.shape[0]
    oh = _batch_onehot(batch_ids, b, valid, per_batch.dtype)
    return jax.lax.dot_general(
        oh, per_batch, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(per_batch.dtype)
