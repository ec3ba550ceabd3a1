"""Host-side batch collation into fixed-capacity device buffers.

Replaces the reference's collation layer (`utils/collation.py`,
`examples/ae_res.py:125-141` ``collate_pointcloud_fn``): per-sample point
lists are batch-indexed, concatenated, and padded/truncated into the static
``[capacity, 1+D]`` coordinate buffer + validity mask the SparseGrid engine
consumes.  The reference's ``max_batch_len`` token budget with
largest-sample dropping is reproduced exactly (sort by size, drop the
biggest until the budget fits).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..ops.coords import batched_coordinates_np, pad_to_capacity


def collate_pointclouds(
    coords_list: Sequence[np.ndarray],
    capacity: int,
    max_batch_len: Optional[int] = None,
    features_list: Optional[Sequence[np.ndarray]] = None,
    feature_dim: int = 1,
):
    """→ (coords[capacity, 1+D], valid[capacity], features[capacity, C],
    kept_indices).

    Like `collate_pointcloud_fn` (`ae_res.py:125-141`): samples are sorted by
    size and the largest dropped while the total exceeds ``max_batch_len``
    (or the buffer capacity).  Batch indices are re-assigned contiguously to
    the kept samples.
    """
    budget = min(max_batch_len or capacity, capacity)
    sizes = [len(c) for c in coords_list]
    order = np.argsort(sizes)  # ascending; drop from the large end
    kept = list(order)
    while kept and sum(sizes[i] for i in kept) > budget:
        kept.pop()
    if not kept:
        # every sample alone exceeds the budget: keep the smallest,
        # truncated by pad_to_capacity (deterministic, never empty)
        kept = [int(order[0])]
    kept = sorted(kept)

    coords = batched_coordinates_np([coords_list[i] for i in kept])
    cpad, valid = pad_to_capacity(coords, capacity)
    if features_list is not None:
        feats = np.concatenate([features_list[i] for i in kept], axis=0)
        fpad = np.zeros((capacity, feats.shape[1]), np.float32)
        n = min(len(feats), capacity)
        fpad[:n] = feats[:n]
    else:
        fpad = np.zeros((capacity, feature_dim), np.float32)
        fpad[valid] = 1.0
    return cpad, valid, fpad, kept


def collate_fields(
    coords_list: Sequence[np.ndarray],  # float continuous coords per sample
    features_list: Sequence[np.ndarray],
    capacity: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """TensorField collation: continuous batched coords [capacity, 1+D]
    (float32), validity, features."""
    rows: List[np.ndarray] = []
    for b, c in enumerate(coords_list):
        rows.append(np.concatenate(
            [np.full((len(c), 1), b, np.float32),
             np.asarray(c, np.float32)], axis=1))
    coords = np.concatenate(rows, axis=0)
    n = min(len(coords), capacity)
    cpad = np.zeros((capacity, coords.shape[1]), np.float32)
    cpad[:n] = coords[:n]
    valid = np.zeros((capacity,), bool)
    valid[:n] = True
    feats = np.concatenate(features_list, axis=0)
    fpad = np.zeros((capacity, feats.shape[1]), np.float32)
    fpad[:n] = feats[:n]
    return cpad, valid, fpad


def stack_devices(batches: Sequence[tuple]) -> tuple:
    """Stack per-device collated tuples along a new leading device axis for
    `shard_map` data parallelism (SURVEY.md §2.5)."""
    return tuple(np.stack([b[i] for b in batches]) for i in range(len(batches[0])))
