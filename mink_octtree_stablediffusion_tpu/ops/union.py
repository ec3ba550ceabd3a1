"""Coordinate-set union with feature accumulation.

TPU-native replacement for the reference's union map + python scatter-add
(`MinkowskiUnion.py:33-83`, manager `union_map` `pybind/extern.hpp:802`).
Also backs SparseTensor binary arithmetic on mismatched coordinate sets
(`MinkowskiTensor.py:511-546` falls back to a union map).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from .coords import INVALID_COORD, SparseGrid, unique_coords


def union(
    grids: Sequence[SparseGrid],
    features: Sequence[jnp.ndarray],
    capacity: int | None = None,
):
    """Union of N sparse tensors; features of coinciding coordinates add.

    Returns (grid, features).  All inputs must share stride/batch_size."""
    g0 = grids[0]
    assert all(g.stride == g0.stride and g.batch_size == g0.batch_size for g in grids)
    cap = capacity or max(g.capacity for g in grids)
    all_coords = jnp.concatenate([g.coords for g in grids], axis=0)
    all_valid = jnp.concatenate([g.valid for g in grids], axis=0)
    all_coords = jnp.where(all_valid[:, None], all_coords, INVALID_COORD)
    uc, uv, inverse, _ = unique_coords(all_coords, all_valid, cap, g0.stride)
    c = features[0].shape[1]
    acc = jnp.zeros((cap + 1, c), dtype=features[0].dtype)
    all_feats = jnp.concatenate(
        [f * g.valid[:, None].astype(f.dtype) for f, g in zip(features, grids)], axis=0
    )
    acc = acc.at[inverse].add(all_feats)
    extents = [g.extent for g in grids]
    extent = None
    if all(e is not None for e in extents):
        extent = tuple(max(e[i] for e in extents) for i in range(g0.ndim))
    out_grid = SparseGrid(
        coords=uc, valid=uv, stride=g0.stride, batch_size=g0.batch_size,
        extent=extent,
    )
    return out_grid, acc[:cap]
