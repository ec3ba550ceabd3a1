"""Trilinear interpolation and splatting between continuous points and voxels.

TPU-native replacement for the reference interpolation natives
(`pybind/extern.hpp:433-467`, `MinkowskiInterpolation.py`) and the
TensorField splat path (`MinkowskiTensorField.py:381-406`,
``create_splat_coordinates`` `:53-73`).  Each continuous query point reads
from / writes to its 2^D surrounding lattice corners with multilinear weights;
corner rows are resolved with the same hashed membership lookup as kernel
maps.
"""

from __future__ import annotations

import itertools

import jax.numpy as jnp
import numpy as np

from .neighbors import grid_lookup
from .coords import INVALID_COORD, SparseGrid, unique_coords
from .conv import gather_rows


def _corners(ndim: int) -> np.ndarray:
    return np.array(list(itertools.product([0, 1], repeat=ndim)), dtype=np.int32)


def interpolation_weights(points: jnp.ndarray, stride) -> tuple:
    """For continuous batched points [M, 1+D] (float): per-corner integer
    coordinates [2^D, M, 1+D] and multilinear weights [2^D, M]."""
    d = points.shape[1] - 1
    s = jnp.asarray(np.asarray(stride, dtype=np.float32).reshape(1, -1))
    xyz = points[:, 1:] / s
    base = jnp.floor(xyz)
    frac = xyz - base
    corners = _corners(d)
    coords_list, weights = [], []
    for c in corners:
        cj = jnp.asarray(c[None, :].astype(np.float32))
        corner_xyz = (base + cj) * s
        w = jnp.prod(jnp.where(cj > 0, frac, 1.0 - frac), axis=-1)
        cc = jnp.concatenate(
            [points[:, :1].astype(jnp.int32), corner_xyz.astype(jnp.int32)], axis=-1
        )
        coords_list.append(cc)
        weights.append(w)
    return jnp.stack(coords_list, axis=0), jnp.stack(weights, axis=0)


def interpolate(
    grid: SparseGrid,
    features: jnp.ndarray,
    points: jnp.ndarray,  # float[M, 1+D] continuous batched coordinates
    points_valid: jnp.ndarray,
) -> jnp.ndarray:
    """Sample voxel features at continuous points → [M, C] (reference
    `MinkowskiInterpolationFunction`, returning the weighted corner sum;
    missing corners contribute zero)."""
    corner_coords, w = interpolation_weights(points, grid.stride)
    k, m, nf = corner_coords.shape
    q_valid = jnp.tile(points_valid, (k,))
    idx = grid_lookup(grid, corner_coords.reshape(k * m, nf), q_valid
                      ).reshape(k, m)
    out = 0.0
    for kk in range(k):
        out = out + gather_rows(features, idx[kk]) * w[kk][:, None]
    return out * points_valid[:, None].astype(features.dtype)


def splat_coordinates(points: jnp.ndarray, points_valid: jnp.ndarray,
                      stride, capacity: int, batch_size: int) -> SparseGrid:
    """Unique lattice corners of all points — the reference's
    ``create_splat_coordinates`` (`MinkowskiTensorField.py:53-73`)."""
    corner_coords, _ = interpolation_weights(points, stride)
    k, m, nf = corner_coords.shape
    flat = corner_coords.reshape(k * m, nf)
    fv = jnp.tile(points_valid, (k,))
    flat = jnp.where(fv[:, None], flat, INVALID_COORD)
    uc, uv, _, _ = unique_coords(flat, fv, capacity, stride)
    d = nf - 1
    s = stride if isinstance(stride, tuple) else (int(stride),) * d
    return SparseGrid(coords=uc, valid=uv, stride=tuple(int(x) for x in np.broadcast_to(np.asarray(s), (d,))), batch_size=batch_size)


def splat(
    grid: SparseGrid,
    points: jnp.ndarray,
    points_valid: jnp.ndarray,
    point_features: jnp.ndarray,  # [M, C]
) -> jnp.ndarray:
    """Scatter point features onto the grid with multilinear weights → [N, C]
    (reference TensorField.splat, `MinkowskiTensorField.py:381-406`)."""
    corner_coords, w = interpolation_weights(points, grid.stride)
    k, m, nf = corner_coords.shape
    n = grid.capacity
    q_valid = jnp.tile(points_valid, (k,))
    idx = grid_lookup(grid, corner_coords.reshape(k * m, nf), q_valid
                      ).reshape(k, m)
    acc = jnp.zeros((n + 1, point_features.shape[1]), dtype=point_features.dtype)
    pf = point_features * points_valid[:, None].astype(point_features.dtype)
    for kk in range(k):
        dest = jnp.where(idx[kk] >= 0, idx[kk], n)
        acc = acc.at[dest].add(pf * w[kk][:, None])
    return acc[:n]
