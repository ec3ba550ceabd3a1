"""Morton (Z-order) codes for batched integer voxel coordinates.

TPU-native replacement for the reference's host-side Morton sorting
(`examples/ae_res.py:92-123` ``sorted_by_morton_code``): interleave the bits of
the (stride-normalized) spatial coordinates into a single int32 key.  The key
is used (a) as the canonical row ordering of every SparseGrid — the reference
keeps tensors Morton-sorted for its windowed/padded attention — and (b) as the
secondary sort key of the sort-based unique/dedup kernel.

All functions are jit-traceable and shape-static.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def bits_per_dim(ndim: int) -> int:
    """Bits of each spatial coordinate that participate in the Morton key.

    The key is a non-negative int32, so we can spend 30 bits total.
    """
    return 30 // ndim


def morton_encode(xyz: jnp.ndarray, stride=1) -> jnp.ndarray:
    """Morton codes for spatial coordinates ``xyz`` of shape [N, D] (int32).

    Coordinates are divided by ``stride`` (the tensor stride — lattice points
    are multiples of it), offset into the non-negative range and clipped to
    ``bits_per_dim`` bits.  Clipping can make distant out-of-range coordinates
    compare equal — callers that need a *total* order additionally tie-break
    on the raw coordinate columns (see ``ops.coords.canonical_order``).
    """
    n, d = xyz.shape
    bits = bits_per_dim(d)
    half = 1 << (bits - 1)
    stride = jnp.asarray(stride, dtype=jnp.int32)
    q = jnp.floor_divide(xyz.astype(jnp.int32), stride) + half
    q = jnp.clip(q, 0, (1 << bits) - 1)
    code = jnp.zeros((n,), dtype=jnp.int32)
    for bit in range(bits):
        for dim in range(d):
            # dim 0 occupies the most-significant interleaved position, to
            # match x-major Z-order (reference interleaves x,y,z MSB-first).
            src = (q[:, dim] >> bit) & 1
            code = code | (src << (bit * d + (d - 1 - dim)))
    return code


def morton_decode(code: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Inverse of :func:`morton_encode` at stride 1 (returns offset-removed coords)."""
    bits = bits_per_dim(ndim)
    half = 1 << (bits - 1)
    out = []
    for dim in range(ndim):
        v = jnp.zeros_like(code)
        for bit in range(bits):
            v = v | (((code >> (bit * ndim + (ndim - 1 - dim))) & 1) << bit)
        out.append(v - half)
    return jnp.stack(out, axis=-1)


def morton_encode_np(xyz: np.ndarray, stride=1) -> np.ndarray:
    """NumPy twin of :func:`morton_encode` for host-side data pipelines."""
    n, d = xyz.shape
    bits = bits_per_dim(d)
    half = 1 << (bits - 1)
    q = np.floor_divide(xyz.astype(np.int64), stride) + half
    q = np.clip(q, 0, (1 << bits) - 1)
    code = np.zeros((n,), dtype=np.int64)
    for bit in range(bits):
        for dim in range(d):
            code |= ((q[:, dim] >> bit) & 1) << (bit * d + (d - 1 - dim))
    return code.astype(np.int32)
