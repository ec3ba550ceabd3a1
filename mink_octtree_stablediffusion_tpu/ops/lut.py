"""Dense lookup-table coordinate queries for bounded-extent grids.

When a SparseGrid's spatial extent is known statically (voxelized shapes
always are: coords lie in [0, resolution)), coordinate→row queries become a
single direct index into a scattered dense table — one gather instead of the
binary search's log(N) gather chain.  The table costs
``B · prod(extent/stride)`` int32 entries, so it is only the right trade
below a size threshold; `lookup_auto` picks LUT vs binary search per grid.

This is the TPU analogue of the reference's O(1) hash probes
(`pybind/extern.hpp:27-39`) for the common bounded-resolution regime, with
the table living in device memory as a plain array (XLA CSE shares one build
across all K offsets and all layers at the same geometry — the reference's
kernel-map memoization, `docs/benchmark.md:3`).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

# default max table entries for choosing the LUT path (~8 MB int32)
LUT_MAX_ENTRIES = 2_097_152


def lut_shape(extent: Sequence[int], stride: Sequence[int],
              batch_size: int) -> Tuple[int, ...]:
    """Table cells per dim in current-stride units."""
    cells = tuple(int(np.ceil(e / s)) for e, s in zip(extent, stride))
    return (batch_size,) + cells


def lut_entries(extent, stride, batch_size) -> int:
    return int(np.prod(lut_shape(extent, stride, batch_size)))


def build_lut(coords: jnp.ndarray, valid: jnp.ndarray, stride, extent,
              batch_size: int) -> jnp.ndarray:
    """Scatter row indices into a flat [B·prod(cells) + 1] table (-1 empty)."""
    shape = lut_shape(extent, stride, batch_size)
    total = int(np.prod(shape))
    s = jnp.asarray(np.asarray(stride, np.int32))
    cells = np.asarray(shape[1:], np.int64)
    pos = jnp.floor_divide(coords[:, 1:], s)
    b = coords[:, 0]
    in_range = valid & (b >= 0) & (b < batch_size)
    flat = b
    for i, c in enumerate(cells):
        in_range = in_range & (pos[:, i] >= 0) & (pos[:, i] < int(c))
        flat = flat * int(c) + jnp.clip(pos[:, i], 0, int(c) - 1)
    dest = jnp.where(in_range, flat, total)
    n = coords.shape[0]
    table = jnp.full((total + 1,), -1, jnp.int32)
    return table.at[dest].set(jnp.arange(n, dtype=jnp.int32))


def lut_lookup(table: jnp.ndarray, stride, extent, batch_size: int,
               queries: jnp.ndarray, queries_valid: jnp.ndarray | None = None
               ) -> jnp.ndarray:
    """Direct-index row lookup; -1 for missing/out-of-extent/invalid."""
    shape = lut_shape(extent, stride, batch_size)
    total = int(np.prod(shape))
    s = jnp.asarray(np.asarray(stride, np.int32))
    cells = np.asarray(shape[1:], np.int64)
    pos = jnp.floor_divide(queries[:, 1:], s)
    # exact-multiple check: off-lattice queries (possible under dilation)
    # must miss, matching binary-search semantics
    on_lattice = jnp.all(queries[:, 1:] == pos * s, axis=-1)
    b = queries[:, 0]
    ok = (b >= 0) & (b < batch_size) & on_lattice
    if queries_valid is not None:
        ok = ok & queries_valid
    flat = b
    for i, c in enumerate(cells):
        ok = ok & (pos[:, i] >= 0) & (pos[:, i] < int(c))
        flat = flat * int(c) + jnp.clip(pos[:, i], 0, int(c) - 1)
    idx = table[jnp.where(ok, flat, total)]
    return jax.lax.stop_gradient(jnp.where(ok, idx, -1))
