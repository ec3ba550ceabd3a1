"""Kernel maps: padded gather-index tensors connecting two SparseGrids.

TPU-native replacement for the reference's native kernel-map generation
(`pybind/extern.hpp:804` ``kernel_map``, `src/kernel_map.hpp` stripped).  The
reference returns ragged per-offset (in_row, out_row) pair lists; here the map
is a dense ``int32[K, N_out]`` gather-index array with -1 sentinels — every
output row looks up its input neighbor for every kernel offset.  This
out-centric layout makes the sparse convolution a pure gather + GEMM (no
scatter in the forward pass → deterministic and MXU-friendly), with the
scatter-add appearing only in the autodiff transpose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import hashtable
from .coords import SparseGrid
from .kernels import KernelSpec


def kernel_map(
    in_grid: SparseGrid,
    out_grid: SparseGrid,
    spec: KernelSpec,
    in_table: hashtable.HashTable | None = None,
) -> jnp.ndarray:
    """Gather indices ``idx[K, N_out]``: input row for each (offset, out row).

    Pairing rule (matches `MinkowskiConvolution.py` semantics):
      conv      — in_coord = out_coord + delta   (delta in input-lattice units)
      transpose — out_coord = in_coord + delta ⇒ query in at out_coord − delta
    """
    table = in_table if in_table is not None else in_grid.hash_table()
    offs = spec.absolute_offsets(in_grid.stride)
    sign = -1 if spec.transpose else 1
    out_xyz = out_grid.coords[:, 1:]
    out_b = out_grid.coords[:, :1]
    rows = []
    for k in range(offs.shape[0]):
        delta = jnp.asarray((sign * offs[k]).astype(np.int32))
        q = jnp.concatenate([out_b, out_xyz + delta[None, :]], axis=-1)
        rows.append(hashtable.lookup(table, q, out_grid.valid))
    return jax.lax.stop_gradient(jnp.stack(rows, axis=0))


def membership(query_grid: SparseGrid, target_grid: SparseGrid,
               target_table: hashtable.HashTable | None = None) -> jnp.ndarray:
    """bool[N_query]: is each (valid) query coordinate present in target?

    The decoder's ``get_target`` (`examples/ae_res.py:556-570`) does this via a
    kernel_size-1 kernel map; a single hashed membership probe is equivalent.
    """
    table = target_table if target_table is not None else target_grid.hash_table()
    idx = hashtable.lookup(table, query_grid.coords, query_grid.valid)
    return (idx >= 0) & query_grid.valid


def identity_map(in_grid: SparseGrid, out_grid: SparseGrid) -> jnp.ndarray:
    """Row map out→in for grids over identical coordinate sets (e.g. pinning a
    stride-1 conv onto an explicitly provided coordinate key)."""
    table = in_grid.hash_table()
    return hashtable.lookup(table, out_grid.coords, out_grid.valid)
