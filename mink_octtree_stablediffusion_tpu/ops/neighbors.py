"""Kernel maps: padded gather-index tensors connecting two SparseGrids.

TPU-native replacement for the reference's native kernel-map generation
(`pybind/extern.hpp:804` ``kernel_map``, `src/kernel_map.hpp` stripped).  The
reference returns ragged per-offset (in_row, out_row) pair lists; here the map
is a dense ``int32[K, N_out]`` gather-index array with -1 sentinels — every
output row looks up its input neighbor for every kernel offset.  This
out-centric layout makes the sparse convolution a pure gather + GEMM (no
scatter in the forward pass → deterministic and MXU-friendly), with the
scatter-add appearing only in the autodiff transpose.

Lookups run as static binary searches over the canonical sorted order
(`ops.search`); every query for all K offsets is batched into ONE search of
K·N_out keys so XLA amortizes the bisection gathers across offsets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .coords import SparseGrid
from .kernels import KernelSpec
from . import hashtable as _hashtable
from . import lut as _lut
from .lut import build_lut, lut_entries, lut_lookup
from .search import lookup_sorted


def grid_lookup(grid: SparseGrid, queries: jnp.ndarray,
                queries_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Coordinate → row query with automatic strategy.

    - bounded extent → dense LUT (`ops.lut`, one direct gather; repeated
      calls on the same grid inside one jit share the build via XLA CSE —
      the reference memoizes kernel maps the same way, `docs/benchmark.md:3`)
    - unbounded, CPU backend → static binary search over the canonical
      order (`ops.search`; fastest compile)
    - unbounded, accelerator backends → XLA open-addressing hash table
      (`ops.hashtable`).  The bisection is NOT used there: on the axon TPU
      backend, `morton_encode`'s bit-interleave miscompiles when fused into
      large graphs (separately-compiled grid/query key instances disagree →
      silent lookup misses); the hash path's packed keys + while_loop probing
      are verified correct in the same fused graphs.
    """
    if grid.extent is not None and lut_entries(
            grid.extent, grid.stride, grid.batch_size) <= _lut.LUT_MAX_ENTRIES:
        table = build_lut(grid.coords, grid.valid, grid.stride, grid.extent,
                          grid.batch_size)
        return lut_lookup(table, grid.stride, grid.extent, grid.batch_size,
                          queries, queries_valid)
    if grid.extent is None and jax.default_backend() != "cpu":
        table = _hashtable.build_table(grid.coords, grid.valid)
        return _hashtable.lookup(table, queries, queries_valid)
    return lookup_sorted(grid.coords, grid.valid, grid.stride, queries,
                         queries_valid, extent=grid.extent)


def kernel_map(
    in_grid: SparseGrid,
    out_grid: SparseGrid,
    spec: KernelSpec,
) -> jnp.ndarray:
    """Gather indices ``idx[K, N_out]``: input row for each (offset, out row).

    Pairing rule (matches `MinkowskiConvolution.py` semantics):
      conv      — in_coord = out_coord + delta   (delta in input-lattice units)
      transpose — out_coord = in_coord + delta ⇒ query in at out_coord − delta
    """
    offs = spec.absolute_offsets(in_grid.stride)
    sign = -1 if spec.transpose else 1
    k = offs.shape[0]
    n_out = out_grid.capacity
    deltas = jnp.asarray((sign * offs).astype(np.int32))  # [K, D]
    q_xyz = out_grid.coords[None, :, 1:] + deltas[:, None, :]  # [K, N, D]
    q_b = jnp.broadcast_to(out_grid.coords[None, :, :1], (k, n_out, 1))
    queries = jnp.concatenate([q_b, q_xyz], axis=-1).reshape(k * n_out, -1)
    q_valid = jnp.broadcast_to(out_grid.valid[None, :], (k, n_out)).reshape(-1)
    idx = grid_lookup(in_grid, queries, q_valid)
    return idx.reshape(k, n_out)


def membership(query_grid: SparseGrid, target_grid: SparseGrid) -> jnp.ndarray:
    """bool[N_query]: is each (valid) query coordinate present in target?

    The decoder's ``get_target`` (`examples/ae_res.py:556-570`) does this via a
    kernel_size-1 kernel map; a single sorted-membership probe is equivalent.
    """
    idx = grid_lookup(target_grid, query_grid.coords, query_grid.valid)
    return (idx >= 0) & query_grid.valid


def identity_map(in_grid: SparseGrid, out_grid: SparseGrid) -> jnp.ndarray:
    """Row map out→in for grids over identical coordinate sets (e.g. pinning a
    stride-1 conv onto an explicitly provided coordinate key)."""
    return grid_lookup(in_grid, out_grid.coords, out_grid.valid)


def get_coords_map(fine_grid: SparseGrid, coarse_grid: SparseGrid
                   ) -> jnp.ndarray:
    """Stride map between two grids (reference `utils/coords.py:29`
    ``get_coords_map``): each fine coordinate maps to the coarse voxel
    containing it.  Returns int32[N_fine] coarse row per fine row (-1 if
    absent).  Coarse stride must be a multiple of the fine stride."""
    cs = np.asarray(coarse_grid.stride, np.int32)
    fs = np.asarray(fine_grid.stride, np.int32)
    assert np.all(cs % fs == 0), "coarse stride must divide by fine stride"
    csj = jnp.asarray(cs)
    down = jnp.concatenate(
        [fine_grid.coords[:, :1],
         jnp.floor_divide(fine_grid.coords[:, 1:], csj) * csj], axis=-1)
    return grid_lookup(coarse_grid, down, fine_grid.valid)
