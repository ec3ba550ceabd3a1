"""Functional coordinate engine: fixed-capacity batched voxel coordinate sets.

TPU-native replacement for the reference's stateful CoordinateMapManager
(`MinkowskiEngine/MinkowskiCoordinateManager.py`, native decl
`pybind/extern.hpp:767-806`).  A coordinate set is a pytree —
``SparseGrid(coords[N_cap, 1+D], valid[N_cap])`` with a static tensor stride —
so every operation (dedup, stride map, generative expansion, membership query)
is a shape-static XLA computation: whole training steps jit with zero host
round-trips.

Canonical row order is batch-major and spatially sorted: bounded-extent grids
sort by the flat row-major cell index (single int32 key — fastest sort and
search, robust on every backend), unbounded grids by (batch, Morton) with
coordinate tie-breakers (the reference sorts tensors by Morton code before
attention, `examples/ae_res.py:92-123`; `nn.MortonWindowTransformer` imposes
morton order itself, so attention locality is independent of this choice).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import hashtable
from .morton import morton_encode

# Stored in every column of padding rows.  Valid pipeline coordinates are
# bounded by the voxelization resolution (<= 1024 in all reference configs),
# far below this sentinel, and the packed-key domain (+-32767 for D=3) is far
# above it.
INVALID_COORD = 1 << 14


def _tuplize(x, d: int) -> Tuple[int, ...]:
    if isinstance(x, (int, np.integer)):
        return (int(x),) * d
    t = tuple(int(v) for v in x)
    assert len(t) == d
    return t


class SparseGrid(struct.PyTreeNode):
    """A deduplicated, Morton-canonically-ordered batched coordinate set.

    coords[:, 0] is the batch index (the reference encodes batch the same way:
    `MinkowskiEngine/utils/collation.py:30-92`).  Rows with ``valid == False``
    are padding and hold ``INVALID_COORD`` in every column.
    """

    coords: jnp.ndarray  # int32[N_cap, 1+D]
    valid: jnp.ndarray  # bool[N_cap]
    stride: Tuple[int, ...] = struct.field(pytree_node=False, default=(1, 1, 1))
    batch_size: int = struct.field(pytree_node=False, default=1)
    # static spatial bound: all valid coords lie in [0, extent) per dim (at
    # stride-1 lattice units).  Enables the dense-LUT query fast path
    # (`ops.lut`); None -> unbounded, queries use sorted binary search.
    extent: Optional[Tuple[int, ...]] = struct.field(pytree_node=False,
                                                    default=None)

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]

    @property
    def ndim(self) -> int:
        return self.coords.shape[1] - 1

    def batch_ids(self) -> jnp.ndarray:
        """Batch index per row; padding rows map to segment ``batch_size``."""
        return jnp.where(self.valid, self.coords[:, 0], self.batch_size)

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))

    def hash_table(self) -> hashtable.HashTable:
        """Build the membership table for this grid (XLA CSE dedupes repeats)."""
        return hashtable.build_table(self.coords, self.valid)


def _flat_bound(extent, stride, d) -> int | None:
    """Total flat cells per batch instance if extent is usable, else None.

    Usable ⟺ the flat key b·prod(cells)+linear stays below int32 for any
    batch index the pipelines use (we reserve 20 bits of batch headroom)."""
    if extent is None:
        return None
    cells = [int(np.ceil(e / s)) for e, s in zip(extent, stride)]
    total = int(np.prod(cells))
    if total <= 0 or total >= (1 << 30):
        return None
    return total


def flat_cell_key(coords: jnp.ndarray, valid: jnp.ndarray, stride,
                  extent) -> jnp.ndarray:
    """Injective int32 sort/search key for bounded grids: the row-major
    linearization ``b·prod(cells) + x·(...)+…`` of the stride-normalized
    cell — no bit interleave (the morton path miscompiles on some TPU
    backends, see ops.neighbors.grid_lookup), one key instead of d+2.
    Padding/invalid rows map to INT32_MAX.  Canonical row order for bounded
    grids is therefore (batch, x, y, z) row-major."""
    d = coords.shape[1] - 1
    sa = np.asarray(_tuplize(stride, d), dtype=np.int32)
    cells = [int(np.ceil(e / s)) for e, s in zip(extent, sa)]
    pos = jnp.floor_divide(coords[:, 1:], jnp.asarray(sa))
    key = coords[:, 0]
    ok = valid
    for i, c in enumerate(cells):
        ok = ok & (pos[:, i] >= 0) & (pos[:, i] < c)
        key = key * c + jnp.clip(pos[:, i], 0, c - 1)
    big = np.iinfo(np.int32).max
    return jnp.where(ok, key, big)


def canonical_sort_keys(coords: jnp.ndarray, valid: jnp.ndarray, stride,
                        extent=None) -> tuple:
    """lexsort key tuple (least→most significant) of the canonical order:
    bounded grids sort by the single flat cell key (batch, row-major);
    unbounded grids by (batch, morton) with coordinate tie-breakers."""
    d = coords.shape[1] - 1
    if _flat_bound(extent, _tuplize(stride, d), d) is not None:
        return (flat_cell_key(coords, valid, _tuplize(stride, d), extent),)
    s = np.asarray(_tuplize(stride, d), dtype=np.int32)
    m = morton_encode(coords[:, 1:], jnp.asarray(s))
    big = np.iinfo(np.int32).max
    m = jnp.where(valid, m, big)
    b = jnp.where(valid, coords[:, 0], big)
    minor = tuple(coords[:, i] for i in range(d, 0, -1))
    return minor + (m, b)


def canonical_order(coords: jnp.ndarray, valid: jnp.ndarray, stride,
                    extent=None) -> jnp.ndarray:
    """Permutation sorting rows into canonical order, padding last."""
    keys = canonical_sort_keys(coords, valid, stride, extent)
    if len(keys) == 1:
        return jnp.argsort(keys[0])
    return jnp.lexsort(keys)


def _decode_flat_key(keys: jnp.ndarray, valid: jnp.ndarray, stride,
                     extent) -> jnp.ndarray:
    """Inverse of ``flat_cell_key`` for lattice-aligned coordinates: recover
    ``[N, 1+D]`` coords (batch, pos·stride) from the flat cell keys.  Exact
    iff every valid coordinate is a multiple of its stride — the SparseGrid
    canonical invariant (make_grid at stride 1, stride_grid's floor·stride,
    expand_grid's parent+offset children all satisfy it)."""
    d = len(extent)
    sa = np.asarray(_tuplize(stride, d), dtype=np.int32)
    cells = [int(np.ceil(e / s)) for e, s in zip(extent, sa)]
    total = int(np.prod(cells))
    k = jnp.where(valid, keys, 0)
    b = k // total
    rem = k % total
    pos = []
    for c in reversed(cells):
        pos.append(rem % c)
        rem = rem // c
    pos = jnp.stack(pos[::-1], axis=-1) * jnp.asarray(sa)
    out = jnp.concatenate([b[:, None], pos], axis=-1).astype(jnp.int32)
    return jnp.where(valid[:, None], out, INVALID_COORD)


def unique_coords(
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    capacity: int,
    stride=1,
    extent=None,
    with_inverse: bool = True,
    batch_size: Optional[int] = None,
):
    """Sort-based dedup into a fixed-capacity canonical buffer.

    The jit-traceable equivalent of the native ``insert_and_map``
    (`MinkowskiCoordinateManager.py:153-179`): returns the unique coordinate
    array, its validity mask, the inverse map (input row → unique row, with
    ``capacity`` as the dropped/invalid sentinel) and the true unique count
    (callers can detect capacity overflow: ``count > capacity``).

    Bounded grids take a key-space fast path: the injective flat cell key is
    sorted as a bare int32 value (no argsort, no ``[N, 1+D]`` payload gather
    or scatter — on TPU those narrow gathers dominated the generic path) and
    the output coordinates are *decoded* from the keys by divmod; the inverse
    map becomes one ``searchsorted``, skipped when ``with_inverse=False``
    (stride/expand callers discard it).  Out-of-bounds valid rows are dropped
    on this path (key = sentinel), matching how every bounded caller already
    masks or guards its candidates.

    The inverse on the bounded path is a dense-LUT gather when ``batch_size``
    is given and the key space fits (`ops.lut.LUT_MAX_ENTRIES`): scatter each
    unique row's position at its key cell, read back at the input keys — two
    O(N) passes instead of ``searchsorted``, which XLA lowers to a log(N)-step
    `while` gather chain on TPU (~3.7 ms at 32k rows vs ~0.3 ms for the LUT).
    """
    n, nf = coords.shape
    d = nf - 1
    st = _tuplize(stride, d)
    big = np.iinfo(np.int32).max
    if _flat_bound(extent, st, d) is not None:
        key = flat_cell_key(coords, valid, st, extent)
        sk = jnp.sort(key)
        okv = sk != big
        first = okv & jnp.concatenate(
            [jnp.ones((1,), bool), sk[1:] != sk[:-1]])
        uid = jnp.cumsum(first.astype(jnp.int32)) - 1
        count = jnp.sum(first.astype(jnp.int32))
        dest = jnp.where(first, jnp.minimum(uid, capacity), capacity)
        out_keys = jnp.full((capacity + 1,), big, jnp.int32).at[dest].set(sk)
        out_keys = out_keys[:capacity]
        out_valid = jnp.arange(capacity, dtype=jnp.int32) < jnp.minimum(
            count, capacity)
        out_coords = _decode_flat_key(out_keys, out_valid, st, extent)
        if not with_inverse:
            return out_coords, out_valid, None, count
        total_cells = _flat_bound(extent, st, d)
        lut_total = (batch_size * total_cells if batch_size is not None
                     else None)
        from .lut import LUT_MAX_ENTRIES
        if lut_total is not None and lut_total + 1 <= LUT_MAX_ENTRIES:
            # dropped/overflowed keys keep the `capacity` default; padding
            # rows write a trash slot that queries never read (okq override)
            lut = jnp.full((lut_total + 1,), capacity, jnp.int32)
            dest = jnp.where((out_keys != big) & (out_keys < lut_total),
                             out_keys, lut_total)
            lut = lut.at[dest].set(jnp.arange(capacity, dtype=jnp.int32))
            okq = (key != big) & (key < lut_total)
            inv = jnp.where(okq, lut[jnp.where(okq, key, 0)], capacity)
        else:
            inv = jnp.searchsorted(out_keys, key).astype(jnp.int32)
            hit = out_keys[jnp.minimum(inv, capacity - 1)] == key
            inv = jnp.where(hit & (key != big) & (inv < capacity), inv,
                            capacity)
        return out_coords, out_valid, inv, count
    order = canonical_order(coords, valid, stride, extent)
    sc = coords[order]
    sv = valid[order]
    prev_eq = jnp.concatenate(
        [jnp.zeros((1,), bool), jnp.all(sc[1:] == sc[:-1], axis=-1) & sv[1:] & sv[:-1]]
    )
    first = sv & ~prev_eq
    uid = jnp.cumsum(first.astype(jnp.int32)) - 1
    uid = jnp.where(sv, jnp.minimum(uid, capacity), capacity)
    count = jnp.sum(first.astype(jnp.int32))

    out = jnp.full((capacity + 1, nf), INVALID_COORD, dtype=jnp.int32)
    out = out.at[jnp.where(first, uid, capacity)].set(sc)
    out_coords = out[:capacity]
    out_valid = jnp.arange(capacity, dtype=jnp.int32) < jnp.minimum(count, capacity)

    inverse = jnp.zeros((n,), dtype=jnp.int32).at[order].set(uid)
    return out_coords, out_valid, inverse, count


def make_grid(
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    capacity: int | None = None,
    stride=1,
    batch_size: int = 1,
    extent: Sequence[int] | None = None,
):
    """Dedup + canonicalize raw batched coords into a SparseGrid.

    Returns ``(grid, inverse, count)``; ``inverse`` maps each input row to its
    unique row (== the reference's inverse_map used by all quantization modes).
    """
    d = coords.shape[1] - 1
    capacity = capacity or coords.shape[0]
    uc, uv, inverse, count = unique_coords(coords, valid, capacity, stride,
                                           extent=extent,
                                           batch_size=batch_size)
    grid = SparseGrid(
        coords=uc, valid=uv, stride=_tuplize(stride, d), batch_size=batch_size,
        extent=None if extent is None else tuple(int(e) for e in extent),
    )
    return grid, inverse, count


def stride_grid(grid: SparseGrid, stride, capacity: int | None = None) -> SparseGrid:
    """Coarsen to tensor-stride ``grid.stride * stride`` (the manager's
    ``stride`` op, `MinkowskiCoordinateManager.py:254-268`).

    Output coordinates are floor-rounded onto the coarser lattice (floor, not
    trunc: correct octree semantics for negative coordinates too).
    """
    d = grid.ndim
    s = np.array(_tuplize(stride, d), dtype=np.int32)
    new_stride = tuple(int(a * b) for a, b in zip(grid.stride, s))
    ns = jnp.asarray(np.array(new_stride, dtype=np.int32))
    down = jnp.concatenate(
        [
            grid.coords[:, :1],
            jnp.floor_divide(grid.coords[:, 1:], ns) * ns,
        ],
        axis=-1,
    )
    down = jnp.where(grid.valid[:, None], down, INVALID_COORD)
    cap = capacity or grid.capacity
    uc, uv, _, _ = unique_coords(down, grid.valid, cap, new_stride,
                                 extent=grid.extent, with_inverse=False)
    return SparseGrid(coords=uc, valid=uv, stride=new_stride,
                      batch_size=grid.batch_size, extent=grid.extent)


def expand_grid(
    grid: SparseGrid,
    offsets: np.ndarray,
    out_stride: Sequence[int],
    capacity: int,
) -> SparseGrid:
    """Generative expansion: unique union of ``coords + offset`` for every
    kernel offset — the coordinate-growth half of
    MinkowskiGenerativeConvolutionTranspose (`MinkowskiConvolution.py:547-642`)
    and of conv with ``expand_coordinates=True``.

    ``offsets`` are absolute (already scaled to lattice units), shape [K, D].
    """
    k, d = offsets.shape
    off = jnp.asarray(offsets.astype(np.int32))
    spatial = grid.coords[:, None, 1:] + off[None, :, :]  # [N, K, D]
    batch = jnp.broadcast_to(grid.coords[:, None, :1], (grid.capacity, k, 1))
    cand = jnp.concatenate([batch, spatial], axis=-1).reshape(-1, 1 + d)
    cand_valid = jnp.repeat(grid.valid, k)
    cand = jnp.where(cand_valid[:, None], cand, INVALID_COORD)
    keep_extent_early = grid.extent is not None and offsets.min() >= 0 and all(
        offsets[:, i].max() <= gs - os
        for i, (gs, os) in enumerate(zip(grid.stride, out_stride)))
    uc, uv, _, _ = unique_coords(
        cand, cand_valid, capacity, tuple(out_stride),
        extent=grid.extent if keep_extent_early else None,
        with_inverse=False)
    # children stay inside [0, extent) iff offsets are non-negative and do
    # not reach past the parent cell (true for the k2-s2 octree growth)
    keep_extent = grid.extent is not None and offsets.min() >= 0 and all(
        offsets[:, i].max() <= gs - os
        for i, (gs, os) in enumerate(zip(grid.stride, out_stride)))
    return SparseGrid(
        coords=uc, valid=uv, stride=tuple(int(s) for s in out_stride),
        batch_size=grid.batch_size,
        extent=grid.extent if keep_extent else None,
    )


def origin_grid(grid: SparseGrid) -> SparseGrid:
    """Per-batch origin coordinates (one row per batch instance) — the
    manager's ``origin_map`` (`MinkowskiCoordinateManager.py:423`), which
    backs global pooling / broadcast."""
    b = grid.batch_size
    d = grid.ndim
    coords = jnp.concatenate(
        [
            jnp.arange(b, dtype=jnp.int32)[:, None],
            jnp.zeros((b, d), dtype=jnp.int32),
        ],
        axis=-1,
    )
    return SparseGrid(
        coords=coords,
        valid=jnp.ones((b,), bool),
        stride=grid.stride,
        batch_size=b,
    )


# ---------------------------------------------------------------------------
# Host-side collation helpers (the reference's utils/collation.py equivalents)
# ---------------------------------------------------------------------------


def batched_coordinates_np(coord_list, dtype=np.int32) -> np.ndarray:
    """Prepend the batch index column (reference `utils/collation.py:30-92`)."""
    rows = []
    for b, c in enumerate(coord_list):
        c = np.asarray(c)
        bc = np.concatenate(
            [np.full((len(c), 1), b, dtype=dtype), np.floor(c).astype(dtype)], axis=1
        )
        rows.append(bc)
    return np.concatenate(rows, axis=0)


def sparse_quantize_np(coords: np.ndarray, quantization_size=1.0, return_index=False,
                       return_inverse=False):
    """Host-side voxelization (reference `utils/quantization.py:136-332`):
    floor-divide continuous coordinates by the quantization size and dedup,
    keeping the first occurrence of each voxel."""
    q = np.floor(np.asarray(coords, dtype=np.float64) / quantization_size).astype(
        np.int32
    )
    _, index, inverse = np.unique(
        q, axis=0, return_index=True, return_inverse=True
    )
    out = (q[np.sort(index)],)
    if return_index or return_inverse:
        # report indices in first-occurrence order to mirror the reference
        order = np.argsort(index)
        rank = np.empty_like(order)
        rank[order] = np.arange(len(order))
        if return_index:
            out = out + (np.sort(index),)
        if return_inverse:
            out = out + (rank[inverse],)
    return out[0] if len(out) == 1 else out


def pad_to_capacity(coords: np.ndarray, capacity: int):
    """Pad/truncate host coords to the static capacity; returns (coords, valid)."""
    n = min(len(coords), capacity)
    out = np.full((capacity, coords.shape[1]), INVALID_COORD, dtype=np.int32)
    out[:n] = coords[:n]
    valid = np.zeros((capacity,), dtype=bool)
    valid[:n] = True
    return out, valid
