"""Sorted-order coordinate lookup: static binary search, no while loops.

The TPU-native fast path for coordinate queries (kernel maps, membership
tests, slicing).  Every SparseGrid is canonically sorted by
(batch, morton, coord-lex) — see `ops.coords.canonical_order` — so a lookup
is a branch-free binary search over the (batch, morton) key pair:
``ceil(log2(N_cap))`` fully-vectorized compare/gather steps, which XLA
schedules as a handful of fused gathers.  This replaces open-addressing hash
probing (`ops.hashtable`, kept as an alternative) whose `lax.while_loop`
carries a sequential dependence of *data-dependent* length — hostile to both
the XLA scheduler and compile time when instantiated hundreds of times in a
UNet.  Reference parity: the native coordinate hash maps
(`pybind/extern.hpp:27-39`).

Domain note: the morton key clips stride-normalized coordinates to
±2^(30/D−1) (±512 per axis for D=3 — covers every reference config, whose
resolutions are ≤256: `examples/ae_res.py:956-973`).  Clipped coordinates
fall into duplicate-key runs; lookups scan a fixed window over the run and
may miss matches beyond it, so out-of-domain coordinates should not be used
as grid rows.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .morton import morton_encode

_INT32_MAX = np.iinfo(np.int32).max
_DUP_WINDOW = 4


def _keys(coords: jnp.ndarray, valid: jnp.ndarray, stride) -> tuple:
    """(batch, morton) sort-key pair; padding rows → (+inf, +inf)."""
    m = morton_encode(coords[:, 1:], jnp.asarray(np.asarray(stride, np.int32)))
    b = jnp.where(valid, coords[:, 0], _INT32_MAX)
    m = jnp.where(valid, m, _INT32_MAX)
    return b, m


def lookup_sorted(
    grid_coords: jnp.ndarray,  # int32[N, 1+D], canonically sorted
    grid_valid: jnp.ndarray,  # bool[N]
    stride,
    queries: jnp.ndarray,  # int32[M, 1+D]
    queries_valid: jnp.ndarray | None = None,  # bool[M]
    extent=None,
) -> jnp.ndarray:
    """Row index of each query in the grid; -1 where absent/invalid.

    ``extent`` must match the value the grid was built with: bounded grids
    are sorted by the flat row-major cell key (one int32 compare per
    bisection step, no morton), unbounded by the (batch, morton) pair."""
    n = grid_coords.shape[0]
    mq = queries.shape[0]
    qv = queries_valid if queries_valid is not None else jnp.ones((mq,), bool)
    from .coords import _flat_bound, _tuplize, flat_cell_key

    d = grid_coords.shape[1] - 1
    st = _tuplize(stride, d)
    if _flat_bound(extent, st, d) is not None:
        gb = flat_cell_key(grid_coords, grid_valid, st, extent)
        gm = jnp.zeros_like(gb)
        qb = flat_cell_key(queries, qv, st, extent)
        qm = jnp.zeros_like(qb)
    else:
        gb, gm = _keys(grid_coords, grid_valid, stride)
        qb, qm = _keys(queries, qv, stride)

    # lower_bound((qb, qm)) via branch-free bisection — static step count
    lo = jnp.zeros((mq,), jnp.int32)
    hi = jnp.full((mq,), n, jnp.int32)
    steps = int(np.ceil(np.log2(max(n, 2)))) + 1
    for _ in range(steps):
        active = lo < hi
        mid = (lo + hi) >> 1
        mb = gb[mid]
        mm = gm[mid]
        less = (mb < qb) | ((mb == qb) & (mm < qm))
        lo = jnp.where(active & less, mid + 1, lo)
        hi = jnp.where(active & ~less, mid, hi)

    # scan the (clip-induced) duplicate-key window for the exact coord match
    found = jnp.full((mq,), -1, jnp.int32)
    for off in range(_DUP_WINDOW):
        idx = jnp.minimum(lo + off, n - 1)
        ok = (lo + off < n) & grid_valid[idx]
        match = ok & jnp.all(grid_coords[idx] == queries, axis=-1)
        found = jnp.where((found < 0) & match, idx, found)
    found = jnp.where(qv, found, -1)
    return jax.lax.stop_gradient(found)
