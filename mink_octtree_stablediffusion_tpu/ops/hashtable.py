"""Pure-XLA open-addressing hash table over batched voxel coordinates.

TPU-native replacement for the reference's native coordinate hash maps
(`pybind/extern.hpp:27-39`: robin_hood CPU map / concurrent GPU map).  The
reference keeps a *stateful* C++ map object per coordinate set and queries it
from every layer; here the table is an immutable pytree of arrays built inside
the traced computation, so whole training steps jit with no host round-trips.

Design:
  * key      — (batch, x1..xD) packed injectively into 64 bits (two uint32 lanes)
  * build    — iterative masked scatter-min rounds (linear probing, first-writer
               -wins resolved deterministically by row index); `lax.while_loop`
               terminates as soon as every valid row owns a slot
  * lookup   — vectorized linear probing; stops at first empty slot (guaranteed
               to exist: table is sized >= 2x capacity)

Everything is integer-valued; gradients never flow through these functions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_INT32_MAX = np.iinfo(np.int32).max


class HashTable(NamedTuple):
    """Immutable coordinate → row-index map (pytree of arrays)."""

    slots: jnp.ndarray  # int32[T]  row index or -1 (empty)
    key_hi: jnp.ndarray  # uint32[N] packed key (high lane) of each table row
    key_lo: jnp.ndarray  # uint32[N] packed key (low lane)

    @property
    def table_size(self) -> int:
        return self.slots.shape[0]


def _field_width(ndim: int) -> int:
    """Bits per packed field; (1 + ndim) fields share 64 bits."""
    return 64 // (1 + ndim)


def pack_keys(coords: jnp.ndarray):
    """Pack [N, 1+D] int32 coords into two uint32 lanes (injective).

    Each field gets ``64 // (1+D)`` bits; spatial coordinates are offset into
    the unsigned range (so D=3 supports coords in [-32768, 32767] and batch
    indices up to 65535 — far beyond the pipelines' resolution<=1024 needs).
    """
    n, nf = coords.shape
    w = _field_width(nf - 1)
    fmask = jnp.uint32((1 << w) - 1) if w < 32 else jnp.uint32(0xFFFFFFFF)
    lo = jnp.zeros((n,), dtype=jnp.uint32)
    hi = jnp.zeros((n,), dtype=jnp.uint32)
    for i in range(nf):
        off = 0 if i == 0 else (1 << (w - 1))
        v = (coords[:, i].astype(jnp.int32) + off).astype(jnp.uint32) & fmask
        p = i * w
        if p < 32:
            lo = lo | (v << p)
            if p + w > 32:
                hi = hi | (v >> (32 - p))
        else:
            hi = hi | (v << (p - 32))
    return hi, lo


def _hash(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """murmur3-style avalanche of the two key lanes -> uint32."""
    h = lo * jnp.uint32(0xCC9E2D51)
    h = (h ^ (h >> 15)) * jnp.uint32(0x1B873593)
    h = h ^ (hi * jnp.uint32(0x9E3779B1))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    return h


def table_size_for(capacity: int) -> int:
    """Power-of-two table size at <=50% load."""
    t = 1
    while t < 2 * capacity:
        t *= 2
    return max(t, 16)


def build_table(coords: jnp.ndarray, valid: jnp.ndarray, table_size: int | None = None) -> HashTable:
    """Insert all valid rows of ``coords`` [N, 1+D] into a fresh table.

    Rows must be unique among valid entries (SparseGrids are always deduped);
    duplicate keys would both get slots and lookups would return the
    first-probed one.
    """
    n = coords.shape[0]
    t = table_size or table_size_for(n)
    assert t & (t - 1) == 0, "table size must be a power of two"
    mask = jnp.uint32(t - 1)

    hi, lo = pack_keys(coords)
    rows = jnp.arange(n, dtype=jnp.int32)
    slot0 = (_hash(hi, lo) & mask).astype(jnp.int32)
    # slot t is a trash slot for masked-out scatters.
    table0 = jnp.full((t + 1,), _INT32_MAX, dtype=jnp.int32)

    def cond(state):
        _, _, remaining, it = state
        return jnp.logical_and(jnp.any(remaining), it < t + n)

    def body(state):
        table, slot, remaining, it = state
        occupant = table[slot]
        attempt = remaining & (occupant == _INT32_MAX)
        dest = jnp.where(attempt, slot, t)
        table = table.at[dest].min(rows)
        won = attempt & (table[slot] == rows)
        remaining = remaining & ~won
        slot = jnp.where(remaining, (slot + 1) & mask.astype(jnp.int32), slot)
        return table, slot, remaining, it + 1

    table, _, _, _ = jax.lax.while_loop(
        cond, body, (table0, slot0, valid, jnp.int32(0))
    )
    slots = jnp.where(table[:t] == _INT32_MAX, -1, table[:t])
    return HashTable(slots=slots, key_hi=hi, key_lo=lo)


def lookup(table: HashTable, coords: jnp.ndarray, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Row indices of ``coords`` [M, 1+D] in the table; -1 where absent."""
    m = coords.shape[0]
    t = table.table_size
    mask = jnp.uint32(t - 1)
    qhi, qlo = pack_keys(coords)
    slot0 = (_hash(qhi, qlo) & mask).astype(jnp.int32)
    active0 = jnp.ones((m,), dtype=bool) if valid is None else valid
    result0 = jnp.full((m,), -1, dtype=jnp.int32)

    def cond(state):
        _, _, active, it = state
        return jnp.logical_and(jnp.any(active), it < t)

    def body(state):
        slot, result, active, it = state
        row = table.slots[slot]
        present = row >= 0
        r = jnp.maximum(row, 0)
        match = present & (table.key_hi[r] == qhi) & (table.key_lo[r] == qlo)
        result = jnp.where(active & match, row, result)
        active = active & present & ~match
        slot = (slot + 1) & mask.astype(jnp.int32)
        return slot, result, active, it + 1

    _, result, _, _ = jax.lax.while_loop(
        cond, body, (slot0, result0, active0, jnp.int32(0))
    )
    return jax.lax.stop_gradient(result)
