"""Row reductions along inverse maps (the reference's COO SpMM uses).

TPU-native replacement for `coo_spmm` / `coo_spmm_average`
(`pybind/extern.hpp:495-506`, `sparse_matrix_functions.py`): the reference
drives its quantization reductions (UNWEIGHTED_SUM/AVERAGE), splat and slice
through sparse matrix products; on TPU these are masked segment scatter-adds
over the inverse map produced by dedup.
"""

from __future__ import annotations

import jax.numpy as jnp


def reduce_by_inverse(
    features: jnp.ndarray,  # [N, C]
    inverse: jnp.ndarray,  # int32[N] target unique row; == capacity → dropped
    valid: jnp.ndarray,  # bool[N]
    capacity: int,
    mode: str = "avg",
) -> jnp.ndarray:
    """Reduce input rows onto their unique row → [capacity, C]."""
    dest = jnp.where(valid, inverse, capacity)
    f = features * valid[:, None].astype(features.dtype)
    if mode in ("sum", "avg"):
        acc = jnp.zeros((capacity + 1, features.shape[1]), features.dtype)
        acc = acc.at[dest].add(f)
        if mode == "avg":
            cnt = jnp.zeros((capacity + 1,), features.dtype).at[dest].add(
                valid.astype(features.dtype)
            )
            acc = acc / jnp.maximum(cnt, 1.0)[:, None]
        return acc[:capacity]
    if mode == "max":
        acc = jnp.full((capacity + 1, features.shape[1]), -jnp.inf, features.dtype)
        acc = acc.at[dest].max(jnp.where(valid[:, None], features, -jnp.inf))
        return jnp.where(jnp.isfinite(acc[:capacity]), acc[:capacity], 0.0)
    if mode == "first":
        # deterministic "random subsample": the first (canonical-order) source
        # row wins — reference RANDOM_SUBSAMPLE picks an arbitrary row.
        n = features.shape[0]
        rows = jnp.arange(n, dtype=jnp.int32)
        winner = jnp.full((capacity + 1,), n, jnp.int32).at[dest].min(
            jnp.where(valid, rows, n)
        )
        safe = jnp.minimum(winner[:capacity], n - 1)
        took = winner[:capacity] < n
        return features[safe] * took[:, None].astype(features.dtype)
    raise ValueError(mode)


def slice_by_inverse(
    unique_features: jnp.ndarray,  # [capacity, C]
    inverse: jnp.ndarray,  # int32[N]
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Gather unique-row features back to every source row (the reference's
    SparseTensor.slice, `MinkowskiSparseTensor.py:577-632`)."""
    cap = unique_features.shape[0]
    safe = jnp.clip(inverse, 0, cap - 1)
    ok = valid & (inverse < cap)
    return unique_features[safe] * ok[:, None].astype(unique_features.dtype)


def coo_spmm(rows: jnp.ndarray, cols: jnp.ndarray, vals: jnp.ndarray,
             num_rows: int, dense: jnp.ndarray,
             average: bool = False) -> jnp.ndarray:
    """COO sparse @ dense (reference `coo_spmm` / `coo_spmm_average`,
    `pybind/extern.hpp:495-506`, `sparse_matrix_functions.py:32-121`):
    out[r] += vals * dense[c]; negative row indices are dropped.  With
    ``average`` the rows are normalized by their nonzero count — the
    UNWEIGHTED_AVERAGE quantization path."""
    ok = rows >= 0
    dest = jnp.where(ok, rows, num_rows)
    contrib = dense[jnp.where(ok, cols, 0)] * \
        (vals * ok.astype(vals.dtype))[:, None]
    out = jnp.zeros((num_rows + 1, dense.shape[1]), dense.dtype)
    out = out.at[dest].add(contrib)
    if average:
        cnt = jnp.zeros((num_rows + 1,), vals.dtype).at[dest].add(
            ok.astype(vals.dtype))
        out = out / jnp.maximum(cnt, 1.0)[:, None]
    return out[:num_rows]
