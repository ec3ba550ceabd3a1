"""Pallas fused gather-GEMM sparse convolution (experimental).

A hand-scheduled alternative to the XLA gather + GEMM path of
`ops.conv.sparse_conv_apply`: per output tile, the kernel gathers the K
neighborhoods of TM rows from VMEM-resident features and accumulates the
K matmuls against W_k in a VMEM accumulator — the gathered ``[TM, K·Cin]``
buffer never round-trips HBM.  This targets the case XLA handles worst:
large K·Cin where the materialized gather dominates HBM traffic.

Status: validated in interpreter mode (tests/test_pallas.py); real-TPU
lowering depends on Mosaic's dynamic-gather support for row indexing —
off by default (`use_pallas_conv(True)` to enable), with automatic fallback
to the XLA path on lowering failure.  See docs/DESIGN.md §7.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_ENABLED = False


def use_pallas_conv(flag: bool) -> None:
    global _ENABLED
    _ENABLED = flag


def enabled() -> bool:
    return _ENABLED


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def pallas_sparse_conv(
    features: jnp.ndarray,  # [N, Cin]
    kernel: jnp.ndarray,  # [K, Cin, Cout]
    nbr_idx: jnp.ndarray,  # int32[K, N_out]
    tile: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, cin = features.shape
    k, n_out = nbr_idx.shape
    cout = kernel.shape[2]
    assert n_out % tile == 0, "pad N_out to a multiple of the tile size"
    idx_t = nbr_idx.T.astype(jnp.int32)  # [N_out, K]

    cin_ = cin  # noqa: F841

    def kern(idx_ref, f_ref, w_ref, out_ref):
        # idx_ref: [tile, K] (this tile's neighbor rows)
        # f_ref:   [N, Cin] (full features, VMEM)
        # w_ref:   [K, Cin, Cout]
        acc = jnp.zeros((tile, cout), jnp.float32)

        def body(kk, acc):
            idx = idx_ref[:, kk]
            m = (idx >= 0)
            safe = jnp.where(m, idx, 0)
            g = jnp.take_along_axis(
                f_ref[:], jnp.broadcast_to(safe[:, None], (tile, cin)),
                axis=0)
            g = g * m[:, None].astype(g.dtype)
            return acc + jax.lax.dot_general(
                g, w_ref[kk],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        acc = jax.lax.fori_loop(0, k, body, acc)
        out_ref[:] = acc.astype(out_ref.dtype)

    grid = (n_out // tile,)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_out, cout), features.dtype),
        interpret=interpret,
    )(idx_t, features, kernel)
