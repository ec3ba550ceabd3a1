"""Chain-slope stage breakdown of the bench.py pipeline on TPU.

Times cumulative stages: geometry -> +reduce -> +conv(XLA) -> +conv(onehot),
isolating where the per-step milliseconds actually go.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import mink_octtree_stablediffusion_tpu as mt  # noqa: E402
from mink_octtree_stablediffusion_tpu.ops.onehot_conv import (  # noqa: E402
    fused_sparse_conv, onehot_sparse_conv)

N_POINTS = 26098
CAPACITY = 32768
CIN, COUT = 3, 32
EXTENT = (160, 160, 60)
TILE = int(sys.argv[1]) if len(sys.argv) > 1 else 256
TW = int(sys.argv[2]) if len(sys.argv) > 2 else 512


def scannet_like_cloud(rng, n):
    n_floor, n_wall, n_clutter = n // 3, n // 3, n - 2 * (n // 3)
    floor = np.stack([rng.randint(0, 160, n_floor),
                      rng.randint(0, 160, n_floor),
                      rng.randint(0, 3, n_floor)], 1)
    wall = np.stack([rng.randint(0, 3, n_wall),
                     rng.randint(0, 160, n_wall),
                     rng.randint(0, 60, n_wall)], 1)
    blob = rng.randn(n_clutter, 3) * 12 + np.array([80, 80, 20])
    clutter = np.clip(blob, 0, [159, 159, 59]).astype(np.int64)
    return np.concatenate([floor, wall, clutter]).astype(np.int32)


rng = np.random.RandomState(0)
cloud = scannet_like_cloud(rng, N_POINTS)
coords = np.concatenate([np.zeros((N_POINTS, 1), np.int32), cloud], 1)
cpad, valid = mt.ops.pad_to_capacity(coords, CAPACITY)
kernel = (rng.randn(27, CIN, COUT) * 0.1).astype(np.float32)
spec = mt.ops.KernelSpec(3, 1, 1, ndim=3)
cpj, vj, kj = map(jnp.asarray, (cpad, valid, kernel))


def stage_fn(mode):
    def f(carry, f_i, kernel):
        grid, inverse, _ = mt.ops.make_grid(carry, vj, CAPACITY,
                                            batch_size=1, extent=EXTENT)
        if mode == "geom":
            nbr = mt.ops.kernel_map(grid, grid, spec)
            return jnp.sum(nbr) * 1e-30
        f = mt.ops.reduce_by_inverse(f_i, inverse, vj, CAPACITY, "sum")
        if mode == "reduce":
            return jnp.sum(f)
        nbr = mt.ops.kernel_map(grid, grid, spec)
        if mode == "conv_xla":
            return jnp.sum(mt.ops.sparse_conv_apply(f, kernel, nbr))
        if mode == "conv_onehot":
            return jnp.sum(onehot_sparse_conv(f, kernel, nbr, tile=TILE,
                                              tw=TW))
        raise ValueError(mode)

    def f_fused(carry, f_i, kernel):
        grid, inverse, _ = mt.ops.make_grid(carry, vj, CAPACITY,
                                            batch_size=1, extent=EXTENT)
        f = mt.ops.reduce_by_inverse(f_i, inverse, vj, CAPACITY, "sum")
        return jnp.sum(fused_sparse_conv(f, kernel, grid, grid, spec,
                                         tile=TILE, tw=TW))

    return f_fused if mode == "conv_fused" else f


def timed(mode, steps, trials=3):
    body_fn = stage_fn(mode)

    @jax.jit
    def run(cpad, feats, kernel):
        def body(carry, f_i):
            s = body_fn(carry, f_i, kernel)
            return carry + (s * 1e-30).astype(jnp.int32), s
        _, sums = jax.lax.scan(body, cpad, feats)
        return jnp.sum(sums)

    def mk():
        return jnp.asarray((rng.randn(steps, CAPACITY, CIN) *
                            valid[None, :, None]).astype(np.float32))
    fs = mk()
    float(jnp.sum(fs))
    float(run(cpj, fs, kj))
    best = float("inf")
    for _ in range(trials):
        fs2 = mk()
        float(jnp.sum(fs2))
        t0 = time.perf_counter()
        float(run(cpj, fs2, kj))
        best = min(best, time.perf_counter() - t0)
    return best


def slope(mode, s0=4, s1=24):
    return (timed(mode, s1) - timed(mode, s0)) / (s1 - s0)


import os  # noqa: E402

modes = (sys.argv[3].split(",") if len(sys.argv) > 3 else
         ["geom", "reduce", "conv_xla", "conv_onehot", "conv_fused"])
for mode in modes:
    print(f"{mode:12s} {slope(mode) * 1e3:8.3f} ms/step")
