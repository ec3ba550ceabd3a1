"""Chain-slope micro-benchmark: XLA gather conv vs Pallas one-hot conv.

Same workload + timing protocol as bench.py (distinct per-step features,
loop-carried dependence, slope between short/long chains cancels tunnel
latency).  Geometry (grid + kernel map) is built once outside the chain so
the measurement isolates the conv itself.

Usage: python scripts/bench_gather.py [cin] [cout] [tile] [tw]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import mink_octtree_stablediffusion_tpu as mt  # noqa: E402
from mink_octtree_stablediffusion_tpu.ops.onehot_conv import (  # noqa: E402
    onehot_sparse_conv)

N_POINTS = 26098
CAPACITY = 32768
CIN = int(sys.argv[1]) if len(sys.argv) > 1 else 3
COUT = int(sys.argv[2]) if len(sys.argv) > 2 else 32
TILE = int(sys.argv[3]) if len(sys.argv) > 3 else 256
TW = int(sys.argv[4]) if len(sys.argv) > 4 else 512
EXTENT = (160, 160, 60)


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


def main():
    rng = np.random.RandomState(0)
    cloud = scannet_like_cloud(rng, N_POINTS)
    coords = np.concatenate([np.zeros((N_POINTS, 1), np.int32), cloud], 1)
    cpad, valid = mt.ops.pad_to_capacity(coords, CAPACITY)
    kernel = (rng.randn(27, CIN, COUT) * 0.1).astype(np.float32)
    spec = mt.ops.KernelSpec(3, 1, 1, ndim=3)
    cpj, vj, kj = map(jnp.asarray, (cpad, valid, kernel))

    @jax.jit
    def geom(cpad, valid):
        grid, inverse, _ = mt.ops.make_grid(cpad, valid, CAPACITY,
                                            batch_size=1, extent=EXTENT)
        return grid, mt.ops.kernel_map(grid, grid, spec)

    grid, nbr = geom(cpj, vj)
    nbr_np = np.asarray(nbr)
    # window stats: chunks needed per (tile, offset)
    idx_t = nbr_np.T
    npad = -(-idx_t.shape[0] // TILE) * TILE
    idx_t = np.pad(idx_t, ((0, npad - idx_t.shape[0]), (0, 0)),
                   constant_values=-1)
    it = idx_t.reshape(-1, TILE, 27)
    v = it >= 0
    lo = np.where(v, it, 2 ** 30).min(1)
    hi = np.where(v, it, -1).max(1)
    nch = np.where(v.any(1), (hi - lo) // TW + 1, 0)
    print(f"window chunks: mean {nch.mean():.2f} max {nch.max()} "
          f"(>{1}: {(nch > 1).mean() * 100:.1f}%)", file=sys.stderr)

    def chain(conv_fn, steps):
        @jax.jit
        def run(nbr, feats, kernel):
            def body(carry, f_i):
                out = conv_fn(f_i + carry * 1e-30, kernel, nbr)
                s = jnp.sum(out)
                return (s * 1e-30).astype(jnp.float32), s
            _, sums = jax.lax.scan(body, jnp.float32(0), feats)
            return jnp.sum(sums)
        return run

    def timed(conv_fn, steps, trials=3):
        run = chain(conv_fn, steps)
        def mk():
            return jnp.asarray((rng.randn(steps, CAPACITY, CIN) *
                                valid[None, :, None]).astype(np.float32))
        fs = mk()
        float(jnp.sum(fs))
        float(run(nbr, fs, kj))
        best = float("inf")
        for _ in range(trials):
            fs2 = mk()
            float(jnp.sum(fs2))
            t0 = time.perf_counter()
            float(run(nbr, fs2, kj))
            best = min(best, time.perf_counter() - t0)
        return best

    def slope(conv_fn, s0=4, s1=24):
        t0, t1 = timed(conv_fn, s0), timed(conv_fn, s1)
        return (t1 - t0) / (s1 - s0)

    # correctness on-device first
    feats = jnp.asarray((rng.randn(CAPACITY, CIN) *
                         valid[:, None]).astype(np.float32))
    ref = np.asarray(jax.jit(mt.ops.sparse_conv_apply)(feats, kj, nbr))
    out = np.asarray(onehot_sparse_conv(feats, kj, nbr, tile=TILE, tw=TW))
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"max rel err vs XLA path: {err:.2e}", file=sys.stderr)

    xla_t = slope(lambda f, k, n: mt.ops.sparse_conv_apply(f, k, n))
    oh_t = slope(lambda f, k, n: onehot_sparse_conv(f, k, n, tile=TILE,
                                                    tw=TW))
    print(f"cin={CIN} cout={COUT} tile={TILE} tw={TW}: "
          f"xla {xla_t * 1e3:.3f} ms  onehot {oh_t * 1e3:.3f} ms  "
          f"speedup {xla_t / oh_t:.2f}x")


if __name__ == "__main__":
    main()
