"""Headline benchmark: single generalized sparse conv forward, k=3, ~26k pts.

Reproduces the reference's benchmark workload (`docs/benchmark.md:14-37`):
`MinkowskiConvolution(in=3, out=32, kernel_size=3, stride=1)` over an
average ScanNet-room-sized cloud (26,098 points, 5 cm voxels).  The upstream
baseline is 0.093 s forward on a Titan X → 280,619 points/sec; the timed
region includes coordinate hashing + kernel-map build + conv, like the
reference's (which builds its kernel map inside the first forward).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np

import jax

try:  # fall back to CPU if the TPU backend is unreachable (flaky tunnel)
    jax.devices()
except RuntimeError as e:
    print(f"[bench] default backend unavailable ({e}); using CPU",
          file=sys.stderr)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

import mink_octtree_stablediffusion_tpu as mt  # noqa: E402

N_POINTS = 26098  # docs/benchmark.md:28 (MinkowskiEngine avg ScanNet points)
CAPACITY = 32768
BASELINE_PPS = N_POINTS / 0.093  # Titan X fwd k=3 (docs/benchmark.md:35)
CIN, COUT, K = 3, 32, 3


def scannet_like_cloud(rng: np.random.RandomState, n: int) -> np.ndarray:
    """Room-like cloud: mostly 2D surfaces (floor/walls) + clutter, ~5 cm
    voxels over a ~8m x 8m x 3m room → coords in [0,160)x[0,160)x[0,60)."""
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
    feats = np.zeros((CAPACITY, CIN), np.float32)
    feats[valid] = rng.randn(int(valid.sum()), CIN)
    kernel = (rng.randn(K ** 3, CIN, COUT) * 0.1).astype(np.float32)

    spec = mt.ops.KernelSpec(K, 1, 1, ndim=3)

    @jax.jit
    def conv_fwd(cpad, valid, feats, kernel):
        grid, inverse, _ = mt.ops.make_grid(cpad, valid, CAPACITY,
                                            batch_size=1,
                                            extent=(160, 160, 60))
        f = mt.ops.reduce_by_inverse(feats, inverse, valid, CAPACITY, "sum")
        nbr = mt.ops.kernel_map(grid, grid, spec)
        return mt.ops.sparse_conv_apply(f, kernel, nbr)

    args = (jnp.asarray(cpad), jnp.asarray(valid), jnp.asarray(feats),
            jnp.asarray(kernel))
    out = conv_fwd(*args)
    out.block_until_ready()  # compile + warm up

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = conv_fwd(*args)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    pps = N_POINTS / dt
    print(json.dumps({
        "metric": "sparse_conv_fwd_k3_points_per_sec",
        "value": round(pps, 1),
        "unit": "points/sec/chip",
        "vs_baseline": round(pps / BASELINE_PPS, 3),
    }))


if __name__ == "__main__":
    main()
