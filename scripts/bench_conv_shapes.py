"""Fused one-hot sparse-conv MFU at REAL layer widths (VERDICT r3 item 5).

The headline bench (`bench.py`) times the reference's own workload —
Cin=3 → 32, which is gather/bandwidth-bound by construction.  This script
times the same fused Pallas conv at the widths the VAE/UNet actually run
(C=128/256/512) on the procedural res-128 workload's per-stride grids, and
reports achieved TFLOP/s and the fraction of the v5e bf16 peak (197
TFLOP/s), with the algorithmic FLOPs counted EXACTLY from the host-side
neighbor-pair count (pairs * 2 * Cin * Cout — tiling-independent).

Timing protocol: chain-slope inside `lax.scan` (see bench.py) — per-step
time is the slope between short and long chains, cancelling dispatch
latency on the remote tunnel.

Usage:
    python scripts/bench_conv_shapes.py                # all configs
    JAX_PLATFORMS=cpu python scripts/bench_conv_shapes.py --smoke
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import mink_octtree_stablediffusion_tpu as mt  # noqa: E402
from mink_octtree_stablediffusion_tpu.data import ProceduralShapes  # noqa: E402

V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9


def up1024(n):
    return int(-(-int(n) // 1024) * 1024)


def pair_count(uniq: np.ndarray) -> int:
    s = set(map(tuple, uniq))
    pairs = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                pairs += sum((b, x + dx, y + dy, z + dz) in s
                             for (b, x, y, z) in s)
    return pairs


def workload(res: int, batch: int, stride: int, points: int):
    """Batched unique voxel coords of procedural shapes at one octree
    stride — the grid a VAE encoder/decoder level actually convolves."""
    ds = ProceduralShapes(resolution=res, num_samples=batch,
                          points_per_shape=points)
    rows = []
    for i in range(batch):
        vox = np.unique(ds[i]["coords"] // stride, axis=0)
        rows.append(np.concatenate(
            [np.full((len(vox), 1), i, np.int32), vox.astype(np.int32)], 1))
    return np.concatenate(rows, 0)


def bench_config(coords: np.ndarray, cin: int, cout: int, extent, batch: int,
                 trials: int = 3, s0: int = 4, s1: int = 16,
                 tile_override=None, pairs_cache=None):
    n = len(coords)
    cap = up1024(1.25 * n)
    cpad, valid = mt.ops.pad_to_capacity(coords, cap)
    rng = np.random.RandomState(0)
    kernel = (rng.randn(27, cin, cout) * 0.02).astype(np.float32)
    spec = mt.ops.KernelSpec(3, 1, 1, ndim=3)
    cpj, vj, kj = map(jnp.asarray, (cpad, valid, kernel))

    def chain(steps):
        @jax.jit
        def run(cpad, valid, feats, kernel):
            def body(carry, f_i):
                grid, inverse, _ = mt.ops.make_grid(
                    carry, valid, cap, batch_size=batch, extent=extent)
                f = mt.ops.reduce_by_inverse(f_i, inverse, valid, cap, "sum")
                if mt.ops.onehot_conv.enabled(grid):
                    # wide channels need the default 128/256 tiling (the
                    # 256/512 tiles of the Cin=3 headline exceed the 16MB
                    # VMEM budget at C>=256)
                    tile, tw = (tile_override or
                                ((256, 512) if cin <= 64 else (128, 256)))
                    out = mt.ops.fused_sparse_conv(f, kernel, grid, grid,
                                                   spec, tile=tile, tw=tw)
                else:
                    nbr = mt.ops.kernel_map(grid, grid, spec)
                    out = mt.ops.sparse_conv_apply(f, kernel, nbr)
                s = jnp.sum(out)
                return carry + (s * 1e-30).astype(jnp.int32), s
            _, sums = jax.lax.scan(body, cpad, feats)
            return jnp.sum(sums)
        return run

    def timed(steps):
        run = chain(steps)
        fs = jnp.asarray((rng.randn(steps, cap, cin) *
                          valid[None, :, None]).astype(np.float32))
        float(jnp.sum(fs))
        float(run(cpj, vj, fs, kj))  # compile + warm
        best = float("inf")
        for _ in range(trials):
            fs2 = jnp.asarray((rng.randn(steps, cap, cin) *
                               valid[None, :, None]).astype(np.float32))
            float(jnp.sum(fs2))
            t0 = time.perf_counter()
            float(run(cpj, vj, fs2, kj))
            best = min(best, time.perf_counter() - t0)
        return best

    per_iter = max((timed(s1) - timed(s0)) / (s1 - s0), 1e-9)
    pairs = pairs_cache if pairs_cache is not None else pair_count(coords)
    flops = 2.0 * pairs * cin * cout
    bytes_moved = 4.0 * (pairs * cin + n * cout)
    return {
        "n_voxels": n,
        "capacity": cap,
        "pairs": pairs,
        "sec_per_conv": round(per_iter, 6),
        "points_per_sec": round(n / per_iter, 1),
        "achieved_tflops": round(flops / per_iter / 1e12, 3),
        # MXU GEMMs run in bf16 inside the Pallas kernel (fp32 is only the
        # HBM storage dtype) — bf16 peak is the right denominator
        "compute_dtype": "bfloat16",
        "mfu_bf16_peak": round(flops / per_iter / V5E_PEAK_BF16_FLOPS, 5),
        "hbm_gbps_algorithmic": round(bytes_moved / per_iter / 1e9, 2),
        "hbm_frac_peak": round(bytes_moved / per_iter /
                               V5E_HBM_BYTES_PER_S, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU config for CI")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--resolution", type=int, default=128)
    ap.add_argument("--points", type=int, default=131072)
    ap.add_argument("--only", type=str, default=None,
                    help="run just the named config (e.g. s4_C512)")
    ap.add_argument("--tile_sweep", action="store_true",
                    help="sweep Pallas (tile, tw) pairs for each config")
    args = ap.parse_args()

    if args.smoke:
        configs = [("s8_C32", 8, 32, 32)]
        args.resolution, args.points, args.batch = 32, 2048, 2
    else:
        # the VAE encoder/decoder level widths (channels 32,128,512) and
        # the reference UNet's mid widths on their matching grids
        configs = [
            ("s1_C32", 1, 32, 32),
            ("s2_C128", 2, 128, 128),
            ("s4_C256", 4, 256, 256),
            ("s4_C512", 4, 512, 512),
            ("s8_C512", 8, 512, 512),
        ]

    for name, stride, cin, cout in configs:
        if args.only and name != args.only:
            continue
        coords = workload(args.resolution, args.batch, stride, args.points)
        ext = tuple([-(-args.resolution // stride)] * 3)
        sweeps = ([None] if not args.tile_sweep else
                  [None, (64, 256), (128, 128), (128, 512), (256, 256),
                   (64, 512)])
        pairs = pair_count(coords)
        for tt in sweeps:
            r = bench_config(coords, cin, cout, ext, args.batch,
                             tile_override=tt, pairs_cache=pairs)
            r.update({"config": name, "cin": cin, "cout": cout,
                      "stride": stride,
                      "tile": "default" if tt is None else list(tt)})
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
