"""Measure per-level octree occupancy for a workload and derive a
capacity schedule (ROADMAP item 3 / VERDICT r2 item 7).

Host-side numpy: voxelize the workload's clouds, count unique cells at each
encoder stride, and size every buffer from MEASURED counts instead of the
`examples/train_vae.py capacities()` rule of thumb:

  encoder level s:   1.25 x sum_b |unique(vox_b // s)|
  decoder level l:   the post-growth CANDIDATE set is exactly 8 x the kept
                     set of the previous level (generative k2s2 growth);
                     training force-keeps the target, so kept ~= the
                     previous level's target count -> dec[l] = 8 x 1.1 x
                     N_{prev stride}
all rounded up to 1024.

Usage:
    python scripts/measure_occupancy.py --resolution 128 --batch 4 \
        --points 250000            # shell fixture (bench workload)
    python scripts/measure_occupancy.py --procedural ...  # dataset stats
"""

import argparse
import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from bench_vae_step_common import shell_cloud  # noqa: E402


def up1024(n):
    return int(-(-int(n) // 1024) * 1024)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=128)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--points", type=int, default=250000)
    ap.add_argument("--procedural", action="store_true",
                    help="use ProceduralShapes instead of the shell fixture")
    ap.add_argument("--samples", type=int, default=16,
                    help="clouds to average over")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    counts = {1: [], 2: [], 4: [], 8: []}
    for i in range(args.samples):
        if args.procedural:
            from mink_octtree_stablediffusion_tpu.data import ProceduralShapes

            ds = ProceduralShapes(resolution=args.resolution,
                                  num_samples=args.samples,
                                  points_per_shape=args.points)
            vox = ds[i]["coords"]
        else:
            vox = shell_cloud(rng, args.points, args.resolution)
        for s in counts:
            counts[s].append(len(np.unique(vox // s, axis=0)))

    b = args.batch
    n = {s: float(np.mean(v)) for s, v in counts.items()}
    print(f"mean voxels/shape by stride: " +
          ", ".join(f"s{s}={n[s]:.0f}" for s in sorted(n)), flush=True)
    n1, n2, n4, n8 = (b * n[s] for s in (1, 2, 4, 8))
    enc = tuple(up1024(1.25 * x) for x in (n2, n4, n8, n8, n8))
    dec = (up1024(1.25 * n8), up1024(8 * 1.1 * n8), up1024(8 * 1.1 * n4),
           up1024(8 * 1.1 * n2))
    input_cap = up1024(1.25 * n1)
    print(f"measured schedule (batch {b}):")
    print(f"  input_capacity {input_cap}")
    print(f"  encoder_capacities {enc}")
    print(f"  decoder_capacities {dec}")
    print("  --caps " + " ".join(map(str, enc + dec)))


if __name__ == "__main__":
    main()
