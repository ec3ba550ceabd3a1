"""One-process A/B sweep of fused-conv band size (GROUP) / window (TW).

The per-band window layout processes `group` kernel offsets per DMA window
(`ops/onehot_conv.py::_offset_perm`).  The one-hot gather FLOPs scale with
`n_chunks * TW * group * tile * cinp` while the DMA traffic is roughly
constant across group sizes that tile the kernel's leading-axis rows, so a
smaller band (group=3: offsets sharing BOTH leading displacements) should
trade ~3x fewer MXU FLOPs for more (but narrower) windows on a k3 cube.
This sweeps the decoder's hot shapes x (group, tw) in one process (one TPU
client, shared compile cache) and prints a table.

Usage:  python scripts/ab_band.py [quick]
"""

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from bench_conv_bwd import bench  # noqa: E402

SHAPES = [(90000, 131072, 32, 32, 4),   # finest level (dominant)
          (24000, 32768, 128, 128, 4),
          (6000, 8192, 512, 512, 4)]
CONFIGS = [  # (tile, tw, group)
    (128, 256, 0),   # current default (group=volume//ks0 = 9 for k3)
    (128, 256, 3),
    (128, 512, 3),
    (256, 384, 3),
    (128, 256, 1),
]


def main():
    from mink_octtree_stablediffusion_tpu.ops import onehot_conv as oh

    os.environ["SKIP_DENSE"] = "1"
    shapes = SHAPES[:1] if "quick" in sys.argv[1:] else SHAPES
    rings = ((False,) if "noring" in sys.argv[1:]
             else (True,) if "ring" in sys.argv[1:] else (False, True))
    for n, cap, cin, cout, b in shapes:
        print(f"=== n={n} cap={cap} {cin}->{cout} b={b} ===", flush=True)
        for ring in rings:
            oh.use_spill_ring(ring)
            for tile, tw, group in CONFIGS:
                os.environ["TILE"] = str(tile)
                os.environ["TW"] = str(tw)
                os.environ["GROUP"] = str(group)
                r = bench(n, cap, cin, cout, b)
                tag = (f"ring={int(ring)} tile={tile} tw={tw} "
                       f"group={group or 'auto'}")
                print(f"  {tag}: " + "  ".join(
                    f"{m}={v:.2f}ms" for m, v in r.items()), flush=True)


if __name__ == "__main__":
    main()
