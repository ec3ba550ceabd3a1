"""Indoor semantic segmentation — the reference's `examples/indoor.py`
(ScanNet room inference with MinkUNet34C) TPU-native.  Without ScanNet data
in-tree, `--synthetic` builds room-like scenes (floor/wall/furniture classes)
and trains/evaluates per-voxel cross-entropy end-to-end.

Run:
    python examples/segmentation_indoor.py --synthetic --steps 3
"""

import argparse
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# persistent compile cache + JAX_PLATFORMS re-apply (the sitecustomize pins
# the platform, so the env var alone is ignored)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import os as _os
if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import optax

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu import models as mm
from mink_octtree_stablediffusion_tpu import train as mtrain


def make_room(rng, res=32, n=2048):
    """floor(0) / wall(1) / furniture(2) voxels with color-ish features."""
    n3 = n // 3
    floor = np.stack([rng.randint(0, res, n3), rng.randint(0, res, n3),
                      np.zeros(n3, np.int64)], 1)
    wall = np.stack([np.zeros(n3, np.int64), rng.randint(0, res, n3),
                     rng.randint(0, res, n3)], 1)
    box0 = rng.randint(4, res - 8, 3)
    furn = box0 + rng.randint(0, 6, (n - 2 * n3, 3))
    coords = np.concatenate([floor, wall, furn]).astype(np.int32)
    labels = np.concatenate([np.zeros(n3), np.ones(n3),
                             np.full(n - 2 * n3, 2)]).astype(np.int32)
    feats = (coords / res + rng.randn(n, 3) * 0.01).astype(np.float32)
    return coords, feats, labels


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--voxels_per_room", type=int, default=2048)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--model", default="MinkUNet34C",
                   choices=["MinkUNet14", "MinkUNet18", "MinkUNet34C"])
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("segmentation")
    rng_np = np.random.RandomState(args.seed)

    b = args.batch_size
    cap = b * args.voxels_per_room
    net = getattr(mm, args.model)(out_channels=3, input_capacity=cap)

    def collate():
        rooms = [make_room(rng_np, args.resolution, args.voxels_per_room)
                 for _ in range(b)]
        coords = mt.ops.batched_coordinates_np([r[0] for r in rooms])
        cpad, valid = mt.ops.pad_to_capacity(coords, cap)
        feats = np.zeros((cap, 3), np.float32)
        labels = np.full((cap,), -1, np.int32)
        n = min(len(coords), cap)
        feats[:n] = np.concatenate([r[1] for r in rooms])[:n]
        labels[:n] = np.concatenate([r[2] for r in rooms])[:n]
        return cpad, valid, feats, labels

    cpad, valid, feats, labels = collate()

    def build(cpad, valid, feats, labels):
        """Dedup coords; reduce features AND labels with the same
        first-occurrence rule so rows stay aligned on the output grid."""
        grid, inverse, _ = mt.ops.make_grid(
            cpad, valid, cap, batch_size=b,
            extent=(args.resolution,) * 3)  # bounded: flat-key/fused paths
        f = mt.ops.reduce_by_inverse(feats, inverse, valid, cap, "first")
        l = mt.ops.reduce_by_inverse(
            labels[:, None].astype(jnp.float32), inverse, valid, cap, "first")
        st = mt.SparseTensor(grid=grid, features=f).mask_features()
        grid_labels = jnp.where(grid.valid, l[:, 0].astype(jnp.int32), -1)
        return st, grid_labels

    st0, _ = build(jnp.asarray(cpad), jnp.asarray(valid), jnp.asarray(feats),
                   jnp.asarray(labels))
    rng = jax.random.PRNGKey(args.seed)
    variables = jax.jit(net.init)(rng, st0)
    log.info("params: %s", mt.utils.count_params(variables["params"]))
    tx = optax.adam(args.lr)
    state = mtrain.TrainState.create(variables["params"],
                                     variables.get("batch_stats", {}), tx)

    def loss_fn(params, batch_stats, batch, rng):
        cpad, valid, feats, labels = batch
        st, labels = build(cpad, valid, feats, labels)
        out, upd = net.apply({"params": params, "batch_stats": batch_stats},
                             st, mutable=["batch_stats"])
        mask = out.valid & (labels >= 0)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            out.features, jnp.maximum(labels, 0))
        loss = jnp.sum(jnp.where(mask, ce, 0.0)) / jnp.maximum(
            jnp.sum(mask), 1)
        acc = jnp.sum(jnp.where(
            mask, (jnp.argmax(out.features, -1) == labels), False)) / \
            jnp.maximum(jnp.sum(mask), 1)
        return loss, ({"acc": acc}, upd.get("batch_stats", batch_stats))

    step_fn = mtrain.make_train_step(loss_fn)
    step, t0 = 0, time.time()
    while True:
        cpad, valid, feats, labels = collate()
        rng, sub = jax.random.split(rng)
        state, loss, aux = step_fn(
            state, (jnp.asarray(cpad), jnp.asarray(valid), jnp.asarray(feats),
                    jnp.asarray(labels)), sub)
        step += 1
        if step % 5 == 0 or (args.steps and step >= args.steps):
            log.info("step %d loss %.4f acc %.3f (%.2f s/step)", step,
                     float(loss), float(aux["acc"]), (time.time() - t0) / 5)
            t0 = time.time()
        if args.steps and step >= args.steps:
            log.info("done")
            return


if __name__ == "__main__":
    main()
