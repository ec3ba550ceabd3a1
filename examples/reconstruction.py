"""Class-conditional generative reconstruction — the reference's
`examples/reconstruction.py` demo TPU-native: GenerativeNet grows a full
shape from one seed voxel per instance (class one-hot features) through six
generative-transpose + pruning levels, trained with per-level BCE.

Run (synthetic smoke):
    python examples/reconstruction.py --steps 5 --resolution 64
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
from mink_octtree_stablediffusion_tpu.data import (
    SyntheticShapes, batch_iterator, collate_pointclouds)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--opt", choices=["sgd", "adam"], default="sgd",
                   help="reference uses raw SGD (`:548-625`); adam+clip is "
                        "the faster-converging alternative")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--max_epochs", type=int, default=50)
    p.add_argument("--input_capacity", type=int, default=65536)
    p.add_argument("--num_points", type=int, default=32768,
                   help="surface samples per shape; must cover the voxel "
                        "shell (~10k voxels/shape at res 64) — sparse "
                        "sampling turns each target into a random subset "
                        "and floors the per-level BCE at the subset "
                        "entropy (~0.12 at 4096 pts), killing eval decode")
    p.add_argument("--eval_every", type=int, default=100,
                   help="eval-mode generation IoU vs per-class targets "
                        "every N steps (reference's per-epoch visual check, "
                        "`reconstruction.py:548-625`, made quantitative)")
    p.add_argument("--viz_dir", type=str, default=None)
    return p.parse_args()


def main():
    cfg = parse_args()
    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("reconstruction")
    np_rng = np.random.RandomState(cfg.seed)
    ds = SyntheticShapes(resolution=cfg.resolution, num_samples=256,
                         points_per_shape=cfg.num_points)
    n_classes = len(ds.CLASSES)
    b = cfg.batch_size
    cap = cfg.input_capacity

    # 6 levels of 8x growth from one seed voxel per instance
    level_caps = tuple(min(b * 8 ** (i + 1), cap) for i in range(6))
    net = mm.GenerativeNet(level_capacities=level_caps)
    seed_stride = 2 ** 6

    # bounded extent end-to-end: the seed grid carries it, every grown level
    # inherits it, so conv/membership take the flat-key/LUT/fused fast paths
    # (the r2 classification/segmentation recipe — 3-8x on-chip)
    extent = (max(cfg.resolution, seed_stride),) * 3

    def seed_tensor(labels):
        coords = jnp.concatenate(
            [jnp.arange(b, dtype=jnp.int32)[:, None],
             jnp.zeros((b, 3), jnp.int32)], axis=-1)
        grid = mt.SparseGrid(coords=coords, valid=jnp.ones((b,), bool),
                             stride=(seed_stride,) * 3, batch_size=b,
                             extent=extent)
        feats = jax.nn.one_hot(labels, n_classes) * 10.0
        return mt.SparseTensor(grid=grid, features=feats)

    def target_grid(cpad, valid):
        st = mt.sparse_tensor(cpad, jnp.ones((cap, 1)) * valid[:, None],
                              capacity=cap, batch_size=b, valid=valid,
                              extent=extent)
        return st.grid

    samples0 = [ds[i] for i in range(b)]
    cpad, valid, _, _ = collate_pointclouds([s["coords"] for s in samples0],
                                            cap)
    labels0 = jnp.asarray([s["label"] for s in samples0], jnp.int32)
    z0 = seed_tensor(labels0)
    tg0 = jax.jit(target_grid)(jnp.asarray(cpad), jnp.asarray(valid))
    rng = jax.random.PRNGKey(cfg.seed)
    variables = jax.jit(net.init)(rng, z0, tg0)
    log.info("params: %s", mt.utils.count_params(variables["params"]))

    if cfg.opt == "adam":
        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(cfg.lr))
    else:
        tx = optax.sgd(cfg.lr, momentum=0.9)  # reference's raw SGD (`:548-625`)
    state = mtrain.TrainState.create(variables["params"],
                                     variables.get("batch_stats", {}), tx)

    def loss_fn(params, batch_stats, batch, rng):
        cpad, valid, labels = batch
        z = seed_tensor(labels)
        tg = target_grid(cpad, valid)
        (out_clss, targets, sout), upd = net.apply(
            {"params": params, "batch_stats": batch_stats}, z, tg,
            mutable=["batch_stats"])
        bce = 0.0
        for logits_t, target in zip(out_clss, targets):
            lo = logits_t.features[:, 0]
            v = logits_t.valid
            t = target.astype(lo.dtype)
            per = jnp.maximum(lo, 0.) - lo * t + jnp.log1p(jnp.exp(-jnp.abs(lo)))
            bce += jnp.sum(jnp.where(v, per, 0.)) / jnp.maximum(
                jnp.sum(v.astype(lo.dtype)), 1.)
        bce = bce / len(out_clss)
        return bce, ({"final_voxels": sout.count()}, upd.get("batch_stats",
                                                             batch_stats))

    step_fn = mtrain.make_train_step(loss_fn)

    # ---- eval: generate each class from its seed in EVAL mode (no
    # force-keep) and score occupancy IoU against held-out targets (the
    # reference's per-epoch visual check, `reconstruction.py:548-625`,
    # made quantitative).  SyntheticShapes geometry is canonical per class,
    # so class -> shape is the right target up to surface-sampling noise.
    ds_val = SyntheticShapes(resolution=cfg.resolution, num_samples=b,
                             points_per_shape=cfg.num_points, seed=777)
    eval_samples = [ds_val[i] for i in range(b)]
    ecpad, evalid, _, _ = collate_pointclouds(
        [s["coords"] for s in eval_samples], cap)
    ecpad, evalid = jnp.asarray(ecpad), jnp.asarray(evalid)
    elabels = jnp.asarray([s["label"] for s in eval_samples], jnp.int32)

    @jax.jit
    def generate(params, batch_stats):
        z = seed_tensor(elabels)
        tg = target_grid(ecpad, evalid)
        (out_clss, targets, sout), _ = net.apply(
            {"params": params, "batch_stats": batch_stats}, z, tg,
            train=False, mutable=["batch_stats"])
        return sout

    def voxel_sets(grid_coords, grid_valid):
        out = {}
        for row, ok in zip(np.asarray(grid_coords), np.asarray(grid_valid)):
            if ok:
                out.setdefault(int(row[0]), set()).add(
                    tuple(int(x) for x in row[1:]))
        return out

    def eval_iou(state):
        sout = generate(state.params, state.batch_stats)
        gen = voxel_sets(sout.grid.coords, sout.grid.valid)
        tgt = voxel_sets(ecpad, evalid)
        vals = [len(gen.get(i, set()) & tgt[i]) /
                max(len(gen.get(i, set()) | tgt[i]), 1) for i in tgt]
        return float(np.mean(vals)), sout

    step, t0 = 0, time.time()
    final_iou = None
    # a --steps cap overrides the epoch cap (20k steps is ~300 epochs of
    # the 256-sample pool; the old epoch cap silently ended runs at 3.2k)
    epochs = cfg.max_epochs if not cfg.steps else \
        max(cfg.max_epochs, -(-cfg.steps // max(len(ds) // b, 1)))
    for epoch in range(epochs):
        for samples in batch_iterator(ds, b, np_rng):
            cpad, valid, _, _ = collate_pointclouds(
                [s["coords"] for s in samples], cap)
            labels = jnp.asarray([s["label"] for s in samples], jnp.int32)
            rng, sub = jax.random.split(rng)
            state, loss, aux = step_fn(
                state, (jnp.asarray(cpad), jnp.asarray(valid), labels), sub)
            step += 1
            if step % 10 == 0:
                log.info("epoch %d step %d bce %.4f voxels %d (%.2f s/step)",
                         epoch, step, float(loss),
                         int(aux["final_voxels"]), (time.time() - t0) / 10)
                t0 = time.time()
            if cfg.eval_every and step % cfg.eval_every == 0:
                iou, _ = eval_iou(state)
                log.info("step %d eval generation IoU %.4f", step, iou)
            if cfg.steps and step >= cfg.steps:
                final_iou, sout = eval_iou(state)
                log.info("done; final bce %.4f generation IoU %.4f",
                         float(loss), final_iou)
                if cfg.viz_dir:
                    path = mt.utils.render_pointclouds(
                        mt.utils.sparse_tensor_clouds(sout, b),
                        os.path.join(cfg.viz_dir, "reconstruction.png"),
                        titles=[f"gen {ds.CLASSES[i]}" for i in range(b)],
                        resolution=cfg.resolution)
                    log.info("render: %s", path)
                import json
                print(json.dumps({"final_bce": float(loss),
                                  "generation_iou": final_iou}), flush=True)
                return


if __name__ == "__main__":
    main()
