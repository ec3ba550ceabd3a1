"""ModelNet40 classification — the reference's
`examples/classification_modelnet40.py` pipeline TPU-native: TensorField →
MinkowskiFCNN / SplatFCNN / PointNet baselines, cross-entropy, Adam.

Run (synthetic smoke):
    python examples/classification_modelnet40.py --synthetic --steps 5
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
    SyntheticShapes, ModelNet40Dataset, batch_iterator, collate_fields)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--network", type=str, default="minkfcnn",
                   choices=["minkfcnn", "minksplatfcnn", "pointnet",
                            "minkpointnet"])
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_points", type=int, default=2048)
    p.add_argument("--voxel_size", type=float, default=0.05,
                   help="unit-sphere points are divided by this before "
                        "quantization (reference --voxel_size, "
                        "classification_modelnet40.py:48,286)")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--max_epochs", type=int, default=50)
    p.add_argument("--data", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--ckpt_dir", type=str, default="ckpt_cls")
    return p.parse_args()


def main():
    cfg = parse_args()
    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("classification")
    np_rng = np.random.RandomState(cfg.seed)

    if cfg.synthetic or cfg.data is None:
        ds = SyntheticShapes(resolution=cfg.resolution, num_samples=256,
                             points_per_shape=cfg.num_points)
        # held-out split: same generator family, disjoint seed
        ds_val = SyntheticShapes(resolution=cfg.resolution, num_samples=64,
                                 points_per_shape=cfg.num_points, seed=777)
        n_classes = len(ds.CLASSES)
    else:
        ds = ModelNet40Dataset(cfg.data, "train", cfg.resolution)
        ds_val = ModelNet40Dataset(cfg.data, "test", cfg.resolution)
        n_classes = 40

    cap = cfg.batch_size * cfg.num_points
    if cfg.network == "minkfcnn":
        net = mm.MinkowskiFCNN(out_channel=n_classes, voxel_capacity=cap)
    elif cfg.network == "minksplatfcnn":
        net = mm.MinkowskiSplatFCNN(out_channel=n_classes, voxel_capacity=cap)
    else:
        net = mm.MinkowskiPointNet(out_channel=n_classes)

    def collate(samples):
        xyzs = [s["xyz"][:cfg.num_points] for s in samples]
        # reference semantics (`create_input_batch`, :286): unit-sphere
        # points as FEATURES, point/voxel_size as quantization COORDS.
        # Dataset xyz is resolution-scaled, so normalize to [-1, 1] first.
        unit = [(x / cfg.resolution * 2.0 - 1.0).astype(np.float32)
                for x in xyzs]
        feats = unit
        # shift to [0, 2] before /voxel_size so the voxel lattice is
        # non-negative and a static extent bounds it (bounded grids take
        # the flat-key/LUT/fused-conv fast paths)
        coords = [(u + 1.0) / cfg.voxel_size for u in unit]
        cpad, valid, fpad = collate_fields(coords, feats, cap)
        labels = np.array([s["label"] for s in samples], np.int32)
        return cpad, valid, fpad, labels

    samples0 = [ds[i] for i in range(cfg.batch_size)]
    cpad, valid, fpad, labels = collate(samples0)

    extent = (int(2.0 / cfg.voxel_size) + 1,) * 3

    def build(cpad, valid, fpad):
        return mt.TensorField(coordinates=jnp.asarray(cpad),
                              features=jnp.asarray(fpad),
                              valid=jnp.asarray(valid),
                              batch_size=cfg.batch_size,
                              extent=extent)

    field0 = build(cpad, valid, fpad)
    rng = jax.random.PRNGKey(cfg.seed)
    variables = jax.jit(net.init)(rng, field0)
    log.info("params: %s", mt.utils.count_params(variables["params"]))

    tx = optax.adam(cfg.lr)
    state = mtrain.TrainState.create(variables["params"],
                                     variables.get("batch_stats", {}), tx)

    def loss_fn(params, batch_stats, batch, rng):
        cpad, valid, fpad, labels = batch
        field = build(cpad, valid, fpad)
        logits, upd = net.apply(
            {"params": params, "batch_stats": batch_stats}, field,
            mutable=["batch_stats"])
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return loss, ({"acc": acc}, upd.get("batch_stats", batch_stats))

    step_fn = mtrain.make_train_step(loss_fn)

    @jax.jit
    def eval_logits(params, batch_stats, cpad, valid, fpad):
        field = build(cpad, valid, fpad)
        return net.apply({"params": params, "batch_stats": batch_stats},
                         field, train=False)

    def evaluate(state):
        correct = total = 0
        for i in range(0, len(ds_val) - cfg.batch_size + 1, cfg.batch_size):
            samples = [ds_val[j] for j in range(i, i + cfg.batch_size)]
            cpad, valid, fpad, labels = collate(samples)
            logits = eval_logits(state.params, state.batch_stats,
                                 jnp.asarray(cpad), jnp.asarray(valid),
                                 jnp.asarray(fpad))
            correct += int(np.sum(np.argmax(np.asarray(logits), -1) == labels))
            total += len(labels)
        return correct / max(total, 1)

    step, t0 = 0, time.time()
    for epoch in range(cfg.max_epochs):
        for samples in batch_iterator(ds, cfg.batch_size, np_rng):
            cpad, valid, fpad, labels = collate(samples)
            rng, sub = jax.random.split(rng)
            state, loss, aux = step_fn(
                state, (jnp.asarray(cpad), jnp.asarray(valid),
                        jnp.asarray(fpad), jnp.asarray(labels)), sub)
            step += 1
            if step % 10 == 0:
                log.info("epoch %d step %d loss %.4f acc %.3f (%.2f s/step)",
                         epoch, step, float(loss), float(aux["acc"]),
                         (time.time() - t0) / 10)
                t0 = time.time()
            if cfg.steps and step >= cfg.steps:
                val_acc = evaluate(state)
                log.info("done (step cap); final loss %.4f val_acc %.4f",
                         float(loss), val_acc)
                return
        val_acc = evaluate(state)
        log.info("epoch %d complete: val_acc %.4f", epoch, val_acc)


if __name__ == "__main__":
    main()
