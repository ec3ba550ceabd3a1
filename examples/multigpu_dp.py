"""Data-parallel scaling demo — the reference's `examples/multigpu.py` /
`multigpu_ddp.py` (mp.spawn + NCCL DDP + SyncBN + all-reduced timing)
TPU-native: ONE SPMD program over a `jax.sharding.Mesh`; per-device batches
ride a leading device axis, gradients `pmean` over the mesh (ICI), SyncBN via
``axis_name`` norms, and the same per-iteration timing report.

Run on the CPU mesh:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/multigpu_dp.py --steps 3 --force_cpu
On real multi-chip TPU it uses all local devices; multi-host via
`mt.parallel` after `jax.distributed.initialize()`.
"""

import argparse
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--batch_per_device", type=int, default=2)
    p.add_argument("--resolution", type=int, default=16)
    p.add_argument("--capacity", type=int, default=1024)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--force_cpu", action="store_true")
    args = p.parse_args()

    if args.force_cpu:
        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count=8")
    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    import mink_octtree_stablediffusion_tpu as mt
    from mink_octtree_stablediffusion_tpu import models as mm
    from mink_octtree_stablediffusion_tpu import train as mtrain
    from mink_octtree_stablediffusion_tpu.data import (SyntheticShapes,
                                                       collate_pointclouds)

    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("multigpu_dp")
    n_dev = jax.device_count()
    mesh = mt.parallel.data_parallel_mesh()
    log.info("devices: %d (%s)", n_dev, jax.devices()[0].platform)

    ds = SyntheticShapes(resolution=args.resolution, num_samples=256,
                         points_per_shape=512)
    b, cap = args.batch_per_device, args.capacity
    # a small classifier with SyncBN across the mesh (MinkUNet-style stem)
    net = mm.ResNet14(out_channels=4, input_capacity=cap, axis_name="data")

    def collate_device(seed):
        r = np.random.RandomState(seed)
        idx = r.randint(0, len(ds), b)
        samples = [ds[int(i)] for i in idx]
        cpad, valid, feats, _ = collate_pointclouds(
            [s["coords"] for s in samples], cap)
        labels = np.array([s["label"] for s in samples], np.int32)
        return cpad, valid, feats, labels

    def device_batch(step):
        per_dev = [collate_device(step * n_dev + d) for d in range(n_dev)]
        return tuple(jnp.asarray(np.stack([pd[i] for pd in per_dev]))
                     for i in range(4))

    def build(cpad, valid, feats):
        return mt.sparse_tensor(cpad, feats, capacity=cap, batch_size=b,
                                valid=valid,
                                extent=(args.resolution,) * 3)

    batch0 = device_batch(0)
    st0 = build(*(x[0] for x in batch0[:3]))
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), st0)
    tx = optax.adam(args.lr)
    state = mtrain.TrainState.create(variables["params"],
                                     variables.get("batch_stats", {}), tx)

    def loss_fn(params, batch_stats, batch, rng):
        cpad, valid, feats, labels = batch
        st = build(cpad, valid, feats)
        logits, upd = net.apply(
            {"params": params, "batch_stats": batch_stats}, st,
            mutable=["batch_stats"])
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()
        return loss, ({}, upd.get("batch_stats", batch_stats))

    dp_step = mtrain.make_dp_train_step(loss_fn, mesh)
    rng = jax.random.PRNGKey(0)
    for step in range(args.steps):
        batch = device_batch(step)
        rngs = jax.random.split(rng, n_dev)
        rng = rngs[0]
        t0 = time.perf_counter()
        state, loss, _ = dp_step(state, batch, rngs)
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
        log.info("step %d loss %.4f  %.3fs  (%d devices, global batch %d)",
                 step, float(loss), dt, n_dev, n_dev * b)
    log.info("done")


if __name__ == "__main__":
    main()
