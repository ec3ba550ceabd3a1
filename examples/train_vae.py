"""Octree sparse VAE training — the reference's canonical pipeline
(`examples/ae_res.py:803-1024` `VaeModule` + `__main__`) rebuilt TPU-native.

Whole-graph jitted train step (tensor construction → encoder → reparam →
pruning decoder → per-level BCE + KLD → grads → optimizer), data-parallel
over all local devices via shard_map, orbax checkpointing with auto-resume,
PNG visualization of reconstructions.

Run (synthetic data smoke):
    python examples/train_vae.py --synthetic --resolution 32 --steps 10
ModelNet40:
    python examples/train_vae.py --data /path/to/ModelNet40 --resolution 128
"""

import argparse
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

# persistent compile cache: recompiles of these large programs are the
# dominant startup cost
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
# this environment registers a remote-TPU PJRT plugin via sitecustomize and
# pins jax_platforms, so JAX_PLATFORMS alone is ignored — re-apply it so
# `JAX_PLATFORMS=cpu python examples/...` behaves as users expect
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu import models as mm
from mink_octtree_stablediffusion_tpu import train as mtrain
from mink_octtree_stablediffusion_tpu.data import (
    SyntheticShapes, ModelNet40Dataset, batch_iterator, collate_pointclouds)


def parse_args():
    # flag set mirrors `examples/ae_res.py:956-973`
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--max_batch_len", type=int, default=200_000)
    p.add_argument("--vae_channel", type=int, nargs=5,
                   default=[32, 128, 512, 512, 4])
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--kld_weight", type=float, default=1e-6)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max_epochs", type=int, default=100)
    p.add_argument("--steps", type=int, default=0, help="hard step cap (0=off)")
    p.add_argument("--save_every", type=int, default=500)
    p.add_argument("--ckpt_dir", type=str, default="ckpt_vae")
    p.add_argument("--recover", action="store_true", default=True)
    p.add_argument("--data", type=str, default=None)
    p.add_argument("--cache_dir", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--small_dataset", action="store_true")
    p.add_argument("--input_capacity", type=int, default=65536)
    p.add_argument("--viz_dir", type=str, default=None)
    p.add_argument("--viz_every", type=int, default=0,
                   help="render reconstruction vs input PNG every N steps")
    return p.parse_args()


def capacities(input_capacity: int):
    """Per-level capacity schedule from the measured surface scaling law.

    Voxelized mesh SURFACES shrink ~4x per octree level (they are 2-D sets;
    measured on SyntheticShapes at res 64: 28k -> 19k -> 7.3k -> 1.85k), not
    the 8x a volumetric argument suggests — an 8x-decay schedule silently
    top-k clips >90% of the stride-8 latent (the reference clamps the same
    way, `examples/ae_res.py:601-605`, but sizes caps to its data).  The
    schedule assumes ~50% input-buffer utilization (the collation budget
    drops samples beyond it) with ~2x headroom per level.

    Decoder levels are CANDIDATE sets (post generative growth): growth
    multiplies the kept coarse set by 8 while the surface target only grows
    4x, so a level's candidate buffer needs ~2x that level's target — at
    the finest level that is ~2x the input capacity.  (Measured r2, res 64:
    growth from 16.2k kept stride-2 voxels = 129.5k candidates vs a 65.5k
    buffer; the silent overflow dropped half the true surface and capped
    eval reconstruction IoU at 0.57 with a PERFECT classifier.  With the
    2x buffer the same run reconstructs at IoU ~1.)"""
    c = input_capacity
    enc = tuple(max(c // d, 128) for d in (2, 4, 16)) + \
        (max(c // 16, 128),) * 2
    dec = tuple(max(c // d, 128) for d in (16, 4, 2)) + (2 * c,)
    return enc, dec


def main():
    cfg = parse_args()
    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("train_vae")
    np_rng = np.random.RandomState(cfg.seed)

    if cfg.synthetic or cfg.data is None:
        ds = SyntheticShapes(resolution=cfg.resolution, num_samples=256)
    else:
        ds = ModelNet40Dataset(cfg.data, "train", cfg.resolution,
                               cache_dir=cfg.cache_dir, augment=True,
                               small_dataset=cfg.small_dataset)
    enc_caps, dec_caps = capacities(cfg.input_capacity)
    vae = mm.VAE(channels=tuple(cfg.vae_channel),
                 encoder_capacities=enc_caps, decoder_capacities=dec_caps)

    cap = cfg.input_capacity
    sample = ds[0]
    cpad, valid, feats, _ = collate_pointclouds(
        [ds[i]["coords"] for i in range(min(cfg.batch_size, len(ds)))],
        cap, cfg.max_batch_len)

    def build(cpad, valid, feats):
        return mt.sparse_tensor(cpad, feats, capacity=cap,
                                batch_size=cfg.batch_size, valid=valid,
                                extent=(cfg.resolution,) * 3)

    st0 = build(jnp.asarray(cpad), jnp.asarray(valid), jnp.asarray(feats))
    rng = jax.random.PRNGKey(cfg.seed)
    variables = jax.jit(vae.init)(rng, st0, st0.grid, rng)
    log.info("params: %s", mt.utils.count_params(variables["params"]))

    tx = mtrain.vae_optimizer(cfg.lr)
    state = mtrain.TrainState.create(variables["params"],
                                     variables.get("batch_stats", {}), tx)
    ckpt = mtrain.CheckpointManager(cfg.ckpt_dir)
    if cfg.recover:
        state = ckpt.restore(state)
        log.info("resumed at step %d", int(state.step))

    def loss_fn(params, batch_stats, batch, rng):
        cpad, valid, feats = batch
        st = build(cpad, valid, feats)
        (out_clss, targets, sout, mean, log_var, _), upd = vae.apply(
            {"params": params, "batch_stats": batch_stats}, st, st.grid, rng,
            mutable=["batch_stats"])
        loss, aux = mm.vae_loss(out_clss, targets, mean, log_var,
                                cfg.kld_weight)
        return loss, (aux, upd["batch_stats"])

    step_fn = mtrain.make_train_step(loss_fn)

    @jax.jit
    def reconstruct(params, batch_stats, batch, rng):
        """eval-mode decode for visualization (`ae_res.py:865-886`)."""
        cpad, valid, feats = batch
        st = build(cpad, valid, feats)
        (out_clss, targets, sout, *_), _ = vae.apply(
            {"params": params, "batch_stats": batch_stats}, st, st.grid, rng,
            train=False, mutable=["batch_stats"])
        return st, sout

    step = int(state.step)
    t0 = time.time()
    for epoch in range(cfg.max_epochs):
        for samples in batch_iterator(ds, cfg.batch_size, np_rng):
            cpad, valid, feats, _ = collate_pointclouds(
                [s["coords"] for s in samples], cap, cfg.max_batch_len)
            rng, sub = jax.random.split(rng)
            state, loss, aux = step_fn(
                state, (jnp.asarray(cpad), jnp.asarray(valid),
                        jnp.asarray(feats)), sub)
            step += 1
            if step % 10 == 0:
                log.info("epoch %d step %d loss %.5f bce %.5f kld %.3f "
                         "(%.2f s/step)", epoch, step, float(loss),
                         float(aux["bce"]), float(aux["kld"]),
                         (time.time() - t0) / 10)
                t0 = time.time()
            if step % cfg.save_every == 0:
                ckpt.save(step, state)
                log.info("checkpointed step %d", step)
            if cfg.viz_every and step % cfg.viz_every == 0:
                sin_v, sout_v = reconstruct(
                    state.params, state.batch_stats,
                    (jnp.asarray(cpad), jnp.asarray(valid),
                     jnp.asarray(feats)), rng)
                path = mt.utils.render_pointclouds(
                    [mt.utils.sparse_tensor_clouds(sin_v, 1)[0],
                     mt.utils.sparse_tensor_clouds(sout_v, 1)[0]],
                    os.path.join(cfg.viz_dir or "viz_vae",
                                 f"step_{step:06d}.png"),
                    titles=["input", "reconstruction"],
                    resolution=cfg.resolution)
                log.info("wrote %s", path)
            if cfg.steps and step >= cfg.steps:
                ckpt.save(step, state, force=True)
                log.info("done (step cap)")
                return
    ckpt.save(step, state, force=True)


if __name__ == "__main__":
    main()
