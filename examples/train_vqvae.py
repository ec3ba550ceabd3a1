"""VQ-VAE training — the reference's `examples/VQVae_res.py` pipeline
TPU-native: same encoder/pruning-decoder as the VAE, with nearest-code
vector quantization, straight-through estimator and the two commitment
losses added to the per-level BCE (`VQVae_res.py:708-732,855-867`).

Run (synthetic smoke):
    python examples/train_vqvae.py --synthetic --steps 2 --resolution 32
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--max_batch_len", type=int, default=200_000)
    p.add_argument("--vae_channel", type=int, nargs=5,
                   default=[32, 128, 512, 512, 4])
    p.add_argument("--num_embeddings", type=int, default=512)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--save_every", type=int, default=500)
    p.add_argument("--ckpt_dir", type=str, default="ckpt_vqvae")
    p.add_argument("--data", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--input_capacity", type=int, default=65536)
    cfg = p.parse_args()
    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("train_vqvae")
    np_rng = np.random.RandomState(cfg.seed)

    if cfg.synthetic or cfg.data is None:
        ds = SyntheticShapes(resolution=cfg.resolution, num_samples=256)
    else:
        ds = ModelNet40Dataset(cfg.data, "train", cfg.resolution)

    from examples.train_vae import capacities

    enc_caps, dec_caps = capacities(cfg.input_capacity)
    net = mm.VQVAE(channels=tuple(cfg.vae_channel),
                   num_embeddings=cfg.num_embeddings,
                   encoder_capacities=enc_caps, decoder_capacities=dec_caps)
    cap, b = cfg.input_capacity, cfg.batch_size

    def build(cpad, valid):
        feats = jnp.ones((cap, 1)) * valid[:, None]
        return mt.sparse_tensor(cpad, feats, capacity=cap, batch_size=b,
                                valid=valid, extent=(cfg.resolution,) * 3)

    cpad, valid, _, _ = collate_pointclouds(
        [ds[i]["coords"] for i in range(b)], cap, cfg.max_batch_len)
    st0 = build(jnp.asarray(cpad), jnp.asarray(valid))
    rng = jax.random.PRNGKey(cfg.seed)
    variables = jax.jit(net.init)(rng, st0, st0.grid)
    log.info("params: %s", mt.utils.count_params(variables["params"]))
    tx = mtrain.vae_optimizer(cfg.lr)
    state = mtrain.TrainState.create(variables["params"],
                                     variables.get("batch_stats", {}), tx)
    ckpt = mtrain.CheckpointManager(cfg.ckpt_dir)
    state = ckpt.restore(state)

    def loss_fn(params, batch_stats, batch, rng):
        cpad, valid = batch
        st = build(cpad, valid)
        (out_clss, targets, sout, ze, idx, vq_loss), upd = net.apply(
            {"params": params, "batch_stats": batch_stats}, st, st.grid,
            mutable=["batch_stats"])
        bce = 0.0
        for logits_t, target in zip(out_clss, targets):
            lo = logits_t.features[:, 0]
            v = logits_t.valid
            t = target.astype(lo.dtype)
            per = jnp.maximum(lo, 0.) - lo * t + \
                jnp.log1p(jnp.exp(-jnp.abs(lo)))
            bce += jnp.sum(jnp.where(v, per, 0.)) / jnp.maximum(
                jnp.sum(v.astype(lo.dtype)), 1.)
        bce = bce / len(out_clss)
        # loss = BCE + ‖zq − sg(ze)‖² + ‖sg(zq) − ze‖² (`VQVae_res.py:861-867`)
        loss = bce + vq_loss
        return loss, ({"bce": bce, "vq": vq_loss}, upd["batch_stats"])

    step_fn = mtrain.make_train_step(loss_fn)
    step, t0 = int(state.step), time.time()
    while True:
        for samples in batch_iterator(ds, b, np_rng):
            cpad, valid, _, _ = collate_pointclouds(
                [s["coords"] for s in samples], cap, cfg.max_batch_len)
            rng, sub = jax.random.split(rng)
            state, loss, aux = step_fn(
                state, (jnp.asarray(cpad), jnp.asarray(valid)), sub)
            step += 1
            if step % 10 == 0:
                log.info("step %d loss %.5f bce %.5f vq %.5f (%.2f s/step)",
                         step, float(loss), float(aux["bce"]),
                         float(aux["vq"]), (time.time() - t0) / 10)
                t0 = time.time()
            if step % cfg.save_every == 0:
                ckpt.save(step, state)
            if cfg.steps and step >= cfg.steps:
                ckpt.save(step, state, force=True)
                log.info("done (step cap)")
                return


if __name__ == "__main__":
    main()
