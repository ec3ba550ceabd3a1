"""Sparse latent-diffusion training — the reference's
`examples/diffusion.py` pipeline rebuilt TPU-native: frozen VAE encoder →
scaled latent → per-instance timestep noising → sparse UNet ε-prediction
(+ coordinate-NLL aux loss) → AdamW with warmup-cosine and grad-clip 0.5;
validation = 50-step DDPM denoising on a real latent coordinate set, decoded
by the frozen pruning decoder.

Run (synthetic smoke):
    python examples/train_diffusion.py --synthetic --resolution 32 --steps 5
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
from mink_octtree_stablediffusion_tpu import diffusion as md
from mink_octtree_stablediffusion_tpu import models as mm
from mink_octtree_stablediffusion_tpu import train as mtrain
from mink_octtree_stablediffusion_tpu.data import (
    SyntheticShapes, ModelNet40Dataset, batch_iterator, collate_pointclouds)


def parse_args():
    # flag set mirrors `examples/diffusion.py:728-763`
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--max_batch_len", type=int, default=200_000)
    p.add_argument("--vae_channel", type=int, nargs=5,
                   default=[32, 128, 512, 512, 4])
    p.add_argument("--unet_channel", type=int, nargs=4,
                   default=[4, 320, 640, 960])
    p.add_argument("--vae_ckpt", type=str, default=None)
    p.add_argument("--vae_scale", type=float, default=0.1428)
    p.add_argument("--ddpm_num_steps", type=int, default=1000)
    p.add_argument("--ddpm_beta_schedule", type=str, default="scaled_linear")
    p.add_argument("--prediction_type", type=str, default="epsilon",
                   choices=["epsilon", "sample"])
    p.add_argument("--time_embedding_norm", type=str, default="default",
                   choices=["default", "scale_shift"])
    p.add_argument("--group", type=int, default=32)
    p.add_argument("--remat", action="store_true",
                   help="rematerialize UNet stacks (memory for recompute)")
    p.add_argument("--with_attn", action="store_true", default=True)
    p.add_argument("--attn_max_len", type=int, default=0,
                   help="per-instance attention packing length (0 = derive "
                        "from the latent capacity; too small silently drops "
                        "tokens from attention)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup", type=int, default=1000)
    p.add_argument("--total_steps", type=int, default=100_000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--save_every", type=int, default=500)
    p.add_argument("--ckpt_dir", type=str, default="ckpt_diffusion")
    p.add_argument("--data", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--input_capacity", type=int, default=65536)
    p.add_argument("--sample_steps", type=int, default=50)
    # noise-point augmentation (`diffusion.py:385-437`) and the no-VAE
    # variant that diffuses occupancy features directly
    # (`diffusion_noVae.py:372`: clean = sin)
    p.add_argument("--noise_point_mode", default="none",
                   choices=["none", "uniform", "all"])
    p.add_argument("--noise_point_max", type=int, default=64)
    p.add_argument("--noise_near", action="store_true")
    p.add_argument("--no_vae", action="store_true")
    p.add_argument("--val_every", type=int, default=0,
                   help="run 50-step sampling validation + PNG every N steps")
    p.add_argument("--viz_dir", type=str, default="viz_diffusion")
    return p.parse_args()


def main():
    cfg = parse_args()
    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("train_diffusion")
    np_rng = np.random.RandomState(cfg.seed)

    if cfg.synthetic or cfg.data is None:
        ds = SyntheticShapes(resolution=cfg.resolution, num_samples=256)
    else:
        ds = ModelNet40Dataset(cfg.data, "train", cfg.resolution)

    from examples.train_vae import capacities

    enc_caps, dec_caps = capacities(cfg.input_capacity)
    vae = mm.VAE(channels=tuple(cfg.vae_channel),
                 encoder_capacities=enc_caps, decoder_capacities=dec_caps)
    latent_cap = enc_caps[2]
    # attention packs each instance to a static length; the finest
    # attention-bearing level is the full latent (block1_tr), so cover the
    # per-instance latent budget with skew headroom — undersizing silently
    # drops tokens from attention (decomposed_features masks pos >= max_len)
    attn_max_len = cfg.attn_max_len or max(
        -(-latent_cap * 3 // (2 * cfg.batch_size) // 128) * 128, 128)
    unet = mm.UNet(channels=tuple(cfg.unet_channel),
                   with_attn=cfg.with_attn, group=cfg.group,
                   remat=cfg.remat, attn_max_len=attn_max_len,
                   time_embedding_norm=cfg.time_embedding_norm,
                   down_capacities=(max(latent_cap // 2, 16),
                                    max(latent_cap // 4, 8),
                                    max(latent_cap // 8, 8)))
    sched = md.DDPMScheduler.create(cfg.ddpm_num_steps,
                                    beta_schedule=cfg.ddpm_beta_schedule,
                                    prediction_type=cfg.prediction_type)

    cap = cfg.input_capacity
    b = cfg.batch_size

    def build(cpad, valid):
        feats = jnp.ones((cap, 1)) * valid[:, None]
        return mt.sparse_tensor(cpad, feats, capacity=cap, batch_size=b,
                                valid=valid, extent=(cfg.resolution,) * 3)

    cpad, valid, _, _ = collate_pointclouds(
        [ds[i]["coords"] for i in range(b)], cap, cfg.max_batch_len)
    st0 = build(jnp.asarray(cpad), jnp.asarray(valid))
    rng = jax.random.PRNGKey(cfg.seed)

    vae_vars = jax.jit(vae.init)(rng, st0, st0.grid, rng)
    if cfg.vae_ckpt:
        # cross-model handoff (`diffusion.py:815-817`)
        vae_params = mtrain.CheckpointManager(cfg.vae_ckpt).restore_params(
            vae_vars["params"])
        vae_vars = {**vae_vars, "params": vae_params}
    vae_vars = jax.tree.map(jax.lax.stop_gradient, vae_vars)

    latent_stride = 8
    latent_res = max(cfg.resolution // latent_stride, 1)

    def encode(st, vv):
        if cfg.no_vae:
            return st  # diffuse occupancy features directly
        mean, _ = vae.apply(
            {"params": vv["params"],
             "batch_stats": vv.get("batch_stats", {})},
            st, method=vae.encode)
        return mean.with_features(
            jax.lax.stop_gradient(mean.features * cfg.vae_scale))

    lat0 = jax.jit(encode)(st0, vae_vars)
    unet_vars = jax.jit(unet.init)(rng, lat0, jnp.zeros((b,), jnp.int32))
    log.info("unet params: %s", mt.utils.count_params(unet_vars["params"]))

    params0 = {"unet": unet_vars["params"],
               "nll": md.CoordNLLParams.create()}
    tx = mtrain.diffusion_optimizer(cfg.lr, cfg.warmup, cfg.total_steps)
    state = mtrain.TrainState.create(params0, {}, tx)
    ckpt = mtrain.CheckpointManager(cfg.ckpt_dir)
    state = ckpt.restore(state)

    def loss_fn(params, batch_stats, batch, rng):
        # vae_vars ride in the batch so the frozen VAE is an argument, not
        # 100s of MB of baked-in constants (compile-time blowup otherwise)
        cpad, valid, vv = batch
        st = build(cpad, valid)
        latent = encode(st, vv)
        if cfg.noise_point_mode != "none" or cfg.noise_near:
            rng, r_np = jax.random.split(rng)
            latent = md.inject_noise_points(
                latent, r_np, cfg.noise_point_mode, latent_res,
                cfg.noise_point_max, capacity=latent.capacity,
                noise_near=cfg.noise_near)

        def unet_apply(noised, timesteps, ehs):
            return unet.apply({"params": params["unet"]}, noised, timesteps,
                              ehs)

        loss, aux = md.diffusion_training_loss(
            unet_apply, sched, latent, rng, nll_params=params["nll"],
            resolution=cfg.resolution,
            prediction_type=cfg.prediction_type)
        return loss, (aux, batch_stats)

    step_fn = mtrain.make_train_step(loss_fn)

    @jax.jit
    def validate(params, vv, batch, rng):
        """50-step denoise on a real latent coordinate set + frozen decode
        (`diffusion.py:520-658`)."""
        cpad, valid = batch
        st = build(cpad, valid)
        latent = encode(st, vv)

        def unet_apply(noised, timesteps, ehs):
            return unet.apply({"params": params["unet"]}, noised, timesteps,
                              ehs, train=False)

        z = md.sample_latent(unet_apply, sched, latent, rng,
                             num_inference_steps=cfg.sample_steps)
        z = z.with_features(z.features / cfg.vae_scale)
        _, _, sout = vae.apply(
            {"params": vv["params"],
             "batch_stats": vv.get("batch_stats", {})},
            z, st.grid, train=False, method=vae.decode)
        return st, sout

    step = int(state.step)
    t0 = time.time()
    while True:
        for samples in batch_iterator(ds, b, np_rng):
            cpad, valid, _, _ = collate_pointclouds(
                [s["coords"] for s in samples], cap, cfg.max_batch_len)
            rng, sub = jax.random.split(rng)
            state, loss, aux = step_fn(
                state, (jnp.asarray(cpad), jnp.asarray(valid), vae_vars), sub)
            step += 1
            if step % 10 == 0:
                log.info("step %d loss %.5f denoise %.5f (%.2f s/step)",
                         step, float(loss), float(aux["denoise_loss"]),
                         (time.time() - t0) / 10)
                t0 = time.time()
            if step % cfg.save_every == 0:
                ckpt.save(step, state)
            if cfg.val_every and step % cfg.val_every == 0:
                sin_v, sout_v = validate(
                    state.params, vae_vars,
                    (jnp.asarray(cpad), jnp.asarray(valid)), rng)
                path = mt.utils.render_pointclouds(
                    [mt.utils.sparse_tensor_clouds(sin_v, 1)[0],
                     mt.utils.sparse_tensor_clouds(sout_v, 1)[0]],
                    os.path.join(cfg.viz_dir, f"step_{step:06d}.png"),
                    titles=["data", "generated"],
                    resolution=cfg.resolution)
                log.info("validation sample written to %s", path)
            if cfg.steps and step >= cfg.steps:
                ckpt.save(step, state, force=True)
                log.info("done (step cap)")
                return


if __name__ == "__main__":
    main()
