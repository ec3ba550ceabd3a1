"""Dense-voxel diffusion baseline — the reference's `examples/diffusion_dense.py`
/ `unet_3d.py` family TPU-native: occupancy grids [B, R, R, R, 1] diffused by
the dense UNet3DModel with DDPM ε-prediction.  The dense path is the
cross-check for the sparse stack on small grids and a pure-MXU baseline.

Run (synthetic smoke):
    python examples/diffusion_dense.py --steps 2 --resolution 16
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

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu import diffusion as md
from mink_octtree_stablediffusion_tpu import models as mm
from mink_octtree_stablediffusion_tpu import train as mtrain
from mink_octtree_stablediffusion_tpu.data import SyntheticShapes, batch_iterator


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--block_channels", type=int, nargs="+",
                   default=[32, 64, 128])
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--with_cond", action="store_true",
                   help="use the conditioned UNet3DConditionModel with "
                        "per-class CLIP-style embeddings "
                        "(reference examples/diffusion_full.py:501)")
    p.add_argument("--cross_attention_dim", type=int, default=64)
    cfg = p.parse_args()
    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("diffusion_dense")
    np_rng = np.random.RandomState(cfg.seed)
    ds = SyntheticShapes(resolution=cfg.resolution, num_samples=128,
                         with_class=cfg.with_cond)

    if cfg.with_cond:
        net = mm.UNet3DConditionModel(
            out_channels=1, block_channels=tuple(cfg.block_channels),
            cross_attention_dim=cfg.cross_attention_dim,
            attention_head_dim=max(min(cfg.block_channels) // 2, 8),
            groups=8,
            cross_attn_levels=(len(cfg.block_channels) - 1,))
    else:
        net = mm.UNet3DModel(out_channels=1,
                             block_channels=tuple(cfg.block_channels),
                             attn_levels=(len(cfg.block_channels) - 1,))
    sched = md.DDPMScheduler.create()
    b, r = cfg.batch_size, cfg.resolution

    def densify(samples):
        grid = np.zeros((b, r, r, r, 1), np.float32)
        for i, s in enumerate(samples):
            v = s["coords"]
            grid[i, v[:, 0], v[:, 1], v[:, 2], 0] = 1.0
        return grid

    # CLIP-embedding stand-in (no network egress in this env): a fixed
    # random per-class token table [n_classes, 1, cross_attention_dim]
    embed_table = jnp.asarray(np.random.RandomState(0).randn(
        len(ds.CLASSES), 1, cfg.cross_attention_dim).astype(np.float32))

    def cond_of(samples):
        labels = np.array([s["label"] for s in samples], np.int32)
        return embed_table[jnp.asarray(labels)]  # [B, 1, D_cross]

    samples0 = [ds[i] for i in range(b)]
    x0 = jnp.asarray(densify(samples0))
    ehs0 = cond_of(samples0) if cfg.with_cond else None
    rng = jax.random.PRNGKey(cfg.seed)
    init_args = (x0, jnp.zeros((b,), jnp.int32)) + (
        (ehs0,) if cfg.with_cond else ())
    variables = jax.jit(net.init)(rng, *init_args)
    log.info("params: %s", mt.utils.count_params(variables["params"]))
    tx = mtrain.diffusion_optimizer(cfg.lr)
    state = mtrain.TrainState.create(variables["params"], {}, tx)

    def loss_fn(params, batch_stats, batch, rng):
        x0, ehs = batch
        r_t, r_n = jax.random.split(rng)
        t = jax.random.randint(r_t, (b,), 0, sched.num_train_timesteps)
        noise = jax.random.normal(r_n, x0.shape)
        xt = sched.add_noise(x0, noise, t)
        if cfg.with_cond:
            eps = net.apply({"params": params}, xt, t, ehs)
        else:
            eps = net.apply({"params": params}, xt, t)
        return jnp.mean((eps - noise) ** 2), ({}, batch_stats)

    step_fn = mtrain.make_train_step(loss_fn)
    step, t0 = 0, time.time()
    while True:
        for samples in batch_iterator(ds, b, np_rng):
            x0 = jnp.asarray(densify(samples))
            ehs = cond_of(samples) if cfg.with_cond else jnp.zeros((b, 1, 1))
            rng, sub = jax.random.split(rng)
            state, loss, _ = step_fn(state, (x0, ehs), sub)
            step += 1
            if step % 5 == 0 or (cfg.steps and step >= cfg.steps):
                log.info("step %d loss %.5f (%.2f s/step)", step, float(loss),
                         (time.time() - t0) / 5)
                t0 = time.time()
            if cfg.steps and step >= cfg.steps:
                log.info("done")
                return


if __name__ == "__main__":
    main()
