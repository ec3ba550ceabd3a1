"""3D shape generation: sample the latent diffusion model and decode with
the pruning VAE decoder — the reference's validation sampling path
(`examples/diffusion.py:520-658`) as a standalone CLI.

The latent coordinate set is fixed (taken from an encoded dataset sample, or
the full latent grid with --latent_mode all — matching `diffusion.py:548-552`),
features are denoised from pure N(0,1) over `--sample_steps` DDPM/DDIM steps
inside one `lax.scan`, then the frozen decoder re-grows the octree.  Outputs
a PNG render per sample.

Run (random-weight smoke):
    python examples/generate.py --synthetic --resolution 32 --sample_steps 5
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

# persistent compile cache + JAX_PLATFORMS re-apply (the sitecustomize pins
# the platform, so the env var alone is ignored)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu import diffusion as md
from mink_octtree_stablediffusion_tpu import models as mm
from mink_octtree_stablediffusion_tpu import train as mtrain
from mink_octtree_stablediffusion_tpu.data import SyntheticShapes, collate_pointclouds


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--vae_channel", type=int, nargs=5,
                   default=[32, 128, 512, 512, 4])
    p.add_argument("--unet_channel", type=int, nargs=4,
                   default=[4, 320, 640, 960])
    p.add_argument("--vae_ckpt", type=str, default=None)
    p.add_argument("--diffusion_ckpt", type=str, default=None)
    p.add_argument("--vae_scale", type=float, default=0.1428)
    p.add_argument("--sample_steps", type=int, default=50)
    p.add_argument("--scheduler", default="ddpm", choices=["ddpm", "ddim"])
    p.add_argument("--latent_mode", default="encoded",
                   choices=["encoded", "all"])
    p.add_argument("--group", type=int, default=32)
    p.add_argument("--attn_max_len", type=int, default=0,
                   help="0 = derive from latent capacity (must match "
                        "training so attention sees the same token sets)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", type=str, default="samples")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--input_capacity", type=int, default=65536)
    p.add_argument("--export_dir", type=str, default=None,
                   help="also write a jax.export serving artifact "
                        "(mt.serve.save_artifact) for AOT deployment")
    cfg = p.parse_args()
    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("generate")

    ds = SyntheticShapes(resolution=cfg.resolution, num_samples=64)

    from examples.train_vae import capacities

    enc_caps, dec_caps = capacities(cfg.input_capacity)
    vae = mm.VAE(channels=tuple(cfg.vae_channel),
                 encoder_capacities=enc_caps, decoder_capacities=dec_caps)
    latent_cap = enc_caps[2]
    attn_max_len = cfg.attn_max_len or max(
        -(-latent_cap * 3 // (2 * cfg.batch_size) // 128) * 128, 128)
    unet = mm.UNet(channels=tuple(cfg.unet_channel), group=cfg.group,
                   attn_max_len=attn_max_len,
                   down_capacities=(max(latent_cap // 2, 16),
                                    max(latent_cap // 4, 8),
                                    max(latent_cap // 8, 8)))
    if cfg.scheduler == "ddpm":
        sched = md.DDPMScheduler.create()
    else:
        sched = md.DDIMScheduler.create()

    cap, b = cfg.input_capacity, cfg.batch_size

    def build(cpad, valid):
        feats = jnp.ones((cap, 1)) * valid[:, None]
        return mt.sparse_tensor(cpad, feats, capacity=cap, batch_size=b,
                                valid=valid, extent=(cfg.resolution,) * 3)

    cpad, valid, _, _ = collate_pointclouds(
        [ds[i]["coords"] for i in range(b)], cap)
    st0 = build(jnp.asarray(cpad), jnp.asarray(valid))
    rng = jax.random.PRNGKey(cfg.seed)

    vae_vars = jax.jit(vae.init)(rng, st0, st0.grid, rng)
    if cfg.vae_ckpt:
        vae_params = mtrain.CheckpointManager(cfg.vae_ckpt).restore_params(
            vae_vars["params"])
        vae_vars = {**vae_vars, "params": vae_params}

    def encode(st):
        mean, _ = vae.apply(
            {"params": vae_vars["params"],
             "batch_stats": vae_vars.get("batch_stats", {})},
            st, method=vae.encode)
        return mean.with_features(mean.features * cfg.vae_scale)

    latent = jax.jit(encode)(st0)
    if cfg.latent_mode == "all":
        latent = jax.jit(lambda l, k: md.inject_noise_points(
            l, k, "all", max(cfg.resolution // 8, 1),
            capacity=latent_cap))(latent, rng)

    unet_vars = jax.jit(unet.init)(rng, latent, jnp.zeros((b,), jnp.int32))
    if cfg.diffusion_ckpt:
        params = mtrain.CheckpointManager(
            cfg.diffusion_ckpt).restore_params(
            {"unet": unet_vars["params"],
             "nll": md.CoordNLLParams.create()})
        unet_vars = {**unet_vars, "params": params["unet"]}

    @jax.jit
    def sample(uv, vv, latent, key):
        def unet_apply(noised, timesteps, ehs):
            return unet.apply(uv, noised, timesteps, ehs, train=False)

        z = md.sample_latent(unet_apply, sched, latent, key,
                             num_inference_steps=cfg.sample_steps)
        z = z.with_features(z.features / cfg.vae_scale)
        out_clss, targets, sout = vae.apply(
            {"params": vv["params"],
             "batch_stats": vv.get("batch_stats", {})},
            z, st0.grid, train=False, method=vae.decode)
        return sout

    t0 = time.time()
    sout = sample(unet_vars, vae_vars, latent,
                  jax.random.PRNGKey(cfg.seed + 1))
    jax.block_until_ready(sout.features)
    compile_and_first = time.time() - t0
    t0 = time.time()
    sout = sample(unet_vars, vae_vars, latent,
                  jax.random.PRNGKey(cfg.seed + 2))
    jax.block_until_ready(sout.features)
    steady = time.time() - t0
    log.info("sampled %d voxels across %d instances; first(incl compile) "
             "%.2fs, steady %.3fs (%.4f s/sample)",
             int(sout.count()), b, compile_and_first, steady, steady / b)

    clouds = mt.utils.sparse_tensor_clouds(sout, b)
    path = os.path.join(cfg.out_dir, "generated.png")
    mt.utils.render_pointclouds(clouds, path, resolution=cfg.resolution)
    log.info("wrote %s", path)

    if cfg.export_dir:
        fn = mt.serve.build_generate_fn(
            vae, unet, sched, input_capacity=cap, batch_size=b,
            resolution=cfg.resolution, vae_scale=cfg.vae_scale,
            sample_steps=cfg.sample_steps)
        d = mt.serve.save_artifact(cfg.export_dir, fn, vae_vars,
                                   unet_vars["params"],
                                   example=(np.asarray(cpad),
                                            np.asarray(valid)))
        log.info("serving artifact written to %s", d)


if __name__ == "__main__":
    main()
