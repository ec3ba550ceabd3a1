"""On-chip profile of the diffusion (UNet) train step — per-op attribution.

Runs one compiled train step (same workload as `bench_unet_stages.py`) under
`jax.profiler.trace` and aggregates the device-side "XLA Ops" events from the
emitted trace.json.gz, attributing time to framework stages via the HLO
metadata op_name paths.  This is ground truth where chain-slope microbenches
are noise-limited (sub-ms layers).

Usage: python scripts/profile_unet_step.py [--small] [--no_attn] [--top N]
"""

import argparse
import sys

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax.numpy as jnp  # noqa: E402

import mink_octtree_stablediffusion_tpu as mt  # noqa: E402
from mink_octtree_stablediffusion_tpu import diffusion as md  # noqa: E402
from mink_octtree_stablediffusion_tpu import models as mm  # noqa: E402

from bench_vae_step_common import make_batch  # noqa: E402
from profile_common import profile_step  # noqa: E402


def build_step(args):
    if args.small:
        b, res, cap, pts = 2, 16, 1024, 300
        vae_kw = dict(channels=(8, 16, 16, 16, 4),
                      encoder_capacities=(1024, 256, 64, 64, 64),
                      decoder_capacities=(64, 512, 1024, 1024))
        unet_ch = (4, 32, 64, 96)
    else:
        b, res, cap, pts = 4, 64, 32768, 60000
        vae_kw = dict(channels=(32, 128, 512, 512, 4),
                      encoder_capacities=(32768, 8192, 2048, 2048, 2048),
                      decoder_capacities=(2048, 8192, 32768, 131072))
        unet_ch = (4, 320, 640, 960)

    rng = np.random.RandomState(0)
    vae = mm.VAE(**vae_kw)
    latent_cap = vae_kw["encoder_capacities"][2]
    attn_max_len = max(-(-latent_cap * 3 // (2 * b) // 128) * 128, 128)
    unet = mm.UNet(channels=unet_ch, with_attn=not args.no_attn, group=32,
                   attn_max_len=attn_max_len,
                   down_capacities=(max(latent_cap // 2, 16),
                                    max(latent_cap // 4, 8),
                                    max(latent_cap // 8, 8)))
    sched = md.DDPMScheduler.create(1000, beta_schedule="scaled_linear")
    vae_scale = 0.1428

    c0, v0 = make_batch(rng, 1, b, cap, res, pts)

    def build(coords, valid):
        return mt.sparse_tensor(coords, jnp.ones((cap, 1)), capacity=cap,
                                batch_size=b, valid=valid,
                                extent=(res,) * 3)

    st0 = jax.jit(build)(c0[0], v0[0])
    vae_vars = jax.jit(vae.init)(jax.random.PRNGKey(0), st0, st0.grid,
                                 jax.random.PRNGKey(1))
    vae_vars = jax.tree.map(jax.lax.stop_gradient, vae_vars)

    def encode(st, vv):
        mean, _ = vae.apply(
            {"params": vv["params"],
             "batch_stats": vv.get("batch_stats", {})},
            st, method=vae.encode)
        return mean.with_features(
            jax.lax.stop_gradient(mean.features * vae_scale))

    lat0 = jax.jit(encode)(st0, vae_vars)
    unet_vars = jax.jit(unet.init)(
        jax.random.PRNGKey(2), lat0, jnp.zeros((b,), jnp.int32))
    nll0 = md.CoordNLLParams.create()

    def loss_of(up, vv, coords, valid, i):
        s = build(coords, valid)
        lat = encode(s, vv)

        def unet_apply(noised, timesteps, ehs):
            return unet.apply({"params": up}, noised, timesteps, ehs)

        rng_ = jax.random.fold_in(jax.random.PRNGKey(3), i)
        loss, _ = md.diffusion_training_loss(
            unet_apply, sched, lat, rng_, nll_params=nll0, resolution=res)
        return loss

    @jax.jit
    def step(uv, vv, coords, valid, i):
        loss, grads = jax.value_and_grad(loss_of)(
            uv["params"], vv, coords, valid, i)
        return loss, jax.tree.map(lambda g: jnp.sum(jnp.abs(g)), grads)

    return step, (unet_vars, vae_vars, c0[0], v0[0], jnp.int32(0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--no_attn", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--dir", default="/tmp/jaxprof_unet")
    args = ap.parse_args()
    step, inputs = build_step(args)
    profile_step(step, inputs, args.dir, args.top)


if __name__ == "__main__":
    main()
