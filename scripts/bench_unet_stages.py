"""Chain-slope stage breakdown of the diffusion (UNet) train step on TPU.

Times cumulative stages of the `examples/train_diffusion.py` step at the
reference's headline UNet size (channels 4/320/640/960, attention on the
coarse levels — `examples/diffusion.py:746-747`):
  geom       make_grid over the input cloud
  +encode    frozen VAE encode -> scaled latent
  +forward   diffusion_training_loss (noise + UNet forward + MSE/NLL)
  +backward  value_and_grad wrt the UNet params
so stage cost = difference of consecutive slopes.  Same chain protocol as
bench.py (loop-carried dependence, distinct per-step clouds; the remote
tunnel makes naive timing meaningless — docs/DESIGN.md §7).

Usage: python scripts/bench_unet_stages.py [--small] [--cpu] [--remat]
"""

import argparse
import sys
import time

import numpy as np

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
else:
    try:
        jax.devices()
    except RuntimeError as e:
        print(f"[stages] default backend unavailable ({e}); using CPU",
              file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
sys.path.insert(0, ".")

import mink_octtree_stablediffusion_tpu as mt  # noqa: E402
from mink_octtree_stablediffusion_tpu import diffusion as md  # noqa: E402
from mink_octtree_stablediffusion_tpu import models as mm  # noqa: E402

from bench_vae_step_common import make_batch  # noqa: E402  (shared fixture)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--no_attn", action="store_true",
                    help="ablation: attention share of the step")
    ap.add_argument("--bf16_params", action="store_true",
                    help="A/B bf16 parameter storage (mixed_precision_params"
                         " recipe): weights live in bf16, killing the"
                         " per-step fp32->bf16 weight casts the profiler"
                         " attributes ~40%% of the device step to")
    args = ap.parse_args()

    if args.small:
        b, res, cap, pts = 2, 16, 1024, 300
        vae_kw = dict(channels=(8, 16, 16, 16, 4),
                      encoder_capacities=(1024, 256, 64, 64, 64),
                      decoder_capacities=(64, 512, 1024, 1024))
        unet_ch = (4, 32, 64, 96)
        short, long_ = 1, 3
    else:
        b, res, cap, pts = 4, 64, 32768, 60000
        vae_kw = dict(channels=(32, 128, 512, 512, 4),
                      encoder_capacities=(32768, 8192, 2048, 2048, 2048),
                      decoder_capacities=(2048, 8192, 32768, 131072))
        unet_ch = (4, 320, 640, 960)
        short, long_ = 2, 6

    rng = np.random.RandomState(0)
    vae = mm.VAE(**vae_kw)
    latent_cap = vae_kw["encoder_capacities"][2]
    attn_max_len = max(-(-latent_cap * 3 // (2 * b) // 128) * 128, 128)
    unet = mm.UNet(channels=unet_ch, with_attn=not args.no_attn, group=32,
                   remat=args.remat, attn_max_len=attn_max_len,
                   down_capacities=(max(latent_cap // 2, 16),
                                    max(latent_cap // 4, 8),
                                    max(latent_cap // 8, 8)))
    sched = md.DDPMScheduler.create(1000, beta_schedule="scaled_linear")
    vae_scale = 0.1428

    c0, v0 = make_batch(rng, 1, b, cap, res, pts)

    def build(coords, valid):
        return mt.sparse_tensor(coords, jnp.ones((cap, 1)), capacity=cap,
                                batch_size=b, valid=valid, extent=(res,) * 3)

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
    print("unet params:", mt.utils.count_params(unet_vars["params"]),
          flush=True)
    if args.bf16_params:
        unet_vars = dict(unet_vars,
                         params=mt.train.cast_params(unet_vars["params"]))
        vae_vars = dict(vae_vars,
                        params=mt.train.cast_params(vae_vars["params"]))
        # (no lat0 recompute: lat0 was only consumed by unet.init above,
        # and the timed stages re-encode per step)
    nll0 = md.CoordNLLParams.create()

    # every variables tree travels as a jit ARGUMENT (closures would bake
    # GB-scale constants into the HLO — diffusion/module.py lesson)
    def stage_geom(uv, vv, coords, valid, i):
        s = build(coords, valid)
        return jnp.sum(s.grid.coords) * 1e-12

    def stage_encode(uv, vv, coords, valid, i):
        s = build(coords, valid)
        lat = encode(s, vv)
        return jnp.sum(lat.features)

    def loss_of(up, vv, coords, valid, i):
        s = build(coords, valid)
        lat = encode(s, vv)

        def unet_apply(noised, timesteps, ehs):
            return unet.apply({"params": up}, noised, timesteps, ehs)

        rng_ = jax.random.fold_in(jax.random.PRNGKey(3), i)
        loss, _ = md.diffusion_training_loss(
            unet_apply, sched, lat, rng_, nll_params=nll0, resolution=res)
        return loss

    def stage_forward(uv, vv, coords, valid, i):
        return loss_of(uv["params"], vv, coords, valid, i)

    def stage_backward(uv, vv, coords, valid, i):
        loss, grads = jax.value_and_grad(loss_of)(
            uv["params"], vv, coords, valid, i)
        return loss + sum(jnp.sum(g) for g in jax.tree.leaves(grads)) * 1e-12

    def timed(stage_fn, steps):
        @jax.jit
        def chain(uv, vv, coords_s, valid_s):
            def body(acc, xs):
                coords, valid, i = xs
                coords = coords + (acc.astype(jnp.int32) & 0)
                return acc + stage_fn(uv, vv, coords, valid, i), None
            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0),
                (coords_s, valid_s, jnp.arange(coords_s.shape[0])))
            return acc

        cs, vs = make_batch(np.random.RandomState(steps), steps, b, cap,
                            res, pts)
        float(chain(unet_vars, vae_vars, cs, vs))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(unet_vars, vae_vars, cs, vs))
            best = min(best, time.perf_counter() - t0)
        return best

    stages = [("geom", stage_geom), ("+encode", stage_encode),
              ("+forward", stage_forward), ("+backward", stage_backward)]
    prev = 0.0
    for name, fn in stages:
        t_s = timed(fn, short)
        t_l = timed(fn, long_)
        slope = (t_l - t_s) / (long_ - short)
        print(f"{name:10s} cumulative {slope*1e3:8.2f} ms/step   "
              f"(+{(slope-prev)*1e3:7.2f} ms)", flush=True)
        prev = slope


if __name__ == "__main__":
    main()
