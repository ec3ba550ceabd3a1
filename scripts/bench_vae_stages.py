"""Chain-slope stage breakdown of the VAE train step on TPU.

Times cumulative stages of `scripts/bench_vae_step.py`'s workload:
  geom       make_grid over the input cloud
  +encoder   encoder forward (mean head summed)
  +forward   full forward + BCE/KLD loss
  +backward  value_and_grad (the full step minus the Adam update)
so stage cost = difference of consecutive slopes.  Same chain protocol as
bench.py (loop-carried dependence, distinct per-step clouds).

Usage: python scripts/bench_vae_stages.py [--small] [--cpu]
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
from mink_octtree_stablediffusion_tpu import models as mm  # noqa: E402

from bench_vae_step_common import make_batch  # noqa: E402  (shared fixture)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--res128", action="store_true",
                    help="the e2e res-128 headline workload "
                         "(scripts/e2e_quality.py --resolution 128)")
    ap.add_argument("--caps", type=int, nargs="*", default=None,
                    help="override encoder+decoder capacities as "
                         "enc0..enc4 dec0..dec3 (9 ints) — for measured-"
                         "occupancy tuning (utils.capacity_report)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.small:
        b, res, cap, pts = 2, 16, 1024, 300
        kw = dict(channels=(8, 16, 16, 16, 4),
                  encoder_capacities=(1024, 256, 64, 64, 64),
                  decoder_capacities=(64, 512, 1024, 1024))
        short, long_ = 1, 3
    elif args.res128:
        # the RESULTS §1 res-128 run: capacities(262144) from
        # examples/train_vae.py
        b, res, cap, pts = 4, 128, 262144, 250000
        kw = dict(channels=(32, 128, 512, 512, 4),
                  encoder_capacities=(131072, 65536, 16384, 16384, 16384),
                  decoder_capacities=(16384, 65536, 131072, 524288))
        short, long_ = 1, 3
    else:
        b, res, cap, pts = 4, 64, 32768, 60000
        kw = dict(channels=(32, 128, 512, 512, 4),
                  encoder_capacities=(32768, 8192, 2048, 2048, 2048),
                  decoder_capacities=(2048, 8192, 32768, 131072))
        short, long_ = 2, 6
    if args.caps:
        assert len(args.caps) == 9, "--caps wants enc0..enc4 dec0..dec3"
        kw["encoder_capacities"] = tuple(args.caps[:5])
        kw["decoder_capacities"] = tuple(args.caps[5:])

    rng = np.random.RandomState(0)
    vae = mm.VAE(**kw)

    c0, v0 = make_batch(rng, 1, b, cap, res, pts)
    st0 = jax.jit(lambda c, v: mt.sparse_tensor(
        c, jnp.ones((cap, 1)), capacity=cap, batch_size=b, valid=v,
        extent=(res,) * 3))(c0[0], v0[0])
    variables = jax.jit(vae.init)(jax.random.PRNGKey(0), st0, st0.grid,
                                  jax.random.PRNGKey(1))

    def build(coords, valid):
        return mt.sparse_tensor(coords, jnp.ones((cap, 1)), capacity=cap,
                                batch_size=b, valid=valid, extent=(res,) * 3)

    # variables travel as jit ARGUMENTS — closing over them would bake
    # 70M-param constants into the HLO and blow the remote-compile request
    # limit (same lesson as the frozen-VAE fix in diffusion/module.py)
    def stage_geom(v, coords, valid, i):
        s = build(coords, valid)
        return jnp.sum(s.grid.coords) * 1e-12

    def stage_encoder(v, coords, valid, i):
        s = build(coords, valid)
        mean, log_var = vae.apply(v, s, method=vae.encode)
        return jnp.sum(mean.features) + jnp.sum(log_var.features)

    def loss_of(p, bs, coords, valid, i):
        s = build(coords, valid)
        rng_ = jax.random.fold_in(jax.random.PRNGKey(2), i)
        (out_clss, targets, _, mean, log_var, _), _ = vae.apply(
            {"params": p, "batch_stats": bs},
            s, s.grid, rng_, mutable=["batch_stats"])
        return mm.vae_loss(out_clss, targets, mean, log_var)[0]

    def stage_forward(v, coords, valid, i):
        return loss_of(v["params"], v["batch_stats"], coords, valid, i)

    def stage_backward(v, coords, valid, i):
        loss, grads = jax.value_and_grad(loss_of)(
            v["params"], v["batch_stats"], coords, valid, i)
        return loss + sum(jnp.sum(g) for g in jax.tree.leaves(grads)) * 1e-12

    def timed(stage_fn, steps):
        @jax.jit
        def chain(v, coords_s, valid_s):
            def body(acc, xs):
                coords, valid, i = xs
                # loop-carried dependence: shift coords by a data-dependent
                # zero so steps cannot be reordered/memoized
                coords = coords + (acc.astype(jnp.int32) & 0)
                return acc + stage_fn(v, coords, valid, i), None
            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0),
                (coords_s, valid_s, jnp.arange(coords_s.shape[0])))
            return acc

        cs, vs = make_batch(np.random.RandomState(steps), steps, b, cap,
                            res, pts)
        float(chain(variables, cs, vs))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(variables, cs, vs))
            best = min(best, time.perf_counter() - t0)
        return best

    stages = [("geom", stage_geom), ("+encoder", stage_encoder),
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
