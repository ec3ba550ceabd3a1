"""Chain-slope end-to-end VAE TRAIN-STEP benchmark on TPU.

One step = geometry build (make_grid over fresh per-step coordinates) +
full octree-VAE forward (encode -> reparameterize -> pruning decode with
per-level membership targets) + BCE/KLD loss + backward + Adam update —
the whole `VaeModule.training_step` (`examples/ae_res.py:817-848`) as one
jitted scan body.  Steps are chained in `lax.scan` with the Adam state as
the carry and DISTINCT per-step coordinates, so per-step time is the slope
between a short and a long chain (cancels tunnel dispatch latency; see
docs/DESIGN.md §7).

Workload: reference channels (32,128,512,512,4) (`diffusion.py:746`),
batch 4 ModelNet40-like shells at resolution 64, 32k input capacity
(70.2M params).  Measured: 211.8 ms/step on v5e.

Usage: python scripts/bench_vae_step.py [--small]
"""

import argparse
import json
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
        print(f"[bench_vae_step] default backend unavailable ({e}); "
              "using CPU", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
sys.path.insert(0, ".")

import mink_octtree_stablediffusion_tpu as mt  # noqa: E402
from mink_octtree_stablediffusion_tpu import models as mm  # noqa: E402
from mink_octtree_stablediffusion_tpu import train as mtr  # noqa: E402

from bench_vae_step_common import make_batch  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="tiny config (CPU smoke)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (handled pre-parse)")
    args = ap.parse_args()

    if args.small:
        b, res, cap, pts = 2, 16, 1024, 300
        kw = dict(channels=(8, 16, 16, 16, 4),
                  encoder_capacities=(1024, 256, 64, 64, 64),
                  decoder_capacities=(64, 512, 1024, 1024))
        short, long_ = 1, 3
    else:
        b, res, cap, pts = 4, 64, 32768, 60000
        kw = dict(channels=(32, 128, 512, 512, 4),
                  encoder_capacities=(32768, 8192, 2048, 2048, 2048),
                  decoder_capacities=(2048, 8192, 32768, 131072))
        short, long_ = 2, 6

    rng = np.random.RandomState(0)
    vae = mm.VAE(**kw)
    tx = mtr.vae_optimizer(1e-3)

    c0, v0 = make_batch(rng, 1, b, cap, res, pts)
    st0 = jax.jit(lambda c, v: mt.sparse_tensor(
        c, jnp.ones((cap, 1)), capacity=cap, batch_size=b, valid=v,
        extent=(res,) * 3))(c0[0], v0[0])
    print("[bench_vae_step] init...", file=sys.stderr)
    variables = jax.jit(vae.init)(jax.random.PRNGKey(0), st0, st0.grid,
                                  jax.random.PRNGKey(1))
    params, bstats = variables["params"], variables.get("batch_stats", {})
    n_par = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"[bench_vae_step] params: {n_par/1e6:.1f}M", file=sys.stderr)

    def loss_fn(p, bs, coords, valid, rng_):
        s = mt.sparse_tensor(coords, jnp.ones((cap, 1)), capacity=cap,
                             batch_size=b, valid=valid, extent=(res,) * 3)
        (out_clss, targets, _, mean, log_var, _), new_bs = vae.apply(
            {"params": p, "batch_stats": bs}, s, s.grid, rng_,
            mutable=["batch_stats"])
        loss, aux = mm.vae_loss(out_clss, targets, mean, log_var)
        return loss, new_bs

    @jax.jit
    def chain(params, bstats, opt_state, coords_s, valid_s):
        def body(carry, xs):
            p, bs, os = carry
            coords, valid, i = xs
            rng_ = jax.random.fold_in(jax.random.PRNGKey(2), i)
            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p, bs["batch_stats"], coords, valid,
                                       rng_)
            upd, os = tx.update(grads, os, p)
            p = jax.tree.map(lambda a, u: a + u, p, upd)
            return (p, {"batch_stats": new_bs["batch_stats"]}, os), loss
        (p, bs, os), losses = jax.lax.scan(
            body, (params, bstats, opt_state),
            (coords_s, valid_s, jnp.arange(coords_s.shape[0])))
        return losses

    opt_state = jax.jit(tx.init)(params)
    bs_w = {"batch_stats": bstats}

    def timed(steps):
        cs, vs = make_batch(np.random.RandomState(steps), steps, b, cap,
                            res, pts)
        out = chain(params, bs_w, opt_state, cs, vs)
        np.asarray(out)  # compile+run
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(chain(params, bs_w, opt_state, cs, vs))
            best = min(best, time.perf_counter() - t0)
        return best

    t_s = timed(short)
    t_l = timed(long_)
    per_step = (t_l - t_s) / (long_ - short)
    print(f"[bench_vae_step] chain {short}: {t_s*1e3:.1f} ms, "
          f"chain {long_}: {t_l*1e3:.1f} ms", file=sys.stderr)
    print(json.dumps({
        "metric": "vae_train_step_ms",
        "value": round(per_step * 1e3, 2),
        "unit": f"ms/step (batch {b}, res {res}, cap {cap})",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
