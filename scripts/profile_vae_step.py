"""On-chip profile of the VAE train step — per-op attribution.

Same workload as `scripts/bench_vae_stages.py` (headline: batch 4, res 64,
32k cap, reference channels), one compiled value_and_grad step traced with
`jax.profiler.trace`, device-plane ops aggregated by framework stage.

Usage: python scripts/profile_vae_step.py [--small] [--top N]
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
from mink_octtree_stablediffusion_tpu import models as mm  # noqa: E402

from bench_vae_step_common import make_batch  # noqa: E402
from profile_common import profile_step  # noqa: E402


def build_step(args):
    if args.small:
        b, res, cap, pts = 2, 16, 1024, 300
        kw = dict(channels=(8, 16, 16, 16, 4),
                  encoder_capacities=(1024, 256, 64, 64, 64),
                  decoder_capacities=(64, 512, 1024, 1024))
    else:
        b, res, cap, pts = 4, 64, 32768, 60000
        kw = dict(channels=(32, 128, 512, 512, 4),
                  encoder_capacities=(32768, 8192, 2048, 2048, 2048),
                  decoder_capacities=(2048, 8192, 32768, 131072))

    rng = np.random.RandomState(0)
    vae = mm.VAE(**kw)
    c0, v0 = make_batch(rng, 1, b, cap, res, pts)

    def build(coords, valid):
        return mt.sparse_tensor(coords, jnp.ones((cap, 1)), capacity=cap,
                                batch_size=b, valid=valid, extent=(res,) * 3)

    st0 = jax.jit(build)(c0[0], v0[0])
    variables = jax.jit(vae.init)(jax.random.PRNGKey(0), st0, st0.grid,
                                  jax.random.PRNGKey(1))

    def loss_of(p, bs, coords, valid, i):
        s = build(coords, valid)
        rng_ = jax.random.fold_in(jax.random.PRNGKey(2), i)
        (out_clss, targets, _, mean, log_var, _), _ = vae.apply(
            {"params": p, "batch_stats": bs},
            s, s.grid, rng_, mutable=["batch_stats"])
        return mm.vae_loss(out_clss, targets, mean, log_var)[0]

    @jax.jit
    def step(v, coords, valid, i):
        loss, grads = jax.value_and_grad(loss_of)(
            v["params"], v["batch_stats"], coords, valid, i)
        return loss, jax.tree.map(lambda g: jnp.sum(jnp.abs(g)), grads)

    return step, (variables, c0[0], v0[0], jnp.int32(0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--dir", default="/tmp/jaxprof_vae")
    args = ap.parse_args()
    step, inputs = build_step(args)
    profile_step(step, inputs, args.dir, args.top)


if __name__ == "__main__":
    main()
