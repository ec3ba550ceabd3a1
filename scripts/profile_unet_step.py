"""On-chip profile of the diffusion (UNet) train step — per-op attribution.

Runs one compiled train step (same workload as `bench_unet_stages.py`) under
`jax.profiler.trace` and aggregates the device-side "XLA Ops" events from the
emitted trace.json.gz, attributing time to framework stages via the HLO
metadata op_name paths.  This is ground truth where chain-slope microbenches
are noise-limited (sub-ms layers).

Usage: python scripts/profile_unet_step.py [--small] [--no_attn] [--top N]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

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


STAGES = (
    ("attention", re.compile(r"Attention|attention|softmax|dot_general.*attn")),
    ("norm", re.compile(r"Norm|norm_|instance|group_norm")),
    ("fused_conv", re.compile(r"pallas|onehot|fused")),
    ("convgather", re.compile(r"gather|take|dynamic_slice")),
    ("scatter", re.compile(r"scatter|add_any|segment")),
    ("sort", re.compile(r"sort")),
    ("matmul", re.compile(r"dot_general|einsum|conv_general")),
)


def classify(op_name: str) -> str:
    for tag, pat in STAGES:
        if pat.search(op_name):
            return tag
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--no_attn", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--dir", default="/tmp/jaxprof_unet")
    args = ap.parse_args()

    step, inputs = build_step(args)
    out = step(*inputs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = step(*inputs)
    jax.block_until_ready(out)
    print(f"wall (async, tunnel-polluted): {time.perf_counter()-t0:.3f}s",
          flush=True)

    os.system(f"rm -rf {args.dir}")
    with jax.profiler.trace(args.dir):
        out = step(*inputs)
        jax.block_until_ready(out)

    traces = glob.glob(f"{args.dir}/plugins/profile/*/*.trace.json.gz")
    assert traces, "no trace emitted"
    d = json.load(gzip.open(sorted(traces)[-1]))
    evs = d.get("traceEvents", [])
    # find the device pid and its "XLA Ops" tid
    dev_pid = None
    ops_tid = None
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "TPU" in e.get("args", {}).get("name", ""):
                dev_pid = e["pid"]
    for e in evs:
        if (e.get("ph") == "M" and e.get("pid") == dev_pid and
                e.get("name") == "thread_name" and
                e.get("args", {}).get("name") == "XLA Ops"):
            ops_tid = e.get("tid")
    assert dev_pid is not None and ops_tid is not None, "no device plane"

    per_op = collections.Counter()
    per_stage = collections.Counter()
    counts = collections.Counter()
    total = 0.0
    for e in evs:
        if (e.get("ph") == "X" and e.get("pid") == dev_pid and
                e.get("tid") == ops_tid):
            arg = e.get("args", {})
            # HLO metadata path: the jaxpr source path of the op
            name = arg.get("tf_op") or arg.get("long_name") or e["name"]
            dur = e.get("dur", 0.0)  # microseconds
            total += dur
            key = name if name != e["name"] else e["name"]
            per_op[key] += dur
            counts[key] += 1
            per_stage[classify(key)] += dur
    print(f"\ndevice total: {total/1e3:.2f} ms over "
          f"{sum(counts.values())} op executions")
    print("\n=== by stage class ===")
    for k, v in per_stage.most_common():
        print(f"  {k:12s} {v/1e3:9.2f} ms  ({100*v/max(total,1e-9):.1f}%)")
    print(f"\n=== top {args.top} ops ===")
    for k, v in per_op.most_common(args.top):
        print(f"  {v/1e3:9.3f} ms  x{counts[k]:<5d} {k[:140]}")


if __name__ == "__main__":
    main()
