"""Attribute the `bench_vae_stages --res128` remote-tunnel stall.

Phase A (safe, CPU): lower the exact chain programs bench_vae_stages
builds at the res-64 (known-good) and res-128 (stalling) workloads and
compare serialized-HLO byte sizes — if the res-128 program crosses a
protobuf/gRPC message bound, the axon remote-compile RPC is the suspect
(the same failure class as the "closing over variables bakes 70M params
into the HLO" lesson in diffusion/module.py).

Phase B (live, opt-in via --live): run each stage chain on the real
backend one at a time with a wall-clock watchdog, printing progress
before each compile/execute so the stalling stage is identified even if
the process must be killed externally; after each stage, a trivial
device op verifies the tunnel is still alive.

Usage:
  python scripts/probe_stall.py            # phase A only (CPU)
  python scripts/probe_stall.py --live     # phase B on the default backend
"""

import argparse
import sys
import time

import numpy as np

import jax

if "--live" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import mink_octtree_stablediffusion_tpu as mt  # noqa: E402
from mink_octtree_stablediffusion_tpu import models as mm  # noqa: E402

from bench_vae_step_common import make_batch  # noqa: E402


CONFIGS = {
    "res64": dict(b=4, res=64, cap=32768, pts=60000,
                  kw=dict(channels=(32, 128, 512, 512, 4),
                          encoder_capacities=(32768, 8192, 2048, 2048, 2048),
                          decoder_capacities=(2048, 8192, 32768, 131072))),
    "res128": dict(b=4, res=128, cap=262144, pts=250000,
                   kw=dict(channels=(32, 128, 512, 512, 4),
                           encoder_capacities=(131072, 65536, 16384, 16384,
                                               16384),
                           decoder_capacities=(16384, 65536, 131072,
                                               524288))),
}


def build_stages(cfg):
    b, res, cap = cfg["b"], cfg["res"], cfg["cap"]
    vae = mm.VAE(**cfg["kw"])
    rng = np.random.RandomState(0)
    c0, v0 = make_batch(rng, 1, b, cap, res, cfg["pts"])
    st0 = jax.jit(lambda c, v: mt.sparse_tensor(
        c, jnp.ones((cap, 1)), capacity=cap, batch_size=b, valid=v,
        extent=(res,) * 3))(c0[0], v0[0])
    variables = jax.jit(vae.init)(jax.random.PRNGKey(0), st0, st0.grid,
                                  jax.random.PRNGKey(1))

    def build(coords, valid):
        return mt.sparse_tensor(coords, jnp.ones((cap, 1)), capacity=cap,
                                batch_size=b, valid=valid, extent=(res,) * 3)

    def loss_of(p, bs, coords, valid, i):
        s = build(coords, valid)
        rng_ = jax.random.fold_in(jax.random.PRNGKey(2), i)
        (out_clss, targets, _, mean, log_var, _), _ = vae.apply(
            {"params": p, "batch_stats": bs},
            s, s.grid, rng_, mutable=["batch_stats"])
        return mm.vae_loss(out_clss, targets, mean, log_var)[0]

    def stage_geom(v, coords, valid, i):
        s = build(coords, valid)
        return jnp.sum(s.grid.coords) * 1e-12

    def stage_encoder(v, coords, valid, i):
        s = build(coords, valid)
        mean, log_var = vae.apply(v, s, method=vae.encode)
        return jnp.sum(mean.features) + jnp.sum(log_var.features)

    def stage_forward(v, coords, valid, i):
        return loss_of(v["params"], v["batch_stats"], coords, valid, i)

    def stage_backward(v, coords, valid, i):
        loss, grads = jax.value_and_grad(loss_of)(
            v["params"], v["batch_stats"], coords, valid, i)
        return loss + sum(jnp.sum(g) for g in jax.tree.leaves(grads)) * 1e-12

    def chain_of(stage_fn, steps):
        def chain(v, coords_s, valid_s):
            def body(acc, xs):
                coords, valid, i = xs
                coords = coords + (acc.astype(jnp.int32) & 0)
                return acc + stage_fn(v, coords, valid, i), None
            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0),
                (coords_s, valid_s, jnp.arange(coords_s.shape[0])))
            return acc
        return chain

    return vae, variables, chain_of, [
        ("geom", stage_geom), ("+encoder", stage_encoder),
        ("+forward", stage_forward), ("+backward", stage_backward)]


def phase_a():
    for name, cfg in CONFIGS.items():
        _, variables, chain_of, stages = build_stages(cfg)
        cs = jax.ShapeDtypeStruct((3, cfg["cap"], 4), jnp.int32)
        vs = jax.ShapeDtypeStruct((3, cfg["cap"]), jnp.bool_)
        for sname, fn in stages:
            t0 = time.perf_counter()
            lowered = jax.jit(chain_of(fn, 3)).lower(variables, cs, vs)
            hlo = lowered.compiler_ir("hlo").as_serialized_hlo_module_proto()
            t1 = time.perf_counter()
            print(f"[A] {name:7s} {sname:10s} serialized HLO "
                  f"{len(hlo)/1e6:9.2f} MB   lower {t1-t0:6.1f} s",
                  flush=True)


def phase_b():
    print(f"[B] backend: {jax.devices()}", flush=True)
    for name in ("res64", "res128"):
        cfg = CONFIGS[name]
        _, variables, chain_of, stages = build_stages(cfg)
        for steps in (1, 3):
            cs, vs = make_batch(np.random.RandomState(steps), steps,
                                cfg["b"], cfg["cap"], cfg["res"],
                                cfg["pts"])
            for sname, fn in stages:
                print(f"[B] {name} {sname} steps={steps}: compiling+running",
                      flush=True)
                t0 = time.perf_counter()
                out = float(jax.jit(chain_of(fn, steps))(variables, cs, vs))
                t1 = time.perf_counter()
                print(f"[B] {name} {sname} steps={steps}: OK "
                      f"{t1-t0:6.1f} s (out={out:.3g})", flush=True)
                # tunnel health check
                assert float(jnp.sum(jnp.ones(8))) == 8.0
                print("[B] tunnel alive", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--live", action="store_true")
    args = ap.parse_args()
    if args.live:
        phase_b()
    else:
        phase_a()
