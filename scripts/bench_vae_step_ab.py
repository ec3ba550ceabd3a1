"""Direct A/B of the res-128 VAE train-step time under two capacity
schedules (VERDICT r2 item 7).

Unlike `bench_vae_stages` (whole-chain lax.scan — its res-128 program
stalls the remote tunnel), this uses the proven e2e protocol: an ordinary
jitted train step in a Python loop with distinct per-step batches; each
step's host fetch of the loss serializes the chain, so steady-state
wall/step is honest under the tunnel.

Usage:
    python scripts/bench_vae_step_ab.py --res128            # default caps
    python scripts/bench_vae_step_ab.py --res128 --caps ... # measured caps
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import mink_octtree_stablediffusion_tpu as mt  # noqa: E402
from mink_octtree_stablediffusion_tpu import models as mm  # noqa: E402
from mink_octtree_stablediffusion_tpu import train as mtrain  # noqa: E402

from bench_vae_step_common import shell_cloud  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res128", action="store_true")
    ap.add_argument("--caps", type=int, nargs="*", default=None)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    if args.res128:
        b, res, cap, pts = 4, 128, 262144, 250000
        enc = (131072, 65536, 16384, 16384, 16384)
        dec = (16384, 65536, 131072, 524288)
    else:
        b, res, cap, pts = 4, 64, 65536, 60000
        enc = (32768, 16384, 4096, 4096, 4096)
        dec = (4096, 16384, 32768, 131072)
    if args.caps:
        assert len(args.caps) == 9
        enc, dec = tuple(args.caps[:5]), tuple(args.caps[5:])
        # the input buffer also shrinks to the measured budget
        cap = max(dec[-1] // 2, enc[0] * 2)
    print(f"caps: input {cap} enc {enc} dec {dec}", flush=True)

    rng = np.random.RandomState(0)

    def batch(i):
        r = np.random.RandomState(1000 + i)
        vox = [shell_cloud(r, pts, res) for _ in range(b)]
        coords = mt.ops.batched_coordinates_np(vox)
        cpad, vpad = mt.ops.pad_to_capacity(coords, cap)
        return jnp.asarray(cpad), jnp.asarray(vpad)

    vae = mm.VAE(channels=(32, 128, 512, 512, 4), encoder_capacities=enc,
                 decoder_capacities=dec)

    def build(cpad, vpad):
        feats = jnp.ones((cap, 1)) * vpad[:, None]
        return mt.sparse_tensor(cpad, feats, capacity=cap, batch_size=b,
                                valid=vpad, extent=(res,) * 3)

    c0, v0 = batch(0)
    st0 = jax.jit(build)(c0, v0)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(vae.init)(key, st0, st0.grid, key)
    print("params:", mt.utils.count_params(variables["params"]), flush=True)
    tx = optax.adam(1e-3)
    state = mtrain.TrainState.create(variables["params"],
                                     variables.get("batch_stats", {}), tx)

    def loss_fn(params, batch_stats, bt, rng):
        st = build(*bt)
        (clss, tgts, sout, mean, log_var, _), upd = vae.apply(
            {"params": params, "batch_stats": batch_stats}, st, st.grid, rng,
            mutable=["batch_stats"])
        loss, aux = mm.vae_loss(clss, tgts, mean, log_var, 1e-6)
        return loss, (aux, upd["batch_stats"])

    step_fn = mtrain.make_train_step(loss_fn)
    # pre-generate host batches so step timing excludes cloud synthesis
    batches = [batch(i) for i in range(8)]
    times = []
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, loss, _ = step_fn(state, batches[i % 8], sub)
        loss = float(loss)  # serialize the chain
        times.append(time.perf_counter() - t0)
        if i % 10 == 0:
            print(f"step {i} loss {loss:.4f} {times[-1]:.3f}s", flush=True)
    steady = sorted(times[5:])
    med = steady[len(steady) // 2]
    print(f"median steady-state step: {med * 1e3:.1f} ms "
          f"(min {min(steady) * 1e3:.1f}, p90 "
          f"{steady[int(len(steady) * 0.9)] * 1e3:.1f})", flush=True)


if __name__ == "__main__":
    main()
