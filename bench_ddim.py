"""Secondary benchmark: full 3D generation throughput — 64-step DDIM
denoising on the sparse latent + pruning-decoder re-growth, the driver
target metric "sec/sample for 64-step DDIM" (BASELINE.md: ">=10x
CPU-reference throughput per chip").

Prints ONE JSON line like bench.py.  `--tiny` shrinks the model for CPU
smoke runs.  `--measure_cpu` runs the IDENTICAL sampling program on the
host CPU once (batch 1, short step counts, linear per-step fit extrapolated
to the target step count) and records the measured baseline in
BASELINE.json under `measured.cpu_ddim64_sec_per_sample` — the number
`vs_baseline` is then derived from (VERDICT r2 item 8: no nominal
constants).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

import jax

_REPO = os.path.dirname(os.path.abspath(__file__))


def _measured_cpu_baseline(default: float = 1.0):
    """CPU-reference s/sample measured by `--measure_cpu` (see module
    docstring); falls back to the 1.0 nominal if never measured.  Returns
    ``(value, provenance)`` so the emitted vs_baseline is never mistaken
    for a measured ratio when the fallback fired (ADVICE r3)."""
    try:
        with open(os.path.join(_REPO, "BASELINE.json")) as f:
            v = float(json.load(f)["measured"]["cpu_ddim64_sec_per_sample"])
        return v, "measured"
    except Exception as e:
        print(f"[bench_ddim] WARNING: no measured CPU baseline "
              f"({e!r}); vs_baseline uses the 1.0 NOMINAL",
              file=sys.stderr)
        return default, "nominal"

def _backend_alive(timeout_s: float = 150.0) -> bool:
    """Probe in a subprocess with a hard deadline — the flaky tunnel can
    RAISE or HANG device enumeration (see bench.py)."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _probe_with_retries(attempts: int = 4, wait_s: float = 120.0) -> bool:
    for i in range(attempts):
        if _backend_alive():
            return True
        if i + 1 < attempts:
            print(f"[bench_ddim] backend probe {i + 1}/{attempts} failed; "
                  f"retrying in {wait_s:.0f}s", file=sys.stderr)
            time.sleep(wait_s)
    return False


if "--measure_cpu" in sys.argv:
    # the CPU-reference measurement never needs the device tunnel
    jax.config.update("jax_platforms", "cpu")
elif not _probe_with_retries():
    print("[bench_ddim] default backend unavailable (raise or hang); "
          "using CPU", file=sys.stderr)
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp  # noqa: E402

import mink_octtree_stablediffusion_tpu as mt  # noqa: E402
from mink_octtree_stablediffusion_tpu import diffusion as md  # noqa: E402
from mink_octtree_stablediffusion_tpu import models as mm  # noqa: E402
from mink_octtree_stablediffusion_tpu.data import (  # noqa: E402
    SyntheticShapes, collate_pointclouds)

def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--measure_cpu", action="store_true",
                   help="measure the CPU-reference s/sample for this exact "
                        "program (batch 1, linear step fit) and record it "
                        "in BASELINE.json")
    args = p.parse_args()
    if args.measure_cpu:
        args.batch = 1

    if args.tiny:
        res, cap, vch, uch, group = 32, 4096, (8, 16, 32, 32, 4), \
            (4, 8, 16, 16), 4
    else:
        # capacity scales with batch (16k voxels/sample at res 128) so
        # per-sample workload is batch-invariant; larger batches amortize
        # the per-step kernel/dispatch overhead of the tiny latent grids
        res, cap = 128, 16384 * args.batch
        vch, uch, group = (32, 128, 512, 512, 4), (4, 320, 640, 960), 32

    enc_caps = tuple(max(cap // (8 ** i), 64) for i in range(1, 4)) + \
        (max(cap // 512, 64),) * 2
    dec_caps = tuple(min(max(cap // (8 ** (3 - i)), 64), cap)
                     for i in range(4))
    latent_cap = enc_caps[2]
    b = args.batch

    vae = mm.VAE(channels=vch, encoder_capacities=enc_caps,
                 decoder_capacities=dec_caps)
    unet = mm.UNet(channels=uch, group=group,
                   down_capacities=(max(latent_cap // 2, 16),
                                    max(latent_cap // 4, 8),
                                    max(latent_cap // 8, 8)))
    sched = md.DDIMScheduler.create()

    ds = SyntheticShapes(resolution=res, num_samples=b,
                         points_per_shape=min(4096, res ** 2))
    cpad, valid, _, _ = collate_pointclouds(
        [ds[i]["coords"] for i in range(b)], cap)

    def build(cpad, valid):
        feats = jnp.ones((cap, 1)) * valid[:, None]
        return mt.sparse_tensor(cpad, feats, capacity=cap, batch_size=b,
                                valid=valid, extent=(res,) * 3)

    st0 = build(jnp.asarray(cpad), jnp.asarray(valid))
    rng = jax.random.PRNGKey(0)
    vae_vars = jax.jit(vae.init)(rng, st0, st0.grid, rng)

    def encode(st):
        mean, _ = vae.apply(vae_vars, st, method=vae.encode)
        return mean.with_features(mean.features * 0.1428)

    latent = jax.jit(encode)(st0)
    unet_vars = jax.jit(unet.init)(rng, latent, jnp.zeros((b,), jnp.int32))

    def make_sample(steps):
        @jax.jit
        def sample(uv, vv, latent, key):
            def unet_apply(noised, timesteps, ehs):
                return unet.apply(uv, noised, timesteps, ehs, train=False)

            z = md.sample_latent(unet_apply, sched, latent, key,
                                 num_inference_steps=steps)
            z = z.with_features(z.features / 0.1428)
            _, _, sout = vae.apply(vv, z, st0.grid, train=False,
                                   method=vae.decode)
            return sout.features

        return sample

    if args.measure_cpu:
        # per-step cost is constant in the step count, so two short runs
        # give the line sec(steps) = a*steps + c exactly; extrapolating to
        # the target step count avoids an hour-long 64-step CPU run
        times = {}
        for s in (4, 8):
            fn = make_sample(s)
            out = fn(unet_vars, vae_vars, latent, jax.random.PRNGKey(1))
            jax.block_until_ready(out)  # compile
            t0 = time.perf_counter()
            out = fn(unet_vars, vae_vars, latent, jax.random.PRNGKey(2))
            float(jnp.sum(out))
            times[s] = time.perf_counter() - t0
            print(f"[measure_cpu] {s}-step sample: {times[s]:.1f}s",
                  file=sys.stderr)
        a = (times[8] - times[4]) / 4.0
        c = times[4] - 4.0 * a
        sec = (a * args.steps + c) / b
        path = os.path.join(_REPO, "BASELINE.json")
        with open(path) as f:
            base = json.load(f)
        base.setdefault("measured", {})
        base["measured"]["cpu_ddim64_sec_per_sample"] = round(sec, 3)
        base["measured"]["cpu_ddim64_provenance"] = (
            f"bench_ddim.py --measure_cpu: identical sampling program on "
            f"host CPU, batch 1, per-step fit from 4/8-step runs "
            f"({times[4]:.1f}s/{times[8]:.1f}s), extrapolated to "
            f"{args.steps} steps")
        with open(path, "w") as f:
            json.dump(base, f, indent=2)
        print(json.dumps({
            "metric": f"cpu_reference_ddim{args.steps}_sec_per_sample",
            "value": round(sec, 3),
            "unit": "sec/sample",
            "vs_baseline": 1.0,
        }))
        return

    sample = make_sample(args.steps)
    out = sample(unet_vars, vae_vars, latent, jax.random.PRNGKey(1))
    jax.block_until_ready(out)  # compile
    iters = 3
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(iters):
        out = sample(unet_vars, vae_vars, latent, jax.random.PRNGKey(2 + i))
        acc += float(jnp.sum(out))  # value fetch: force real completion
    sec_per_sample = (time.perf_counter() - t0) / iters / b

    baseline, baseline_kind = _measured_cpu_baseline()
    rec = {
        "metric": f"ddim{args.steps}_generation_sec_per_sample",
        "value": round(sec_per_sample, 4),
        "unit": "sec/sample",
        "vs_baseline": round(baseline / sec_per_sample, 3),
        "baseline": baseline_kind,
    }
    mfu = _sampling_mfu(unet, unet_vars, vae, vae_vars, latent, st0,
                        args.steps, sec_per_sample * b)
    if mfu is not None:
        rec.update(mfu)
    print(json.dumps(rec))


def _sampling_mfu(unet, unet_vars, vae, vae_vars, latent, st0, steps,
                  sec_per_batch):
    """Roofline accounting for the sampling program (VERDICT r3 item 5):
    FLOPs of ONE UNet denoise application + the final pruning decode,
    counted by XLA's own cost model on the CPU lowering of the identical
    computation with the Pallas fused-conv path disabled — the XLA
    fallback executes the same capacity-padded gather-GEMMs, so the count
    is the algorithmic MXU work (exact where buffers run full, an upper
    bound where they carry headroom).  MFU is judged against the v5e
    bf16 peak (197 TFLOP/s)."""
    import mink_octtree_stablediffusion_tpu.ops.onehot_conv as oh

    old = oh._ENABLED
    try:
        oh._ENABLED = False
        cpu = jax.devices("cpu")[0]
        b = latent.batch_size

        def unet_step(uv, lat, t):
            return unet.apply(uv, lat, t, train=False).features

        def decode(vv, z):
            _, _, sout = vae.apply(vv, z, st0.grid, train=False,
                                   method=vae.decode)
            return sout.features

        with jax.default_device(cpu):
            f_step = jax.jit(unet_step).lower(
                unet_vars, latent,
                jnp.zeros((b,), jnp.int32)).compile().cost_analysis()
            f_dec = jax.jit(decode).lower(
                vae_vars, latent).compile().cost_analysis()
        total = steps * float(f_step.get("flops", 0.0)) + \
            float(f_dec.get("flops", 0.0))
        if total <= 0:
            return None
        tflops = total / sec_per_batch / 1e12
        return {
            "achieved_tflops": round(tflops, 3),
            "mfu_bf16_peak": round(tflops * 1e12 / 197e12, 5),
            "flops_per_batch": total,
        }
    except Exception as e:
        print(f"[bench_ddim] MFU accounting skipped: {e!r}",
              file=sys.stderr)
        return None
    finally:
        oh._ENABLED = old


if __name__ == "__main__":
    main()
