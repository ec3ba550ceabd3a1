"""Two-phase generative-quality check: VAE overfit -> diffusion overfit ->
sample -> decode, with quantitative voxel-IoU metrics.

The reference validates its pipeline qualitatively (README renders,
`examples/ae_res.py:865-886` reconstruction PNGs); this script makes that a
number: overfit a small VAE on a fixed SyntheticShapes batch and report
reconstruction IoU, then overfit the latent diffusion on the frozen VAE's
latents and report generation IoU against the training shapes (an overfit
diffusion should regenerate them — the reference's own `--small_dataset`
idx%4 harness, `examples/dataset.py:182-183`, is the same idea without the
metric).

CPU smoke:
    JAX_PLATFORMS=cpu python scripts/e2e_quality.py --resolution 16 \
        --steps_vae 60 --steps_diff 60 --sample_steps 10
TPU run (defaults):
    python scripts/e2e_quality.py
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import mink_octtree_stablediffusion_tpu as mt  # noqa: E402
from mink_octtree_stablediffusion_tpu import diffusion as md  # noqa: E402
from mink_octtree_stablediffusion_tpu import models as mm  # noqa: E402
from mink_octtree_stablediffusion_tpu import train as mtrain  # noqa: E402
from mink_octtree_stablediffusion_tpu.data import (  # noqa: E402
    SyntheticShapes, collate_pointclouds)

from examples.train_vae import capacities  # noqa: E402


def voxel_sets(st, stride=1):
    """Per-instance sets of voxel tuples (host side)."""
    c = np.asarray(st.grid.coords)
    v = np.asarray(st.grid.valid)
    out = {}
    for row, ok in zip(c, v):
        if ok:
            out.setdefault(int(row[0]), set()).add(tuple(int(x) for x in row[1:]))
    return out


def iou(sets_a, sets_b):
    """Mean per-instance intersection-over-union of two voxel-set dicts."""
    vals = []
    for b in sets_a:
        a, c = sets_a[b], sets_b.get(b, set())
        u = len(a | c)
        vals.append(len(a & c) / u if u else 1.0)
    return float(np.mean(vals)) if vals else 0.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--points", type=int, default=4096,
                   help="surface samples per shape (raise with resolution "
                        "so the voxel shell is fully covered)")
    p.add_argument("--input_capacity", type=int, default=8192)
    p.add_argument("--vae_channel", type=int, nargs=5,
                   default=[16, 32, 64, 64, 4])
    p.add_argument("--unet_channel", type=int, nargs=4,
                   default=[4, 64, 128, 192])
    p.add_argument("--steps_vae", type=int, default=1500)
    p.add_argument("--steps_diff", type=int, default=2000)
    p.add_argument("--sample_steps", type=int, default=50)
    p.add_argument("--vae_scale", type=float, default=0.1428)
    p.add_argument("--lr_vae", type=float, default=1e-3)
    p.add_argument("--lr_diff", type=float, default=2e-4)
    p.add_argument("--group", type=int, default=16)
    p.add_argument("--prediction_type",
                   choices=["epsilon", "sample", "v_prediction"],
                   default="epsilon",
                   help="'sample' (x0-prediction + SNR weighting, the "
                        "reference's alternative mode, diffusion.py:487-504) "
                        "converges far faster on overfit sets: ε-prediction "
                        "must squeeze a per-voxel identity through the s1 "
                        "bottleneck (docs/DESIGN.md §9) while x0 can be "
                        "memorized per coordinate")
    p.add_argument("--diff_opt", choices=["adamw", "adafactor"],
                   default="adamw",
                   help="adafactor fits the reference-width ~1B-param UNet "
                        "in one v5e's HBM (Adam state alone is 16 GB there)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize UNet stacks in the backward pass")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--viz_dir", type=str, default=None)
    cfg = p.parse_args()

    ds = SyntheticShapes(resolution=cfg.resolution, num_samples=cfg.batch_size,
                         points_per_shape=cfg.points)
    cap, b = cfg.input_capacity, cfg.batch_size
    cpad, valid, feats, _ = collate_pointclouds(
        [ds[i]["coords"] for i in range(b)], cap)
    cpad, valid, feats = (jnp.asarray(cpad), jnp.asarray(valid),
                          jnp.asarray(feats))

    enc_caps, dec_caps = capacities(cap)
    vae = mm.VAE(channels=tuple(cfg.vae_channel),
                 encoder_capacities=enc_caps, decoder_capacities=dec_caps)
    latent_cap = enc_caps[2]

    def build(cpad, valid, feats):
        return mt.sparse_tensor(cpad, feats, capacity=cap, batch_size=b,
                                valid=valid, extent=(cfg.resolution,) * 3)

    st0 = jax.jit(build)(cpad, valid, feats)
    rng = jax.random.PRNGKey(cfg.seed)
    variables = jax.jit(vae.init)(rng, st0, st0.grid, rng)
    print("vae params:", mt.utils.count_params(variables["params"]),
          flush=True)

    # ---- phase 1: VAE overfit ----
    # cosine-anneal the VAE lr: constant-lr Adam is stable until the loss
    # floor (~bce 4e-5 here) then spikes — a step-1800 spike cost 0.55 IoU
    # vs ~1.0 in the first res-64 run; annealing to 0 pins the converged
    # params
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(mtrain.warmup_cosine(cfg.lr_vae, 20, cfg.steps_vae)))
    state = mtrain.TrainState.create(variables["params"],
                                     variables.get("batch_stats", {}), tx)

    def vae_loss_fn(params, batch_stats, batch, rng):
        st = build(*batch)
        (out_clss, targets, sout, mean, log_var, _), upd = vae.apply(
            {"params": params, "batch_stats": batch_stats}, st, st.grid, rng,
            mutable=["batch_stats"])
        loss, aux = mm.vae_loss(out_clss, targets, mean, log_var, 1e-6)
        return loss, (aux, upd["batch_stats"])

    step_fn = mtrain.make_train_step(vae_loss_fn)
    t0 = time.time()
    bce = None
    for step in range(1, cfg.steps_vae + 1):
        rng, sub = jax.random.split(rng)
        state, loss, aux = step_fn(state, (cpad, valid, feats), sub)
        if step % 100 == 0 or step == cfg.steps_vae:
            bce = float(aux["bce"])
            print(f"vae step {step} loss {float(loss):.5f} bce {bce:.5f} "
                  f"({(time.time() - t0) / step:.2f} s/step)", flush=True)
    vae_vars = {"params": state.params, "batch_stats": state.batch_stats}
    vae_vars = jax.tree.map(jax.lax.stop_gradient, vae_vars)

    @jax.jit
    def reconstruct(vv, cpad, valid, feats, rng):
        st = build(cpad, valid, feats)
        (out_clss, targets, sout, *_), _ = vae.apply(
            {"params": vv["params"], "batch_stats": vv["batch_stats"]},
            st, st.grid, rng, train=False, mutable=["batch_stats"])
        return st, sout

    st_in, st_rec = reconstruct(vae_vars, cpad, valid, feats, rng)
    rec_iou = iou(voxel_sets(st_in), voxel_sets(st_rec))
    print(f"reconstruction IoU: {rec_iou:.4f}", flush=True)

    # ---- phase 2: diffusion overfit on the frozen latents ----
    def encode(vv, st):
        mean, _ = vae.apply(
            {"params": vv["params"], "batch_stats": vv["batch_stats"]},
            st, method=vae.encode)
        return mean.with_features(
            jax.lax.stop_gradient(mean.features * cfg.vae_scale))

    lat0 = jax.jit(encode)(vae_vars, st0)
    attn_max_len = max(-(-latent_cap * 3 // (2 * b) // 128) * 128, 128)
    unet = mm.UNet(channels=tuple(cfg.unet_channel), group=cfg.group,
                   attn_max_len=attn_max_len, remat=cfg.remat,
                   down_capacities=(max(latent_cap // 2, 16),
                                    max(latent_cap // 4, 8),
                                    max(latent_cap // 8, 8)))
    sched = md.DDPMScheduler.create(prediction_type=cfg.prediction_type)
    unet_vars = jax.jit(unet.init)(rng, lat0, jnp.zeros((b,), jnp.int32))
    print("unet params:", mt.utils.count_params(unet_vars["params"]),
          flush=True)

    params0 = {"unet": unet_vars["params"], "nll": md.CoordNLLParams.create()}
    if cfg.diff_opt == "adafactor":
        tx2 = mtrain.adafactor_diffusion_optimizer(
            cfg.lr_diff, warmup_steps=100, total_steps=cfg.steps_diff)
    else:
        tx2 = mtrain.diffusion_optimizer(cfg.lr_diff, warmup_steps=100,
                                         total_steps=cfg.steps_diff)
    dstate = mtrain.TrainState.create(params0, {}, tx2)

    def diff_loss_fn(params, batch_stats, batch, rng):
        cpad, valid, feats, vv = batch
        latent = encode(vv, build(cpad, valid, feats))

        def unet_apply(noised, timesteps, ehs):
            return unet.apply({"params": params["unet"]}, noised, timesteps,
                              ehs)

        loss, aux = md.diffusion_training_loss(
            unet_apply, sched, latent, rng, nll_params=params["nll"],
            resolution=cfg.resolution,
            prediction_type=cfg.prediction_type)
        return loss, (aux, batch_stats)

    dstep_fn = mtrain.make_train_step(diff_loss_fn)
    t0 = time.time()
    for step in range(1, cfg.steps_diff + 1):
        rng, sub = jax.random.split(rng)
        dstate, loss, aux = dstep_fn(dstate, (cpad, valid, feats, vae_vars),
                                     sub)
        if step % 100 == 0 or step == cfg.steps_diff:
            print(f"diff step {step} loss {float(loss):.5f} denoise "
                  f"{float(aux['denoise_loss']):.5f} "
                  f"({(time.time() - t0) / step:.2f} s/step)", flush=True)

    # ---- phase 3: sample + decode + IoU vs the training shapes ----
    @jax.jit
    def generate(params, vv, cpad, valid, feats, rng):
        st = build(cpad, valid, feats)
        latent = encode(vv, st)

        def unet_apply(noised, timesteps, ehs):
            return unet.apply({"params": params["unet"]}, noised, timesteps,
                              ehs, train=False)

        z = md.sample_latent(unet_apply, sched, latent, rng,
                             num_inference_steps=cfg.sample_steps)
        z = z.with_features(z.features / cfg.vae_scale)
        _, _, sout = vae.apply(
            {"params": vv["params"], "batch_stats": vv["batch_stats"]},
            z, st.grid, train=False, method=vae.decode)
        return st, sout

    st_in2, st_gen = generate(dstate.params, vae_vars, cpad, valid, feats,
                              jax.random.PRNGKey(cfg.seed + 7))
    gen_iou = iou(voxel_sets(st_in2), voxel_sets(st_gen))
    print(f"generation IoU (overfit): {gen_iou:.4f}", flush=True)

    if cfg.viz_dir:
        path = mt.utils.render_pointclouds(
            [mt.utils.sparse_tensor_clouds(st_in2, 1)[0],
             mt.utils.sparse_tensor_clouds(st_rec, 1)[0],
             mt.utils.sparse_tensor_clouds(st_gen, 1)[0]],
            os.path.join(cfg.viz_dir, "e2e_quality.png"),
            titles=["data", "reconstruction", "generated"],
            resolution=cfg.resolution)
        print("render:", path, flush=True)

    print(json.dumps({"bce": bce, "reconstruction_iou": rec_iou,
                      "generation_iou": gen_iou}), flush=True)


if __name__ == "__main__":
    main()
