"""Diagnose the train-BCE vs eval-IoU gap: train the VAE, then walk the
EVAL-mode decode level by level and report, per level: candidate rows vs
capacity (growth overflow), keep count, target count, and keep∩target
recall/precision.  Run on-chip at the e2e_quality config."""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import optax  # noqa: E402

import mink_octtree_stablediffusion_tpu as mt  # noqa: E402
from mink_octtree_stablediffusion_tpu import models as mm  # noqa: E402
from mink_octtree_stablediffusion_tpu import train as mtrain  # noqa: E402
from mink_octtree_stablediffusion_tpu.data import (  # noqa: E402
    SyntheticShapes, collate_pointclouds)

from examples.train_vae import capacities  # noqa: E402
from scripts.e2e_quality import iou, voxel_sets  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--points", type=int, default=32768)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--input_capacity", type=int, default=65536)
    p.add_argument("--vae_channel", type=int, nargs=5,
                   default=[32, 128, 512, 512, 4])
    p.add_argument("--steps_vae", type=int, default=1500)
    p.add_argument("--lr_vae", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    cfg = p.parse_args()

    ds = SyntheticShapes(resolution=cfg.resolution,
                         num_samples=cfg.batch_size,
                         points_per_shape=cfg.points)
    cap, b = cfg.input_capacity, cfg.batch_size
    cpad, valid, feats, _ = collate_pointclouds(
        [ds[i]["coords"] for i in range(b)], cap)
    cpad, valid, feats = map(jnp.asarray, (cpad, valid, feats))
    print("input valid voxels:", int(np.asarray(valid).sum()), "/", cap)

    enc_caps, dec_caps = capacities(cap)
    print("enc caps:", enc_caps, "dec caps:", dec_caps)
    vae = mm.VAE(channels=tuple(cfg.vae_channel),
                 encoder_capacities=enc_caps, decoder_capacities=dec_caps)

    def build(cpad, valid, feats):
        return mt.sparse_tensor(cpad, feats, capacity=cap, batch_size=b,
                                valid=valid, extent=(cfg.resolution,) * 3)

    st0 = jax.jit(build)(cpad, valid, feats)
    rng = jax.random.PRNGKey(cfg.seed)
    variables = jax.jit(vae.init)(rng, st0, st0.grid, rng)

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
    for step in range(1, cfg.steps_vae + 1):
        rng, sub = jax.random.split(rng)
        state, loss, aux = step_fn(state, (cpad, valid, feats), sub)
        if step % 300 == 0 or step == cfg.steps_vae:
            print(f"vae step {step} bce {float(aux['bce']):.6f} "
                  f"({(time.time() - t0) / step:.2f} s/step)", flush=True)

    vv = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def eval_decode(vv, cpad, valid, feats, rng):
        st = build(cpad, valid, feats)
        (out_clss, targets, sout, mean, log_var, z) = vae.apply(
            vv, st, st.grid, rng, train=False)
        return st, out_clss, targets, sout

    st_in, out_clss, targets, sout = eval_decode(vv, cpad, valid, feats, rng)
    for lvl, (lt, tg) in enumerate(zip(out_clss, targets)):
        v = np.asarray(lt.valid)
        lo = np.asarray(lt.features[:, 0])
        t = np.asarray(tg) & v
        keep = (lo > 0) & v
        inter = keep & t
        print(f"level {lvl}: cap={lt.capacity} candidates={v.sum()} "
              f"(saturated={v.sum() >= lt.capacity}) "
              f"target={t.sum()} keep={keep.sum()} "
              f"recall={inter.sum() / max(t.sum(), 1):.4f} "
              f"precision={inter.sum() / max(keep.sum(), 1):.4f}",
              flush=True)
    rec = iou(voxel_sets(st_in), voxel_sets(sout))
    print("eval reconstruction IoU:", round(rec, 4))

    # same walk in TRAIN mode (force-keep) for contrast
    @jax.jit
    def train_decode(vv, cpad, valid, feats, rng):
        st = build(cpad, valid, feats)
        (out_clss, targets, sout, *_), _ = vae.apply(
            vv, st, st.grid, rng, train=True, mutable=["batch_stats"])
        return st, out_clss, targets, sout

    st_in2, out_clss2, targets2, sout2 = train_decode(vv, cpad, valid, feats,
                                                      rng)
    for lvl, (lt, tg) in enumerate(zip(out_clss2, targets2)):
        v = np.asarray(lt.valid)
        lo = np.asarray(lt.features[:, 0])
        t = np.asarray(tg) & v
        keep = (lo > 0) & v
        inter = keep & t
        print(f"[train-mode] level {lvl}: candidates={v.sum()} "
              f"target={t.sum()} keep={keep.sum()} "
              f"recall={inter.sum() / max(t.sum(), 1):.4f}", flush=True)
    rec2 = iou(voxel_sets(st_in2), voxel_sets(sout2))
    print("train-mode (force-keep) reconstruction IoU:", round(rec2, 4))


if __name__ == "__main__":
    main()
