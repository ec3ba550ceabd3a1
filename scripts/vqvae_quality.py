"""VQ-VAE to a metric (VERDICT r2 item 5): reconstruction IoU + codebook
health (perplexity, active-code fraction) + the straight-through losses.

Two protocols, mirroring the VAE quality scripts:
  default      overfit a fixed SyntheticShapes batch (the reference's
               `--small_dataset` harness, `examples/dataset.py:182-183`)
               and report EVAL-mode reconstruction IoU;
  --generalize train on the ProceduralShapes distribution and report
               HELD-OUT reconstruction IoU on the val split.
Matches `examples/VQVae_res.py:708-867` (codebook, straight-through,
commitment losses, pruning decoder).

CPU smoke:
    JAX_PLATFORMS=cpu python scripts/vqvae_quality.py --resolution 16 \
        --points 512 --input_capacity 1024 --steps 40
TPU overfit run:
    python scripts/vqvae_quality.py --resolution 64 --points 32768 \
        --input_capacity 65536 --vae_channel 32 128 512 512 4 --steps 2000
"""

import argparse
import json
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
from mink_octtree_stablediffusion_tpu.data import (  # noqa: E402
    ProceduralShapes, SyntheticShapes, collate_pointclouds)

from examples.train_vae import capacities  # noqa: E402
from e2e_generalize import mean_iou, voxel_sets  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--points", type=int, default=4096)
    p.add_argument("--input_capacity", type=int, default=8192)
    p.add_argument("--vae_channel", type=int, nargs=5,
                   default=[16, 32, 64, 64, 4])
    p.add_argument("--num_embeddings", type=int, default=512)
    p.add_argument("--ema", action="store_true",
                   help="EMA codebook updates instead of the codebook-"
                        "gradient loss (VERDICT r4 item 9)")
    p.add_argument("--ema_decay", type=float, default=0.99)
    p.add_argument("--restart_dead", action="store_true",
                   help="re-seed dying codes from batch encoder outputs")
    p.add_argument("--stream", action="store_true",
                   help="fresh on-device procedural batches every step "
                        "(data/device_shapes.py) — the streaming protocol")
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--generalize", action="store_true",
                   help="train on the ProceduralShapes distribution and "
                        "report held-out val reconstruction IoU")
    p.add_argument("--train_shapes", type=int, default=512)
    p.add_argument("--val_shapes", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--viz_dir", type=str, default=None)
    cfg = p.parse_args(argv)
    if cfg.stream:
        cfg.generalize = True  # streaming implies the held-out protocol

    res, b, cap = cfg.resolution, cfg.batch_size, cfg.input_capacity
    np_rng = np.random.RandomState(cfg.seed + 1)
    if cfg.generalize:
        train_ds = ProceduralShapes(resolution=res,
                                    num_samples=cfg.train_shapes,
                                    points_per_shape=cfg.points,
                                    seed=cfg.seed, split="train")
        val_ds = ProceduralShapes(resolution=res, num_samples=cfg.val_shapes,
                                  points_per_shape=cfg.points, seed=cfg.seed,
                                  split="val")
        train_coords = [train_ds[i]["coords"]
                        for i in range(cfg.train_shapes)]
        val_coords = [val_ds[i]["coords"] for i in range(cfg.val_shapes)]
    else:
        ds = SyntheticShapes(resolution=res, num_samples=b,
                             points_per_shape=cfg.points)
        train_coords = [ds[i]["coords"] for i in range(b)]
        val_coords = train_coords  # overfit protocol: eval on the train batch

    def collate(coords_list):
        cpad, valid, _, _ = collate_pointclouds(coords_list, cap)
        return jnp.asarray(cpad), jnp.asarray(valid)

    if cfg.stream:
        import itertools
        from mink_octtree_stablediffusion_tpu.data import procedural_batch
        _counter = itertools.count()
        _skey = jax.random.PRNGKey(cfg.seed + 177)

        def train_batch():
            k = jax.random.fold_in(_skey, next(_counter))
            cpad, valid, _, _ = procedural_batch(k, b, cfg.points, res, cap)
            return cpad, valid
    else:
        def train_batch():
            if cfg.generalize:
                idx = np_rng.randint(0, len(train_coords), b)
                return collate([train_coords[i] for i in idx])
            return collate(train_coords)

    val_batches = [collate(val_coords[i:i + b])
                   for i in range(0, len(val_coords) - b + 1, b)]

    enc_caps, dec_caps = capacities(cap)
    net = mm.VQVAE(channels=tuple(cfg.vae_channel),
                   num_embeddings=cfg.num_embeddings,
                   ema=cfg.ema, ema_decay=cfg.ema_decay,
                   restart_dead=cfg.restart_dead,
                   encoder_capacities=enc_caps, decoder_capacities=dec_caps)

    def build(cpad, valid):
        feats = jnp.ones((cap, 1)) * valid[:, None]
        return mt.sparse_tensor(cpad, feats, capacity=cap, batch_size=b,
                                valid=valid, extent=(res,) * 3)

    st0 = jax.jit(build)(*val_batches[0])
    rng = jax.random.PRNGKey(cfg.seed)
    variables = jax.jit(net.init)(rng, st0, st0.grid)
    print("vqvae params:", mt.utils.count_params(variables["params"]),
          flush=True)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(mtrain.warmup_cosine(cfg.lr, 20, cfg.steps)))
    # non-param state: batch_stats (+ vq_stats for the EMA codebook) ride
    # the TrainState's batch_stats slot as one nested dict
    stats0 = {k: variables[k] for k in ("batch_stats", "vq_stats")
              if k in variables}
    state = mtrain.TrainState.create(variables["params"], stats0, tx)

    def loss_fn(params, batch_stats, batch, rng):
        st = build(*batch)
        (out_clss, targets, sout, ze, idx, vq_loss), upd = net.apply(
            {"params": params, **batch_stats}, st, st.grid,
            mutable=list(batch_stats.keys()))
        bce = 0.0
        for logits_t, target in zip(out_clss, targets):
            lo = logits_t.features[:, 0]
            v = logits_t.valid
            t = target.astype(lo.dtype)
            per = jnp.maximum(lo, 0.) - lo * t + \
                jnp.log1p(jnp.exp(-jnp.abs(lo)))
            bce += jnp.sum(jnp.where(v, per, 0.)) / jnp.maximum(
                jnp.sum(v.astype(lo.dtype)), 1.)
        bce = bce / len(out_clss)
        loss = bce + vq_loss
        return loss, ({"bce": bce, "vq": vq_loss}, dict(upd))

    step_fn = mtrain.make_train_step(loss_fn)
    t0 = time.time()
    bce = vq = None
    for step in range(1, cfg.steps + 1):
        rng, sub = jax.random.split(rng)
        state, loss, aux = step_fn(state, train_batch(), sub)
        if step % 100 == 0 or step == cfg.steps:
            bce, vq = float(aux["bce"]), float(aux["vq"])
            print(f"step {step} loss {float(loss):.5f} bce {bce:.5f} vq "
                  f"{vq:.5f} ({(time.time() - t0) / step:.2f} s/step)",
                  flush=True)

    vv = {"params": state.params, **state.batch_stats}

    @jax.jit
    def reconstruct(vv, cpad, valid):
        st = build(cpad, valid)
        (out_clss, targets, sout, ze, idx, vq_loss), _ = net.apply(
            vv, st, st.grid, train=False,
            mutable=[k for k in vv if k != "params"])
        code_valid = ze.valid
        return st, sout, idx, code_valid

    ious, all_idx = [], []
    for vb in val_batches:
        st_in, st_rec, idx, code_valid = reconstruct(vv, *vb)
        ious.append(mean_iou(voxel_sets(st_in), voxel_sets(st_rec)))
        all_idx.append(np.asarray(idx)[np.asarray(code_valid)])
    rec_iou = float(np.mean(ious))
    codes = np.concatenate(all_idx)
    hist = np.bincount(codes, minlength=cfg.num_embeddings).astype(np.float64)
    pk = hist / max(hist.sum(), 1.0)
    nz = pk[pk > 0]
    perplexity = float(np.exp(-np.sum(nz * np.log(nz))))
    active = float(np.mean(hist > 0))
    label = "HELD-OUT val" if cfg.generalize else "overfit eval"
    print(f"{label} reconstruction IoU: {rec_iou:.4f}", flush=True)
    print(f"codebook: perplexity {perplexity:.1f} / {cfg.num_embeddings}, "
          f"active-code fraction {active:.3f}", flush=True)

    if cfg.viz_dir:
        st_in, st_rec, *_ = reconstruct(vv, *val_batches[0])
        tag = "_gen" if cfg.generalize else ""
        path = mt.utils.render_pointclouds(
            [mt.utils.sparse_tensor_clouds(st_in, 1)[0],
             mt.utils.sparse_tensor_clouds(st_rec, 1)[0]],
            os.path.join(cfg.viz_dir, f"vqvae_quality{tag}.png"),
            titles=["data", "vq reconstruction"], resolution=res)
        print("render:", path, flush=True)

    out = {"reconstruction_iou": rec_iou, "bce": bce, "vq_loss": vq,
           "codebook_perplexity": perplexity, "active_code_fraction": active,
           "generalize": cfg.generalize}
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    main()
