"""Conditioning control: prove class conditioning STEERS generation.

The reference trains caption-conditioned diffusion
(`examples/diffusion_cross.py:82,352-356` — captions "a picture of a
{class}") but never verifies control.  This script makes it quantitative
(VERDICT r2 item 3):

  1. restore the generalization VAE (`scripts/e2e_generalize.py` checkpoint,
     dense-canvas latent);
  2. train a MinkowskiFCNN classifier on the same ProceduralShapes
     distribution (held-out val accuracy reported — the verdict oracle);
  3. train CLASS-conditional latent diffusion (random-table embeddings via
     cross-attention, 10% null-conditioning dropout for CFG);
  4. sample every class from pure noise on the data-independent canvas at a
     sweep of CFG scales, decode through the pruning decoder, CLASSIFY the
     decoded shapes, and report per-class conditional accuracy.

CPU smoke:
    JAX_PLATFORMS=cpu python scripts/cond_control.py --resolution 16 \
        --points 512 --input_capacity 1024 --steps_cls 20 --steps_diff 20 \
        --sample_steps 5 --rounds 1 --cfg_scales 1 3
TPU run (after e2e_generalize has trained the VAE):
    python scripts/cond_control.py --skip_cls_if_ckpt
"""

import argparse
import itertools
import json
import os
import sys
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor

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
from mink_octtree_stablediffusion_tpu import diffusion as md  # noqa: E402
from mink_octtree_stablediffusion_tpu import models as mm  # noqa: E402
from mink_octtree_stablediffusion_tpu import train as mtrain  # noqa: E402
from mink_octtree_stablediffusion_tpu.data import (  # noqa: E402
    ProceduralShapes, collate_fields, collate_pointclouds)

from examples.train_vae import capacities  # noqa: E402
from e2e_generalize import voxel_sets  # noqa: E402


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--points", type=int, default=32768)
    p.add_argument("--input_capacity", type=int, default=65536)
    p.add_argument("--train_shapes", type=int, default=512)
    p.add_argument("--val_shapes", type=int, default=32)
    p.add_argument("--composite_prob", type=float, default=0.25)
    p.add_argument("--vae_channel", type=int, nargs=5,
                   default=[32, 128, 512, 512, 4])
    p.add_argument("--unet_channel", type=int, nargs=4,
                   default=[4, 128, 256, 384])
    p.add_argument("--cross_attention_dim", type=int, default=256)
    p.add_argument("--cond_tokens", type=int, default=4)
    p.add_argument("--cond_dropout", type=float, default=0.1)
    p.add_argument("--embed", choices=["frozen", "learned"],
                   default="learned",
                   help="frozen = r3/r4 fixed random table; learned = "
                        "train the class embeddings with the UNet")
    p.add_argument("--time_norm", choices=["default", "scale_shift"],
                   default="default",
                   help="UNet time-embedding norm (scale_shift = FiLM)")
    p.add_argument("--cond_into_time", action="store_true",
                   help="AdaGN-style: add the pooled class tokens to the "
                        "timestep embedding so every norm carries the "
                        "condition (guided-diffusion practice), not just "
                        "the cross-attn layers")
    p.add_argument("--cfg_scales", type=float, nargs="+",
                   default=[1.0, 2.0, 3.0])
    p.add_argument("--rounds", type=int, default=13,
                   help="sampling rounds per (class, scale); batch_size "
                        "samples each (13 x 4 = 52/class: the r3 default of "
                        "12 samples gave +-0.23 CIs — too thin to attribute "
                        "per-class failures, VERDICT r3)")
    p.add_argument("--oracle_shapes", type=int, default=128,
                   help="held-out shapes for the oracle's confusion matrix")
    p.add_argument("--stream", action="store_true",
                   help="train classifier+diffusion on FRESH generator "
                        "seeds every batch (see e2e_generalize --stream)")
    p.add_argument("--steps_cls", type=int, default=600)
    p.add_argument("--cls_points", type=int, default=2048)
    p.add_argument("--steps_diff", type=int, default=10000)
    p.add_argument("--sample_steps", type=int, default=50)
    p.add_argument("--vae_scale", type=float, default=0.1428)
    p.add_argument("--canvas_noise", type=float, default=1.0)
    p.add_argument("--lr_diff", type=float, default=2e-4)
    p.add_argument("--lr_cls", type=float, default=1e-3)
    p.add_argument("--group", type=int, default=32)
    p.add_argument("--prediction_type",
                   choices=["epsilon", "sample", "v_prediction"],
                   default="sample")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt_dir", type=str, default="ckpt_generalize")
    p.add_argument("--skip_diff", action="store_true")
    p.add_argument("--viz_dir", type=str, default=None)
    return p.parse_args(argv)


def main(argv=None):
    cfg = parse_args(argv)
    res, b, cap = cfg.resolution, cfg.batch_size, cfg.input_capacity
    cells = (res // 8) ** 3
    train_ds = ProceduralShapes(resolution=res, num_samples=cfg.train_shapes,
                                points_per_shape=cfg.points, seed=cfg.seed,
                                split="train",
                                composite_prob=cfg.composite_prob)
    val_ds = ProceduralShapes(resolution=res, num_samples=cfg.val_shapes,
                              points_per_shape=cfg.points, seed=cfg.seed,
                              split="val", composite_prob=cfg.composite_prob)
    n_classes = len(train_ds.CLASSES)
    np_rng = np.random.RandomState(cfg.seed + 1)

    train_samples = [train_ds[i] for i in range(cfg.train_shapes)]
    val_samples = [val_ds[i] for i in range(cfg.val_shapes)]
    # larger held-out set for the oracle confusion matrix (the val split is
    # an unbounded seed space; indices beyond val_shapes are equally held
    # out)
    oracle_ds = ProceduralShapes(resolution=res,
                                 num_samples=cfg.oracle_shapes,
                                 points_per_shape=cfg.points, seed=cfg.seed,
                                 split="val",
                                 composite_prob=cfg.composite_prob)
    oracle_samples = [oracle_ds[i] for i in range(cfg.oracle_shapes)]

    if cfg.stream:
        _counter = itertools.count()
        _tpool = ThreadPoolExecutor(max_workers=3)

        def _gen_labeled():
            samples = [train_ds[i]
                       for i in (next(_counter) for _ in range(b))]
            return samples

        _squeue = deque(_tpool.submit(_gen_labeled) for _ in range(6))

        def next_train_samples():
            fut = _squeue.popleft()
            _squeue.append(_tpool.submit(_gen_labeled))
            return fut.result()
    else:
        def next_train_samples():
            idx = np_rng.randint(0, cfg.train_shapes, b)
            return [train_samples[i] for i in idx]

    # ---- classifier (the verdict oracle) on voxel-coordinate clouds ----
    # Decoded generations are voxel sets, so the classifier consumes voxel
    # coords as points: subsample -> unit sphere -> /voxel_size (the
    # reference create_input_batch semantics).
    voxel_size = 0.05
    cls_cap = b * cfg.cls_points
    extent = (int(2.0 / voxel_size) + 1,) * 3
    clf = mm.MinkowskiFCNN(out_channel=n_classes, voxel_capacity=cls_cap)

    def cls_collate(coords_list):
        pts = []
        for c in coords_list:
            c = np.asarray(c, np.float32)
            idx = np_rng.randint(0, len(c), cfg.cls_points)
            x = c[idx]
            center = 0.5 * (x.max(0) + x.min(0))
            x = x - center
            x = x / max(np.linalg.norm(x, axis=1).max(), 1e-6)  # unit sphere
            pts.append(x)
        unit = pts
        coords = [(u + 1.0) / voxel_size for u in unit]
        cpad, valid, fpad = collate_fields(coords, unit, cls_cap)
        return jnp.asarray(cpad), jnp.asarray(valid), jnp.asarray(fpad)

    def cls_build(cpad, valid, fpad):
        return mt.TensorField(coordinates=cpad, features=fpad, valid=valid,
                              batch_size=b, extent=extent)

    rng = jax.random.PRNGKey(cfg.seed)
    f0 = cls_build(*cls_collate([s["coords"] for s in train_samples[:b]]))
    clf_vars = jax.jit(clf.init)(rng, f0)
    # clip + cosine: plain Adam at 1e-3 spikes on hard ProceduralShapes
    # batches (observed: loss 0.23 -> 1.68 at step 500) and the oracle's
    # held-out accuracy is the ceiling of the whole conditioning proof
    clf_tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(mtrain.warmup_cosine(cfg.lr_cls, 20, cfg.steps_cls)))
    clf_state = mtrain.TrainState.create(clf_vars["params"],
                                         clf_vars.get("batch_stats", {}),
                                         clf_tx)

    def clf_loss_fn(params, batch_stats, batch, rng):
        cpad, valid, fpad, labels = batch
        field = cls_build(cpad, valid, fpad)
        logits, upd = clf.apply(
            {"params": params, "batch_stats": batch_stats}, field,
            mutable=["batch_stats"])
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return loss, ({"acc": acc}, upd.get("batch_stats", batch_stats))

    clf_step = mtrain.make_train_step(clf_loss_fn)

    @jax.jit
    def clf_logits(params, batch_stats, cpad, valid, fpad):
        return clf.apply({"params": params, "batch_stats": batch_stats},
                         cls_build(cpad, valid, fpad), train=False)

    t0 = time.time()
    for step in range(1, cfg.steps_cls + 1):
        samples = next_train_samples()
        batch = cls_collate([s["coords"] for s in samples])
        labels = jnp.asarray([s["label"] for s in samples], jnp.int32)
        rng, sub = jax.random.split(rng)
        clf_state, loss, aux = clf_step(clf_state, (*batch, labels), sub)
        if step % 100 == 0 or step == cfg.steps_cls:
            print(f"cls step {step} loss {float(loss):.4f} acc "
                  f"{float(aux['acc']):.3f} "
                  f"({(time.time() - t0) / step:.2f} s/step)", flush=True)

    def classify(coords_list):
        """Predicted class per voxel-coord cloud (empty clouds -> -1)."""
        preds = []
        for i in range(0, len(coords_list), b):
            chunk = coords_list[i:i + b]
            chunk = chunk + [chunk[-1]] * (b - len(chunk))
            nonempty = [c if len(c) else np.zeros((1, 3)) for c in chunk]
            logits = clf_logits(clf_state.params, clf_state.batch_stats,
                                *cls_collate(nonempty))
            pr = np.argmax(np.asarray(logits), -1)
            for j, c in enumerate(coords_list[i:i + b]):
                preds.append(int(pr[j]) if len(c) else -1)
        return preds

    # held-out oracle accuracy + FULL confusion matrix — with it the
    # conditional-accuracy numbers can be decomposed into oracle error vs
    # generation error (VERDICT r3 item 2)
    val_pred = classify([s["coords"] for s in oracle_samples])
    val_true = [s["label"] for s in oracle_samples]
    cls_val_acc = float(np.mean([p == t for p, t in zip(val_pred, val_true)]))
    confusion = np.zeros((n_classes, n_classes))  # [true, pred]
    for p, t in zip(val_pred, val_true):
        if p >= 0:
            confusion[t, p] += 1
    row = confusion.sum(1, keepdims=True)
    conf_norm = confusion / np.maximum(row, 1.0)
    per_cls_oracle = {name: float(conf_norm[li, li])
                      for li, name in enumerate(train_ds.CLASSES)}
    print(f"classifier held-out val acc: {cls_val_acc:.4f} "
          f"({cfg.oracle_shapes} shapes; per-class {per_cls_oracle})",
          flush=True)
    print("oracle confusion (rows true, cols pred):\n" +
          "\n".join(f"  {train_ds.CLASSES[i]:9s} " +
                    " ".join(f"{conf_norm[i, j]:.3f}"
                             for j in range(n_classes))
                    for i in range(n_classes)), flush=True)

    def confusion_correct(pred_hist: np.ndarray) -> np.ndarray:
        """Estimate the TRUE generated-class distribution p from the
        observed oracle-prediction histogram q: q = Mᵀ p with M the
        oracle's row-stochastic confusion matrix — least squares, clipped
        to the simplex.  Separates oracle confusion from generation error."""
        q = pred_hist / max(pred_hist.sum(), 1.0)
        p, *_ = np.linalg.lstsq(conf_norm.T, q, rcond=None)
        p = np.clip(p, 0.0, None)
        return p / max(p.sum(), 1e-9)

    # ---- restore the generalization VAE ----
    enc_caps, dec_caps = capacities(cap)
    dec_caps = (max(dec_caps[0], b * cells),) + tuple(dec_caps[1:])
    vae = mm.VAE(channels=tuple(cfg.vae_channel),
                 encoder_capacities=enc_caps, decoder_capacities=dec_caps,
                 latent_canvas=True, canvas_noise_std=cfg.canvas_noise)

    def build(cpad, valid, feats):
        return mt.sparse_tensor(cpad, feats, capacity=cap, batch_size=b,
                                valid=valid, extent=(res,) * 3)

    def collate(samples):
        cpad, valid, feats, _ = collate_pointclouds(
            [s["coords"] for s in samples], cap)
        return (jnp.asarray(cpad), jnp.asarray(valid), jnp.asarray(feats))

    st0 = jax.jit(build)(*collate(val_samples[:b]))
    variables = jax.jit(vae.init)(rng, st0, st0.grid, rng)
    vae_ckpt = mtrain.CheckpointManager(os.path.join(cfg.ckpt_dir, "vae"))
    assert vae_ckpt.latest_step() is not None, (
        f"no VAE checkpoint under {cfg.ckpt_dir}/vae — run "
        "scripts/e2e_generalize.py first")
    vae_vars = jax.tree.map(
        jax.lax.stop_gradient,
        vae_ckpt.restore_vars(variables["params"],
                              variables.get("batch_stats", {})))
    print(f"restored VAE at step {vae_ckpt.latest_step()}", flush=True)

    def encode_canvas(vv, st):
        mean, _ = vae.apply(
            {"params": vv["params"], "batch_stats": vv["batch_stats"]},
            st, method=vae.encode)
        mean = mean.with_features(
            jax.lax.stop_gradient(mean.features * cfg.vae_scale))
        canvas = mt.ops.canvas_grid(b, mean.grid.extent, mean.grid.stride)
        return mt.ops.expand_to_canvas(mean, canvas)

    # ---- conditional diffusion ----
    # class-embedding table (`diffusion_cross.py:809-812` role; the
    # conditioning signal is the table rows, null = zeros).  r3/r4 used a
    # FROZEN random table; --embed learned trains it jointly with the UNet
    # (VERDICT r4 item 4: box/cylinder were generation-limited and a
    # frozen random code gives the model nothing class-structured to read)
    S, D = cfg.cond_tokens, cfg.cross_attention_dim
    table0 = np.random.RandomState(7).randn(
        n_classes, S, D).astype(np.float32)
    table = jnp.asarray(table0)  # frozen fallback / init shape

    lat0 = jax.jit(encode_canvas)(vae_vars, st0)
    attn_max_len = max(-(-cells // 128) * 128, 128)
    unet = mm.UNet(channels=tuple(cfg.unet_channel), group=cfg.group,
                   with_cross_attn=True, cross_attention_dim=D,
                   time_embedding_norm=cfg.time_norm,
                   cond_into_time=cfg.cond_into_time,
                   attn_max_len=attn_max_len,
                   down_capacities=(max(b * cells // 8, 16),
                                    max(b * cells // 64, 8),
                                    max(b * cells // 512, 8)))
    sched = md.DDPMScheduler.create(prediction_type=cfg.prediction_type)
    ehs0 = table[jnp.zeros((b,), jnp.int32)]
    unet_vars = jax.jit(unet.init)(rng, lat0, jnp.zeros((b,), jnp.int32),
                                   ehs0)
    print("unet params:", mt.utils.count_params(unet_vars["params"]),
          flush=True)

    tx2 = mtrain.diffusion_optimizer(cfg.lr_diff, warmup_steps=100,
                                     total_steps=cfg.steps_diff)
    params0 = {"unet": unet_vars["params"]}
    if cfg.embed == "learned":
        params0["cond_table"] = jnp.asarray(table0)
    dstate = mtrain.TrainState.create(params0, {}, tx2)
    diff_ckpt = mtrain.CheckpointManager(
        os.path.join(cfg.ckpt_dir, "diff_cond"))

    def diff_loss_fn(params, batch_stats, batch, rng):
        cpad, valid, feats, labels, vv = batch
        latent = encode_canvas(vv, build(cpad, valid, feats))
        r_drop, r_loss = jax.random.split(rng)
        tbl = params.get("cond_table", table)
        ehs = tbl[labels]
        # classifier-free-guidance training: drop to null cond per instance
        drop = jax.random.bernoulli(r_drop, cfg.cond_dropout, (b, 1, 1))
        ehs = jnp.where(drop, 0.0, ehs)

        def unet_apply(noised, timesteps, cond):
            return unet.apply({"params": params["unet"]}, noised, timesteps,
                              cond)

        loss, aux = md.diffusion_training_loss(
            unet_apply, sched, latent, r_loss, nll_params=None,
            resolution=res, prediction_type=cfg.prediction_type,
            encoder_hidden_state=ehs)
        return loss, (aux, batch_stats)

    dstep_fn = mtrain.make_train_step(diff_loss_fn)
    if cfg.skip_diff:
        dstate = diff_ckpt.restore(dstate)
        print(f"restored cond diffusion at step {int(dstate.step)}",
              flush=True)
    else:
        if diff_ckpt.latest_step() is not None:
            dstate = diff_ckpt.restore(dstate)
            print(f"resuming cond diffusion from step {int(dstate.step)}",
                  flush=True)
        t0 = time.time()
        for step in range(int(dstate.step) + 1, cfg.steps_diff + 1):
            samples = next_train_samples()
            batch = collate(samples)
            labels = jnp.asarray([s["label"] for s in samples], jnp.int32)
            rng, sub = jax.random.split(rng)
            dstate, loss, aux = dstep_fn(
                dstate, (*batch, labels, vae_vars), sub)
            if step % 200 == 0 or step == cfg.steps_diff:
                print(f"cond diff step {step} loss {float(loss):.5f} denoise "
                      f"{float(aux['denoise_loss']):.5f} "
                      f"({(time.time() - t0) / step:.2f} s/step)", flush=True)
            if step % 2000 == 0:
                diff_ckpt.save(step, dstate, force=True)
        if diff_ckpt.latest_step() != int(dstate.step):
            diff_ckpt.save(int(dstate.step), dstate, force=True)

    # ---- sample each class on the canvas, decode, classify ----
    canvas = mt.ops.canvas_grid(b, (res,) * 3, (8,) * 3)
    template = mt.SparseTensor(
        grid=canvas, features=jnp.zeros((b * cells, cfg.vae_channel[-1])))
    tgt0 = st0.grid

    from functools import partial

    # label/scale static: `sample_latent` branches on guidance_scale != 1
    # in Python (CFG doubles the UNet calls), so it cannot be traced
    @partial(jax.jit, static_argnames=("label", "scale"))
    def generate(params, vv, rng, *, label, scale):
        tbl = params.get("cond_table", table)
        ehs = tbl[jnp.full((b,), label, jnp.int32)]

        def unet_apply(noised, timesteps, cond):
            return unet.apply({"params": params["unet"]}, noised, timesteps,
                              cond, train=False)

        z = md.sample_latent(unet_apply, sched, template, rng,
                             num_inference_steps=cfg.sample_steps,
                             encoder_hidden_state=ehs,
                             guidance_scale=scale)
        z = z.with_features(z.features / cfg.vae_scale)
        _, _, sout = vae.apply(
            {"params": vv["params"], "batch_stats": vv["batch_stats"]},
            z, tgt0, train=False, method=vae.decode)
        return sout

    results = {}
    per_class_at_best = None
    for scale in cfg.cfg_scales:
        per_class, per_class_corr, per_class_ci = {}, {}, {}
        for label in range(n_classes):
            clouds = []
            for r in range(cfg.rounds):
                sout = generate(dstate.params, vae_vars,
                                jax.random.PRNGKey(cfg.seed + 997 * label
                                                   + 31 * r
                                                   + int(scale * 7919)),
                                label=label, scale=float(scale))
                s = voxel_sets(sout)
                for j in range(b):
                    vox = s.get(j, set())
                    clouds.append(np.array(sorted(vox), np.int64).reshape(
                        -1, 3) if vox else np.zeros((0, 3), np.int64))
            preds = classify(clouds)
            n = len(preds)
            acc = float(np.mean([p == label for p in preds]))
            # Wilson interval: the normal approximation collapses to
            # +-0.000 at 0/n and n/n, overstating certainty exactly at
            # the headline cells (ADVICE r4)
            z = 1.96
            center = (acc + z * z / (2 * n)) / (1 + z * z / n)
            half = (z / (1 + z * z / n)) * float(
                np.sqrt(acc * (1 - acc) / n + z * z / (4 * n * n)))
            lo, hi = center - half, center + half
            ci = max(acc - lo, hi - acc)  # reported as acc +- ci
            hist = np.zeros(n_classes)
            for p in preds:
                if p >= 0:
                    hist[p] += 1
            corrected = confusion_correct(hist)
            empty = sum(1 for p in preds if p < 0)
            name = train_ds.CLASSES[label]
            per_class[name] = acc
            per_class_ci[name] = ci
            per_class_corr[name] = float(corrected[label])
            print(f"cfg {scale}: class {name} -> conditional acc "
                  f"{acc:.3f} +-{ci:.3f} (n={n}, empty={empty}); "
                  f"oracle-corrected true-class share "
                  f"{corrected[label]:.3f}; pred hist "
                  f"{hist.astype(int).tolist()}", flush=True)
        results[str(scale)] = {
            "per_class": per_class,
            "per_class_ci95": per_class_ci,
            "per_class_oracle_corrected": per_class_corr,
            "mean": float(np.mean(list(per_class.values()))),
            "mean_oracle_corrected": float(
                np.mean(list(per_class_corr.values()))),
            "samples_per_class": cfg.rounds * b,
        }
        if (per_class_at_best is None
                or results[str(scale)]["mean"] > per_class_at_best[1]):
            per_class_at_best = (str(scale), results[str(scale)]["mean"])

    if cfg.viz_dir:
        best = float(per_class_at_best[0])
        clouds = []
        for label in range(n_classes):
            sout = generate(dstate.params, vae_vars,
                            jax.random.PRNGKey(cfg.seed + 977 + label),
                            label=label, scale=best)
            clouds.append(mt.utils.sparse_tensor_clouds(sout, 1)[0])
        path = mt.utils.render_pointclouds(
            clouds, os.path.join(cfg.viz_dir, "cond_control.png"),
            titles=[f"cond: {c} (cfg {best})" for c in train_ds.CLASSES],
            resolution=res)
        print("render:", path, flush=True)

    out = {"classifier_val_acc": cls_val_acc,
           "classifier_val_per_class": per_cls_oracle,
           "oracle_confusion": conf_norm.tolist(),
           "oracle_shapes": cfg.oracle_shapes,
           "cfg_sweep": results,
           "best_scale": per_class_at_best[0],
           "best_mean_conditional_acc": per_class_at_best[1],
           "stream": cfg.stream}
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    main()
