"""Generalization protocol: train on a procedural shape DISTRIBUTION,
validate on held-out shapes, generate template-free from pure noise.

This is what the reference's ModelNet40 training actually does
(`examples/ae_res.py:143-214` train/test phases, `:865-886` val renders;
`examples/dataset.py:129-220`) — made quantitative and runnable in a
zero-egress environment via `ProceduralShapes` (parameter-randomized
primitives, disjoint val split):

  phase 1  VAE trained on streaming fresh batches from the train split
           (dense-canvas latent, ops/canvas.py) → held-out reconstruction
           IoU on the val split.
  phase 2  latent diffusion trained on the frozen VAE's canvas latents of
           the same streaming distribution.
  phase 3  UNCONDITIONAL generation: denoise pure noise on the
           data-independent canvas (no structural template — unlike the
           reference's sampling, which reuses a data batch's latent coords,
           `diffusion.py:597-629`), decode through the pruning decoder, and
           score: distribution membership (nearest-neighbor IoU against
           train+val banks) and novelty (nearest-TRAIN IoU histogram —
           samples must not be copies).

CPU smoke:
    JAX_PLATFORMS=cpu python scripts/e2e_generalize.py --resolution 16 \
        --points 512 --input_capacity 1024 --train_shapes 16 --val_shapes 8 \
        --steps_vae 30 --steps_diff 30 --sample_steps 5 --gen_samples 4
TPU run:
    python scripts/e2e_generalize.py --viz_dir docs/results
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
    ProceduralShapes, collate_pointclouds)

from examples.train_vae import capacities  # noqa: E402


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--points", type=int, default=32768)
    p.add_argument("--input_capacity", type=int, default=65536)
    p.add_argument("--train_shapes", type=int, default=512)
    p.add_argument("--val_shapes", type=int, default=32)
    p.add_argument("--stream", action="store_true",
                   help="draw every train batch from FRESH generator seeds "
                        "(unbounded index stream) instead of the fixed "
                        "train_shapes pool — removes the pool-overfit axis "
                        "entirely (VERDICT r3 item 3); train_shapes then "
                        "only sizes the novelty bank / train-IoU probe")
    p.add_argument("--stream_workers", type=int, default=3,
                   help="host threads prefetching streamed batches")
    p.add_argument("--stream_device", action="store_true",
                   help="TRUE streaming with ON-DEVICE shape synthesis "
                        "(data/device_shapes.py): fresh parametric batch "
                        "per step at device-millisecond cost, zero host "
                        "work — removes the r4 host-bound 3.7x wall at "
                        "res 128 (VERDICT r4 item 7)")
    p.add_argument("--caps", type=int, nargs=9, default=None,
                   help="5 encoder + 4 decoder capacities (overrides the "
                        "rule-of-thumb schedule; use "
                        "scripts/measure_occupancy.py --procedural)")
    p.add_argument("--composite_prob", type=float, default=0.25)
    p.add_argument("--vae_channel", type=int, nargs=5,
                   default=[32, 128, 512, 512, 4])
    p.add_argument("--unet_channel", type=int, nargs=4,
                   default=[4, 128, 256, 384])
    p.add_argument("--steps_vae", type=int, default=6000)
    p.add_argument("--steps_diff", type=int, default=15000)
    p.add_argument("--sample_steps", type=int, default=50)
    p.add_argument("--gen_samples", type=int, default=16)
    p.add_argument("--vae_scale", type=float, default=0.1428)
    p.add_argument("--canvas_noise", type=float, default=1.0)
    p.add_argument("--lr_vae", type=float, default=1e-3)
    p.add_argument("--lr_diff", type=float, default=2e-4)
    p.add_argument("--group", type=int, default=32)
    p.add_argument("--kld_weight", type=float, default=1e-6)
    p.add_argument("--prediction_type",
                   choices=["epsilon", "sample", "v_prediction"],
                   default="sample")
    p.add_argument("--diff_opt", choices=["adamw", "adafactor"],
                   default="adamw")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--attn_window", type=int, default=None,
                   help="Morton-window self-attention for UNet levels "
                        "whose dense cell bound exceeds attn_max_len "
                        "(needed at res 256: the stride-8 canvas holds "
                        "32768 cells/instance — full attention is O(L^2))")
    p.add_argument("--attn_max_len", type=int, default=None,
                   help="override the level-0-cells default (with "
                        "--attn_window this is the full-vs-windowed "
                        "threshold)")
    p.add_argument("--level0_skip", action="store_true",
                   help="UNet concat of the conv_in activation into "
                        "conv_out — the identity path DESIGN 9 predicts "
                        "unbinds the epsilon target (VERDICT r4 item 6)")
    p.add_argument("--eval_every", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt_dir", type=str, default="ckpt_generalize")
    p.add_argument("--skip_vae", action="store_true",
                   help="restore the VAE from ckpt_dir/vae instead of "
                        "training")
    p.add_argument("--skip_diff", action="store_true",
                   help="restore the diffusion state from ckpt_dir/diff")
    p.add_argument("--tag", type=str, default="",
                   help="suffix for result files/renders")
    p.add_argument("--viz_dir", type=str, default=None)
    return p.parse_args(argv)


def voxel_sets(st):
    c = np.asarray(st.grid.coords)
    v = np.asarray(st.grid.valid)
    out = {}
    for row, ok in zip(c, v):
        if ok:
            out.setdefault(int(row[0]), set()).add(
                tuple(int(x) for x in row[1:]))
    return out


def iou_sets(a: set, b: set) -> float:
    u = len(a | b)
    return len(a & b) / u if u else 1.0


def mean_iou(sets_a, sets_b):
    vals = [iou_sets(sets_a[k], sets_b.get(k, set())) for k in sets_a]
    return float(np.mean(vals)) if vals else 0.0


def main(argv=None):
    cfg = parse_args(argv)
    res, b, cap = cfg.resolution, cfg.batch_size, cfg.input_capacity
    assert res % 8 == 0
    cells = (res // 8) ** 3  # canvas cells per instance at the stride-8 latent

    train_ds = ProceduralShapes(resolution=res, num_samples=cfg.train_shapes,
                                points_per_shape=cfg.points, seed=cfg.seed,
                                split="train",
                                composite_prob=cfg.composite_prob)
    val_ds = ProceduralShapes(resolution=res, num_samples=cfg.val_shapes,
                              points_per_shape=cfg.points, seed=cfg.seed,
                              split="val", composite_prob=cfg.composite_prob)

    print(f"materializing {cfg.train_shapes} train / {cfg.val_shapes} val "
          "procedural shapes...", flush=True)
    t0 = time.time()
    train_coords = [train_ds[i]["coords"] for i in range(cfg.train_shapes)]
    val_coords = [val_ds[i]["coords"] for i in range(cfg.val_shapes)]
    print(f"  done in {time.time() - t0:.1f}s; train voxels/shape "
          f"mean {np.mean([len(c) for c in train_coords]):.0f}", flush=True)

    np_rng = np.random.RandomState(cfg.seed + 1)

    def collate(idxs, pool):
        cpad, valid, feats, _ = collate_pointclouds(
            [pool[i] for i in idxs], cap)
        return (jnp.asarray(cpad), jnp.asarray(valid), jnp.asarray(feats))

    if cfg.stream_device:
        # on-device synthesis: the generator jits, so a fresh batch is
        # device work queued ahead of the train step — no host transfer
        from mink_octtree_stablediffusion_tpu.data import procedural_batch
        _counter = itertools.count()
        _skey = jax.random.PRNGKey(cfg.seed + 77)

        def train_batch():
            k = jax.random.fold_in(_skey, next(_counter))
            cpad, valid, feats, _ = procedural_batch(
                k, b, cfg.points, res, cap,
                composite_prob=cfg.composite_prob)
            return (cpad, valid, feats)
    elif cfg.stream:
        # fresh shapes every step: the generator is parametric, so the
        # train distribution is effectively infinite — the honest analogue
        # of ModelNet40's mesh diversity with the pool-overfit axis removed.
        # Host-side generation (~0.1-0.3 s/shape at res 128) is overlapped
        # with the device step by a small thread pool.
        _counter = itertools.count()
        _pool = ThreadPoolExecutor(max_workers=cfg.stream_workers)

        def _gen_batch():
            idxs = [next(_counter) for _ in range(b)]
            cpad, valid, feats, _ = collate_pointclouds(
                [train_ds[i]["coords"] for i in idxs], cap)
            return (jnp.asarray(cpad), jnp.asarray(valid),
                    jnp.asarray(feats))

        _queue = deque(_pool.submit(_gen_batch)
                       for _ in range(2 * cfg.stream_workers))

        def train_batch():
            fut = _queue.popleft()
            _queue.append(_pool.submit(_gen_batch))
            return fut.result()
    else:
        def train_batch():
            return collate(np_rng.randint(0, cfg.train_shapes, b),
                           train_coords)

    val_batches = [collate(range(i, i + b), val_coords)
                   for i in range(0, cfg.val_shapes - b + 1, b)]
    # train-IoU probe: as many batches as the val protocol averages, so the
    # train/val gap compares like against like (ADVICE r3)
    train_probe = [collate(range(i, i + b), train_coords)
                   for i in range(0, min(cfg.train_shapes, cfg.val_shapes)
                                  - b + 1, b)]

    if cfg.caps is not None:
        enc_caps, dec_caps = tuple(cfg.caps[:5]), tuple(cfg.caps[5:])
    else:
        enc_caps, dec_caps = capacities(cap)
    dec_caps = (max(dec_caps[0], b * cells),) + tuple(dec_caps[1:])
    vae = mm.VAE(channels=tuple(cfg.vae_channel),
                 encoder_capacities=enc_caps, decoder_capacities=dec_caps,
                 latent_canvas=True, canvas_noise_std=cfg.canvas_noise)

    def build(cpad, valid, feats):
        return mt.sparse_tensor(cpad, feats, capacity=cap, batch_size=b,
                                valid=valid, extent=(res,) * 3)

    st0 = jax.jit(build)(*val_batches[0])
    rng = jax.random.PRNGKey(cfg.seed)
    variables = jax.jit(vae.init)(rng, st0, st0.grid, rng)
    print("vae params:", mt.utils.count_params(variables["params"]),
          flush=True)

    # ---- phase 1: VAE on the training distribution ----
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(mtrain.warmup_cosine(cfg.lr_vae, 20, cfg.steps_vae)))
    state = mtrain.TrainState.create(variables["params"],
                                     variables.get("batch_stats", {}), tx)
    vae_ckpt = mtrain.CheckpointManager(os.path.join(cfg.ckpt_dir, "vae"))

    def vae_loss_fn(params, batch_stats, batch, rng):
        st = build(*batch)
        (out_clss, targets, sout, mean, log_var, _), upd = vae.apply(
            {"params": params, "batch_stats": batch_stats}, st, st.grid, rng,
            mutable=["batch_stats"])
        loss, aux = mm.vae_loss(out_clss, targets, mean, log_var,
                                cfg.kld_weight)
        return loss, (aux, upd["batch_stats"])

    step_fn = mtrain.make_train_step(vae_loss_fn)

    @jax.jit
    def reconstruct(vv, cpad, valid, feats, rng):
        st = build(cpad, valid, feats)
        (out_clss, targets, sout, *_), _ = vae.apply(
            {"params": vv["params"], "batch_stats": vv["batch_stats"]},
            st, st.grid, rng, train=False, mutable=["batch_stats"])
        return st, sout

    def val_recon_iou(vv, batches):
        vals = []
        for vb in batches:
            st_in, st_rec = reconstruct(vv, *vb, jax.random.PRNGKey(9))
            vals.append(mean_iou(voxel_sets(st_in), voxel_sets(st_rec)))
        return float(np.mean(vals))

    if cfg.skip_vae:
        state = vae_ckpt.restore(state)
        print(f"restored VAE at step {int(state.step)}", flush=True)
        vae_vars = {"params": state.params, "batch_stats": state.batch_stats}
    else:
        # auto-resume a partially-trained leg (tunnel stalls can kill the
        # process mid-phase; the optimizer state carries the schedule)
        if vae_ckpt.latest_step() is not None:
            state = vae_ckpt.restore(state)
            print(f"resuming VAE from step {int(state.step)}", flush=True)
        t0, step0 = time.time(), int(state.step)
        for step in range(step0 + 1, cfg.steps_vae + 1):
            rng, sub = jax.random.split(rng)
            state, loss, aux = step_fn(state, train_batch(), sub)
            if step % 100 == 0 or step == cfg.steps_vae:
                print(f"vae step {step} loss {float(loss):.5f} bce "
                      f"{float(aux['bce']):.5f} "
                      f"({(time.time() - t0) / (step - step0):.2f} s/step)",
                      flush=True)
            if step % cfg.eval_every == 0:
                vv = {"params": state.params,
                      "batch_stats": state.batch_stats}
                print(f"  val recon IoU @ {step}: "
                      f"{val_recon_iou(vv, val_batches[:2]):.4f}", flush=True)
            if step % 2000 == 0:
                vae_ckpt.save(int(state.step), state, force=True)
        if vae_ckpt.latest_step() != int(state.step):
            vae_ckpt.save(int(state.step), state, force=True)
        vae_vars = {"params": state.params, "batch_stats": state.batch_stats}
    vae_vars = jax.tree.map(jax.lax.stop_gradient, vae_vars)

    final_val_iou = val_recon_iou(vae_vars, val_batches)
    train_iou = val_recon_iou(vae_vars, train_probe)
    print(f"HELD-OUT reconstruction IoU ({cfg.val_shapes} val shapes): "
          f"{final_val_iou:.4f}  (train-set IoU {train_iou:.4f})", flush=True)

    if cfg.steps_diff == 0:
        # VAE-only leg (e.g. pool-size ablations)
        result = {"val_recon_iou": final_val_iou,
                  "train_recon_iou": train_iou,
                  "train_shapes": cfg.train_shapes,
                  "stream": bool(cfg.stream or cfg.stream_device),
                  "stream_device": cfg.stream_device,
                  "resolution": res,
                  "steps_vae": cfg.steps_vae}
        print(json.dumps(result), flush=True)
        return result

    # ---- phase 2: diffusion on frozen canvas latents ----
    def encode_canvas(vv, st):
        mean, _ = vae.apply(
            {"params": vv["params"], "batch_stats": vv["batch_stats"]},
            st, method=vae.encode)
        mean = mean.with_features(
            jax.lax.stop_gradient(mean.features * cfg.vae_scale))
        canvas = mt.ops.canvas_grid(b, mean.grid.extent, mean.grid.stride)
        return mt.ops.expand_to_canvas(mean, canvas)

    lat0 = jax.jit(encode_canvas)(vae_vars, st0)
    attn_max_len = cfg.attn_max_len or max(-(-cells // 128) * 128, 128)
    unet = mm.UNet(channels=tuple(cfg.unet_channel), group=cfg.group,
                   attn_max_len=attn_max_len, remat=cfg.remat,
                   attn_window=cfg.attn_window,
                   level0_skip=cfg.level0_skip,
                   down_capacities=(max(b * cells // 8, 16),
                                    max(b * cells // 64, 8),
                                    max(b * cells // 512, 8)))
    sched = md.DDPMScheduler.create(prediction_type=cfg.prediction_type)
    unet_vars = jax.jit(unet.init)(rng, lat0, jnp.zeros((b,), jnp.int32))
    print("unet params:", mt.utils.count_params(unet_vars["params"]),
          flush=True)

    params0 = {"unet": unet_vars["params"]}
    if cfg.diff_opt == "adafactor":
        tx2 = mtrain.adafactor_diffusion_optimizer(
            cfg.lr_diff, warmup_steps=100, total_steps=cfg.steps_diff)
    else:
        tx2 = mtrain.diffusion_optimizer(cfg.lr_diff, warmup_steps=100,
                                         total_steps=cfg.steps_diff)
    dstate = mtrain.TrainState.create(params0, {}, tx2)
    # per-prediction-type checkpoint dir: the epsilon long run must not
    # clobber the x0 run's state
    diff_ckpt = mtrain.CheckpointManager(
        os.path.join(cfg.ckpt_dir, f"diff_{cfg.prediction_type}"))

    def diff_loss_fn(params, batch_stats, batch, rng):
        cpad, valid, feats, vv = batch
        latent = encode_canvas(vv, build(cpad, valid, feats))

        def unet_apply(noised, timesteps, ehs):
            return unet.apply({"params": params["unet"]}, noised, timesteps,
                              ehs)

        loss, aux = md.diffusion_training_loss(
            unet_apply, sched, latent, rng, nll_params=None, resolution=res,
            prediction_type=cfg.prediction_type)
        return loss, (aux, batch_stats)

    dstep_fn = mtrain.make_train_step(diff_loss_fn)
    if cfg.skip_diff:
        dstate = diff_ckpt.restore(dstate)
        print(f"restored diffusion at step {int(dstate.step)}", flush=True)
    else:
        if diff_ckpt.latest_step() is not None:
            dstate = diff_ckpt.restore(dstate)
            print(f"resuming diffusion from step {int(dstate.step)}",
                  flush=True)
        t0, step0 = time.time(), int(dstate.step)
        for step in range(step0 + 1, cfg.steps_diff + 1):
            rng, sub = jax.random.split(rng)
            cpad, valid, feats = train_batch()
            dstate, loss, aux = dstep_fn(dstate,
                                         (cpad, valid, feats, vae_vars), sub)
            if step % 200 == 0 or step == cfg.steps_diff:
                print(f"diff step {step} loss {float(loss):.5f} denoise "
                      f"{float(aux['denoise_loss']):.5f} "
                      f"({(time.time() - t0) / (step - step0):.2f} s/step)",
                      flush=True)
            if step % 2000 == 0:
                diff_ckpt.save(step, dstate, force=True)
        if diff_ckpt.latest_step() != int(dstate.step):
            diff_ckpt.save(int(dstate.step), dstate, force=True)

    # ---- phase 3: template-free generation + membership/novelty ----
    canvas = mt.ops.canvas_grid(b, (res,) * 3, (8,) * 3)
    template = mt.SparseTensor(
        grid=canvas, features=jnp.zeros((b * cells, cfg.vae_channel[-1])))

    @jax.jit
    def generate(params, vv, cpad, valid, feats, rng):
        # target_grid is only a structural argument for eval decode (no
        # force-keep in eval) — any grid of the right batch works
        tgt = build(cpad, valid, feats).grid

        def unet_apply(noised, timesteps, ehs):
            return unet.apply({"params": params["unet"]}, noised, timesteps,
                              ehs, train=False)

        z = md.sample_latent(unet_apply, sched, template, rng,
                             num_inference_steps=cfg.sample_steps)
        z = z.with_features(z.features / cfg.vae_scale)
        _, _, sout = vae.apply(
            {"params": vv["params"], "batch_stats": vv["batch_stats"]},
            z, tgt, train=False, method=vae.decode)
        return sout

    gen_sets = []
    rounds = max(cfg.gen_samples // b, 1)
    for i in range(rounds):
        sout = generate(dstate.params, vae_vars, *val_batches[0],
                        jax.random.PRNGKey(cfg.seed + 100 + i))
        s = voxel_sets(sout)
        gen_sets.extend(s.get(j, set()) for j in range(b))
    counts = [len(s) for s in gen_sets]
    print(f"generated {len(gen_sets)} samples; voxels/sample "
          f"min {min(counts)} median {int(np.median(counts))} "
          f"max {max(counts)}", flush=True)

    # membership + novelty vs the banks — flat int64 keys + sorted
    # intersections, NOT Python sets of tuples: at res 128 the 4096-shape
    # bank as tuple-sets costs ~200 B/voxel ≈ 35+ GB and OOM-kills the
    # 1-core host (observed: 99 GB RSS)
    def flat_keys(arr) -> np.ndarray:
        c = np.asarray(arr, np.int64)
        return np.unique((c[:, 0] * res + c[:, 1]) * res + c[:, 2])

    def iou_keys(a: np.ndarray, b: np.ndarray) -> float:
        inter = len(np.intersect1d(a, b, assume_unique=True))
        u = len(a) + len(b) - inter
        return inter / u if u else 1.0

    train_bank = [flat_keys(c) for c in train_coords]
    val_bank = [flat_keys(c) for c in val_coords]
    gen_keys = [flat_keys(np.array(sorted(g), np.int64).reshape(-1, 3))
                if g else np.empty((0,), np.int64) for g in gen_sets]
    tcounts = [len(s) for s in train_bank]
    lo_count = 0.3 * float(np.median(tcounts))
    nearest_train, nearest_val = [], []
    for g in gen_keys:
        nearest_train.append(max((iou_keys(g, t) for t in train_bank),
                                 default=0.0))
        nearest_val.append(max((iou_keys(g, t) for t in val_bank),
                              default=0.0))
    # size-validity only: voxel-set IoU between two honestly different
    # poses/aspects of the same class is ~0.1-0.2, so nearest-IoU is a
    # NOVELTY metric (low = not a copy), not a validity gate; shape
    # validity is judged by renders and the conditional-classification
    # oracle (scripts/cond_control.py)
    hi_count = 3.0 * float(np.median(tcounts))
    valid_frac = float(np.mean(
        [lo_count <= c <= hi_count for c in counts]))
    print("nearest-TRAIN IoU per sample:",
          [round(v, 3) for v in nearest_train], flush=True)
    print("nearest-val IoU per sample:",
          [round(v, 3) for v in nearest_val], flush=True)
    hist, edges = np.histogram(nearest_train, bins=np.arange(0, 1.05, 0.1))
    print("novelty histogram (nearest-train IoU):",
          dict(zip([f"{e:.1f}" for e in edges[:-1]], hist.tolist())),
          flush=True)

    if cfg.viz_dir:
        st_v, st_vrec = reconstruct(vae_vars, *val_batches[0],
                                    jax.random.PRNGKey(9))
        sout = generate(dstate.params, vae_vars, *val_batches[0],
                        jax.random.PRNGKey(cfg.seed + 100))
        tag = f"_{cfg.tag}" if cfg.tag else ""
        path = mt.utils.render_pointclouds(
            [mt.utils.sparse_tensor_clouds(st_v, 1)[0],
             mt.utils.sparse_tensor_clouds(st_vrec, 1)[0]] +
            mt.utils.sparse_tensor_clouds(sout, b),
            os.path.join(cfg.viz_dir, f"e2e_generalize{tag}.png"),
            titles=["held-out data", "held-out recon"] +
                   [f"generated {i}" for i in range(b)],
            resolution=res)
        print("render:", path, flush=True)

    result = {
        "val_recon_iou": final_val_iou,
        "train_recon_iou": train_iou,
        "gen_size_valid_frac": valid_frac,
        "gen_nearest_train_iou_mean": float(np.mean(nearest_train)),
        "gen_nearest_train_iou_max": float(np.max(nearest_train)),
        "gen_nearest_val_iou_mean": float(np.mean(nearest_val)),
        "gen_voxels_median": int(np.median(counts)),
        "prediction_type": cfg.prediction_type,
        "stream": bool(cfg.stream or cfg.stream_device),
        "stream_device": cfg.stream_device,
        "resolution": res,
    }
    print(json.dumps(result), flush=True)
    return result


if __name__ == "__main__":
    main()
