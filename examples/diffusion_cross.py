"""Text/image-conditioned sparse latent diffusion — the reference's
`examples/diffusion_cross.py` (CLIP text, captions "a picture of a {class}")
and `diffusion_cross_image.py` (CLIP vision) TPU-native: the UNet's
cross-attention consumes conditioning embeddings [B, S, D] supplied as
arrays.  With `--cond clip-text` the embeddings come from HuggingFace
CLIPTextModel (cpu torch) when available; `--cond random` uses fixed random
embeddings keyed by class so the conditioning pathway trains end-to-end with
zero external dependencies.

Run (synthetic smoke):
    python examples/diffusion_cross.py --synthetic --steps 2 --cond random
"""

import argparse
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# persistent compile cache + JAX_PLATFORMS re-apply (the sitecustomize pins
# the platform, so the env var alone is ignored)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import os as _os
if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu import diffusion as md
from mink_octtree_stablediffusion_tpu import models as mm
from mink_octtree_stablediffusion_tpu import train as mtrain
from mink_octtree_stablediffusion_tpu.data import (
    SyntheticShapes, batch_iterator, collate_pointclouds)


class TextEncoder:
    """caption → [S, D] embedding; CLIP when available, else a per-caption
    random table (`diffusion_cross.py:809-812` uses CLIPTextModel)."""

    def __init__(self, mode: str, seq_len: int = 77, dim: int = 768,
                 clip_path: str = "openai/clip-vit-large-patch14"):
        self.mode = mode
        self.seq_len, self.dim = seq_len, dim
        self.cache = {}
        if mode == "clip-text":
            try:
                import torch  # noqa
                from transformers import CLIPTextModel, CLIPTokenizer

                self.tok = CLIPTokenizer.from_pretrained(clip_path)
                self.model = CLIPTextModel.from_pretrained(clip_path)
                self.model.eval()
            except Exception as e:  # no weights in zero-egress envs
                logging.getLogger(__name__).warning(
                    "CLIP unavailable (%s); falling back to random cond", e)
                self.mode = "random"
        elif mode == "clip-image":
            # `diffusion_cross_image.py:838-842`: CLIPVisionModel embeddings
            # [B, 257, 1024]; rendered views are preprocessed offline.  In
            # zero-egress environments this degrades to the random table.
            try:
                import torch  # noqa
                from transformers import CLIPImageProcessor, CLIPVisionModel

                self.proc = CLIPImageProcessor.from_pretrained(clip_path)
                self.model = CLIPVisionModel.from_pretrained(clip_path)
                self.model.eval()
                self.seq_len, self.dim = 257, 1024
            except Exception as e:
                logging.getLogger(__name__).warning(
                    "CLIP vision unavailable (%s); random cond", e)
                self.mode = "random"

    def __call__(self, captions):
        if self.mode == "clip-text":
            import torch

            with torch.no_grad():
                toks = self.tok(list(captions), padding="max_length",
                                max_length=self.seq_len, truncation=True,
                                return_tensors="pt")
                out = self.model(**toks).last_hidden_state
            return jnp.asarray(out.numpy())
        rows = []
        for c in captions:
            if c not in self.cache:
                r = np.random.RandomState(abs(hash(c)) % (2 ** 31))
                self.cache[c] = r.randn(self.seq_len, self.dim).astype(
                    np.float32)
            rows.append(self.cache[c])
        return jnp.asarray(np.stack(rows))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--vae_channel", type=int, nargs=5,
                   default=[8, 16, 32, 32, 4])
    p.add_argument("--unet_channel", type=int, nargs=4,
                   default=[4, 8, 16, 16])
    p.add_argument("--cond", default="random",
                   choices=["random", "clip-text", "clip-image"])
    p.add_argument("--cross_attention_dim", type=int, default=768)
    p.add_argument("--group", type=int, default=4)
    p.add_argument("--vae_scale", type=float, default=0.1428)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--input_capacity", type=int, default=4096)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("diffusion_cross")
    np_rng = np.random.RandomState(args.seed)

    ds = SyntheticShapes(resolution=args.resolution, num_samples=128,
                         with_class=True)
    encoder = TextEncoder(args.cond, dim=args.cross_attention_dim)

    from examples.train_vae import capacities

    enc_caps, dec_caps = capacities(args.input_capacity)
    vae = mm.VAE(channels=tuple(args.vae_channel),
                 encoder_capacities=enc_caps, decoder_capacities=dec_caps)
    latent_cap = enc_caps[2]
    unet = mm.UNet(channels=tuple(args.unet_channel), with_attn=True,
                   with_cross_attn=True,
                   cross_attention_dim=args.cross_attention_dim,
                   group=args.group,
                   down_capacities=(max(latent_cap // 2, 16),
                                    max(latent_cap // 4, 8),
                                    max(latent_cap // 8, 8)))
    sched = md.DDPMScheduler.create()

    cap, b = args.input_capacity, args.batch_size

    def build(cpad, valid):
        feats = jnp.ones((cap, 1)) * valid[:, None]
        return mt.sparse_tensor(cpad, feats, capacity=cap, batch_size=b,
                                valid=valid,
                                extent=(args.resolution,) * 3)

    samples = [ds[i] for i in range(b)]
    cpad, valid, _, _ = collate_pointclouds([s["coords"] for s in samples],
                                            cap)
    st0 = build(jnp.asarray(cpad), jnp.asarray(valid))
    rng = jax.random.PRNGKey(args.seed)
    vae_vars = jax.jit(vae.init)(rng, st0, st0.grid, rng)
    vae_vars = jax.tree.map(jax.lax.stop_gradient, vae_vars)

    def encode(st, vv):
        mean, _ = vae.apply(
            {"params": vv["params"],
             "batch_stats": vv.get("batch_stats", {})},
            st, method=vae.encode)
        return mean.with_features(
            jax.lax.stop_gradient(mean.features * args.vae_scale))

    lat0 = jax.jit(encode)(st0, vae_vars)
    ehs0 = encoder([s["caption"] for s in samples])
    unet_vars = jax.jit(unet.init)(rng, lat0, jnp.zeros((b,), jnp.int32),
                                   ehs0)
    log.info("unet params: %s", mt.utils.count_params(unet_vars["params"]))

    tx = mtrain.diffusion_optimizer(args.lr)
    state = mtrain.TrainState.create(unet_vars["params"], {}, tx)

    def loss_fn(params, batch_stats, batch, rng):
        cpad, valid, ehs, vv = batch
        st = build(cpad, valid)
        latent = encode(st, vv)

        def unet_apply(noised, timesteps, cond):
            return unet.apply({"params": params}, noised, timesteps, cond)

        loss, aux = md.diffusion_training_loss(
            unet_apply, sched, latent, rng, encoder_hidden_state=ehs)
        return loss, (aux, batch_stats)

    step_fn = mtrain.make_train_step(loss_fn)
    step, t0 = 0, time.time()
    while True:
        for samples in batch_iterator(ds, b, np_rng):
            cpad, valid, _, _ = collate_pointclouds(
                [s["coords"] for s in samples], cap)
            ehs = encoder([s["caption"] for s in samples])
            rng, sub = jax.random.split(rng)
            state, loss, aux = step_fn(
                state, (jnp.asarray(cpad), jnp.asarray(valid), ehs,
                        vae_vars), sub)
            step += 1
            if step % 5 == 0 or (args.steps and step >= args.steps):
                log.info("step %d loss %.5f (%.2f s/step)", step, float(loss),
                         (time.time() - t0) / 5)
                t0 = time.time()
            if args.steps and step >= args.steps:
                log.info("done")
                return


if __name__ == "__main__":
    main()
