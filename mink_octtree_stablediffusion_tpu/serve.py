"""Serving: ahead-of-time exported generation artifacts (`jax.export`).

The reference has no serving story (training scripts only); for production
TPU deployment the natural unit is an **exported StableHLO artifact** of the
whole generation program — 64-step denoising `lax.scan` + pruning-decoder
re-growth compiled as ONE function — so serving workers never retrace or
recompile Python (cold-start = artifact load + XLA compile from a stable
serialized form, and the compile cache makes repeats instant).

Weights travel as *arguments*, not baked constants (GB-scale constants blow
up lowering — see examples/train_diffusion.py), so one artifact serves any
checkpoint with matching shapes.  `save_artifact` writes the serialized
program plus the weight pytrees; `load_artifact` returns a plain callable
``(cpad, valid, seed) -> (coords, valid_mask)``.

Typical flow::

    gen = mt.serve.build_generate_fn(vae, unet, sched, cfg...)
    mt.serve.save_artifact(dir, gen, vae_vars, unet_params,
                           example=(cpad, valid))
    ...on the serving worker...
    generate = mt.serve.load_artifact(dir)
    coords, mask = generate(cpad, valid, seed=123)
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import diffusion as md
from .tensor import SparseTensor, sparse_tensor


def build_generate_fn(
    vae,
    unet,
    scheduler,
    *,
    input_capacity: int,
    batch_size: int,
    resolution: int,
    vae_scale: float = 0.1428,
    sample_steps: int = 64,
    steps_offset: int = 0,
    guidance_scale: float = 1.0,
) -> Callable:
    """The full generation program as a pure function.

    ``fn(vae_vars, unet_params, cpad, valid, key) -> (coords, valid)``:
    encode the conditioning sample's geometry to fix the latent coordinate
    set (the reference's sampling protocol, `diffusion.py:520-658`), denoise
    pure N(0,1) features, decode with the pruning decoder, and return the
    generated stride-1 voxel set (coords int32[N_cap, 1+D], valid bool).
    """

    def fn(vae_vars, unet_params, cpad, valid, key,
           encoder_hidden_state=None):
        feats = jnp.ones((input_capacity, 1)) * valid[:, None]
        st = sparse_tensor(cpad, feats, capacity=input_capacity,
                           batch_size=batch_size, valid=valid,
                           extent=(resolution,) * 3)
        mean, _ = vae.apply(
            {"params": vae_vars["params"],
             "batch_stats": vae_vars.get("batch_stats", {})},
            st, method=vae.encode)
        latent = mean.with_features(mean.features * vae_scale)

        def unet_apply(noised, timesteps, ehs):
            return unet.apply({"params": unet_params}, noised, timesteps,
                              ehs, train=False)

        z = md.sample_latent(unet_apply, scheduler, latent, key,
                             num_inference_steps=sample_steps,
                             encoder_hidden_state=encoder_hidden_state,
                             guidance_scale=guidance_scale,
                             steps_offset=steps_offset)
        z = z.with_features(z.features / vae_scale)
        _, _, sout = vae.apply(
            {"params": vae_vars["params"],
             "batch_stats": vae_vars.get("batch_stats", {})},
            z, st.grid, train=False, method=vae.decode)
        return sout.grid.coords, sout.grid.valid

    return fn


def export_generate(fn, vae_vars, unet_params, cpad, valid,
                    platforms: Optional[list] = None) -> bytes:
    """Serialize the jitted generation program to portable bytes
    (StableHLO via `jax.export`; compile on load, any worker)."""
    from jax import export as jexport

    key = jax.random.PRNGKey(0)
    args = (vae_vars, unet_params, jnp.asarray(cpad), jnp.asarray(valid), key)
    specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
        args)
    exp = jexport.export(jax.jit(fn), platforms=platforms)(*specs)
    return bytes(exp.serialize())


def load_generate(data: bytes) -> Callable:
    """Deserialize an exported generation program to a callable
    ``(vae_vars, unet_params, cpad, valid, key) -> (coords, valid)``."""
    from jax import export as jexport

    exp = jexport.deserialize(data)
    return jax.jit(exp.call)


def save_artifact(directory: str, fn, vae_vars, unet_params, example,
                  platforms: Optional[list] = None) -> str:
    """Write a self-contained serving artifact: the exported program plus
    the weight pytrees (flax serialization).  ``example`` = (cpad, valid)
    arrays fixing the static shapes."""
    from flax import serialization

    os.makedirs(directory, exist_ok=True)
    cpad, valid = example
    data = export_generate(fn, vae_vars, unet_params, cpad, valid,
                           platforms=platforms)
    with open(os.path.join(directory, "program.jaxexport"), "wb") as f:
        f.write(data)
    with open(os.path.join(directory, "vae_vars.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(vae_vars))
    with open(os.path.join(directory, "unet_params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(unet_params))
    return directory


def load_artifact(directory: str) -> Callable:
    """Load a serving artifact → ``generate(cpad, valid, seed)`` callable
    returning host numpy (coords, valid).  Weight pytrees are restored from
    the artifact and closed over."""
    from flax import serialization

    with open(os.path.join(directory, "program.jaxexport"), "rb") as f:
        call = load_generate(f.read())
    with open(os.path.join(directory, "vae_vars.msgpack"), "rb") as f:
        vae_bytes = f.read()
    with open(os.path.join(directory, "unet_params.msgpack"), "rb") as f:
        unet_bytes = f.read()
    # msgpack restores dict-of-arrays trees without a template
    vae_vars = serialization.msgpack_restore(vae_bytes)
    unet_params = serialization.msgpack_restore(unet_bytes)

    def generate(cpad, valid, seed: int = 0):
        key = jax.random.PRNGKey(seed)
        coords, mask = call(vae_vars, unet_params, jnp.asarray(cpad),
                            jnp.asarray(valid), key)
        return np.asarray(coords), np.asarray(mask)

    return generate
