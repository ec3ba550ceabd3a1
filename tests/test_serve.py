"""Serving artifacts: exported generation program round-trips exactly."""

import pytest

# compile-heavy: excluded from the fast subset
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu import diffusion as md
from mink_octtree_stablediffusion_tpu import models as mm


def _tiny_setup(rng):
    b, cap, res = 2, 256, 16
    vox = [np.unique(rng.randint(0, res, (40, 3)), axis=0) for _ in range(b)]
    coords = mt.ops.batched_coordinates_np(vox)
    cpad, valid = mt.ops.pad_to_capacity(coords, cap)
    vae = mm.VAE(channels=(8, 12, 16, 16, 4),
                 encoder_capacities=(128, 64, 32, 32, 32),
                 decoder_capacities=(32, 64, 128, 256))
    unet = mm.UNet(channels=(4, 8, 16, 16), attn_max_len=32, group=4,
                   down_capacities=(16, 8, 8))
    sched = md.DDIMScheduler.create()
    fn = mt.serve.build_generate_fn(
        vae, unet, sched, input_capacity=cap, batch_size=b, resolution=res,
        sample_steps=3)
    feats = jnp.ones((cap, 1)) * jnp.asarray(valid)[:, None]
    st = mt.sparse_tensor(jnp.asarray(cpad), feats, capacity=cap,
                          batch_size=b, valid=jnp.asarray(valid),
                          extent=(res,) * 3)
    k = jax.random.PRNGKey(0)
    vae_vars = jax.jit(vae.init)(k, st, st.grid, k)
    mean, _ = jax.jit(lambda v, s: vae.apply(
        {"params": v["params"], "batch_stats": v.get("batch_stats", {})},
        s, method=vae.encode))(vae_vars, st)
    unet_vars = jax.jit(unet.init)(k, mean, jnp.zeros((b,), jnp.int32))
    return fn, vae_vars, unet_vars["params"], cpad, valid


def test_export_roundtrip_exact(rng):
    fn, vae_vars, unet_params, cpad, valid = _tiny_setup(rng)
    key = jax.random.PRNGKey(7)
    ref_c, ref_v = jax.jit(fn)(vae_vars, unet_params, jnp.asarray(cpad),
                               jnp.asarray(valid), key)
    data = mt.serve.export_generate(fn, vae_vars, unet_params, cpad, valid)
    assert isinstance(data, bytes) and len(data) > 0
    call = mt.serve.load_generate(data)
    out_c, out_v = call(vae_vars, unet_params, jnp.asarray(cpad),
                        jnp.asarray(valid), key)
    np.testing.assert_array_equal(np.asarray(out_c), np.asarray(ref_c))
    np.testing.assert_array_equal(np.asarray(out_v), np.asarray(ref_v))


def test_artifact_save_load(rng, tmp_path):
    fn, vae_vars, unet_params, cpad, valid = _tiny_setup(rng)
    d = mt.serve.save_artifact(str(tmp_path / "artifact"), fn, vae_vars,
                               unet_params, example=(cpad, valid))
    generate = mt.serve.load_artifact(d)
    coords, mask = generate(cpad, valid, seed=7)
    ref_c, ref_v = jax.jit(fn)(vae_vars, unet_params, jnp.asarray(cpad),
                               jnp.asarray(valid), jax.random.PRNGKey(7))
    np.testing.assert_array_equal(coords, np.asarray(ref_c))
    np.testing.assert_array_equal(mask, np.asarray(ref_v))
    assert mask.sum() > 0
