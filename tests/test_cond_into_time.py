"""AdaGN-style class->time conditioning (`UNet.cond_into_time`).

The reference conditions only through cross-attention
(`/root/reference/examples/diffusion_cross.py:352-356`); guided-diffusion
practice additionally folds the pooled condition into the timestep
embedding so every FiLM/scale-shift norm carries it.  These tests pin the
two contracts of the opt-in flag: (a) the pooled projection receives
gradient, (b) the projection is bias-free, so a CFG-dropped all-zero
condition leaves the timestep embedding exactly untouched and the
unconditional branch stays truly unconditional.
"""

import numpy as np

import jax
import jax.numpy as jnp

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu import models as mm


def _latent(rng, b=2, cap=64, c=4, stride=8, res=4):
    vox = [np.unique(rng.randint(0, res, (20, 3)), axis=0) * stride
           for _ in range(b)]
    coords = mt.ops.batched_coordinates_np(vox)
    cpad, vpad = mt.ops.pad_to_capacity(coords, cap)
    feats = rng.randn(cap, c).astype(np.float32)
    return jax.jit(lambda co, f, v: mt.sparse_tensor(
        co, f, capacity=cap, batch_size=b, stride=stride, valid=v))(
        jnp.asarray(cpad), jnp.asarray(feats), jnp.asarray(vpad))


def _unet(**kw):
    return mm.UNet(channels=(4, 8, 16, 16), attn_max_len=64,
                   down_capacities=(32, 16, 8), group=4,
                   with_cross_attn=True, cross_attention_dim=32,
                   cond_into_time=True, **kw)


def test_cond_into_time_grad_and_sensitivity():
    rng = np.random.RandomState(0)
    lat = _latent(rng)
    unet = _unet()
    t0 = jnp.zeros((2,), jnp.int32)
    ehs = jnp.asarray(rng.randn(2, 5, 32).astype(np.float32) * 0.1)
    vs = jax.jit(unet.init)(jax.random.PRNGKey(0), lat, t0, ehs)
    proj = vs["params"]["cond_time_proj"]
    assert set(proj.keys()) == {"kernel"}  # bias-free by contract
    assert proj["kernel"].shape == (32, 16)  # D -> 4*ch[0]

    def loss(params, e):
        return jnp.mean(unet.apply(params, lat, t0, e).F ** 2)

    l1, g = jax.jit(jax.value_and_grad(loss))(vs, ehs)
    gk = float(jnp.sum(g["params"]["cond_time_proj"]["kernel"] ** 2))
    assert np.isfinite(float(l1)) and gk > 0
    l2 = jax.jit(loss)(vs, ehs * 3.0)
    assert abs(float(l1) - float(l2)) > 1e-9


def test_zero_condition_leaves_temb_untouched():
    """CFG unconditional branch: a zero condition adds exactly zero to
    temb, so the output must be bit-identical to multiplying the
    projection kernel by zero (i.e. the flag is inert for zero cond)."""
    rng = np.random.RandomState(1)
    lat = _latent(rng)
    unet = _unet()
    t0 = jnp.zeros((2,), jnp.int32)
    ehs0 = jnp.zeros((2, 5, 32), jnp.float32)
    vs = jax.jit(unet.init)(jax.random.PRNGKey(0), lat, t0, ehs0)
    out = jax.jit(lambda v, e: unet.apply(v, lat, t0, e).F)(vs, ehs0)
    # zeroing the projection kernel must not change anything for zero cond
    vz = jax.tree_util.tree_map(lambda x: x, vs)
    vz = {"params": dict(vs["params"])}
    vz["params"]["cond_time_proj"] = {
        "kernel": jnp.zeros_like(vs["params"]["cond_time_proj"]["kernel"])}
    out_z = jax.jit(lambda v, e: unet.apply(v, lat, t0, e).F)(vz, ehs0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_z))
