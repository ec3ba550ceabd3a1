"""Conditioning at REAL CLIP dimensions (VERDICT r4 item 8).

The reference feeds [B,77,768] CLIPText last-hidden-states and
[B,257,1024] CLIPVision states into every UNet block
(`/root/reference/examples/diffusion_cross.py:352-356,809-812`,
`diffusion_cross_image.py:838-842`).  Zero egress excuses the CLIP
*weights*, not the *dims*: these tests prove the attention packing and
the UNet cross-attention path hold memory/shape at S=77–257, D=768–1024.
"""

import numpy as np

import jax
import jax.numpy as jnp

import pytest

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu import nn as mnn
from mink_octtree_stablediffusion_tpu import models as mm


def batched_tensor(rng, b=2, cap=64, c=8, res=16):
    vox = [np.unique(rng.randint(0, res, (24, 3)), axis=0)
           for _ in range(b)]
    coords = mt.ops.batched_coordinates_np(vox)
    cpad, vpad = mt.ops.pad_to_capacity(coords, cap)
    feats = rng.randn(cap, c).astype(np.float32)
    return jax.jit(lambda co, f, v: mt.sparse_tensor(
        co, f, capacity=cap, batch_size=b, valid=v, extent=(res,) * 3))(
        jnp.asarray(cpad), jnp.asarray(feats), jnp.asarray(vpad))


@pytest.mark.parametrize("s,d", [(77, 768), (257, 1024)])
def test_sparse_transformer_clip_dims(s, d):
    """Cross-attention at CLIP text [77,768] and vision [257,1024] dims."""
    rng = np.random.RandomState(0)
    st = batched_tensor(rng)
    m = mnn.SparseTransformer(max_len=64, cross_attention_dim=d)
    ehs = jnp.asarray(rng.randn(2, s, d).astype(np.float32) * 0.05)
    variables = m.init(jax.random.PRNGKey(0), st, encoder_hidden_state=ehs)
    out1 = jax.jit(lambda v, t, e: m.apply(v, t, encoder_hidden_state=e))(
        variables, st, ehs)
    out2 = jax.jit(lambda v, t, e: m.apply(v, t, encoder_hidden_state=e))(
        variables, st, ehs * 2.0)
    assert np.all(np.isfinite(np.asarray(out1.F)))
    assert np.abs(np.asarray(out1.F) - np.asarray(out2.F)).max() > 1e-5
    # to_kv projects FROM the cross dim: its kernel must be [D, 2C]
    kv = variables["params"]["SparseAttention_0"]["to_kv"]["kernel"]
    assert kv.shape == (d, 16)


def test_unet_cross_attn_clip_text_dims():
    """Full UNet fwd+bwd with [B,77,768] conditioning — the
    diffusion_cross text path at true CLIP width."""
    rng = np.random.RandomState(1)
    b, cap, c, stride, res = 2, 64, 4, 8, 4
    vox = [np.unique(rng.randint(0, res, (20, 3)), axis=0) * stride
           for _ in range(b)]
    coords = mt.ops.batched_coordinates_np(vox)
    cpad, vpad = mt.ops.pad_to_capacity(coords, cap)
    feats = rng.randn(cap, c).astype(np.float32)
    lat = jax.jit(lambda co, f, v: mt.sparse_tensor(
        co, f, capacity=cap, batch_size=b, stride=stride, valid=v))(
        jnp.asarray(cpad), jnp.asarray(feats), jnp.asarray(vpad))
    unet = mm.UNet(channels=(4, 8, 16, 16), attn_max_len=64,
                   down_capacities=(32, 16, 8), group=4,
                   with_cross_attn=True, cross_attention_dim=768)
    t0 = jnp.zeros((b,), jnp.int32)
    ehs = jnp.asarray(rng.randn(b, 77, 768).astype(np.float32) * 0.02)
    vs = jax.jit(unet.init)(jax.random.PRNGKey(0), lat, t0, ehs)

    def loss(params, e):
        out = unet.apply(params, lat, t0, e)
        return jnp.mean(out.F ** 2)

    l1, g = jax.jit(jax.value_and_grad(loss))(vs, ehs)
    gn = sum(float(jnp.sum(x ** 2)) for x in jax.tree.leaves(g)) ** 0.5
    assert np.isfinite(float(l1)) and np.isfinite(gn) and gn > 0
    # conditioning reaches the output
    l2 = jax.jit(loss)(vs, ehs * 3.0)
    assert abs(float(l1) - float(l2)) > 1e-9
