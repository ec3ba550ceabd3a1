"""Dense 3D baseline + cross-check of sparse conv against the dense path on
a fully-occupied grid (SURVEY.md §7.3: dense baselines as cross-check)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu import models as mm
from mink_octtree_stablediffusion_tpu.ops import get_coords_map, stride_grid


def test_dense_unet3d_shapes(rng):
    net = mm.UNet3DModel(out_channels=2, block_channels=(8, 16),
                         layers_per_block=1, attn_levels=(1,), groups=4)
    x = jnp.asarray(rng.randn(2, 8, 8, 8, 1).astype(np.float32))
    t = jnp.zeros((2,), jnp.int32)
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x, t)
    out = jax.jit(lambda v, x, t: net.apply(v, x, t))(variables, x, t)
    assert out.shape == (2, 8, 8, 8, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_get_coords_map(rng):
    coords = np.concatenate(
        [np.zeros((32, 1), np.int32), rng.randint(0, 8, (32, 3))],
        axis=1).astype(np.int32)
    st = jax.jit(lambda c: mt.sparse_tensor(c, jnp.ones((32, 1)),
                                            capacity=32))(jnp.asarray(coords))
    coarse = jax.jit(lambda g: stride_grid(g, 2, 32))(st.grid)
    cmap = jax.jit(get_coords_map)(st.grid, coarse)
    cn, cc = np.asarray(st.C), np.asarray(coarse.coords)
    v = np.asarray(st.valid)
    m = np.asarray(cmap)
    for i in range(32):
        if v[i]:
            assert m[i] >= 0
            np.testing.assert_array_equal(cc[m[i]][1:], (cn[i][1:] // 2) * 2)
        else:
            assert m[i] == -1


def _np_attention(tokens, wq, wkv, heads, ctx=None):
    """Independent numpy MHA (no mask): softmax(qk/sqrt(hd)) v."""
    b, l, c = tokens.shape
    q = tokens @ wq
    src = tokens if ctx is None else ctx
    kv = src @ wkv
    k, v = kv[..., :c], kv[..., c:]
    hd = c // heads

    def h(t):
        return t.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)

    logits = h(q) @ h(k).transpose(0, 1, 3, 2) / np.sqrt(hd)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    return (w @ h(v)).transpose(0, 2, 1, 3).reshape(b, -1, c)


def test_dense_attention_matches_reference_math(rng):
    """`DenseAttention` == the reference `denseAttention` pipeline
    (`diffusion_block_dense.py:640-680`): attn → LayerNorm → SiLU → to_out
    → +residual (the dense path keeps the norm+act the sparse path comments
    out)."""
    b, l, c, heads = 2, 12, 8, 2
    x = rng.randn(b, l, c).astype(np.float32)
    layer = mm.DenseAttention(num_heads=heads)
    v = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = layer.apply(v, jnp.asarray(x))

    p = v["params"]
    o = _np_attention(x, np.asarray(p["to_q"]["kernel"]),
                      np.asarray(p["to_kv"]["kernel"]), heads)
    mu = o.mean(-1, keepdims=True)
    var = o.var(-1, keepdims=True)
    o = (o - mu) / np.sqrt(var + 1e-6)
    o = o * np.asarray(p["norm1"]["scale"]) + np.asarray(p["norm1"]["bias"])
    o = o * (1.0 / (1.0 + np.exp(-o)))  # silu
    o = o @ np.asarray(p["to_out"]["kernel"]) + np.asarray(p["to_out"]["bias"])
    np.testing.assert_allclose(np.asarray(out), o + x, rtol=2e-4, atol=1e-5)


def test_dense_attention_cross_attends(rng):
    b, l, c, s, dc = 2, 6, 8, 3, 16
    x = rng.randn(b, l, c).astype(np.float32)
    ctx = rng.randn(b, s, dc).astype(np.float32)
    layer = mm.DenseAttention(num_heads=2, cross_attention_dim=dc)
    v = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ctx))
    o1 = layer.apply(v, jnp.asarray(x), jnp.asarray(ctx))
    o2 = layer.apply(v, jnp.asarray(x), jnp.asarray(ctx) + 1.0)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_sparse_attention_matches_dense_tokens_on_full_grid(rng):
    """Dense↔sparse cross-check (VERDICT r1 item 4): on a fully-occupied
    grid the sparse packed-masked attention must equal unmasked dense-token
    attention with the same weights (sparse structure adds nothing there)."""
    from mink_octtree_stablediffusion_tpu import nn as mnn

    res, c, b = 4, 8, 2
    n = res ** 3
    g = np.stack(np.meshgrid(*([np.arange(res)] * 3), indexing="ij"),
                 axis=-1).reshape(-1, 3)
    coords = np.concatenate(
        [np.concatenate([np.full((n, 1), bi), g], 1) for bi in range(b)]
    ).astype(np.int32)
    feats = rng.randn(b * n, c).astype(np.float32)
    st = jax.jit(lambda co, f: mt.sparse_tensor(
        co, f, capacity=b * n, batch_size=b, extent=(res,) * 3))(
        jnp.asarray(coords), jnp.asarray(feats))

    tr = mnn.SparseTransformer(max_len=n, num_heads=2)
    v = tr.init(jax.random.PRNGKey(0), st)
    out = tr.apply(v, st)

    packed, mask, pos = st.decomposed_features(n)
    assert bool(jnp.all(mask))  # fully occupied: nothing is padding
    p = v["params"]["SparseAttention_0"]
    o = _np_attention(np.asarray(packed), np.asarray(p["to_q"]["kernel"]),
                      np.asarray(p["to_kv"]["kernel"]), 2)
    o = o @ np.asarray(p["to_out"]["kernel"]) + np.asarray(p["to_out"]["bias"])
    o = o + np.asarray(packed)  # residual
    # scatter the dense-token result back to rows and compare
    got_packed, _, _ = out.decomposed_features(n)
    np.testing.assert_allclose(np.asarray(got_packed), o, rtol=2e-4,
                               atol=1e-5)


@pytest.mark.slow
def test_unet3d_condition_model_trains_and_conditions(rng):
    b, r = 2, 8
    x = jnp.asarray(rng.randn(b, r, r, r, 2).astype(np.float32))
    t = jnp.zeros((b,), jnp.int32)
    ehs = jnp.asarray(rng.randn(b, 3, 16).astype(np.float32))
    net = mm.UNet3DConditionModel(out_channels=2, block_channels=(8, 16),
                                  cross_attention_dim=16,
                                  attention_head_dim=4, groups=4,
                                  cross_attn_levels=(1,))
    v = jax.jit(net.init)(jax.random.PRNGKey(0), x, t, ehs)

    @jax.jit
    def loss(params, ehs):
        out = net.apply({"params": params}, x, t, ehs)
        assert out.shape == x.shape
        return jnp.mean((out - x) ** 2)

    l, g = jax.value_and_grad(loss)(v["params"], ehs)
    assert np.isfinite(float(l))
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
    # conditioning reaches the output
    o1 = net.apply(v, x, t, ehs)
    o2 = net.apply(v, x, t, ehs + 1.0)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
