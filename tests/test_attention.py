"""Attention tests: Morton-window transformer masking (cross-instance and
padding isolation) and cross-attention conditioning sensitivity."""

import jax
import jax.numpy as jnp
import numpy as np

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu import nn as mnn


def batched_tensor(rng, n=40, b=2, res=8, cap=64, c=8):
    coords = np.concatenate(
        [rng.randint(0, b, (n, 1)), rng.randint(0, res, (n, 3))],
        axis=1).astype(np.int32)
    feats = rng.randn(cap, c).astype(np.float32)
    cpad, valid = mt.ops.pad_to_capacity(coords, cap)
    return jax.jit(lambda co, f, v: mt.sparse_tensor(
        co, f, capacity=cap, batch_size=b, valid=v))(
        jnp.asarray(cpad), jnp.asarray(feats), jnp.asarray(valid))


def test_morton_window_isolates_instances(rng):
    st = batched_tensor(rng)
    m = mnn.MortonWindowTransformer(window_size=8)
    variables = m.init(jax.random.PRNGKey(0), st)
    out = jax.jit(lambda v, s: m.apply(v, s))(variables, st)
    f = np.asarray(out.F)
    assert np.all(np.isfinite(f))
    # padding rows must stay zero (residual of zero + masked attention)
    assert np.all(f[~np.asarray(st.valid)] == 0)

    # changing ONLY instance 1's features must not change instance 0's output
    f2 = np.asarray(st.F).copy()
    mask1 = np.asarray(st.valid) & (np.asarray(st.C[:, 0]) == 1)
    f2[mask1] += 5.0
    st2 = st.with_features(jnp.asarray(f2))
    out2 = jax.jit(lambda v, s: m.apply(v, s))(variables, st2)
    mask0 = np.asarray(st.valid) & (np.asarray(st.C[:, 0]) == 0)
    np.testing.assert_allclose(np.asarray(out2.F)[mask0], f[mask0], rtol=1e-5)


def test_sparse_transformer_isolates_instances(rng):
    st = batched_tensor(rng)
    m = mnn.SparseTransformer(max_len=64)
    variables = m.init(jax.random.PRNGKey(0), st)
    out = jax.jit(lambda v, s: m.apply(v, s))(variables, st)
    f2 = np.asarray(st.F).copy()
    mask1 = np.asarray(st.valid) & (np.asarray(st.C[:, 0]) == 1)
    f2[mask1] += 5.0
    out2 = jax.jit(lambda v, s: m.apply(v, s))(variables,
                                               st.with_features(jnp.asarray(f2)))
    mask0 = np.asarray(st.valid) & (np.asarray(st.C[:, 0]) == 0)
    np.testing.assert_allclose(np.asarray(out2.F)[mask0],
                               np.asarray(out.F)[mask0], rtol=1e-5)


def test_cross_attention_uses_conditioning(rng):
    st = batched_tensor(rng)
    m = mnn.SparseTransformer(max_len=64, cross_attention_dim=16)
    ehs = jnp.asarray(rng.randn(2, 5, 16).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), st, encoder_hidden_state=ehs)
    out1 = jax.jit(lambda v, s, e: m.apply(v, s, encoder_hidden_state=e))(
        variables, st, ehs)
    out2 = jax.jit(lambda v, s, e: m.apply(v, s, encoder_hidden_state=e))(
        variables, st, ehs * 2.0)
    # conditioning must influence the output
    diff = np.abs(np.asarray(out1.F) - np.asarray(out2.F)).max()
    assert diff > 1e-4
