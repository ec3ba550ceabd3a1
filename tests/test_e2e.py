"""End-to-end learning tests — the reference's overfit fixture strategy
(`examples/dataset.py:182-183` small_dataset) as goldens: a tiny VAE must
drive per-level BCE down on 4 fixed shapes, and the bf16 conv path must agree
with fp32 to bf16 precision."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu import models as mm
from mink_octtree_stablediffusion_tpu import nn as mnn
from mink_octtree_stablediffusion_tpu import train as mtrain
from mink_octtree_stablediffusion_tpu.data import SyntheticShapes, collate_pointclouds


@pytest.mark.slow
def test_vae_overfit_bce_decreases(rng):
    ds = SyntheticShapes(resolution=16, num_samples=4, points_per_shape=512)
    cap, b = 1024, 4
    cpad, valid, feats, _ = collate_pointclouds(
        [ds[i]["coords"] for i in range(4)], cap)
    batch = (jnp.asarray(cpad), jnp.asarray(valid), jnp.asarray(feats))

    vae = mm.VAE(channels=(8, 16, 16, 16, 4),
                 encoder_capacities=(512, 128, 64, 64, 64),
                 decoder_capacities=(64, 512, 1024, 2048))

    def build(cpad, valid, feats):
        return mt.sparse_tensor(cpad, feats, capacity=cap, batch_size=b,
                                valid=valid, extent=(16, 16, 16))

    st0 = build(*batch)
    variables = jax.jit(vae.init)(jax.random.PRNGKey(0), st0, st0.grid,
                                  jax.random.PRNGKey(1))
    tx = optax.adam(3e-3)
    state = mtrain.TrainState.create(variables["params"],
                                     variables.get("batch_stats", {}), tx)

    def loss_fn(params, batch_stats, batch, rng):
        st = build(*batch)
        (out_clss, targets, _, mean, log_var, _), upd = vae.apply(
            {"params": params, "batch_stats": batch_stats}, st, st.grid, rng,
            mutable=["batch_stats"])
        loss, aux = mm.vae_loss(out_clss, targets, mean, log_var)
        return loss, (aux, upd["batch_stats"])

    step = mtrain.make_train_step(loss_fn)
    rng_j = jax.random.PRNGKey(2)
    first = None
    for i in range(25):
        rng_j, sub = jax.random.split(rng_j)
        state, loss, aux = step(state, batch, sub)
        if first is None:
            first = float(aux["bce"])
    last = float(aux["bce"])
    # learning must actually happen on the overfit fixture
    assert last < 0.7 * first, (first, last)


def test_bf16_conv_close_to_fp32(rng):
    coords = np.concatenate(
        [np.zeros((64, 1), np.int32), rng.randint(0, 8, (64, 3))],
        axis=1).astype(np.int32)
    st = jax.jit(lambda c, f: mt.sparse_tensor(c, f, capacity=64))(
        jnp.asarray(coords), jnp.asarray(rng.randn(64, 16).astype(np.float32)))
    conv32 = mnn.SparseConv(16, kernel_size=3)
    convbf = mnn.SparseConv(16, kernel_size=3, dtype=jnp.bfloat16)
    params = conv32.init(jax.random.PRNGKey(0), st)
    o32 = jax.jit(lambda p, s: conv32.apply(p, s))(params, st)
    obf = jax.jit(lambda p, s: convbf.apply(p, s))(params, st)
    assert obf.features.dtype == o32.features.dtype == jnp.float32
    err = np.abs(np.asarray(o32.F) - np.asarray(obf.F))
    rel = err.max() / max(np.abs(np.asarray(o32.F)).max(), 1e-6)
    assert rel < 0.05, rel  # bf16 mantissa ≈ 8 bits
