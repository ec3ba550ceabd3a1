"""Training-harness tests: single-device + 8-virtual-device data-parallel
steps (grad psum), checkpoint save/auto-resume round-trip, determinism
(SURVEY.md §4 item 5, §5 determinism plan)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu import nn as mnn
from mink_octtree_stablediffusion_tpu import train as mtrain


def tiny_batch(rng, cap=32, b=2):
    coords = np.concatenate(
        [rng.randint(0, b, (cap // 2, 1)), rng.randint(0, 8, (cap // 2, 3))],
        axis=1).astype(np.int32)
    cpad, valid = mt.ops.pad_to_capacity(coords, cap)
    feats = (rng.randn(cap, 4) * valid[:, None]).astype(np.float32)
    return cpad, valid, feats


class TinyModel(mnn.SparseConv):
    pass


def make_model_and_state(rng, cap=32, b=2, lr=1e-2):
    cpad, valid, feats = tiny_batch(rng, cap, b)

    conv = mnn.SparseConv(8, kernel_size=3)

    def build(cpad, valid, feats):
        return mt.sparse_tensor(cpad, feats, capacity=cap, batch_size=b,
                                valid=valid)

    st0 = build(jnp.asarray(cpad), jnp.asarray(valid), jnp.asarray(feats))
    variables = jax.jit(conv.init)(jax.random.PRNGKey(0), st0)
    tx = optax.adam(lr)
    state = mtrain.TrainState.create(variables["params"], {}, tx)

    def loss_fn(params, batch_stats, batch, rng):
        cpad, valid, feats = batch
        st = build(cpad, valid, feats)
        out = conv.apply({"params": params}, st)
        return jnp.sum(out.features ** 2), ({}, batch_stats)

    return state, loss_fn, (cpad, valid, feats)


def test_single_device_step_and_determinism(rng):
    state, loss_fn, batch = make_model_and_state(rng)
    step = mtrain.make_train_step(loss_fn)
    b = tuple(map(jnp.asarray, batch))
    k = jax.random.PRNGKey(1)
    s1, l1, _ = step(state, b, k)
    s2, l2, _ = step(state, b, k)
    # same seed ⇒ bit-identical step (functional design, no shared state)
    assert float(l1) == float(l2)
    for a, c in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    assert int(s1.step) == 1


def test_dp_train_step_matches_mean_of_grads(rng):
    state, loss_fn, batch = make_model_and_state(rng)
    n_dev = jax.device_count()
    assert n_dev == 8
    mesh = mt.parallel.data_parallel_mesh()
    dp_step = mtrain.make_dp_train_step(loss_fn, mesh)
    # identical batch on every device → dp step == single step
    dev_batch = tuple(jnp.asarray(np.stack([x] * n_dev)) for x in batch)
    rngs = jnp.stack([jax.random.PRNGKey(1)] * n_dev)
    s_dp, loss_dp, _ = dp_step(state, dev_batch, rngs)
    s_single, loss_single, _ = mtrain.make_train_step(loss_fn)(
        state, tuple(map(jnp.asarray, batch)), jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(loss_dp), float(loss_single), rtol=1e-5)
    for a, c in zip(jax.tree.leaves(s_dp.params),
                    jax.tree.leaves(s_single.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-5,
                                   atol=1e-6)


def test_checkpoint_save_restore_roundtrip(rng, tmp_path):
    state, loss_fn, batch = make_model_and_state(rng)
    step = mtrain.make_train_step(loss_fn)
    b = tuple(map(jnp.asarray, batch))
    state, _, _ = step(state, b, jax.random.PRNGKey(1))
    state, _, _ = step(state, b, jax.random.PRNGKey(2))

    ckpt = mtrain.CheckpointManager(str(tmp_path / "ckpt"))
    ckpt.save(2, state)
    assert ckpt.latest_step() == 2

    fresh, _, _ = make_model_and_state(np.random.RandomState(0))
    restored = mtrain.CheckpointManager(str(tmp_path / "ckpt")).restore(fresh)
    assert int(restored.step) == 2
    for a, c in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    # params-only handoff (VAE→diffusion pattern)
    params = mtrain.CheckpointManager(str(tmp_path / "ckpt")).restore_params(
        fresh.params)
    for a, c in zip(jax.tree.leaves(params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_warmup_cosine_schedule():
    sched = mtrain.warmup_cosine(1e-3, warmup_steps=10, total_steps=100)
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(10)) == pytest.approx(1e-3, rel=1e-3)
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-6)
    assert float(sched(5)) == pytest.approx(5e-4, rel=1e-2)


def test_bf16_policy_training_loss_decreases(rng):
    # end-to-end training under the bf16 MXU policy: params stay fp32,
    # compute runs in bf16 (fp32 accumulation), loss still optimizes
    from mink_octtree_stablediffusion_tpu import ops as mops

    try:
        mops.set_default_compute_dtype(jnp.bfloat16)
        state, loss_fn, batch = make_model_and_state(rng, lr=1e-2)
        step = mtrain.make_train_step(loss_fn)
        b = tuple(map(jnp.asarray, batch))
        losses = []
        s = state
        for i in range(6):
            s, loss, _ = step(s, b, jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0] * 0.9, losses
        assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(s.params))
    finally:
        mops.set_default_compute_dtype(None)
