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


@pytest.mark.slow
def test_dp_vae_step_matches_single(rng):
    """The FULL VAE step — generative growth, membership, top-k, pruning,
    canvas expansion, SyncBN — under the 8-device dp mesh must reproduce
    the single-device step at identical global batch (VERDICT r2 item 4;
    the reference DDP-wraps the whole VAE, `examples/ae_res.py:996-997`)."""
    from mink_octtree_stablediffusion_tpu import models as mm

    res, cap, b = 16, 256, 2
    cells = (res // 8) ** 3
    coords = np.concatenate(
        [rng.randint(0, b, (cap // 2, 1)), rng.randint(0, res, (cap // 2, 3))],
        axis=1).astype(np.int32)
    cpad, valid = mt.ops.pad_to_capacity(coords, cap)
    feats = (np.ones((cap, 1)) * valid[:, None]).astype(np.float32)
    batch = (cpad, valid, feats)

    def build(cpad, valid, feats):
        return mt.sparse_tensor(cpad, feats, capacity=cap, batch_size=b,
                                valid=valid, extent=(res,) * 3)

    def make(axis_name):
        vae = mm.VAE(channels=(4, 8, 8, 8, 2),
                     encoder_capacities=(128, 64, 32, 32, 32),
                     decoder_capacities=(max(b * cells, 16), 64, 128, 256),
                     latent_canvas=True, axis_name=axis_name)

        def loss_fn(params, batch_stats, batch, rng):
            st = build(*batch)
            (clss, tgts, sout, mean, log_var, _), upd = vae.apply(
                {"params": params, "batch_stats": batch_stats}, st, st.grid,
                rng, mutable=["batch_stats"])
            loss, aux = mm.vae_loss(clss, tgts, mean, log_var, 1e-6)
            return loss, (aux, upd["batch_stats"])

        return vae, loss_fn

    vae_s, loss_s = make(None)
    _, loss_dp = make("data")  # SyncBN pmean inside the mesh
    st0 = build(*map(jnp.asarray, batch))
    key = jax.random.PRNGKey(0)
    variables = jax.jit(vae_s.init)(key, st0, st0.grid, key)
    tx = optax.adam(1e-3)
    mk = lambda: mtrain.TrainState.create(  # noqa: E731
        variables["params"], variables.get("batch_stats", {}), tx)

    n_dev = jax.device_count()
    mesh = mt.parallel.data_parallel_mesh()
    dp_step = mtrain.make_dp_train_step(loss_dp, mesh)
    dev_batch = tuple(jnp.asarray(np.stack([x] * n_dev)) for x in batch)
    rngs = jnp.stack([jax.random.PRNGKey(1)] * n_dev)
    s_dp, l_dp, _ = dp_step(mk(), dev_batch, rngs)
    s_single, l_single, _ = mtrain.make_train_step(loss_s)(
        mk(), tuple(map(jnp.asarray, batch)), jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(l_dp), float(l_single), rtol=1e-5)
    # post-Adam params: the dp graph (pmean collectives + axis-named BN)
    # compiles with different float reassociation than the single-device
    # graph, and Adam's rsqrt amplifies that fp32 rounding on near-zero
    # grad elements (measured: 1/432 elements at 1.8e-5 abs) — same class
    # of SPMD noise as the dp×tp test's conditioning bound
    for a, c in zip(jax.tree.leaves(s_dp.params),
                    jax.tree.leaves(s_single.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-3,
                                   atol=5e-5)
    for a, c in zip(jax.tree.leaves(s_dp.batch_stats),
                    jax.tree.leaves(s_single.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-4,
                                   atol=1e-5)


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


def test_restore_vars_across_optimizers(rng, tmp_path):
    """restore_vars must load params+batch_stats saved under a DIFFERENT
    optimizer (the conditioning script's VAE handoff) — plain restore()
    requires a matching opt_state tree and fails there."""
    state, loss_fn, batch = make_model_and_state(rng)
    step = mtrain.make_train_step(loss_fn)
    state, _, _ = step(state, tuple(map(jnp.asarray, batch)),
                       jax.random.PRNGKey(1))
    ckpt = mtrain.CheckpointManager(str(tmp_path / "ckpt_rv"))
    ckpt.save(1, state)

    fresh, _, _ = make_model_and_state(np.random.RandomState(0))
    out = mtrain.CheckpointManager(str(tmp_path / "ckpt_rv")).restore_vars(
        fresh.params, {})
    for a, c in zip(jax.tree.leaves(out["params"]),
                    jax.tree.leaves(state.params)):
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


def test_mixed_precision_params_tracks_fp32(rng):
    """bf16 parameter STORAGE (fp32 master in the optimizer state): the
    training trajectory must track fp32 param storage closely, the live
    params must stay bf16 (= round(master)) so jitted steps never cast
    weights, and sub-bf16-ulp updates must accumulate in the master
    instead of rounding away (docs/DESIGN.md §7 weight-cast finding)."""
    state32, loss_fn, batch = make_model_and_state(rng)
    b = tuple(map(jnp.asarray, batch))
    k = jax.random.PRNGKey(1)

    tx16 = mtrain.mixed_precision_params(optax.adam(1e-2))
    state16 = mtrain.TrainState.create(
        mtrain.cast_params(state32.params), {}, tx16)

    step32 = mtrain.make_train_step(loss_fn)
    step16 = mtrain.make_train_step(loss_fn)
    l32s, l16s = [], []
    for i in range(20):
        state32, l32, _ = step32(state32, b, k)
        state16, l16, _ = step16(state16, b, k)
        l32s.append(float(l32))
        l16s.append(float(l16))
    # loss trajectories agree to bf16-level tolerance
    np.testing.assert_allclose(l16s, l32s, rtol=2e-2)
    # live params stayed bf16 and equal round(master) exactly
    master = state16.opt_state.master
    for p, m in zip(jax.tree.leaves(state16.params), jax.tree.leaves(master)):
        assert p.dtype == jnp.bfloat16
        assert m.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(p, np.float32),
                                      np.asarray(m.astype(jnp.bfloat16),
                                                 np.float32))


def test_mixed_precision_master_accumulates_sub_ulp_updates():
    """Updates far below one bf16 ulp must still move the master: 1000
    SGD steps of 1e-5 on a param at 1.0 (bf16 ulp ≈ 7.8e-3) shift the
    master by ~1e-2 — naive bf16-only storage would stay frozen at 1.0."""
    params = {"w": jnp.ones((4,), jnp.bfloat16)}
    tx = mtrain.mixed_precision_params(optax.sgd(1e-5))

    @jax.jit
    def step(params, opt_state):
        grads = {"w": jnp.ones((4,), jnp.bfloat16)}
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state

    opt_state = tx.init(params)
    for _ in range(1000):
        params, opt_state = step(params, opt_state)
    m = np.asarray(opt_state.master["w"], np.float32)
    np.testing.assert_allclose(m, 1.0 - 1e-2, rtol=1e-3)
    # and the live params show the accumulated drift once it crosses an ulp
    assert float(np.asarray(params["w"], np.float32)[0]) < 1.0


def test_create_mixed_precision_seeds_master_from_fp32(rng):
    """`TrainState.create_mixed_precision` must seed the fp32 master from
    the ORIGINAL params (no bf16 round-trip at init), while the live copy
    is the bf16 cast — `create(cast_params(p), ...)` loses that."""
    state32, _, _ = make_model_and_state(rng)
    tx = mtrain.mixed_precision_params(optax.adam(1e-2))
    st = mtrain.TrainState.create_mixed_precision(state32.params, {}, tx)
    for p0, m, live in zip(jax.tree.leaves(state32.params),
                           jax.tree.leaves(st.opt_state.master),
                           jax.tree.leaves(st.params)):
        assert m.dtype == jnp.float32 and live.dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(m), np.asarray(p0))
        np.testing.assert_array_equal(
            np.asarray(live, np.float32),
            np.asarray(jnp.asarray(p0).astype(jnp.bfloat16), np.float32))


def test_checkpoint_roundtrip_mixed_precision_state(rng, tmp_path):
    """orbax roundtrip of the `MixedPrecisionParamsState` opt_state (the
    NamedTuple holding the fp32 master) — the state that makes bf16-storage
    resume correct must restore bit-exactly (ADVICE r1)."""
    state32, loss_fn, batch = make_model_and_state(rng)
    tx = mtrain.mixed_precision_params(optax.adam(1e-2))
    state = mtrain.TrainState.create_mixed_precision(state32.params, {}, tx)
    step = mtrain.make_train_step(loss_fn)
    b = tuple(map(jnp.asarray, batch))
    state, _, _ = step(state, b, jax.random.PRNGKey(1))
    state, _, _ = step(state, b, jax.random.PRNGKey(2))

    ckpt = mtrain.CheckpointManager(str(tmp_path / "ckpt_mp"))
    ckpt.save(2, state)

    fresh = mtrain.TrainState.create_mixed_precision(state32.params, {}, tx)
    restored = mtrain.CheckpointManager(str(tmp_path / "ckpt_mp")).restore(
        fresh)
    assert int(restored.step) == 2
    # fp32 master restores bit-exactly with dtype preserved
    for a, c in zip(jax.tree.leaves(restored.opt_state.master),
                    jax.tree.leaves(state.opt_state.master)):
        assert a.dtype == c.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    # live bf16 params restore bit-exactly too
    for a, c in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        assert a.dtype == c.dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(c, np.float32))
    # and training continues identically from the restored state
    s_a, l_a, _ = step(state, b, jax.random.PRNGKey(3))
    s_b, l_b, _ = step(restored, b, jax.random.PRNGKey(3))
    assert float(l_a) == float(l_b)


def test_adafactor_diffusion_optimizer_trains(rng):
    """The memory-lean Adafactor recipe (reference-width-UNet-on-one-chip
    path, scripts/e2e_quality.py --diff_opt adafactor) optimizes."""
    state32, loss_fn, batch = make_model_and_state(rng)
    tx = mtrain.adafactor_diffusion_optimizer(1e-2, warmup_steps=2,
                                              total_steps=50)
    state = mtrain.TrainState.create(state32.params, {}, tx)
    step = mtrain.make_train_step(loss_fn)
    b = tuple(map(jnp.asarray, batch))
    losses = []
    for i in range(12):
        state, loss, _ = step(state, b, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.9, losses
