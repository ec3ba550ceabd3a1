"""Parity-tail layers (VERDICT r1 item 8): tail activations, PReLU/RReLU,
AlphaDropout, AdaptiveLogSoftmaxWithLoss, HjmInstanceNorm, SEBottleneck —
numeric goldens against torch (the reference wraps the same torch modules,
`MinkowskiNonlinearity.py:61-174`, `MinkowskiNormalization.py:520-544`,
`modules/senet_block.py:89-131`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu import nn as mnn


def batch_tensor(rng, cap=64, b=2, c=4, res=8):
    n = cap - 8  # some padding rows
    coords = np.concatenate(
        [rng.randint(0, b, (n, 1)), rng.randint(0, res, (n, 3))],
        axis=1).astype(np.int32)
    cpad, valid = mt.ops.pad_to_capacity(coords, cap)
    feats = (rng.randn(cap, c) * valid[:, None]).astype(np.float32)
    st = jax.jit(lambda co, v, f: mt.sparse_tensor(
        co, f, capacity=cap, batch_size=b, valid=v,
        extent=(res,) * 3))(*map(jnp.asarray, (cpad, valid, feats)))
    # NOTE: sparse_tensor canonically re-orders rows — return the tensor's
    # own (reordered) features as the golden input, not the collate-order
    # array
    return st, np.asarray(st.features), valid


@pytest.mark.parametrize("name,tmod", [
    ("hardshrink", torch.nn.Hardshrink()),
    ("softshrink", torch.nn.Softshrink()),
    ("tanhshrink", torch.nn.Tanhshrink()),
    ("log_sigmoid", torch.nn.LogSigmoid()),
    ("softmin", torch.nn.Softmin(dim=-1)),
    ("relu6", torch.nn.ReLU6()),
    ("selu", torch.nn.SELU()),
    ("hardswish", torch.nn.Hardswish()),
])
def test_tail_activations_match_torch(rng, name, tmod):
    x = rng.randn(32, 8).astype(np.float32) * 2
    ours = np.asarray(mnn.get_act(name)(jnp.asarray(x)))
    ref = tmod(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_threshold_matches_torch(rng):
    x = rng.randn(32, 4).astype(np.float32)
    ours = np.asarray(mnn.threshold(jnp.asarray(x), 0.3, -7.0))
    ref = torch.nn.Threshold(0.3, -7.0)(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_prelu_matches_torch(rng):
    st, feats, valid = batch_tensor(rng)
    layer = mnn.PReLU(num_parameters=4)
    alpha = rng.rand(4).astype(np.float32)
    out = layer.apply({"params": {"alpha": jnp.asarray(alpha)}}, st)
    ref = torch.nn.functional.prelu(torch.from_numpy(feats),
                                    torch.from_numpy(alpha)).numpy()
    np.testing.assert_allclose(np.asarray(out.features), ref, rtol=1e-6)
    # default init 0.25 like torch
    v = mnn.PReLU(num_parameters=1).init(jax.random.PRNGKey(0), st)
    assert float(v["params"]["alpha"][0]) == pytest.approx(0.25)


def test_rrelu_eval_matches_torch_and_train_bounds(rng):
    st, feats, valid = batch_tensor(rng)
    layer = mnn.RReLU()
    out = layer.apply({}, st, deterministic=True)
    ref = torch.nn.RReLU()(torch.from_numpy(torch.tensor(feats).numpy()))
    ref = torch.nn.functional.rrelu(torch.from_numpy(feats),
                                    training=False).numpy()
    np.testing.assert_allclose(np.asarray(out.features), ref, rtol=1e-6)
    # train mode: slopes land in [lower, upper]
    out_t = layer.apply({}, st, deterministic=False,
                        rngs={"rrelu": jax.random.PRNGKey(3)})
    f = np.asarray(out_t.features)
    neg = feats < 0
    ratio = f[neg] / feats[neg]
    assert (ratio >= 1 / 8 - 1e-6).all() and (ratio <= 1 / 3 + 1e-6).all()


def test_alpha_dropout_statistics(rng):
    """AlphaDropout preserves mean/std of a SELU-standardized input and is
    the identity in deterministic mode (torch `nn.AlphaDropout`)."""
    st, feats, valid = batch_tensor(rng, cap=4096, b=1, c=8, res=16)
    layer = mnn.AlphaDropout(rate=0.3)
    out_d = layer.apply({}, st, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out_d.features), feats)
    out = layer.apply({}, st, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(0)})
    f = np.asarray(out.features)[np.asarray(st.valid).astype(bool)]
    src = feats[np.asarray(st.valid).astype(bool)]
    assert abs(f.mean() - src.mean()) < 0.1
    assert abs(f.std() - src.std()) < 0.15


def test_adaptive_log_softmax_matches_torch(rng):
    in_f, n_classes, cutoffs = 16, 40, (8, 24)
    n = 32
    x = rng.randn(n, in_f).astype(np.float32)
    target = rng.randint(0, n_classes, (n,)).astype(np.int64)
    tmod = torch.nn.AdaptiveLogSoftmaxWithLoss(
        in_f, n_classes, list(cutoffs), div_value=2.0, head_bias=False)
    with torch.no_grad():
        t_out, t_loss = tmod(torch.from_numpy(x), torch.from_numpy(target))

    layer = mnn.AdaptiveLogSoftmaxWithLoss(
        in_features=in_f, n_classes=n_classes, cutoffs=cutoffs, div_value=2.0)
    params = {
        "head": {"kernel": jnp.asarray(tmod.head.weight.detach().numpy().T)},
    }
    for i, tail in enumerate(tmod.tail):
        params[f"tail{i}_proj"] = {
            "kernel": jnp.asarray(tail[0].weight.detach().numpy().T)}
        params[f"tail{i}_out"] = {
            "kernel": jnp.asarray(tail[1].weight.detach().numpy().T)}
    lp, loss = layer.apply({"params": params}, jnp.asarray(x),
                           jnp.asarray(target.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(lp), t_out.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(float(loss), float(t_loss), rtol=1e-4)


def test_hjm_instance_norm_train_normalizes_per_instance(rng):
    st, feats, valid = batch_tensor(rng, cap=256, b=3, c=6, res=8)
    layer = mnn.HjmInstanceNorm()
    v = layer.init(jax.random.PRNGKey(0), st)
    out, upd = layer.apply(v, st, train=True, mutable=["batch_stats"])
    f = np.asarray(out.features)
    bid = np.asarray(st.grid.batch_ids())
    ok = np.asarray(st.valid).astype(bool)
    for b in range(3):
        rows = f[ok & (bid == b)]
        # per-instance standardized (BN per instance == instance norm)
        np.testing.assert_allclose(rows.mean(0), 0.0, atol=1e-4)
        np.testing.assert_allclose(rows.var(0), 1.0, atol=1e-2)


def test_hjm_instance_norm_running_stats_sequential(rng):
    """The running stats must equal the torch loop's sequential momentum
    updates over instances in batch order."""
    st, feats, valid = batch_tensor(rng, cap=256, b=3, c=6, res=8)
    m = 0.9
    layer = mnn.HjmInstanceNorm(momentum=m)
    v = layer.init(jax.random.PRNGKey(0), st)
    _, upd = layer.apply(v, st, train=True, mutable=["batch_stats"])

    bid = np.asarray(st.grid.batch_ids())
    ok = np.asarray(st.valid).astype(bool)
    ra_mean, ra_var = np.zeros(6), np.ones(6)
    for b in range(3):
        rows = feats[ok & (bid == b)]
        ra_mean = m * ra_mean + (1 - m) * rows.mean(0)
        # torch BatchNorm1d feeds the Bessel-corrected (unbiased) variance
        # into the running stat while normalizing with the biased one
        ra_var = m * ra_var + (1 - m) * rows.var(0, ddof=1)
    np.testing.assert_allclose(np.asarray(upd["batch_stats"]["mean"]),
                               ra_mean, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(upd["batch_stats"]["var"]),
                               ra_var, rtol=1e-4, atol=1e-5)
    # eval mode uses running stats like plain BN eval
    v2 = {"params": v["params"], "batch_stats": upd["batch_stats"]}
    out_e = layer.apply(v2, st, train=False)
    expect = (feats - ra_mean) / np.sqrt(ra_var + 1e-5)
    np.testing.assert_allclose(np.asarray(out_e.features)[ok], expect[ok],
                               rtol=2e-3, atol=1e-4)


def test_se_bottleneck_forward_backward(rng):
    st, feats, valid = batch_tensor(rng, cap=128, b=2, c=8, res=8)
    block = mnn.SEBottleneck(planes=4, reduction=4)
    v = jax.jit(block.init)(jax.random.PRNGKey(0), st)
    assert "se" in v["params"] and "conv3" in v["params"]

    @jax.jit
    def loss(params, st):
        out, _ = block.apply({"params": params,
                              "batch_stats": v["batch_stats"]}, st,
                             mutable=["batch_stats"])
        assert out.num_channels == 16  # planes * expansion
        return jnp.sum(out.features ** 2)

    l, g = jax.value_and_grad(loss)(v["params"], st)
    assert np.isfinite(float(l))
    flat = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    assert any(float(jnp.abs(x).sum()) > 0 for x in flat)
