"""Forward-pass coverage of every model family (SURVEY.md §2.4 inventory):
classification (FCNN/Splat/PointNets), ResNet, MinkUNet, completion &
generative reconstruction nets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu import models as mm


def sparse_input(rng, n=60, b=2, res=8, cap=128, c=3):
    coords = np.concatenate(
        [rng.randint(0, b, (n, 1)), rng.randint(0, res, (n, 3))],
        axis=1).astype(np.int32)
    cpad, valid = mt.ops.pad_to_capacity(coords, cap)
    feats = (rng.randn(cap, c) * valid[:, None]).astype(np.float32)
    return jax.jit(lambda co, f, v: mt.sparse_tensor(
        co, f, capacity=cap, batch_size=b, valid=v, extent=(res,) * 3))(
        jnp.asarray(cpad), jnp.asarray(feats), jnp.asarray(valid))


def field_input(rng, n=128, b=2, res=8, c=3):
    pts = np.concatenate(
        [rng.randint(0, b, (n, 1)).astype(np.float32),
         rng.rand(n, 3).astype(np.float32) * res], axis=1)
    feats = rng.randn(n, c).astype(np.float32)
    # bounded extent: the pyramid's ~10 derived grids then compile via the
    # 1-key flat sort instead of d+2-key lexsorts (the suite's long pole)
    return mt.TensorField(jnp.asarray(pts), jnp.asarray(feats),
                          jnp.ones((n,), bool), batch_size=b,
                          extent=(res,) * 3)


def test_resnet14_forward(rng):
    st = sparse_input(rng)
    net = mm.ResNet14(out_channels=5, input_capacity=128, init_dim=8,
                      planes=(8, 8, 8, 8))
    v = jax.jit(net.init)(jax.random.PRNGKey(0), st)
    out, _ = jax.jit(lambda v, s: net.apply(v, s, mutable=["batch_stats"]))(
        v, st)
    assert out.shape == (2, 5)
    assert np.all(np.isfinite(np.asarray(out)))


def test_minkunet14_forward_preserves_grid(rng):
    st = sparse_input(rng)
    net = mm.MinkUNet14(out_channels=4, input_capacity=128, init_dim=4,
                        planes=(4, 4, 8, 8, 8, 8, 4, 4))
    v = jax.jit(net.init)(jax.random.PRNGKey(0), st)
    out, _ = jax.jit(lambda v, s: net.apply(v, s, mutable=["batch_stats"]))(
        v, st)
    np.testing.assert_array_equal(np.asarray(out.C), np.asarray(st.C))
    assert out.F.shape == (128, 4)


def test_pointnets_forward(rng):
    field = field_input(rng)
    net = mm.MinkowskiPointNet(out_channel=5, embedding_channel=32)
    v = jax.jit(net.init)(jax.random.PRNGKey(0), field)
    out, _ = jax.jit(lambda v, f: net.apply(v, f, mutable=["batch_stats"]))(
        v, field)
    assert out.shape == (2, 5)

    dense = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    pn = mm.PointNet(out_channel=5, embedding_channel=32)
    v2 = jax.jit(pn.init)(jax.random.PRNGKey(0), dense)
    out2, _ = jax.jit(lambda v, x: pn.apply(v, x, mutable=["batch_stats"]))(
        v2, dense)
    assert out2.shape == (2, 5)


@pytest.mark.slow
def test_fcnn_variants_forward(rng):
    field = field_input(rng)
    for cls in (mm.MinkowskiFCNN, mm.MinkowskiSplatFCNN):
        net = cls(out_channel=4, embedding_channel=32,
                  channels=(4, 4, 8, 8, 8), voxel_capacity=128)
        v = jax.jit(net.init)(jax.random.PRNGKey(0), field)
        out, _ = jax.jit(
            lambda v, f: net.apply(v, f, mutable=["batch_stats"]))(v, field)
        assert out.shape == (2, 4)
        assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_completion_and_generative(rng):
    st = sparse_input(rng, res=8)
    comp = mm.CompletionNet(enc_channels=(4, 4, 8, 8, 8, 8),
                            dec_channels=(8, 8, 4, 4, 4, 4),
                            enc_capacities=(128, 64, 32, 16, 8, 8),
                            dec_capacities=(16, 64, 128, 256, 512))
    v = jax.jit(comp.init)(jax.random.PRNGKey(0), st, st.grid)
    (out_clss, targets, out), _ = jax.jit(
        lambda v, s: comp.apply(v, s, s.grid, mutable=["batch_stats"]))(v, st)
    assert len(out_clss) == 5
    assert np.all(np.isfinite(np.asarray(out.F)))

    b = 2
    seed_coords = jnp.concatenate(
        [jnp.arange(b, dtype=jnp.int32)[:, None],
         jnp.zeros((b, 3), jnp.int32)], axis=-1)
    seed = mt.SparseTensor(
        grid=mt.SparseGrid(coords=seed_coords, valid=jnp.ones((b,), bool),
                           stride=(64,) * 3, batch_size=b),
        features=jnp.asarray(rng.randn(b, 8).astype(np.float32)))
    gen = mm.GenerativeNet(channels=(8, 8, 8, 4, 4, 4, 4),
                           level_capacities=(16, 64, 256, 512, 1024, 2048))
    tg = sparse_input(rng, res=8).grid
    v = jax.jit(gen.init)(jax.random.PRNGKey(0), seed, tg)
    (out_clss, targets, out), _ = jax.jit(
        lambda v, z, t: gen.apply(v, z, t, mutable=["batch_stats"]))(
        v, seed, tg)
    assert len(out_clss) == 6
    assert np.all(np.isfinite(np.asarray(out.F)))
