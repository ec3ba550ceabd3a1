"""Dense latent canvas (ops/canvas.py) + ProceduralShapes distribution —
the round-3 generalization substrate (VERDICT r2 items 1/3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu import models as mm
from mink_octtree_stablediffusion_tpu.data import (ProceduralShapes,
                                                   collate_pointclouds)
from mink_octtree_stablediffusion_tpu.ops import (canvas_grid,
                                                  expand_to_canvas, make_grid)


def test_canvas_grid_is_canonical():
    """Row order must equal make_grid's canonical (batch, x, y, z) order so
    downstream convs/searches see an ordinary bounded grid."""
    g = canvas_grid(2, resolution=16, stride=8)
    assert g.capacity == 2 * 2 ** 3
    assert bool(jnp.all(g.valid))
    ref, _, _ = make_grid(g.coords, g.valid, capacity=g.capacity, stride=8,
                          batch_size=2, extent=(16, 16, 16))
    np.testing.assert_array_equal(np.asarray(ref.coords), np.asarray(g.coords))
    assert bool(jnp.all(ref.valid))


def test_expand_to_canvas_scatter(rng):
    coords = mt.ops.batched_coordinates_np(
        [np.array([[0, 0, 0], [8, 0, 8]]), np.array([[8, 8, 8]])])
    cpad, vpad = mt.ops.pad_to_capacity(coords, 8)
    grid, _, _ = make_grid(jnp.asarray(cpad), jnp.asarray(vpad), 8, stride=8,
                           batch_size=2, extent=(16, 16, 16))
    # features = row index + 1 on valid rows (recognizable per-row values)
    lat = mt.SparseTensor(
        grid=grid,
        features=jnp.where(grid.valid[:, None],
                           jnp.arange(8, dtype=jnp.float32)[:, None] + 1.0,
                           0.0) * jnp.ones((1, 4)))
    canvas = canvas_grid(2, 16, 8)
    out = expand_to_canvas(lat, canvas)
    f = np.asarray(out.features)
    # occupied cells carry their latent features, empty cells exact zeros
    idx = np.asarray(mt.ops.grid_lookup(grid, canvas.coords, canvas.valid))
    present = idx >= 0
    assert present.sum() == 3
    np.testing.assert_allclose(
        f[present], np.asarray(lat.features)[idx[present]])
    assert np.all(f[~present] == 0.0)
    # jittered path: empties become nonzero, occupied stay exact
    out2 = expand_to_canvas(lat, canvas, empty_noise_std=0.5,
                            rng=jax.random.PRNGKey(0))
    f2 = np.asarray(out2.features)
    np.testing.assert_allclose(
        f2[present], np.asarray(lat.features)[idx[present]])
    assert np.all(np.abs(f2[~present]) > 0.0)


@pytest.mark.slow
def test_vae_latent_canvas_roundtrip(rng):
    """VAE with latent_canvas trains a step and decodes in eval mode; the
    canvas latent is the full dense stride-8 set."""
    res, cap, b = 16, 512, 2
    ds = ProceduralShapes(resolution=res, num_samples=b, points_per_shape=512)
    cpad, valid, feats, _ = collate_pointclouds(
        [ds[i]["coords"] for i in range(b)], cap)
    st = mt.sparse_tensor(jnp.asarray(cpad), jnp.asarray(feats), capacity=cap,
                          batch_size=b, valid=jnp.asarray(valid),
                          extent=(res,) * 3)
    cells = (res // 8) ** 3
    vae = mm.VAE(channels=(8, 16, 32, 32, 4),
                 encoder_capacities=(256, 128, 64, 64, 64),
                 decoder_capacities=(max(b * cells, 64), 128, 256, 1024),
                 latent_canvas=True, canvas_noise_std=1.0)
    key = jax.random.PRNGKey(0)
    v = jax.jit(vae.init)(key, st, st.grid, key)

    def loss(params, key):
        (clss, tgts, sout, mean, log_var, z), upd = vae.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, st, st.grid,
            key, mutable=["batch_stats"])
        # the decode input is the full canvas: every row valid
        assert z.grid.capacity == b * cells
        l, _ = mm.vae_loss(clss, tgts, mean, log_var, 1e-6)
        return l

    l, g = jax.value_and_grad(loss)(v["params"], key)
    assert np.isfinite(float(l))
    assert all(np.all(np.isfinite(x)) for x in jax.tree.leaves(g))
    # eval decode runs on the (noise-free) canvas
    (clss, tgts, sout, *_), _ = vae.apply(v, st, st.grid, key, train=False,
                                          mutable=["batch_stats"])
    assert sout.grid.capacity == 1024


class TestProceduralShapes:
    def test_deterministic_and_diverse(self):
        ds = ProceduralShapes(resolution=32, num_samples=64)
        a1, a2 = ds[5], ds[5]
        np.testing.assert_array_equal(a1["coords"], a2["coords"])
        # same class, different instance -> different voxelization
        s0, s4 = set(map(tuple, ds[0]["coords"])), set(map(tuple,
                                                           ds[4]["coords"]))
        assert ds[0]["label"] == ds[4]["label"]
        inter = len(s0 & s4) / max(len(s0 | s4), 1)
        assert inter < 0.9

    def test_split_disjoint(self):
        tr = ProceduralShapes(resolution=32, num_samples=8, split="train")
        va = ProceduralShapes(resolution=32, num_samples=8, split="val")
        for i in range(4):
            a = set(map(tuple, tr[i]["coords"]))
            b = set(map(tuple, va[i]["coords"]))
            assert len(a & b) / max(len(a | b), 1) < 0.9

    def test_class_balance_and_captions(self):
        ds = ProceduralShapes(resolution=32, num_samples=8, with_class=True)
        labels = [ds[i]["label"] for i in range(8)]
        assert sorted(set(labels)) == [0, 1, 2, 3]
        assert "picture of a" in ds[1]["caption"]

    def test_composites_only_when_asked(self):
        ds0 = ProceduralShapes(resolution=32, num_samples=4,
                               composite_prob=0.0)
        ds1 = ProceduralShapes(resolution=32, num_samples=4,
                               composite_prob=1.0)
        # both voxelize inside the grid
        for ds in (ds0, ds1):
            for i in range(4):
                c = ds[i]["coords"]
                assert c.min() >= 0 and c.max() < 32


def test_denoise_loss_v_prediction(rng):
    """v-prediction target = sqrt(ac)·ε − sqrt(1−ac)·x0 per instance-t
    (the ε-ablation mode, DESIGN §9 / RESULTS r3)."""
    from mink_octtree_stablediffusion_tpu import diffusion as md

    grid = canvas_grid(2, 16, 8)
    x0 = jnp.asarray(rng.randn(grid.capacity, 4).astype(np.float32))
    lat = mt.SparseTensor(grid=grid, features=x0)
    sched = md.DDPMScheduler.create(prediction_type="v_prediction")
    noise = jnp.asarray(rng.randn(*x0.shape).astype(np.float32))
    t = jnp.asarray([3, 77])
    out = lat.with_features(jnp.asarray(
        rng.randn(*x0.shape).astype(np.float32)))
    loss = md.denoise_loss(sched, out, lat, noise, t, "v_prediction")
    bid = np.asarray(grid.batch_ids())
    ac = np.asarray(sched.alphas_cumprod)[np.asarray(t)[bid]][:, None]
    target = np.sqrt(ac) * np.asarray(noise) - np.sqrt(1 - ac) * np.asarray(x0)
    expect = np.mean((np.asarray(out.features) - target) ** 2)
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)
