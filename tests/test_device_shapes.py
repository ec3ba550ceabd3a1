"""Device-side procedural generation (data/device_shapes.py): the jnp
re-expression of `ProceduralShapes` that streams batches with zero host
work (RESULTS r4: host generation was 3.7x slower than the device step at
res 128 — VERDICT r4 item 7)."""

import numpy as np

import jax
import jax.numpy as jnp

import pytest

from mink_octtree_stablediffusion_tpu.data import (
    ProceduralShapes,
    pack_voxels,
    procedural_batch,
    sample_shape,
)


def test_pack_voxels_matches_numpy_unique():
    rng = np.random.RandomState(0)
    res, b, n, cap = 32, 3, 500, 2048
    vox = rng.randint(0, res, (b, n, 3)).astype(np.int32)
    cpad, valid, feats = jax.jit(
        lambda v: pack_voxels(v, res, cap))(jnp.asarray(vox))
    cpad, valid = np.asarray(cpad), np.asarray(valid)
    got = {tuple(r) for r in cpad[valid]}
    want = {(bi,) + tuple(v)
            for bi in range(b) for v in np.unique(vox[bi], axis=0)}
    assert got == want
    assert not np.any(cpad[~valid])  # padding rows are zeros
    assert np.array_equal(np.asarray(feats)[:, 0], valid.astype(np.float32))


def test_pack_voxels_overflow_drops_tail():
    res, cap = 16, 8
    vox = jnp.stack([jnp.arange(12, dtype=jnp.int32)] * 3, -1)[None]
    cpad, valid, _ = pack_voxels(vox, res, cap)
    assert int(valid.sum()) == cap  # 12 unique -> first 8 kept, sorted
    assert np.array_equal(np.asarray(cpad)[:, 1], np.arange(8))


def test_sample_shape_in_bounds_and_varied():
    res = 64
    for label in range(4):
        xyz = jax.jit(lambda k: sample_shape(
            k, label, 2048, res))(jax.random.PRNGKey(label))
        xyz = np.asarray(xyz)
        assert xyz.min() >= 0 and xyz.max() < res
        # different keys -> different geometry
        xyz2 = np.asarray(sample_shape(jax.random.PRNGKey(label + 100),
                                       jnp.int32(label), 2048, res))
        assert not np.allclose(xyz, xyz2)


def test_procedural_batch_layout_and_determinism():
    res, b, n, cap = 32, 4, 1024, 8192
    c1, v1, f1, l1 = procedural_batch(jax.random.PRNGKey(7), b, n, res, cap)
    c2, v2, f2, l2 = procedural_batch(jax.random.PRNGKey(7), b, n, res, cap)
    assert np.array_equal(np.asarray(c1), np.asarray(c2))  # deterministic
    assert np.array_equal(np.asarray(l1), np.arange(b) % 4)
    c3, v3, *_ = procedural_batch(jax.random.PRNGKey(8), b, n, res, cap)
    assert not np.array_equal(np.asarray(c1), np.asarray(c3))
    cpad, valid = np.asarray(c1), np.asarray(v1)
    # every batch index present; coords within the grid
    assert set(cpad[valid][:, 0]) == set(range(b))
    assert cpad[valid][:, 1:].min() >= 0
    assert cpad[valid][:, 1:].max() < res
    # valid rows are unique (the dedup contract)
    rows = cpad[valid]
    assert len({tuple(r) for r in rows}) == len(rows)


def test_device_distribution_matches_host_scale():
    """Voxel counts per shape should be in the same regime as the host
    ProceduralShapes at matched (res, points) — the two generators are
    distribution-equivalent, not bit-identical."""
    res, n = 64, 8192
    host = ProceduralShapes(resolution=res, num_samples=8,
                            points_per_shape=n, seed=3)
    host_counts = [len(host[i]["coords"]) for i in range(8)]
    c, v, _, _ = procedural_batch(jax.random.PRNGKey(3), 8, n, res,
                                  131072)
    cpad, valid = np.asarray(c), np.asarray(v)
    dev_counts = [int(((cpad[:, 0] == i) & valid).sum()) for i in range(8)]
    lo, hi = 0.3 * min(host_counts), 3.0 * max(host_counts)
    assert all(lo < d < hi for d in dev_counts), (host_counts, dev_counts)


@pytest.mark.parametrize("label", [0, 1, 2, 3])
def test_primitive_morphology(label):
    """Coarse morphological invariants: sphere-like shells are hollow
    (few interior voxels), boxes fill their bounding box corners more
    than spheres do."""
    res = 48
    xyz = np.asarray(sample_shape(jax.random.PRNGKey(40 + label),
                                  jnp.int32(label), 16384, res,
                                  composite_prob=0.0))
    vox = np.unique(np.clip(np.floor(xyz), 0, res - 1).astype(np.int32),
                    axis=0)
    assert len(vox) > 200  # a real surface, not a degenerate cluster
    # a surface voxelization occupies far fewer cells than its bbox volume
    ext = vox.max(0) - vox.min(0) + 1
    assert len(vox) < 0.6 * np.prod(ext.astype(float))
