"""Tensor-layer tests: SparseTensor construction/quantization, arithmetic,
dense round-trip, decomposed packing, TensorField voxelize/slice/splat.
Mirrors the reference invariants documented in SURVEY.md §3.1/§3.5.

All framework calls are jitted (module-level cached wrappers): this machine's
single CPU core makes eager per-primitive dispatch pathologically slow, and
jit-everything is the intended usage anyway.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu.tensor import slice_to_field


@functools.lru_cache(maxsize=None)
def build_fn(capacity, batch_size, mode):
    return jax.jit(lambda c, f: mt.sparse_tensor(
        c, f, capacity=capacity, batch_size=batch_size, quantization_mode=mode))


def build(coords, feats, capacity, batch_size=1, mode="sum"):
    return build_fn(capacity, batch_size, mode)(
        jnp.asarray(coords), jnp.asarray(feats))


def make_coords(rng, n=40, b=2, res=8):
    return np.concatenate(
        [rng.randint(0, b, (n, 1)), rng.randint(0, res, (n, 3))], axis=1
    ).astype(np.int32)


def valid_rows(st):
    v = np.asarray(st.valid)
    return np.asarray(st.C)[v], np.asarray(st.F)[v]


def test_sparse_tensor_quantization_sum(rng):
    coords = np.array(
        [[0, 1, 1, 1], [0, 1, 1, 1], [0, 2, 0, 0], [1, 0, 0, 0]], np.int32
    )
    feats = np.array([[1.0], [2.0], [3.0], [4.0]], np.float32)
    st = build(coords, feats, capacity=8, batch_size=2)
    assert int(st.count()) == 3
    c, f = valid_rows(st)
    got = {tuple(c[i]): float(f[i, 0]) for i in range(len(c))}
    assert got == {(0, 1, 1, 1): pytest.approx(3.0),
                   (0, 2, 0, 0): pytest.approx(3.0),
                   (1, 0, 0, 0): pytest.approx(4.0)}


def test_sparse_tensor_avg_mode(rng):
    coords = np.array([[0, 1, 1, 1], [0, 1, 1, 1], [0, 2, 0, 0],
                       [0, 3, 0, 0]], np.int32)
    feats = np.array([[1.0], [3.0], [5.0], [7.0]], np.float32)
    st = build(coords, feats, capacity=8, batch_size=2, mode="avg")
    _, f = valid_rows(st)
    assert sorted(f[:, 0].tolist()) == [pytest.approx(2.0), pytest.approx(5.0),
                                        pytest.approx(7.0)]


def test_arithmetic_same_grid(rng):
    coords = make_coords(rng)
    feats = rng.randn(40, 4).astype(np.float32)
    st = build(coords, feats, capacity=64, batch_size=2)
    fn = jax.jit(lambda s: ((s + s).features, (s * 3.0 - s).features))
    f2, f3 = fn(st)
    np.testing.assert_allclose(np.asarray(f2), 2 * np.asarray(st.F), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(f3), 2 * np.asarray(st.F), rtol=1e-6)


def test_add_mismatched_grids_union(rng):
    c1 = np.array([[0, 0, 0, 0], [0, 1, 0, 0]], np.int32)
    c2 = np.array([[0, 1, 0, 0], [0, 2, 0, 0]], np.int32)
    f1 = np.array([[1.0], [2.0]], np.float32)
    f2 = np.array([[10.0], [20.0]], np.float32)
    a = build(c1, f1, capacity=4)
    b = build(c2, f2, capacity=4)
    s = jax.jit(lambda a, b: a + b)(a, b)
    c, f = valid_rows(s)
    got = {tuple(c[i]): float(f[i, 0]) for i in range(len(c))}
    assert got == {(0, 0, 0, 0): 1.0, (0, 1, 0, 0): 12.0, (0, 2, 0, 0): 20.0}


def test_dense_roundtrip(rng):
    coords = make_coords(rng, n=30, b=2, res=4)
    feats = rng.randn(30, 3).astype(np.float32)
    st = build(coords, feats, capacity=64, batch_size=2)
    d = jax.jit(lambda s: s.dense((4, 4, 4)))(st)
    assert d.shape == (2, 3, 4, 4, 4)
    dn = np.asarray(d)
    c, f = valid_rows(st)
    for i in range(len(c)):
        b, x, y, z = c[i]
        np.testing.assert_allclose(dn[b, :, x, y, z], f[i], rtol=1e-6)
    st2 = jax.jit(lambda d: mt.to_sparse_dense(d, capacity=64))(d)
    assert int(st2.count()) == int(st.count())
    c2, f2 = valid_rows(st2)
    # sparse(dense(x)) == x up to row order; canonical order makes it exact
    got = {tuple(r): tuple(v) for r, v in zip(c2.tolist(), f2.tolist())}
    want = {tuple(r): tuple(v) for r, v in zip(c.tolist(), f.tolist())}
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5)


def test_decomposed_roundtrip(rng):
    coords = make_coords(rng, n=50, b=3, res=8)
    feats = rng.randn(50, 4).astype(np.float32)
    st = build(coords, feats, capacity=64, batch_size=3)
    fn = jax.jit(lambda s: s.decomposed_features(64))
    packed, mask, pos = fn(st)
    assert int(mask.sum()) == int(st.count())
    bid = np.asarray(st.C[:, 0])[np.asarray(st.valid)]
    for b in range(3):
        assert int(np.asarray(mask)[b].sum()) == int((bid == b).sum())
    back = jax.jit(lambda s, p, q: s.from_decomposed(p, q))(st, packed, pos)
    np.testing.assert_allclose(np.asarray(back.F), np.asarray(st.F), rtol=1e-6)


def test_tensorfield_sparse_and_slice(rng):
    pts = np.concatenate(
        [rng.randint(0, 2, (20, 1)).astype(np.float32),
         rng.rand(20, 3).astype(np.float32) * 4],
        axis=1,
    )
    feats = rng.randn(20, 5).astype(np.float32)
    tf = mt.TensorField(
        coordinates=jnp.asarray(pts), features=jnp.asarray(feats),
        valid=jnp.ones((20,), bool), batch_size=2)

    def go(tf):
        st, inverse = tf.sparse(capacity=32)
        return st, slice_to_field(st, tf, inverse)

    st, sliced = jax.jit(go)(tf)
    assert int(st.count()) <= 20
    vox = np.floor(pts[:, 1:]).astype(np.int32)
    key = np.concatenate([pts[:, :1].astype(np.int32), vox], axis=1)
    sf = np.asarray(sliced.F)
    for i in range(20):
        same = np.all(key == key[i], axis=1)
        np.testing.assert_allclose(sf[i], feats[same].mean(0), rtol=1e-5)


def test_tensorfield_splat_interpolate_inverse(rng):
    # points at lattice corners: splat then interpolate reproduces sums of
    # coincident points
    pts = np.concatenate(
        [np.zeros((8, 1), np.float32),
         rng.randint(0, 4, (8, 3)).astype(np.float32)],
        axis=1,
    )
    feats = rng.randn(8, 2).astype(np.float32)
    tf = mt.TensorField(jnp.asarray(pts), jnp.asarray(feats),
                        jnp.ones((8,), bool), batch_size=1)

    def go(tf):
        st = tf.splat(capacity=128)
        return mt.interpolate_at(st, tf.coordinates, tf.valid)

    got = np.asarray(jax.jit(go)(tf))
    for i in range(8):
        same = np.all(pts == pts[i], axis=1)
        np.testing.assert_allclose(got[i], feats[same].sum(0), rtol=1e-4,
                                   atol=1e-5)


def test_cat_and_stacks(rng):
    coords = make_coords(rng, n=40)
    feats = rng.randn(40, 4).astype(np.float32)
    st = build(coords, feats, capacity=64, batch_size=2)

    def go(s):
        a = s.with_features(s.F * 1.0)
        b = s.with_features(s.F * 2.0)
        return mt.cat(a, b).F, mt.stack_mean(a, b).F, mt.stack_var(a, b).F

    c, m, v = jax.jit(go)(st)
    assert c.shape == (64, 8)
    np.testing.assert_allclose(np.asarray(m), np.asarray(st.F) * 1.5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v), (np.asarray(st.F) * 0.5) ** 2,
                               rtol=1e-5, atol=1e-6)
