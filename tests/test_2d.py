"""Dimension-generality: the engine is D-generic like the reference (its 2D
toy segmentation, `examples/training.py`).  2D sparse conv must equal dense
conv on a full 2D grid, and a small 2D UNet-ish stack must train."""

import jax
import jax.numpy as jnp
import numpy as np

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu import nn as mnn


def test_2d_sparse_conv_equals_dense(rng):
    res, cin, cout = 6, 3, 4
    g = np.stack(np.meshgrid(np.arange(res), np.arange(res),
                             indexing="ij"), -1).reshape(-1, 2)
    coords = np.concatenate([np.zeros((len(g), 1), np.int32), g],
                            1).astype(np.int32)
    feats = rng.randn(len(coords), cin).astype(np.float32)
    st = jax.jit(lambda c, f: mt.sparse_tensor(
        c, f, capacity=len(coords), extent=(res, res)))(
        jnp.asarray(coords), jnp.asarray(feats))
    assert st.grid.ndim == 2

    conv = mnn.SparseConv(cout, kernel_size=3, ndim=2)
    params = conv.init(jax.random.PRNGKey(0), st)
    out = jax.jit(lambda p, s: conv.apply(p, s))(params, st)

    dense_in = np.zeros((1, cin, res, res), np.float32)
    for i, (b, x, y) in enumerate(coords):
        dense_in[0, :, x, y] = feats[i]
    kernel = np.asarray(params["params"]["kernel"]).reshape(
        3, 3, cin, cout)
    rhs = np.transpose(kernel, (3, 2, 0, 1))
    dn = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(dense_in), jnp.asarray(rhs), (1, 1), "SAME"))
    on, cn = np.asarray(out.F), np.asarray(out.C)
    for i in range(out.capacity):
        if bool(out.valid[i]):
            b, x, y = cn[i]
            np.testing.assert_allclose(on[i], dn[0, :, x, y], rtol=2e-4,
                                       atol=1e-4)


def test_2d_down_up_roundtrip(rng):
    coords = np.concatenate(
        [np.zeros((32, 1), np.int32), rng.randint(0, 8, (32, 2))],
        axis=1).astype(np.int32)
    cpad, valid = mt.ops.pad_to_capacity(coords, 32)
    st = jax.jit(lambda c, f, v: mt.sparse_tensor(
        c, f, capacity=32, valid=v, extent=(8, 8)))(
        jnp.asarray(cpad),
        jnp.asarray((rng.randn(32, 4) * valid[:, None]).astype(np.float32)),
        jnp.asarray(valid))
    down = mnn.SparseConv(8, kernel_size=2, stride=2, ndim=2, out_capacity=16)
    pdown = down.init(jax.random.PRNGKey(0), st)
    mid = jax.jit(lambda p, s: down.apply(p, s))(pdown, st)
    assert mid.tensor_stride == (2, 2)
    up = mnn.SparseConvTranspose(4, kernel_size=2, stride=2, ndim=2)
    pup = up.init(jax.random.PRNGKey(1), mid, st.grid)
    out = jax.jit(lambda p, m, g: up.apply(p, m, g))(pup, mid, st.grid)
    np.testing.assert_array_equal(np.asarray(out.C), np.asarray(st.C))
    assert np.all(np.isfinite(np.asarray(out.F)))
