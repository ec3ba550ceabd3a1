"""Dense 3D baseline + cross-check of sparse conv against the dense path on
a fully-occupied grid (SURVEY.md §7.3: dense baselines as cross-check)."""

import jax
import jax.numpy as jnp
import numpy as np

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu import models as mm
from mink_octtree_stablediffusion_tpu.ops import get_coords_map, stride_grid


def test_dense_unet3d_shapes(rng):
    net = mm.UNet3DModel(out_channels=2, block_channels=(8, 16),
                         layers_per_block=1, attn_levels=(1,), groups=4)
    x = jnp.asarray(rng.randn(2, 8, 8, 8, 1).astype(np.float32))
    t = jnp.zeros((2,), jnp.int32)
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x, t)
    out = jax.jit(lambda v, x, t: net.apply(v, x, t))(variables, x, t)
    assert out.shape == (2, 8, 8, 8, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_get_coords_map(rng):
    coords = np.concatenate(
        [np.zeros((32, 1), np.int32), rng.randint(0, 8, (32, 3))],
        axis=1).astype(np.int32)
    st = jax.jit(lambda c: mt.sparse_tensor(c, jnp.ones((32, 1)),
                                            capacity=32))(jnp.asarray(coords))
    coarse = jax.jit(lambda g: stride_grid(g, 2, 32))(st.grid)
    cmap = jax.jit(get_coords_map)(st.grid, coarse)
    cn, cc = np.asarray(st.C), np.asarray(coarse.coords)
    v = np.asarray(st.valid)
    m = np.asarray(cmap)
    for i in range(32):
        if v[i]:
            assert m[i] >= 0
            np.testing.assert_array_equal(cc[m[i]][1:], (cn[i][1:] // 2) * 2)
        else:
            assert m[i] == -1
