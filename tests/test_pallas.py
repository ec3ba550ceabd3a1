"""Pallas fused conv kernel (interpreter mode): must match the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu.ops.pallas_conv import pallas_sparse_conv


def test_pallas_conv_matches_xla(rng):
    n, cap, cin, cout = 100, 256, 8, 16
    coords = np.concatenate(
        [np.zeros((n, 1), np.int32), rng.randint(0, 8, (n, 3))],
        axis=1).astype(np.int32)
    cpad, valid = mt.ops.pad_to_capacity(coords, cap)
    feats = (rng.randn(cap, cin) * valid[:, None]).astype(np.float32)
    st = jax.jit(lambda c, f, v: mt.sparse_tensor(
        c, f, capacity=cap, valid=v, extent=(8,) * 3))(
        jnp.asarray(cpad), jnp.asarray(feats), jnp.asarray(valid))
    spec = mt.ops.KernelSpec(3, 1, ndim=3)
    nbr = jax.jit(lambda g: mt.ops.kernel_map(g, g, spec))(st.grid)
    kernel = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)

    ref = jax.jit(lambda f, k, n: mt.ops.sparse_conv_apply(f, k, n))(
        st.features, kernel, nbr)
    out = pallas_sparse_conv(st.features, kernel, nbr, tile=128,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)
