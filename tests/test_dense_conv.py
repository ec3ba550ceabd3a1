"""Dense no-growth conv path vs the gather-GEMM reference.

The densify→lax.conv→gather formulation (`ops/dense_conv.py`) must match the
kernel-map path exactly (fp32) for: stride-1 convs, strided downsample convs,
and k==s transpose upsample convs (the reference's Upsample unit,
`modules/diffusion_block.py:287-306`), including gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu.ops import (
    KernelSpec, dense_conv, kernel_map, sparse_conv_apply, stride_grid)


def _grid(rng, n, cap, cin, ext, bsz=2, stride=1):
    coords = []
    for b in range(bsz):
        c = np.unique(rng.randint(0, ext // stride, (n, 3)) * stride, axis=0)
        coords.append(np.concatenate(
            [np.full((len(c), 1), b, np.int32), c], 1))
    coords = np.concatenate(coords).astype(np.int32)
    cpad, valid = mt.ops.pad_to_capacity(coords, cap)
    feats = (rng.randn(cap, cin) * valid[:, None]).astype(np.float32)
    return jax.jit(lambda c, f, v: mt.sparse_tensor(
        c, f, capacity=cap, valid=v, batch_size=bsz, extent=(ext,) * 3,
        stride=stride))(
        jnp.asarray(cpad), jnp.asarray(feats), jnp.asarray(valid))


def _check(dense_fn, feats, kern, nbr, gout):
    ref = jax.jit(lambda f, k: sparse_conv_apply(
        f, k, nbr, compute_dtype=jnp.float32))(feats, kern)
    out = jax.jit(dense_fn)(feats, kern)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    dref = jax.jit(jax.grad(lambda f, k: jnp.vdot(sparse_conv_apply(
        f, k, nbr, compute_dtype=jnp.float32), gout), argnums=(0, 1)))(
        feats, kern)
    dfus = jax.jit(jax.grad(lambda f, k: jnp.vdot(
        dense_fn(f, k), gout), argnums=(0, 1)))(feats, kern)
    for a, b in zip(dfus, dref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dense_general_strided_matches_gather(rng):
    # k3 s2 downsample on a coarse (no-growth) grid: capacity must cover
    # the dense cell bound (2 instances × 8³)
    st = _grid(rng, 200, 1024, 5, 8)
    spec = KernelSpec(3, 2, ndim=3)
    og = jax.jit(lambda g: stride_grid(g, 2, 256))(st.grid)
    assert dense_conv.dense_no_growth_preferred2(spec, st.grid, og)
    nbr = jax.jit(lambda gi, go: kernel_map(gi, go, spec))(st.grid, og)
    kern = jnp.asarray(rng.randn(27, 5, 7).astype(np.float32) * 0.1)
    gout = jnp.asarray(rng.randn(256, 7).astype(np.float32))
    _check(lambda f, k: dense_conv.dense_conv_general_apply(
        f, k, st.grid, og, spec, compute_dtype=jnp.float32),
        st.features, kern, nbr, gout)


def test_dense_general_strided_even_kernel(rng):
    # k2 s2 (offsets [0, 1]) — the even-kernel pairing has no centering
    st = _grid(rng, 150, 1024, 4, 8)
    spec = KernelSpec(2, 2, ndim=3)
    og = jax.jit(lambda g: stride_grid(g, 2, 128))(st.grid)
    assert dense_conv.dense_no_growth_preferred2(spec, st.grid, og)
    nbr = jax.jit(lambda gi, go: kernel_map(gi, go, spec))(st.grid, og)
    kern = jnp.asarray(rng.randn(8, 4, 6).astype(np.float32) * 0.1)
    gout = jnp.asarray(rng.randn(128, 6).astype(np.float32))
    _check(lambda f, k: dense_conv.dense_conv_general_apply(
        f, k, st.grid, og, spec, compute_dtype=jnp.float32),
        st.features, kern, nbr, gout)


def test_dense_general_transpose_matches_gather(rng):
    # k2 s2 transpose up onto the (generative) fine grid — each output cell
    # has exactly one source, the einsum-interleave path
    st = _grid(rng, 100, 128, 6, 16, stride=4)
    spec = KernelSpec(2, 2, ndim=3, transpose=True)
    offs = spec.absolute_offsets(st.grid.stride)
    out_stride = spec.out_stride(st.grid.stride)
    og = jax.jit(lambda g: mt.ops.expand_grid(
        g, offs, out_stride, 1024))(st.grid)
    assert dense_conv.dense_no_growth_preferred2(spec, st.grid, og)
    nbr = jax.jit(lambda gi, go: kernel_map(gi, go, spec))(st.grid, og)
    kern = jnp.asarray(rng.randn(8, 6, 5).astype(np.float32) * 0.1)
    gout = jnp.asarray(rng.randn(1024, 5).astype(np.float32))
    _check(lambda f, k: dense_conv.dense_conv_general_apply(
        f, k, st.grid, og, spec, compute_dtype=jnp.float32),
        st.features, kern, nbr, gout)


def test_dense_no_growth_predicates():
    rng = np.random.RandomState(0)
    st = _grid(rng, 100, 1024, 4, 8)
    og = jax.jit(lambda g: stride_grid(g, 2, 256))(st.grid)
    # transpose with k != s is NOT exact-children — must refuse
    assert not dense_conv.dense_no_growth_preferred2(
        KernelSpec(3, 2, ndim=3, transpose=True), og, st.grid)
    # growth case: capacity below the cell count — must refuse
    small = _grid(rng, 100, 128, 4, 8)
    assert not dense_conv.dense_no_growth_preferred2(
        KernelSpec(3, 1, ndim=3), small.grid, small.grid)
    # HYPER_CROSS unsupported
    assert not dense_conv.dense_no_growth_preferred2(
        KernelSpec(3, 1, ndim=3, region_type=mt.ops.RegionType.HYPER_CROSS),
        st.grid, st.grid)
