"""NN-layer tests: sparse conv vs dense conv equivalence on a full grid,
norm statistics, attention packing, generative growth, pooling — the op-level
golden strategy from SURVEY.md §4.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu import nn as mnn


def full_grid_tensor(rng, res=4, c=3, b=1):
    """SparseTensor occupying every voxel of a res^3 grid."""
    g = np.stack(np.meshgrid(*([np.arange(res)] * 3), indexing="ij"),
                 axis=-1).reshape(-1, 3)
    coords = []
    for bi in range(b):
        coords.append(np.concatenate(
            [np.full((len(g), 1), bi), g], axis=1))
    coords = np.concatenate(coords).astype(np.int32)
    feats = rng.randn(len(coords), c).astype(np.float32)
    st = jax.jit(lambda co, f: mt.sparse_tensor(
        co, f, capacity=len(coords), batch_size=b))(
        jnp.asarray(coords), jnp.asarray(feats))
    return st, coords, feats


def test_sparse_conv_equals_dense_conv(rng):
    """Generalized sparse conv on a fully-occupied grid == lax.conv (SAME).
    This is the core correctness gate (SURVEY.md §4 item 2)."""
    res, cin, cout = 4, 3, 5
    st, coords, feats = full_grid_tensor(rng, res, cin)
    conv = mnn.SparseConv(cout, kernel_size=3)
    params = conv.init(jax.random.PRNGKey(1), st)
    out = jax.jit(lambda p, s: conv.apply(p, s))(params, st)

    # dense reference: NCDHW conv with the same (K, Cin, Cout) kernel
    dense_in = np.zeros((1, cin, res, res, res), np.float32)
    for i, (b, x, y, z) in enumerate(coords):
        dense_in[0, :, x, y, z] = feats[i]
    kernel = np.asarray(params["params"]["kernel"])  # [27, cin, cout]
    # kernel offset order is C-order product over (dx,dy,dz) in {-1,0,1}
    khwc = kernel.reshape(3, 3, 3, cin, cout)  # [dx,dy,dz,ci,co]
    rhs = np.transpose(khwc, (4, 3, 0, 1, 2))  # OIXYZ
    dense_out = jax.lax.conv_general_dilated(
        jnp.asarray(dense_in), jnp.asarray(rhs), (1, 1, 1), "SAME")
    dn = np.asarray(dense_out)

    on = np.asarray(out.F)
    cn = np.asarray(out.C)
    for i in range(out.capacity):
        if bool(out.valid[i]):
            b, x, y, z = cn[i]
            np.testing.assert_allclose(on[i], dn[0, :, x, y, z], rtol=2e-4,
                                       atol=1e-4)


def test_strided_conv_grid_and_linear_fastpath(rng):
    st, coords, feats = full_grid_tensor(rng, 4, 3)
    conv = mnn.SparseConv(4, kernel_size=2, stride=2, out_capacity=8)
    params = conv.init(jax.random.PRNGKey(0), st)
    out = jax.jit(lambda p, s: conv.apply(p, s))(params, st)
    assert out.tensor_stride == (2, 2, 2)
    assert int(out.count()) == 8  # 4^3 grid → 2^3 coarse voxels

    lin = mnn.SparseConv(6, kernel_size=1)
    p2 = lin.init(jax.random.PRNGKey(0), st)
    o2 = jax.jit(lambda p, s: lin.apply(p, s))(p2, st)
    np.testing.assert_allclose(
        np.asarray(o2.F),
        np.asarray(st.F) @ np.asarray(p2["params"]["kernel"][0]), rtol=2e-5,
        atol=1e-5)


def test_generative_transpose_grows_children(rng):
    coords = np.array([[0, 0, 0, 0], [0, 2, 2, 2]], np.int32)
    feats = rng.randn(2, 3).astype(np.float32)
    st = jax.jit(lambda c, f: mt.sparse_tensor(c, f, capacity=2, stride=2))(
        jnp.asarray(coords), jnp.asarray(feats))
    up = mnn.GenerativeConvTranspose(4, out_capacity=16, kernel_size=2,
                                     stride=2)
    params = up.init(jax.random.PRNGKey(0), st)
    out = jax.jit(lambda p, s: up.apply(p, s))(params, st)
    assert out.tensor_stride == (1, 1, 1)
    assert int(out.count()) == 16  # each parent grows 8 children
    # children of parent at (0,0,0) are the {0,1}^3 cube
    cn = set(map(tuple, np.asarray(out.C)[np.asarray(out.valid)].tolist()))
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                assert (0, dx, dy, dz) in cn
                assert (0, 2 + dx, 2 + dy, 2 + dz) in cn


def test_upsample_interpolate_copies_parent(rng):
    coords = np.array([[0, 0, 0, 0], [0, 4, 2, 6]], np.int32)
    feats = rng.randn(2, 5).astype(np.float32)
    st = jax.jit(lambda c, f: mt.sparse_tensor(c, f, capacity=2, stride=2))(
        jnp.asarray(coords), jnp.asarray(feats))
    up = mnn.UpsampleInterpolate(out_capacity=16)
    params = up.init(jax.random.PRNGKey(0), st)
    out = jax.jit(lambda p, s: up.apply(p, s))(params, st)
    cn, fn = np.asarray(out.C), np.asarray(out.F)
    feats_by_parent = {tuple(c): f for c, f in zip(coords.tolist(), feats)}
    for i in range(16):
        if bool(out.valid[i]):
            parent = (cn[i][0],) + tuple((cn[i][1:] // 2) * 2)
            np.testing.assert_allclose(fn[i], feats_by_parent[parent],
                                       rtol=1e-6)


def test_batchnorm_masked_stats(rng):
    st, coords, feats = full_grid_tensor(rng, 4, 3, b=2)
    bn = mnn.BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), st)
    out, updated = jax.jit(
        lambda v, s: bn.apply(v, s, train=True, mutable=["batch_stats"])
    )(variables, st)
    f = np.asarray(out.F)[np.asarray(st.valid)]
    np.testing.assert_allclose(f.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(f.std(0), 1.0, atol=1e-3)


def test_instance_norm_per_instance(rng):
    st, coords, feats = full_grid_tensor(rng, 4, 4, b=2)
    m = mnn.InstanceNorm()
    variables = m.init(jax.random.PRNGKey(0), st)
    out = jax.jit(lambda v, s: m.apply(v, s))(variables, st)
    f = np.asarray(out.F)
    bid = np.asarray(st.C[:, 0])
    v = np.asarray(st.valid)
    for b in range(2):
        g = f[v & (bid == b)]
        np.testing.assert_allclose(g.mean(0), 0.0, atol=1e-4)
        np.testing.assert_allclose(g.std(0), 1.0, atol=1e-2)


def test_stable_instance_norm_group_stats(rng):
    st, _, _ = full_grid_tensor(rng, 4, 8, b=2)
    m = mnn.StableInstanceNorm(group=4)
    variables = m.init(jax.random.PRNGKey(0), st)
    out = jax.jit(lambda v, s: m.apply(v, s))(variables, st)
    f = np.asarray(out.F)
    assert np.all(np.isfinite(f))
    # group-averaged normalization: each group of 4 channels shares stats, so
    # the concatenated group should have ~zero mean per instance
    bid = np.asarray(st.C[:, 0])
    v = np.asarray(st.valid)
    g0 = f[v & (bid == 0)][:, :4]
    np.testing.assert_allclose(g0.mean(), 0.0, atol=1e-3)


def test_ada_stable_instance_norm_conditioning(rng):
    st, _, _ = full_grid_tensor(rng, 4, 4, b=2)
    m = mnn.AdaStableInstanceNorm()
    emb = jnp.asarray(rng.randn(2, 16).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), st, emb)
    out = jax.jit(lambda v, s, e: m.apply(v, s, e))(variables, st, emb)
    assert np.all(np.isfinite(np.asarray(out.F)))


def test_local_and_global_pool(rng):
    st, coords, feats = full_grid_tensor(rng, 4, 3, b=2)
    pool = mnn.LocalPool(kernel_size=2, stride=2, mode="max", out_capacity=16)
    params = pool.init(jax.random.PRNGKey(0), st)
    out = jax.jit(lambda p, s: pool.apply(p, s))(params, st)
    assert int(out.count()) == 16  # 8 per instance
    # max pool of the (0,0,0) output voxel == max over its 2^3 children
    cn, fn = np.asarray(out.C), np.asarray(out.F)
    kids = feats[(coords[:, 0] == 0) & np.all(coords[:, 1:] < 2, axis=1)]
    i = next(i for i in range(16) if tuple(cn[i]) == (0, 0, 0, 0))
    np.testing.assert_allclose(fn[i], kids.max(0), rtol=1e-6)

    g = jax.jit(mnn.global_pool_features)(st)
    v = np.asarray(st.valid)
    bid = np.asarray(st.C[:, 0])
    for b in range(2):
        np.testing.assert_allclose(np.asarray(g)[b],
                                   feats[v & (bid == b)].mean(0), rtol=1e-5)


def test_sparse_transformer_masking(rng):
    st, _, _ = full_grid_tensor(rng, 2, 8, b=2)
    m = mnn.SparseTransformer(max_len=16)
    variables = m.init(jax.random.PRNGKey(0), st)
    out = jax.jit(lambda v, s: m.apply(v, s))(variables, st)
    assert np.all(np.isfinite(np.asarray(out.F)))
    # padding rows stay zero
    assert np.all(np.asarray(out.F)[~np.asarray(out.valid)] == 0)


def test_se_layer_and_res_block(rng):
    st, _, _ = full_grid_tensor(rng, 4, 8)
    se = mnn.SELayer(reduction=4)
    v = se.init(jax.random.PRNGKey(0), st)
    out = jax.jit(lambda v, s: se.apply(v, s))(v, st)
    assert np.all(np.isfinite(np.asarray(out.F)))

    blk = mnn.ResBasicBlock(planes=8)
    variables = blk.init(jax.random.PRNGKey(0), st)
    out, _ = jax.jit(lambda v, s: blk.apply(v, s, mutable=["batch_stats"]))(
        variables, st)
    assert out.F.shape == (st.capacity, 8)


def test_basic_block_time_emb(rng):
    st, _, _ = full_grid_tensor(rng, 4, 8, b=2)
    blk = mnn.BasicBlock(channels=8, use_time_emb=True, group=4,
                         with_attn=True, attn_max_len=64)
    emb = jnp.asarray(rng.randn(2, 32).astype(np.float32))
    variables = blk.init(jax.random.PRNGKey(0), st, emb)
    out = jax.jit(lambda v, s, e: blk.apply(v, s, e))(variables, st, emb)
    assert np.all(np.isfinite(np.asarray(out.F)))
    assert out.F.shape == (st.capacity, 8)


def test_conv_numeric_gradcheck(rng):
    """Numeric gradient verification of the sparse conv (the reference ships
    a gradcheck wrapper for exactly this, `utils/gradcheck.py:34-60`)."""
    import mink_octtree_stablediffusion_tpu as mt2
    from mink_octtree_stablediffusion_tpu.utils import gradcheck

    coords = np.concatenate(
        [np.zeros((12, 1), np.int32), rng.randint(0, 3, (12, 3))],
        axis=1).astype(np.int32)
    cpad, valid = mt2.ops.pad_to_capacity(coords, 16)
    st = jax.jit(lambda c, f, v: mt2.sparse_tensor(
        c, f, capacity=16, valid=v))(
        jnp.asarray(cpad),
        jnp.asarray((rng.randn(16, 2) * valid[:, None]).astype(np.float32)),
        jnp.asarray(valid))
    spec = mt2.ops.KernelSpec(3, 1, ndim=3)
    nbr = mt2.ops.kernel_map(st.grid, st.grid, spec)
    kernel = jnp.asarray(rng.randn(27, 2, 3).astype(np.float32) * 0.2)

    def f(feats, kern):
        return mt2.ops.sparse_conv_apply(feats, kern, nbr)

    assert gradcheck(f, (st.features, kernel))


def test_hybrid_region_offsets():
    from mink_octtree_stablediffusion_tpu.ops import (RegionType,
                                                      hybrid_region_offsets)

    offs = hybrid_region_offsets(
        3, (RegionType.HYPER_CUBE, RegionType.HYPER_CUBE,
            RegionType.HYPER_CROSS))
    s = set(map(tuple, offs.tolist()))
    # cube over (x, y) at z=0, plus pure z = ±1 spokes off the origin
    assert (1, -1, 0) in s and (0, 0, 1) in s and (0, 0, -1) in s
    assert (1, 1, 1) not in s and (1, 0, 1) not in s
    assert len(s) == 9 + 2


def test_backend_differential_suite_cpu():
    # on a CPU host both sides coincide: every op must be exactly consistent
    rep = mt.utils.backend_differential_suite(n=256, res=8)
    assert rep["_all_ok"], rep
    assert rep["geometry_keys"]["max_err"] == 0.0


def test_compute_dtype_policy(rng):
    # CPU auto policy = fp32 (bit-exact tests); forcing bf16 stays close
    import mink_octtree_stablediffusion_tpu.ops as mops
    assert mops.default_compute_dtype() == jnp.float32
    coords = np.concatenate(
        [np.zeros((300, 1), np.int32), rng.randint(0, 16, (300, 3))],
        1).astype(np.int32)
    cpad, valid = mt.ops.pad_to_capacity(coords, 512)
    st = jax.jit(lambda c, f, v: mt.sparse_tensor(
        c, f, capacity=512, valid=v, batch_size=1))(
        jnp.asarray(cpad),
        jnp.asarray((rng.randn(512, 8) * valid[:, None]).astype(np.float32)),
        jnp.asarray(valid))
    conv = mt.nn.SparseConv(16, kernel_size=3)
    params = jax.jit(conv.init)(jax.random.PRNGKey(0), st)
    ref = jax.jit(conv.apply)(params, st).features
    try:
        mops.set_default_compute_dtype(jnp.bfloat16)
        assert mops.default_compute_dtype() == jnp.bfloat16
        out = jax.jit(lambda p, s: conv.apply(p, s).features)(params, st)
        # bf16 compute, fp32 accumulate: output dtype unchanged, values close
        assert out.dtype == jnp.float32
        scale = float(jnp.max(jnp.abs(ref))) + 1e-9
        assert float(jnp.max(jnp.abs(out - ref))) / scale < 3e-2
        assert not np.array_equal(np.asarray(out), np.asarray(ref))
    finally:
        mops.set_default_compute_dtype(None)
    # per-layer override beats the global policy
    conv32 = mt.nn.SparseConv(16, kernel_size=3, dtype=jnp.float32)
    p32 = jax.jit(conv32.init)(jax.random.PRNGKey(0), st)
    try:
        mops.set_default_compute_dtype(jnp.bfloat16)
        out32 = jax.jit(lambda p, s: conv32.apply(p, s).features)(p32, st)
    finally:
        mops.set_default_compute_dtype(None)
    ref32 = jax.jit(conv32.apply)(p32, st).features
    np.testing.assert_array_equal(np.asarray(out32), np.asarray(ref32))


@pytest.mark.slow
def test_resnet_stack_remat_matches(rng):
    # lifted remat is a pure memory/recompute trade: same param structure,
    # same forward, same grads (up to backward fusion-order noise)
    import flax.linen as fnn  # noqa: F401

    st, _, _ = full_grid_tensor(rng, 4, 4, b=2)
    emb = jnp.asarray(rng.randn(2, 32).astype(np.float32))
    kw = dict(out_channels=8, layers=3, after="downsample", use_time_emb=True,
              group=4, with_attn=True, attn_max_len=64, out_capacity=32)
    m0 = mnn.ResNetStack(**kw)
    m1 = mnn.remat_stack()(**kw)
    variables = jax.jit(m0.init, static_argnums=(5,))(
        jax.random.PRNGKey(0), st, emb, None, None, True)
    v1 = jax.eval_shape(
        lambda: m1.init(jax.random.PRNGKey(0), st, emb, None, None, True))
    assert (jax.tree_util.tree_structure(v1)
            == jax.tree_util.tree_structure(variables))

    def run(model):
        def loss(v, x):
            f = model.apply(v, x, emb, None, None, True).features
            return jnp.sum(f ** 2), f
        return jax.jit(jax.value_and_grad(loss, has_aux=True))(variables, st)

    (l0, f0), g0 = run(m0)
    (l1, f1), g1 = run(m1)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3,
                                   atol=1e-5)


@pytest.mark.slow
def test_resnet_stack_nonconv_heads_alias_legacy(rng):
    """`after="avg_pool"` / `"upsample_interpolate"` are the first-class
    spellings of the reference's ``use_conv=False`` head selection
    (`diffusion_block.py:344-364`): identical module graph, identical
    outputs."""
    st, _, _ = full_grid_tensor(rng, 4, 4, b=2)
    # upsampling needs a coarse (stride-2) input
    coarse = mnn.LocalPool(2, 2, mode="avg", out_capacity=32).apply({}, st)
    for x_in, new, legacy in [
        (st, dict(after="avg_pool", out_capacity=32),
         dict(after="downsample", use_conv=False, out_capacity=32)),
        (coarse, dict(after="upsample_interpolate", out_capacity=256),
         dict(after="upsample", use_conv=False, out_capacity=256)),
    ]:
        m_new = mnn.ResNetStack(out_channels=8, layers=2, **new)
        m_old = mnn.ResNetStack(out_channels=8, layers=2, **legacy)
        v = jax.jit(m_new.init, static_argnums=(5,))(
            jax.random.PRNGKey(0), x_in, None, None, None, True)
        v2 = jax.eval_shape(
            lambda: m_old.init(jax.random.PRNGKey(0), x_in, None, None, None,
                               True))
        assert (jax.tree_util.tree_structure(v) ==
                jax.tree_util.tree_structure(v2))
        # eval mode: no batch_stats mutation, deterministic comparison
        o_new = jax.jit(m_new.apply, static_argnums=(5,))(
            v, x_in, None, None, None, False)
        o_old = jax.jit(m_old.apply, static_argnums=(5,))(
            v, x_in, None, None, None, False)
        np.testing.assert_array_equal(np.asarray(o_new.features),
                                      np.asarray(o_old.features))
        np.testing.assert_array_equal(np.asarray(o_new.grid.coords),
                                      np.asarray(o_old.grid.coords))


def test_resnet_stack_avg_pool_head_geometry(rng):
    """`after="avg_pool"`: trailing 2x2 avg pool halves the grid (stride
    doubles), batch-norm path, grads flow."""
    st, _, _ = full_grid_tensor(rng, 4, 3, b=2)
    m = mnn.ResNetStack(out_channels=8, layers=2, after="avg_pool",
                        out_capacity=32)
    v = jax.jit(m.init, static_argnums=(5,))(
        jax.random.PRNGKey(0), st, None, None, None, True)

    @jax.jit
    def loss(params, st):
        out, _ = m.apply({"params": params["params"],
                          "batch_stats": params.get("batch_stats", {})},
                         st, None, None, None, True,
                         mutable=["batch_stats"])
        assert tuple(int(s) for s in out.grid.stride) == (2, 2, 2)
        return jnp.sum(out.features ** 2)

    l, g = jax.value_and_grad(loss)(v, st)
    assert np.isfinite(float(l)) and float(l) > 0
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_resnet_stack_pool_transpose_head(rng):
    """`after="pool_transpose"`: unpool to a pinned finer grid (the
    reference's defined-but-unwired `pool_transpose` head,
    `diffusion_block.py:351-356`)."""
    st, _, _ = full_grid_tensor(rng, 4, 3, b=1)
    coarse = mnn.LocalPool(2, 2, mode="avg", out_capacity=16).apply({}, st)
    m = mnn.ResNetStack(out_channels=6, layers=2, after="pool_transpose")
    v = jax.jit(m.init, static_argnums=(5,))(
        jax.random.PRNGKey(0), coarse, None, st.grid, None, True)
    out, _ = m.apply(v, coarse, None, st.grid, None, True,
                     mutable=["batch_stats"])
    assert out.grid is st.grid  # landed exactly on the pinned fine grid
    f = np.asarray(out.features)
    assert np.isfinite(f).all()
    assert int(np.sum(np.asarray(out.valid))) == int(np.sum(np.asarray(st.valid)))
    # unpooled rows are non-trivial (each fine voxel copied its parent)
    assert float(np.abs(f).sum()) > 0
