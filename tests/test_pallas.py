"""Pallas fused conv kernel (interpreter mode): must match the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu.ops.pallas_conv import pallas_sparse_conv


def _sphere(rng, n, cap, cin, ext, bsz=1):
    coords = []
    for b in range(bsz):
        c = np.unique(rng.randint(0, ext, (n, 3)), axis=0)
        coords.append(np.concatenate(
            [np.full((len(c), 1), b, np.int32), c], 1))
    coords = np.concatenate(coords).astype(np.int32)
    cpad, valid = mt.ops.pad_to_capacity(coords, cap)
    feats = (rng.randn(cap, cin) * valid[:, None]).astype(np.float32)
    return jax.jit(lambda c, f, v: mt.sparse_tensor(
        c, f, capacity=cap, valid=v, batch_size=bsz, extent=(ext,) * 3))(
        jnp.asarray(cpad), jnp.asarray(feats), jnp.asarray(valid))


def test_fused_onehot_conv_matches_xla(rng):
    st = _sphere(rng, 400, 1024, 3, 16, bsz=2)
    spec = mt.ops.KernelSpec(3, 1, ndim=3)
    nbr = jax.jit(lambda g: mt.ops.kernel_map(g, g, spec))(st.grid)
    kern = jnp.asarray(rng.randn(27, 3, 16).astype(np.float32) * 0.1)
    ref = jax.jit(lambda f, k: mt.ops.sparse_conv_apply(f, k, nbr))(
        st.features, kern)
    out = mt.ops.fused_sparse_conv(
        st.features, kern, st.grid, st.grid, spec, tile=128, tw=128,
        compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


@pytest.mark.slow
def test_fused_onehot_conv_grads_match_xla(rng):
    st = _sphere(rng, 300, 512, 4, 12)
    spec = mt.ops.KernelSpec(3, 1, ndim=3)
    nbr = jax.jit(lambda g: mt.ops.kernel_map(g, g, spec))(st.grid)
    kern = jnp.asarray(rng.randn(27, 4, 8).astype(np.float32) * 0.1)
    gout = jnp.asarray(rng.randn(512, 8).astype(np.float32))
    dref = jax.grad(lambda f, k: jnp.vdot(
        mt.ops.sparse_conv_apply(f, k, nbr), gout), argnums=(0, 1))(
        st.features, kern)
    dfus = jax.grad(lambda f, k: jnp.vdot(mt.ops.fused_sparse_conv(
        f, k, st.grid, st.grid, spec, tile=128, tw=128,
        compute_dtype=jnp.float32, interpret=True), gout),
        argnums=(0, 1))(st.features, kern)
    np.testing.assert_allclose(np.asarray(dfus[0]), np.asarray(dref[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dfus[1]), np.asarray(dref[1]),
                               rtol=1e-4, atol=1e-5)


def test_fused_onehot_conv_strided_and_transpose(rng):
    # strided downsample conv
    st = _sphere(rng, 300, 512, 5, 12, bsz=2)
    spec = mt.ops.KernelSpec(3, 2, ndim=3)
    og = jax.jit(lambda g: mt.ops.stride_grid(g, 2, 512))(st.grid)
    nbr = jax.jit(lambda gi, go: mt.ops.kernel_map(gi, go, spec))(st.grid, og)
    kern = jnp.asarray(rng.randn(27, 5, 7).astype(np.float32) * 0.1)
    ref = jax.jit(lambda f, k: mt.ops.sparse_conv_apply(f, k, nbr))(
        st.features, kern)
    out = mt.ops.fused_sparse_conv(st.features, kern, st.grid, og, spec,
                                   tile=128, tw=128,
                                   compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)
    # transposed conv back up onto the fine grid (alignment-mask path)
    spec_t = mt.ops.KernelSpec(2, 2, ndim=3, transpose=True)
    nbr_t = jax.jit(lambda gi, go: mt.ops.kernel_map(gi, go, spec_t))(
        og, st.grid)
    kern_t = jnp.asarray(rng.randn(8, 5, 6).astype(np.float32) * 0.1)
    ref_t = jax.jit(lambda f, k: mt.ops.sparse_conv_apply(f, k, nbr_t))(
        st.features[:512], kern_t)
    out_t = mt.ops.fused_sparse_conv(
        st.features[:512], kern_t, og, st.grid, spec_t, tile=128, tw=128,
        compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref_t),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_fused_onehot_conv_grads_strided_and_transpose(rng):
    # the backward's flipped-direction pass swaps lattice strides — cover
    # both a downsampling conv (s_out=2) and a transpose conv (s_in=2)
    st = _sphere(rng, 200, 256, 4, 12)
    spec = mt.ops.KernelSpec(3, 2, ndim=3)
    og = jax.jit(lambda g: mt.ops.stride_grid(g, 2, 256))(st.grid)
    nbr = jax.jit(lambda gi, go: mt.ops.kernel_map(gi, go, spec))(st.grid, og)
    kern = jnp.asarray(rng.randn(27, 4, 6).astype(np.float32) * 0.1)
    gout = jnp.asarray(rng.randn(256, 6).astype(np.float32))
    dref = jax.grad(lambda f, k: jnp.vdot(
        mt.ops.sparse_conv_apply(f, k, nbr), gout), argnums=(0, 1))(
        st.features, kern)
    dfus = jax.grad(lambda f, k: jnp.vdot(mt.ops.fused_sparse_conv(
        f, k, st.grid, og, spec, tile=128, tw=128,
        compute_dtype=jnp.float32, interpret=True), gout),
        argnums=(0, 1))(st.features, kern)
    np.testing.assert_allclose(np.asarray(dfus[0]), np.asarray(dref[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dfus[1]), np.asarray(dref[1]),
                               rtol=1e-4, atol=1e-5)

    spec_t = mt.ops.KernelSpec(2, 2, ndim=3, transpose=True)
    nbr_t = jax.jit(lambda gi, go: mt.ops.kernel_map(gi, go, spec_t))(
        og, st.grid)
    kern_t = jnp.asarray(rng.randn(8, 4, 5).astype(np.float32) * 0.1)
    gout_t = jnp.asarray(rng.randn(256, 5).astype(np.float32))
    dref_t = jax.grad(lambda f, k: jnp.vdot(
        mt.ops.sparse_conv_apply(f, k, nbr_t), gout_t), argnums=(0, 1))(
        st.features[:256], kern_t)
    dfus_t = jax.grad(lambda f, k: jnp.vdot(mt.ops.fused_sparse_conv(
        f, k, og, st.grid, spec_t, tile=128, tw=128,
        compute_dtype=jnp.float32, interpret=True), gout_t),
        argnums=(0, 1))(st.features[:256], kern_t)
    np.testing.assert_allclose(np.asarray(dfus_t[0]), np.asarray(dref_t[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dfus_t[1]), np.asarray(dref_t[1]),
                               rtol=1e-4, atol=1e-5)


def test_fused_onehot_conv_cout_tiled(rng, monkeypatch):
    # narrow cin + very wide cout forces the cout-block grid dimension
    # (weight pair over the VMEM budget) while staying cheap in interpret;
    # pinned budget keeps the cout grid exercised regardless of layout.
    from mink_octtree_stablediffusion_tpu.ops import onehot_conv as oh
    monkeypatch.setattr(oh, "_VMEM_BUDGET", 2 ** 22)
    assert oh.select_params(3, 2048, 27, 128, 256, jnp.bfloat16)[2] < 2048
    st = _sphere(rng, 150, 256, 3, 10)
    spec = mt.ops.KernelSpec(3, 1, ndim=3)
    nbr = jax.jit(lambda g: mt.ops.kernel_map(g, g, spec))(st.grid)
    kern = jnp.asarray(rng.randn(27, 3, 2048).astype(np.float32) * 0.1)
    ref = jax.jit(lambda f, k: mt.ops.sparse_conv_apply(f, k, nbr))(
        st.features, kern)
    out = mt.ops.fused_sparse_conv(
        st.features, kern, st.grid, st.grid, spec, tile=128, tw=256,
        compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


@pytest.mark.slow
def test_fused_onehot_conv_packed_layout(rng, monkeypatch):
    # opt-in packed narrow-channel window layout (off by default — see the
    # on-chip verdict in `_packed_layout`): fwd + grads must match the XLA
    # path at a narrow width, including a cin not divisible by 8
    from mink_octtree_stablediffusion_tpu.ops import onehot_conv as oh
    monkeypatch.setattr(oh, "_PACKED", True)
    for cin, cout in ((3, 16), (12, 8)):
        assert oh._packed_layout(cin) is not None
        st = _sphere(rng, 250, 512, cin, 12)
        spec = mt.ops.KernelSpec(3, 1, ndim=3)
        nbr = jax.jit(lambda g: mt.ops.kernel_map(g, g, spec))(st.grid)
        kern = jnp.asarray(
            rng.randn(27, cin, cout).astype(np.float32) * 0.1)
        gout = jnp.asarray(rng.randn(512, cout).astype(np.float32))
        dref = jax.grad(lambda f, k: jnp.vdot(
            mt.ops.sparse_conv_apply(f, k, nbr), gout), argnums=(0, 1))(
            st.features, kern)
        dfus = jax.grad(lambda f, k: jnp.vdot(mt.ops.fused_sparse_conv(
            f, k, st.grid, st.grid, spec, tile=128, tw=128,
            compute_dtype=jnp.float32, interpret=True), gout),
            argnums=(0, 1))(st.features, kern)
        np.testing.assert_allclose(np.asarray(dfus[0]), np.asarray(dref[0]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dfus[1]), np.asarray(dref[1]),
                                   rtol=1e-4, atol=1e-5)


def test_fused_select_params_vmem_budget():
    from mink_octtree_stablediffusion_tpu.ops import onehot_conv as oh
    # requested config honored when it fits
    assert oh.select_params(3, 32, 27, 256, 512, jnp.bfloat16) == (
        256, 512, 32)
    # wide layers shrink but stay legal (co_t multiple of 128 or == cout)
    for cin, cout in ((640, 640), (512, 512), (256, 640)):
        p = oh.select_params(cin, cout, 27, 128, 256, jnp.bfloat16)
        assert p is not None
        t, w, c = p
        assert t >= 32 and w >= 128 and (c == cout or c % 128 == 0)
    # absurd widths refuse (callers fall back to the XLA path)
    assert oh.select_params(1024, 1024, 27, 128, 256, jnp.bfloat16) is None


def test_conv_schedule_real_widths():
    # weight-heavy mid-width layers (the UNet's 512/640ch levels) switch to
    # the band-split schedule (full-slab blocking had VMEM-shrunk their row
    # tile, re-streaming the slab per tile); narrow layers keep the full
    # schedule; over-budget widths (960/1280) default to the XLA path
    # (opt-in split via use_band_split)
    from mink_octtree_stablediffusion_tpu.ops import onehot_conv as oh
    assert oh.conv_schedule(32, 32, 27, 9, 128, 256, jnp.bfloat16) == "full"
    assert oh.conv_schedule(256, 256, 27, 9, 128, 256,
                            jnp.bfloat16) == "full"
    for cin, cout in ((512, 512), (640, 640)):
        assert oh.conv_schedule(cin, cout, 27, 9, 128, 256,
                                jnp.bfloat16) == "split"
    for cin, cout in ((960, 960), (1280, 640), (4096, 4096)):
        assert oh.conv_schedule(cin, cout, 27, 9, 128, 256,
                                jnp.bfloat16) is None
    try:
        oh.use_band_split(True)
        assert oh.conv_schedule(960, 960, 27, 9, 128, 256,
                                jnp.bfloat16) == "split"
        # a single band that itself exceeds VMEM refuses entirely
        assert oh.conv_schedule(4096, 4096, 27, 9, 128, 256,
                                jnp.bfloat16) is None
    finally:
        oh.use_band_split(False)


@pytest.mark.slow
def test_fused_band_split_matches_xla(rng, monkeypatch):
    # shrink the VMEM budget so a cheap width exercises the band-split
    # schedule (forward + both grads, incl. the split flipped-direction dF
    # and the blocked fused dW) against the XLA path
    from mink_octtree_stablediffusion_tpu.ops import onehot_conv as oh
    monkeypatch.setattr(oh, "_VMEM_BUDGET", 2_000_000)
    monkeypatch.setattr(oh, "_BAND_SPLIT", True)  # opt-in schedule
    cin, cout = 64, 256
    assert oh.conv_schedule(cin, cout, 27, 9, 128, 128,
                            jnp.float32) == "split"
    assert oh._dk_params(cin, cout, 27, 9, 128, 128) is not None
    st = _sphere(rng, 200, 256, cin, 12, bsz=2)
    spec = mt.ops.KernelSpec(3, 1, ndim=3)
    nbr = jax.jit(lambda g: mt.ops.kernel_map(g, g, spec))(st.grid)
    kern = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.05)
    gout = jnp.asarray(rng.randn(256, cout).astype(np.float32))
    ref = jax.jit(lambda f, k: mt.ops.sparse_conv_apply(f, k, nbr))(
        st.features, kern)
    out = mt.ops.fused_sparse_conv(
        st.features, kern, st.grid, st.grid, spec, tile=128, tw=128,
        compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)
    dref = jax.grad(lambda f, k: jnp.vdot(
        mt.ops.sparse_conv_apply(f, k, nbr), gout), argnums=(0, 1))(
        st.features, kern)
    dfus = jax.grad(lambda f, k: jnp.vdot(mt.ops.fused_sparse_conv(
        f, k, st.grid, st.grid, spec, tile=128, tw=128,
        compute_dtype=jnp.float32, interpret=True), gout),
        argnums=(0, 1))(st.features, kern)
    np.testing.assert_allclose(np.asarray(dfus[0]), np.asarray(dref[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dfus[1]), np.asarray(dref[1]),
                               rtol=1e-4, atol=1e-4)


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


def test_fused_separate_key_window(rng):
    # cin a multiple of 128 routes keys into their own 128-lane window
    # (inline key lane would cost a whole extra lane block on the MXU);
    # fwd + both grads must match the XLA path
    from mink_octtree_stablediffusion_tpu.ops import onehot_conv as oh

    cin, cout = 128, 64
    assert oh._key_layout(cin) == (True, 128)
    assert oh._key_layout(3) == (False, 128)
    assert oh._key_layout(512) == (True, 512)
    st = _sphere(rng, 200, 256, cin, 12)
    spec = mt.ops.KernelSpec(3, 1, ndim=3)
    nbr = jax.jit(lambda g: mt.ops.kernel_map(g, g, spec))(st.grid)
    kern = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
    gout = jnp.asarray(rng.randn(256, cout).astype(np.float32))

    def ref_loss(f, k):
        return jnp.vdot(mt.ops.sparse_conv_apply(f, k, nbr), gout)

    def fus_loss(f, k):
        return jnp.vdot(mt.ops.fused_sparse_conv(
            f, k, st.grid, st.grid, spec, tile=128, tw=128,
            compute_dtype=jnp.float32, interpret=True), gout)

    ref = jax.value_and_grad(ref_loss, argnums=(0, 1))(st.features, kern)
    fus = jax.value_and_grad(fus_loss, argnums=(0, 1))(st.features, kern)
    np.testing.assert_allclose(float(fus[0]), float(ref[0]), rtol=1e-4)
    for a, b in zip(fus[1], ref[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fused_dw_wide_cout_tiling(rng):
    # Cout wide enough that the dW accumulator is blocked over a
    # (k-group, cout-tile) grid (nco > 1) — the path that lets wide layers
    # stay fused instead of falling back to the XLA gather transpose
    from mink_octtree_stablediffusion_tpu.ops import onehot_conv as oh

    cin, cout = 4, 2048
    p = oh._dk_params(cin, cout, 27, 9, 128, 128)
    assert p is not None and p[2] < 2048, p  # co_t tiled
    st = _sphere(rng, 200, 256, cin, 12)
    spec = mt.ops.KernelSpec(3, 1, ndim=3)
    nbr = jax.jit(lambda g: mt.ops.kernel_map(g, g, spec))(st.grid)
    kern = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
    gout = jnp.asarray(rng.randn(256, cout).astype(np.float32))
    dref = jax.grad(lambda f, k: jnp.vdot(
        mt.ops.sparse_conv_apply(f, k, nbr), gout), argnums=(0, 1))(
        st.features, kern)
    dfus = jax.grad(lambda f, k: jnp.vdot(mt.ops.fused_sparse_conv(
        f, k, st.grid, st.grid, spec, tile=128, tw=128,
        compute_dtype=jnp.float32, interpret=True), gout),
        argnums=(0, 1))(st.features, kern)
    np.testing.assert_allclose(np.asarray(dfus[0]), np.asarray(dref[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dfus[1]), np.asarray(dref[1]),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_fused_onehot_conv_cross_and_aniso(rng):
    # HYPER_CROSS k=3 (volume 7 -> group 2, one padded offset) and an
    # anisotropic (3,1,1) cube (volume 3 -> group 1): both hit the banded
    # per-group window layout off the k3-cube fast shapes
    st = _sphere(rng, 400, 1024, 3, 16, bsz=2)
    for spec in (mt.ops.KernelSpec(3, 1, ndim=3,
                                   region_type=mt.ops.RegionType.HYPER_CROSS),
                 mt.ops.KernelSpec((3, 1, 1), 1, ndim=3)):
        nbr = jax.jit(lambda g, s=spec: mt.ops.kernel_map(g, g, s))(st.grid)
        kern = jnp.asarray(
            rng.randn(spec.volume, 3, 16).astype(np.float32) * 0.1)
        gout = jnp.asarray(rng.randn(1024, 16).astype(np.float32))
        ref = jax.jit(lambda f, k: mt.ops.sparse_conv_apply(f, k, nbr))(
            st.features, kern)
        out = mt.ops.fused_sparse_conv(
            st.features, kern, st.grid, st.grid, spec, tile=128, tw=128,
            compute_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        dref = jax.grad(lambda f, k: jnp.vdot(
            mt.ops.sparse_conv_apply(f, k, nbr), gout), argnums=(0, 1))(
            st.features, kern)
        dfus = jax.grad(lambda f, k: jnp.vdot(mt.ops.fused_sparse_conv(
            f, k, st.grid, st.grid, spec, tile=128, tw=128,
            compute_dtype=jnp.float32, interpret=True), gout),
            argnums=(0, 1))(st.features, kern)
        np.testing.assert_allclose(np.asarray(dfus[0]), np.asarray(dref[0]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dfus[1]), np.asarray(dref[1]),
                                   rtol=1e-4, atol=1e-5)




@pytest.mark.parametrize("ring", [True, False])
@pytest.mark.slow
def test_fused_onehot_conv_dense_grid_spills(rng, ring, request):
    # 100%-occupied grid with a small tw: per-band windows exceed tw and the
    # spill-chunk loop (ring-buffered or serial) must stay exact (fwd+grads)
    from mink_octtree_stablediffusion_tpu.ops import onehot_conv as oh
    prev = oh._SPILL_RING
    oh.use_spill_ring(ring)
    request.addfinalizer(lambda: oh.use_spill_ring(prev))
    ext = 12
    g = np.stack(np.meshgrid(*([np.arange(ext)] * 3), indexing="ij"),
                 -1).reshape(-1, 3)
    coords = np.concatenate([np.zeros((len(g), 1), np.int64), g],
                            1).astype(np.int32)
    cap = 2048  # 1728 valid rows
    cpad, valid = mt.ops.pad_to_capacity(coords, cap)
    feats = (rng.randn(cap, 4) * valid[:, None]).astype(np.float32)
    st = jax.jit(lambda c, f, v: mt.sparse_tensor(
        c, f, capacity=cap, valid=v, batch_size=1, extent=(ext,) * 3))(
        jnp.asarray(cpad), jnp.asarray(feats), jnp.asarray(valid))
    spec = mt.ops.KernelSpec(3, 1, ndim=3)
    nbr = jax.jit(lambda gr: mt.ops.kernel_map(gr, gr, spec))(st.grid)
    kern = jnp.asarray(rng.randn(27, 4, 8).astype(np.float32) * 0.1)
    gout = jnp.asarray(rng.randn(cap, 8).astype(np.float32))
    ref = jax.jit(lambda f, k: mt.ops.sparse_conv_apply(f, k, nbr))(
        st.features, kern)
    out = mt.ops.fused_sparse_conv(
        st.features, kern, st.grid, st.grid, spec, tile=128, tw=128,
        compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)
    dref = jax.grad(lambda f, k: jnp.vdot(
        mt.ops.sparse_conv_apply(f, k, nbr), gout), argnums=(0, 1))(
        st.features, kern)
    dfus = jax.grad(lambda f, k: jnp.vdot(mt.ops.fused_sparse_conv(
        f, k, st.grid, st.grid, spec, tile=128, tw=128,
        compute_dtype=jnp.float32, interpret=True), gout),
        argnums=(0, 1))(st.features, kern)
    np.testing.assert_allclose(np.asarray(dfus[0]), np.asarray(dref[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dfus[1]), np.asarray(dref[1]),
                               rtol=1e-4, atol=1e-5)


def test_extract_nbr_matches_kernel_map(rng):
    # the backward's fused kernel-map extraction (base-256 digit encoding)
    # must reproduce ops.kernel_map exactly, including in bf16 compute
    from mink_octtree_stablediffusion_tpu.ops import onehot_conv as oh
    from mink_octtree_stablediffusion_tpu.ops.coords import _tuplize

    st = _sphere(rng, 400, 1024, 3, 16, bsz=2)
    spec = mt.ops.KernelSpec(3, 1, ndim=3)
    nbr_ref = np.asarray(
        jax.jit(lambda g: mt.ops.kernel_map(g, g, spec))(st.grid))
    offs = spec.absolute_offsets(st.grid.stride)
    static = oh._FusedStatic(
        np.asarray(offs, np.int64).tolist(),
        _tuplize(st.grid.stride, st.grid.ndim), st.grid.extent,
        128, 128, 9, jnp.bfloat16, True)
    nbr = np.asarray(oh._extract_nbr(static, st.grid.coords, st.grid.valid,
                                     st.grid.coords, st.grid.valid))
    # kernel_map and _extract_nbr agree offset-for-offset (same offset order)
    np.testing.assert_array_equal(nbr, nbr_ref)


def test_brick_conv_matches_gather_path(rng):
    """8³-brick block-sparse conv (ops/brick.py) == the generalized
    gather-GEMM conv on the same grid (k=3 s=1 bounded)."""
    from mink_octtree_stablediffusion_tpu.ops import brick as mb

    cap, b, res, cin, cout = 2048, 2, 24, 6, 5
    n = 1500
    coords = np.concatenate(
        [rng.randint(0, b, (n, 1)), rng.randint(0, res, (n, 3))],
        axis=1).astype(np.int32)
    cpad, valid = mt.ops.pad_to_capacity(coords, cap)
    feats = (rng.randn(cap, cin) * valid[:, None]).astype(np.float32)
    kernel = rng.randn(27, cin, cout).astype(np.float32) * 0.2

    st = jax.jit(lambda c, v, f: mt.sparse_tensor(
        c, f, capacity=cap, batch_size=b, valid=v, extent=(res,) * 3))(
        jnp.asarray(cpad), jnp.asarray(valid), jnp.asarray(feats))
    spec = mt.ops.KernelSpec(3, 1, 1, ndim=3)
    assert mb.brick_applicable(spec, st.grid)

    nbr = mt.ops.kernel_map(st.grid, st.grid, spec)
    ref = mt.ops.sparse_conv_apply(st.features, jnp.asarray(kernel), nbr)

    got = jax.jit(mb.brick_sparse_conv)(st.features, jnp.asarray(kernel),
                                        st.grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)
    # padding rows stay exactly zero
    assert float(jnp.abs(got * (~st.valid)[:, None]).sum()) == 0.0


def test_brick_roundtrip_and_gradients(rng):
    from mink_octtree_stablediffusion_tpu.ops import brick as mb

    cap, b, res, c = 512, 2, 16, 4
    coords = np.concatenate(
        [rng.randint(0, b, (300, 1)), rng.randint(0, res, (300, 3))],
        axis=1).astype(np.int32)
    cpad, valid = mt.ops.pad_to_capacity(coords, cap)
    feats = (rng.randn(cap, c) * valid[:, None]).astype(np.float32)
    st = jax.jit(lambda co, v, f: mt.sparse_tensor(
        co, f, capacity=cap, batch_size=b, valid=v, extent=(res,) * 3))(
        jnp.asarray(cpad), jnp.asarray(valid), jnp.asarray(feats))

    layout = mb.brick_layout(st.grid)
    back = mb.from_bricks(mb.to_bricks(st.features, layout), layout, st.valid)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(st.features))

    kernel = jnp.asarray(rng.randn(27, c, c).astype(np.float32) * 0.2)

    @jax.jit
    def loss(f, k):
        return jnp.sum(mb.brick_sparse_conv(f, k, st.grid) ** 2)

    # grads vs the gather path's grads
    spec = mt.ops.KernelSpec(3, 1, 1, ndim=3)
    nbr = mt.ops.kernel_map(st.grid, st.grid, spec)

    @jax.jit
    def loss_ref(f, k):
        return jnp.sum(mt.ops.sparse_conv_apply(f, k, nbr) ** 2)

    gf, gk = jax.grad(loss, argnums=(0, 1))(st.features, kernel)
    gf_r, gk_r = jax.grad(loss_ref, argnums=(0, 1))(st.features, kernel)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_r), rtol=2e-3,
                               atol=2e-3)
    v = np.asarray(st.valid).astype(bool)
    np.testing.assert_allclose(np.asarray(gf)[v], np.asarray(gf_r)[v],
                               rtol=2e-3, atol=2e-3)


def test_vol_conv_pallas_matches_lax_conv(rng):
    """Pallas dense-volume conv (interpret) == lax.conv SAME (fp32)."""
    from mink_octtree_stablediffusion_tpu.ops import vol_conv as vc

    B, R, C, CO = 2, 16, 5, 7
    vol = rng.randn(B, R, R, R, C).astype(np.float32)
    ker = (rng.randn(27, C, CO) * 0.2).astype(np.float32)
    out = vc.vol_conv(jnp.asarray(vol), jnp.asarray(ker),
                      compute_dtype=jnp.float32, interpret=True)
    rhs = ker.reshape(3, 3, 3, C, CO)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(vol), jnp.asarray(rhs), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)


def test_brick_pallas_conv_matches_gather_path_with_grads(rng):
    """Differentiable sparse wrapper of the Pallas volume conv == the
    gather-GEMM conv, forward and both gradients (interpret mode)."""
    from mink_octtree_stablediffusion_tpu.ops import vol_conv as vc

    cap, b, res, cin, cout = 1024, 2, 16, 6, 5
    coords = np.concatenate([rng.randint(0, b, (700, 1)),
                             rng.randint(0, res, (700, 3))],
                            1).astype(np.int32)
    cpad, valid = mt.ops.pad_to_capacity(coords, cap)
    feats = (rng.randn(cap, cin) * valid[:, None]).astype(np.float32)
    kernel = (rng.randn(27, cin, cout) * 0.2).astype(np.float32)
    st = jax.jit(lambda c, v, f: mt.sparse_tensor(
        c, f, capacity=cap, batch_size=b, valid=v, extent=(res,) * 3))(
        jnp.asarray(cpad), jnp.asarray(valid), jnp.asarray(feats))
    spec = mt.ops.KernelSpec(3, 1, 1, ndim=3)
    assert vc.brick_pallas_applicable(spec, st.grid)

    nbr = mt.ops.kernel_map(st.grid, st.grid, spec)
    ref = mt.ops.sparse_conv_apply(st.features, jnp.asarray(kernel), nbr)
    got = vc.brick_pallas_conv(st.features, jnp.asarray(kernel), st.grid,
                               compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)

    def loss(f, k):
        return jnp.sum(vc.brick_pallas_conv(
            f, k, st.grid, compute_dtype=jnp.float32, interpret=True) ** 2)

    def loss_ref(f, k):
        return jnp.sum(mt.ops.sparse_conv_apply(f, k, nbr) ** 2)

    gf, gk = jax.grad(loss, (0, 1))(st.features, jnp.asarray(kernel))
    gf_r, gk_r = jax.grad(loss_ref, (0, 1))(st.features, jnp.asarray(kernel))
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_r), rtol=2e-3,
                               atol=2e-3)
    v = np.asarray(st.valid).astype(bool)
    np.testing.assert_allclose(np.asarray(gf)[v], np.asarray(gf_r)[v],
                               rtol=2e-3, atol=2e-3)
