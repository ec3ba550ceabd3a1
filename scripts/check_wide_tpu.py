"""On-chip Mosaic validation of the band-split fused conv (wide layers).

The reference UNet's 960-channel level and 1280-wide skip-cat inputs exceed
the full-slab VMEM budget and run the band-split schedule
(`ops/onehot_conv.py::conv_schedule` == "split").  This checks fwd + dF + dW
of those widths against the XLA gather path on the TPU backend:

    python scripts/check_wide_tpu.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import mink_octtree_stablediffusion_tpu as mt  # noqa: E402
from mink_octtree_stablediffusion_tpu.ops import onehot_conv as oh  # noqa: E402

print("backend:", jax.default_backend(), jax.devices()[0])
oh.use_band_split(True)  # the schedule under test is opt-in
rng = np.random.RandomState(0)


def sphere_tensor(ext, cap, cin, n, bsz):
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


def check(cin, cout, tag, ext=8, cap=256, n=80, bsz=4):
    sched = oh.conv_schedule(cin, cout, 27, 9, 128, 256, jnp.bfloat16)
    st = sphere_tensor(ext, cap, cin, n, bsz)
    spec = mt.ops.KernelSpec(3, 1, ndim=3)
    kern = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.02)
    gout = jnp.asarray(rng.randn(cap, cout).astype(np.float32))
    nbr = jax.jit(lambda g: mt.ops.kernel_map(g, g, spec))(st.grid)

    def loss_ref(f, k):
        return jnp.vdot(mt.ops.sparse_conv_apply(
            f, k, nbr, compute_dtype=jnp.bfloat16), gout)

    def loss_fused(f, k):
        return jnp.vdot(mt.ops.fused_sparse_conv(
            f, k, st.grid, st.grid, spec, compute_dtype=jnp.bfloat16), gout)

    t0 = time.time()
    fref = np.asarray(jax.jit(lambda f, k: mt.ops.sparse_conv_apply(
        f, k, nbr, compute_dtype=jnp.bfloat16))(st.features, kern))
    dref = jax.tree.map(np.asarray, jax.jit(jax.grad(
        loss_ref, argnums=(0, 1)))(st.features, kern))
    ffus = np.asarray(jax.jit(lambda f, k: mt.ops.fused_sparse_conv(
        f, k, st.grid, st.grid, spec, compute_dtype=jnp.bfloat16))(
        st.features, kern))
    dfus = jax.tree.map(np.asarray, jax.jit(jax.grad(
        loss_fused, argnums=(0, 1)))(st.features, kern))
    errs = {}
    for name, a, b in (("fwd", fref, ffus), ("dF", dref[0], dfus[0]),
                       ("dW", dref[1], dfus[1])):
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        errs[name] = rel
        assert rel < 2e-2, (tag, name, rel)
    print(f"  {tag} sched={sched} ({time.time() - t0:.1f}s): " +
          " ".join(f"{k}={v:.2e}" for k, v in errs.items()), flush=True)


check(960, 960, "960->960 (UNet level 3 / mid)")
check(1280, 640, "1280->640 (skip-cat input)")
check(960, 320, "960->320 (up transition)")
oh.use_band_split(False)
# default-routed split widths (full slab fits but VMEM-shrinks the tile)
check(640, 640, "640->640 (UNet level 2, default split)")
check(512, 512, "512->512 (VAE wide level, default split)")
print("ALL OK")
