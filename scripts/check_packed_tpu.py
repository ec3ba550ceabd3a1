"""On-chip validation of the PACKED narrow-channel window layout.

Narrow widths (3->32 input conv, 32->32 / 32->64 finest-level, 48->32
non-multiple-of-8, 1->16 degenerate) through fused fwd + both grads vs the
XLA gather path, both running on the accelerator; also A/Bs packed vs the
inline layout for bit-agreement of the fused path with itself.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import mink_octtree_stablediffusion_tpu as mt  # noqa: E402
from mink_octtree_stablediffusion_tpu.ops import onehot_conv as oh  # noqa

print("backend:", jax.default_backend(), jax.devices()[0])
oh.use_packed_window(True)  # off by default (slower on-chip; see layout doc)

rng = np.random.RandomState(0)
spec = mt.ops.KernelSpec(3, 1, ndim=3)

for cin, cout, n, cap, res in ((3, 32, 3000, 4096, 64),
                               (32, 32, 3000, 4096, 64),
                               (32, 64, 3000, 4096, 64),
                               (48, 32, 1500, 2048, 32),
                               (1, 16, 1500, 2048, 32)):
    coords = np.concatenate(
        [np.zeros((n, 1), np.int32), rng.randint(0, res, (n, 3))], 1)
    cpad, valid = mt.ops.pad_to_capacity(coords.astype(np.int32), cap)
    st = jax.jit(lambda c, v, f: mt.sparse_tensor(
        c, f, capacity=cap, valid=v, extent=(res,) * 3))(
        jnp.asarray(cpad), jnp.asarray(valid),
        jnp.asarray((rng.randn(cap, cin) * valid[:, None]).astype(
            np.float32)))
    kern = jnp.asarray((rng.randn(27, cin, cout) * 0.1).astype(np.float32))
    g_out = jnp.asarray(rng.randn(cap, cout).astype(np.float32))
    nbr = jax.jit(lambda g: mt.ops.kernel_map(g, g, spec))(st.grid)

    def loss_ref(f, k):
        return jnp.vdot(mt.ops.sparse_conv_apply(
            f, k, nbr, compute_dtype=jnp.float32), g_out)

    def loss_fused(f, k):
        return jnp.vdot(mt.ops.fused_sparse_conv(
            f, k, st.grid, st.grid, spec, compute_dtype=jnp.float32), g_out)

    t0 = time.time()
    assert oh._packed_layout(cin) is not None
    fref = np.asarray(jax.jit(lambda f, k: mt.ops.sparse_conv_apply(
        f, k, nbr, compute_dtype=jnp.float32))(st.features, kern))
    ffus = np.asarray(jax.jit(lambda f, k: mt.ops.fused_sparse_conv(
        f, k, st.grid, st.grid, spec, compute_dtype=jnp.float32))(
        st.features, kern))
    dref = jax.tree.map(np.asarray, jax.jit(
        jax.grad(loss_ref, argnums=(0, 1)))(st.features, kern))
    dfus = jax.tree.map(np.asarray, jax.jit(
        jax.grad(loss_fused, argnums=(0, 1)))(st.features, kern))
    # packed vs inline fused layouts must agree bitwise-closely too
    oh.use_packed_window(False)
    finl = np.asarray(jax.jit(lambda f, k: mt.ops.fused_sparse_conv(
        f, k, st.grid, st.grid, spec, compute_dtype=jnp.float32))(
        st.features, kern))
    oh.use_packed_window(True)
    print(f"{cin}->{cout} ({time.time() - t0:.1f}s):")
    for name, a, b, tol in (
            ("fwd", fref, ffus, 2e-2), ("packed-vs-inline", finl, ffus, 0.0),
            ("dF", dref[0], dfus[0], 2e-2), ("dW", dref[1], dfus[1], 2e-2)):
        scale = np.abs(a).max() + 1e-9
        rel = np.abs(a - b).max() / scale
        print(f"  {name}: max_rel_err={rel:.3e} (scale {scale:.3g})")
        assert rel <= max(tol, 0.0) or (tol == 0.0 and rel < 1e-6), \
            (cin, cout, name, rel)
print("ALL OK")
