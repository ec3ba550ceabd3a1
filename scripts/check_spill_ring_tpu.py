"""On-chip Mosaic validation of the ring-buffered spill-chunk schedule.

The spill ring (`ops/onehot_conv.py::use_spill_ring`) prefetches spill
chunk c+1 into a third window slot while chunk c computes; the slot index
is traced (c % 2 picks the slot), which interpret mode cannot validate —
Mosaic's real DMA semantics must agree.  This forces spills on-chip
(fully-occupied grid, tw=128 ≪ band span) and checks fwd + dF + dW of the
ring schedule against the XLA gather path, at both a narrow (4ch) and a
wide (256ch, separate key window) layer.  Run on the TPU backend:

    python scripts/check_spill_ring_tpu.py
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
rng = np.random.RandomState(0)


def dense_tensor(ext, cap, cin):
    g = np.stack(np.meshgrid(*([np.arange(ext)] * 3), indexing="ij"),
                 -1).reshape(-1, 3)
    coords = np.concatenate([np.zeros((len(g), 1), np.int64), g],
                            1).astype(np.int32)
    cpad, valid = mt.ops.pad_to_capacity(coords, cap)
    feats = (rng.randn(cap, cin) * valid[:, None]).astype(np.float32)
    return jax.jit(lambda c, f, v: mt.sparse_tensor(
        c, f, capacity=cap, valid=v, batch_size=1, extent=(ext,) * 3))(
        jnp.asarray(cpad), jnp.asarray(feats), jnp.asarray(valid))


def check(ext, cap, cin, cout, tag):
    st = dense_tensor(ext, cap, cin)
    spec = mt.ops.KernelSpec(3, 1, ndim=3)
    kern = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.05)
    gout = jnp.asarray(rng.randn(cap, cout).astype(np.float32))
    nbr = jax.jit(lambda g: mt.ops.kernel_map(g, g, spec))(st.grid)

    def loss_ref(f, k):
        return jnp.vdot(mt.ops.sparse_conv_apply(
            f, k, nbr, compute_dtype=jnp.bfloat16), gout)

    def loss_fused(f, k):
        return jnp.vdot(mt.ops.fused_sparse_conv(
            f, k, st.grid, st.grid, spec, tile=128, tw=128,
            compute_dtype=jnp.bfloat16), gout)

    fref = np.asarray(jax.jit(lambda f, k: mt.ops.sparse_conv_apply(
        f, k, nbr, compute_dtype=jnp.bfloat16))(st.features, kern))
    dref = jax.tree.map(np.asarray, jax.jit(jax.grad(
        loss_ref, argnums=(0, 1)))(st.features, kern))
    for ring in (False, True):
        oh.use_spill_ring(ring)
        t0 = time.time()
        ffus = np.asarray(jax.jit(lambda f, k: mt.ops.fused_sparse_conv(
            f, k, st.grid, st.grid, spec, tile=128, tw=128,
            compute_dtype=jnp.bfloat16))(st.features, kern))
        dfus = jax.tree.map(np.asarray, jax.jit(jax.grad(
            loss_fused, argnums=(0, 1)))(st.features, kern))
        errs = {}
        for name, a, b in (("fwd", fref, ffus), ("dF", dref[0], dfus[0]),
                           ("dW", dref[1], dfus[1])):
            rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
            errs[name] = rel
            assert rel < 2e-2, (tag, ring, name, rel)
        print(f"  {tag} ring={int(ring)} ({time.time() - t0:.1f}s): " +
              " ".join(f"{k}={v:.2e}" for k, v in errs.items()), flush=True)


# narrow: inline key lane; wide: separate key window — both spill at tw=128
check(12, 2048, 4, 8, "narrow 4->8 ext12")
check(12, 2048, 256, 256, "wide 256->256 ext12")
oh.use_spill_ring(False)
print("ALL OK")
