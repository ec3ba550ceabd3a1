"""On-chip validation of the fused conv paths (run on the TPU backend).

1. `backend_differential_suite` — per-op accelerator-vs-CPU checks.
2. Wide-layer (512->512, k=27) fused fwd + bwd vs the XLA gather path on
   the accelerator itself: exercises the separate key-window DMA, the
   cout-tiled forward and the (k-group, cout)-blocked dW accumulator at
   reference VAE layer widths.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import mink_octtree_stablediffusion_tpu as mt  # noqa: E402

print("backend:", jax.default_backend(), jax.devices()[0])

t0 = time.time()
rep = mt.utils.backend_differential_suite(n=1024, res=12)
print(f"differential suite ({time.time() - t0:.1f}s):")
for k, v in rep.items():
    if k != "_all_ok":
        print(f"  {k}: err={v['max_err']:.3g} tol={v['tol']:.3g} "
              f"{'OK' if v['ok'] else 'FAIL'}")
assert rep["_all_ok"], rep

# --- wide-layer fwd+bwd differential (fused vs XLA, both on-accelerator) ---
rng = np.random.RandomState(0)
n, cap, res = 2000, 2048, 32
cin, cout = 512, 512
coords = np.concatenate(
    [np.zeros((n, 1), np.int32), rng.randint(0, res, (n, 3))], 1)
cpad, valid = mt.ops.pad_to_capacity(coords.astype(np.int32), cap)
st = jax.jit(lambda c, v, f: mt.sparse_tensor(
    c, f, capacity=cap, valid=v, extent=(res,) * 3))(
    jnp.asarray(cpad), jnp.asarray(valid),
    jnp.asarray((rng.randn(cap, cin) * valid[:, None]).astype(np.float32)))
spec = mt.ops.KernelSpec(3, 1, ndim=3)
kern = jnp.asarray((rng.randn(27, cin, cout) * 0.05).astype(np.float32))
g_out = jnp.asarray(rng.randn(cap, cout).astype(np.float32))

nbr = jax.jit(lambda g: mt.ops.kernel_map(g, g, spec))(st.grid)


def loss_ref(f, k):
    return jnp.vdot(mt.ops.sparse_conv_apply(
        f, k, nbr, compute_dtype=jnp.bfloat16), g_out)


def loss_fused(f, k):
    return jnp.vdot(mt.ops.fused_sparse_conv(
        f, k, st.grid, st.grid, spec, compute_dtype=jnp.bfloat16), g_out)


t0 = time.time()
dref = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(st.features, kern)
dfus = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(st.features, kern)
dref = jax.tree.map(np.asarray, dref)
dfus = jax.tree.map(np.asarray, dfus)
print(f"wide-layer fwd+bwd compiled+ran in {time.time() - t0:.1f}s")
for name, a, b in (("dF", dref[0], dfus[0]), ("dW", dref[1], dfus[1])):
    scale = np.abs(a).max() + 1e-9
    rel = np.abs(a - b).max() / scale
    print(f"  {name}: max_rel_err={rel:.3e} (scale {scale:.3g})")
    assert rel < 2e-2, (name, rel)

# forward value check too
fref = np.asarray(jax.jit(lambda f, k: mt.ops.sparse_conv_apply(
    f, k, nbr, compute_dtype=jnp.bfloat16))(st.features, kern))
ffus = np.asarray(jax.jit(lambda f, k: mt.ops.fused_sparse_conv(
    f, k, st.grid, st.grid, spec, compute_dtype=jnp.bfloat16))(
    st.features, kern))
rel = np.abs(fref - ffus).max() / (np.abs(fref).max() + 1e-9)
print(f"  fwd: max_rel_err={rel:.3e}")
assert rel < 1e-2, rel
print("ALL OK")
