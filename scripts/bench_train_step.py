"""Chain-slope training-step benchmark: fused conv forward+backward
(value+grad of a sum-of-squares loss) on the headline ScanNet-room workload,
including per-step geometry.  Reference backward-only k3: 0.0056 s Titan X
(docs/benchmark.md:41).  Measured: 9.7 ms/step fwd+bwd (2.69M pts/s) on v5e
with the fused one-hot backward (dF transpose-direction pass + dW one-hot
accumulation kernel).
"""
import numpy as np, jax, jax.numpy as jnp, sys, time
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
sys.path.insert(0, ".")
import mink_octtree_stablediffusion_tpu as mt

N_POINTS, CAPACITY, CIN, COUT, K = 26098, 32768, 3, 32, 3
EXTENT = (160, 160, 60)
rng = np.random.RandomState(0)
n3 = N_POINTS // 3
floor = np.stack([rng.randint(0,160,n3), rng.randint(0,160,n3), rng.randint(0,3,n3)],1)
wall = np.stack([rng.randint(0,3,n3), rng.randint(0,160,n3), rng.randint(0,60,n3)],1)
blob = np.clip(rng.randn(N_POINTS-2*n3,3)*12 + np.array([80,80,20]), 0, [159,159,59]).astype(np.int64)
cloud = np.concatenate([floor, wall, blob]).astype(np.int32)
coords = np.concatenate([np.zeros((N_POINTS,1),np.int32), cloud],1)
cpad, valid = mt.ops.pad_to_capacity(coords, CAPACITY)
kernel = (rng.randn(K**3, CIN, COUT)*0.1).astype(np.float32)
spec = mt.ops.KernelSpec(K, 1, 1, ndim=3)
cpj, vj, kj = map(jnp.asarray, (cpad, valid, kernel))

def chain(steps):
    @jax.jit
    def run(cpad, valid, feats, kernel):
        grid, inverse, _ = mt.ops.make_grid(cpad, valid, CAPACITY, batch_size=1, extent=EXTENT)
        def body(carry, f_i):
            k_c, s_acc = carry
            def loss(f, k):
                out = mt.ops.fused_sparse_conv(f, k, grid, grid, spec)
                return jnp.sum(out * out)
            g_f, g_k = jax.grad(loss, argnums=(0, 1))(f_i, k_c)
            s = jnp.sum(g_f) + jnp.sum(g_k)
            return (k_c + g_k * 1e-30, s_acc + s), None
        f = mt.ops.reduce_by_inverse(feats[0], inverse, valid, CAPACITY, "sum")
        (k_f, s), _ = jax.lax.scan(body, (kernel, 0.0), feats)
        return s
    return run

def timed(steps):
    run = chain(steps)
    fs = jnp.asarray((rng.randn(steps, CAPACITY, CIN) * valid[None,:,None]).astype(np.float32))
    float(run(cpj, vj, fs, kj))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(run(cpj, vj, fs, kj)); best = min(best, time.perf_counter() - t0)
    return best

t0, t1 = timed(4), timed(24)
per = (t1 - t0) / 20
pps = N_POINTS / per
print(f"fwd+bwd per step: {per*1e3:.2f} ms  ({pps/1e6:.2f}M pts/s)  reference bwd-only k3: 0.0056s Titan X", flush=True)
