"""A/B: 8³-brick block-sparse conv vs the fused one-hot conv at the finest
octree level (the standing bottleneck, DESIGN §7: ~26 ms of the VAE step).

Chain-slope on-chip timing, same workload as bench_parts_finest.py
(4-sphere batch, cap 131072, 32→32, k=27).  Variants:
  onehot_fwd / brick_fwd      — single conv forward
  onehot_fb  / brick_fb       — forward + backward (dF+dW via vjp)
  onehot_stack / brick_stack  — 6 convs on the same grid (the ResNetStack
                                shape); brick scatters once, convs in brick
                                layout, gathers once (the resident win)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import mink_octtree_stablediffusion_tpu as mt  # noqa: E402
from mink_octtree_stablediffusion_tpu.ops import brick as mb  # noqa: E402
from mink_octtree_stablediffusion_tpu.ops import vol_conv as vc  # noqa: E402

N, CAP, CIN, COUT, B, RES = 90000, 131072, 32, 32, 4, 64
TILE, TW = 128, 256
K = 27
spec = mt.ops.KernelSpec(3, 1, ndim=3)
CD = jnp.bfloat16


def mk(seed):
    r = np.random.RandomState(seed)
    npb = N // B
    vox = []
    for bi in range(B):
        p = r.randn(npb, 3)
        p /= np.linalg.norm(p, axis=1, keepdims=True) + 1e-9
        vox.append(((p * (RES / 2 - 1.5)) + RES / 2).astype(np.int32))
    coords = mt.ops.batched_coordinates_np(vox)
    return mt.ops.pad_to_capacity(coords, CAP)


def main():
    rng = np.random.RandomState(0)
    steps_data = [mk(s) for s in range(6)]
    cs = jnp.asarray(np.stack([c for c, _ in steps_data]))
    vs = jnp.asarray(np.stack([v for _, v in steps_data]))
    feats0 = jnp.asarray(rng.randn(CAP, CIN).astype(np.float32))
    kern0 = jnp.asarray((rng.randn(K, CIN, COUT) * 0.1).astype(np.float32))
    kerns = jnp.asarray((rng.randn(6, K, CIN, COUT) * 0.1).astype(np.float32))
    gout = jnp.asarray(rng.randn(CAP, COUT).astype(np.float32))

    def onehot(f, k, grid):
        return mt.ops.fused_sparse_conv(f, k, grid, grid, spec, tile=TILE,
                                        tw=TW, compute_dtype=CD)

    def brick(f, k, grid):
        layout = mb.brick_layout(grid)
        bricks = mb.to_bricks(f.astype(CD), layout)
        out = mb.brick_conv_xla(bricks, k.astype(CD), layout)
        return mb.from_bricks(out, layout, grid.valid).astype(jnp.float32)

    def stack_onehot(f, ks, grid):
        for i in range(6):
            f = onehot(f, ks[i], grid)
        return f

    def stack_brick(f, ks, grid):
        layout = mb.brick_layout(grid)
        h = mb.to_bricks(f.astype(CD), layout)
        for i in range(6):
            h = mb.brick_conv_xla(h, ks[i].astype(CD), layout).astype(CD)
        return mb.from_bricks(h, layout, grid.valid).astype(jnp.float32)

    def pallas(f, k, grid):
        return vc.brick_pallas_conv(f, k, grid, compute_dtype=CD)

    variants = {}
    for name, fn in (("onehot", onehot), ("brick", brick), ("pallas", pallas)):
        def fwd(f, k, grid, fn=fn):
            return jnp.vdot(fn(f, k, grid), gout) * 1e-9

        def fb(f, k, grid, fn=fn):
            def loss(f, k):
                return jnp.vdot(fn(f, k, grid), gout)
            l, (gf, gk) = jax.value_and_grad(loss, argnums=(0, 1))(f, k)
            return (l * 1e-9 + jnp.sum(gf) * 1e-12 +
                    jnp.sum(gk) * 1e-12).astype(jnp.float32)

        variants[f"{name}_fwd"] = ("single", fwd)
        variants[f"{name}_fb"] = ("single", fb)
    def stack_pallas(f, ks, grid):
        for i in range(6):
            f = pallas(f, ks[i], grid)
        return f

    for name, fn in (("onehot", stack_onehot), ("brick", stack_brick),
                     ("pallas", stack_pallas)):
        def sfwd(f, ks, grid, fn=fn):
            return jnp.vdot(fn(f, ks, grid), gout) * 1e-9
        variants[f"{name}_stack"] = ("stack", sfwd)

    for mode in (sys.argv[1:] or list(variants)):
        kind, vfn = variants[mode]

        def run(c, v):
            st = mt.sparse_tensor(c, feats0, capacity=CAP, valid=v,
                                  batch_size=B, extent=(RES,) * 3)
            k = kern0 if kind == "single" else kerns
            return vfn(st.features, k, st.grid).astype(jnp.float32)

        def chain(steps):
            @jax.jit
            def f(cs, vs):
                def body(acc, xs):
                    c, v = xs
                    c = c + (acc.astype(jnp.int32) & 0)
                    return acc + run(c, v), None
                a, _ = jax.lax.scan(body, jnp.float32(0.),
                                    (cs[:steps], vs[:steps]))
                return a

            float(f(cs, vs))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(cs, vs))
                best = min(best, time.perf_counter() - t0)
            return best

        ms = (chain(6) - chain(2)) / 4 * 1000
        print(f"{mode}: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
