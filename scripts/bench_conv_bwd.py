"""Chain-slope micro-bench of fused conv fwd / dF / dW per layer shape.

Isolates which backward component dominates on the VAE decoder's layer
shapes (dF = flipped-direction fused pass; dW = blocked one-hot
accumulation kernel).  Usage:
  python scripts/bench_conv_bwd.py [n cap cin cout]...
Defaults to the decoder's hot shapes.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import mink_octtree_stablediffusion_tpu as mt  # noqa: E402

import os  # noqa: E402
if os.environ.get("PACKED"):  # A/B the packed narrow-channel layout
    from mink_octtree_stablediffusion_tpu.ops import onehot_conv as _oh
    _oh.use_packed_window(os.environ["PACKED"] != "0")

SHAPES = [(1500, 2048, 512, 512, 4), (6000, 8192, 512, 512, 4),
          (24000, 32768, 128, 128, 4), (90000, 131072, 32, 32, 4)]
RES = 64
MODES = ("geom", "fwd", "dF", "dW", "both", "densefwd", "denseboth")
# extra (env MODES only): xfwd/xboth — the unfused XLA kernel_map+gather path


def bench(n, cap, cin, cout, b=4):
    import os
    res = int(os.environ.get("EXT", str(RES)))
    grid_kind = os.environ.get("GRID", "sphere")  # sphere | dense
    rng = np.random.RandomState(0)
    spec = mt.ops.KernelSpec(3, 1, ndim=3)
    kern = jnp.asarray((rng.randn(27, cin, cout) * 0.05).astype(np.float32))
    npb = n // b

    def mk(seed):
        r = np.random.RandomState(seed)
        vox = []
        for bi in range(b):
            if grid_kind == "dense":
                # random cell subset — matches the UNet's latent-level
                # occupancy (coarse strided grids are dense-ish)
                flat = r.choice(res ** 3, size=min(npb, res ** 3),
                                replace=False)
                vox.append(np.stack([flat // (res * res),
                                     (flat // res) % res,
                                     flat % res], 1).astype(np.int32))
            else:
                p = r.randn(npb, 3)
                p /= np.linalg.norm(p, axis=1, keepdims=True) + 1e-9
                vox.append(((p * (res / 2 - 1.5)) + res / 2).astype(np.int32))
        coords = mt.ops.batched_coordinates_np(vox)
        cpad, valid = mt.ops.pad_to_capacity(coords, cap)
        return cpad, valid

    steps_data = [mk(s) for s in range(6)]
    cs = jnp.asarray(np.stack([c for c, _ in steps_data]))
    vs = jnp.asarray(np.stack([v for _, v in steps_data]))
    feats0 = jnp.asarray(rng.randn(cap, cin).astype(np.float32))
    gout = jnp.asarray(rng.randn(cap, cout).astype(np.float32))

    def run(coords, valid, feats, mode):
        st = mt.sparse_tensor(coords, feats, capacity=cap, valid=valid,
                              batch_size=b, extent=(res,) * 3)

        import os
        tile = int(os.environ.get("TILE", "128"))
        tw = int(os.environ.get("TW", "256"))
        group = int(os.environ.get("GROUP", "0")) or None

        def loss(f, k):
            return jnp.vdot(mt.ops.fused_sparse_conv(
                f, k, st.grid, st.grid, spec, tile=tile, tw=tw, group=group,
                compute_dtype=jnp.bfloat16), gout)

        def loss_dense(f, k):
            return jnp.vdot(mt.ops.dense_conv_apply(
                f, k, st.grid, spec, compute_dtype=jnp.bfloat16), gout)

        def loss_xla(f, k):
            nbr = mt.ops.kernel_map(st.grid, st.grid, spec)
            return jnp.vdot(mt.ops.sparse_conv_apply(
                f, k, nbr, compute_dtype=jnp.bfloat16), gout)

        if mode == "geom":
            return jnp.sum(st.grid.coords).astype(jnp.float32) * 1e-9
        if mode == "fwd":
            return loss(st.features, kern)
        if mode == "dF":
            return jnp.sum(jax.grad(loss, 0)(st.features, kern))
        if mode == "dW":
            return jnp.sum(jax.grad(loss, 1)(st.features, kern))
        if mode == "xfwd":
            return loss_xla(st.features, kern)
        if mode == "xboth":
            g = jax.grad(loss_xla, (0, 1))(st.features, kern)
            return jnp.sum(g[0]) + jnp.sum(g[1])
        if mode == "densefwd":
            return loss_dense(st.features, kern)
        if mode == "denseboth":
            g = jax.grad(loss_dense, (0, 1))(st.features, kern)
            return jnp.sum(g[0]) + jnp.sum(g[1])
        g = jax.grad(loss, (0, 1))(st.features, kern)
        return jnp.sum(g[0]) + jnp.sum(g[1])

    import os
    modes = MODES[:5] if os.environ.get("SKIP_DENSE") else MODES
    if os.environ.get("MODES"):  # e.g. MODES=fwd,both — cut compile count
        modes = tuple(os.environ["MODES"].split(","))
    out = {}
    for mode in modes:
        def chain(steps):
            @jax.jit
            def f(cs, vs, feats):
                def body(acc, xs):
                    c, v = xs
                    c = c + (acc.astype(jnp.int32) & 0)
                    return acc + run(c, v, feats, mode).astype(
                        jnp.float32) * 1e-9, None
                a, _ = jax.lax.scan(body, jnp.float32(0.), (cs[:steps],
                                                            vs[:steps]))
                return a
            float(f(cs, vs, feats0))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(cs, vs, feats0))
                best = min(best, time.perf_counter() - t0)
            return best
        out[mode] = (chain(6) - chain(2)) / 4 * 1000
    return out


if __name__ == "__main__":
    shapes = SHAPES
    if len(sys.argv) > 1:
        a = list(map(int, sys.argv[1:]))
        shapes = [tuple(a[i:i + 5]) for i in range(0, len(a), 5)]
    for n, cap, cin, cout, b in shapes:
        r = bench(n, cap, cin, cout, b)
        print(f"n={n} cap={cap} {cin}->{cout} b={b}: "
              + "  ".join(f"{m}={v:.2f}ms" for m, v in r.items()),
              flush=True)
