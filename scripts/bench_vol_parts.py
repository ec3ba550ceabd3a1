"""Attribution of brick_pallas_conv's cost at the finest-level workload:
  scatter  — rows → padded 128-lane volume only
  kernel   — vol_conv_tiles on a PRE-BUILT volume only (the Pallas kernel)
  dwkernel — vol_conv_dw on pre-built inputs only
  gather   — brick-order rows gather only
  full     — the whole wrapper (matches bench_brick pallas_fwd)
Chain-slope protocol as bench_brick.py."""

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

N, CAP, C, CO, B, RES = 90000, 131072, 32, 32, 4, 64
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
    feats0 = jnp.asarray(rng.randn(CAP, C).astype(np.float32))
    kern0 = jnp.asarray((rng.randn(27, C, CO) * 0.1).astype(np.float32))
    kp = vc.pad_kernel(kern0).astype(CD)
    gout = jnp.asarray(rng.randn(CAP, CO).astype(np.float32))
    # static pre-built volume + tiles for the kernel-only modes
    volp0 = jnp.asarray(rng.randn(B, RES + 2, RES + 2, RES + 8, 128)
                        .astype(np.float32)).astype(CD)
    gt0 = jnp.asarray(rng.randn(B * (RES // 8) ** 3, 512, CO)
                      .astype(np.float32))

    def scatter(st):
        cells = [RES] * 3
        pdims = (cells[0] + 2, cells[1] + 2, cells[2] + 8)
        total = B * int(np.prod(pdims))
        pos = st.grid.coords[:, 1:]
        flat = st.grid.coords[:, 0]
        for i, (cl, pd) in enumerate(zip(cells, pdims)):
            flat = flat * pd + jnp.clip(pos[:, i], 0, cl - 1) + 1
        dest = jnp.where(st.valid, flat, total)
        fpad = jnp.pad(st.features.astype(CD), ((0, 0), (0, 96)))
        dense = jnp.zeros((total + 1, 128), CD)
        dense = dense.at[dest].set(fpad * st.valid[:, None].astype(CD))
        return dense[:total].reshape((B,) + pdims + (128,))

    def gather(st, gt):
        layout = mb.brick_layout(st.grid)
        return mb.from_bricks(gt, layout, st.valid)

    modes = {
        "scatter": lambda st, vp, gt: jnp.sum(
            scatter(st).astype(jnp.float32)) * 1e-9,
        "kernel": lambda st, vp, gt: (jnp.vdot(
            vc.vol_conv_tiles(
                vp + st.features[0, 0].astype(CD) * 0, kp).reshape(-1, CO),
            gt.reshape(-1, CO)) * 1e-9),
        "dwkernel": lambda st, vp, gt: jnp.sum(vc.vol_conv_dw(
            vp + st.features[0, 0].astype(CD) * 0, gt)) * 1e-9,
        "gather": lambda st, vp, gt: jnp.vdot(gather(st, gt), gout) * 1e-9,
        "full": lambda st, vp, gt: jnp.vdot(
            vc.brick_pallas_conv(st.features, kern0, st.grid,
                                 compute_dtype=CD), gout) * 1e-9,
    }

    for mode in (sys.argv[1:] or list(modes)):
        fn = modes[mode]

        def run(c, v, volp0, gt0):
            st = mt.sparse_tensor(c, feats0, capacity=CAP, valid=v,
                                  batch_size=B, extent=(RES,) * 3)
            return fn(st, volp0, gt0).astype(jnp.float32)

        def chain(steps):
            # big static tensors travel as ARGUMENTS: closure constants get
            # serialized into the remote-compile request (HTTP 413)
            @jax.jit
            def f(cs, vs, volp0, gt0):
                def body(acc, xs):
                    c, v = xs
                    c = c + (acc.astype(jnp.int32) & 0)
                    return acc + run(c, v, volp0, gt0), None
                a, _ = jax.lax.scan(body, jnp.float32(0.),
                                    (cs[:steps], vs[:steps]))
                return a

            float(f(cs, vs, volp0, gt0))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(cs, vs, volp0, gt0))
                best = min(best, time.perf_counter() - t0)
            return best

        ms = (chain(6) - chain(2)) / 4 * 1000
        print(f"{mode}: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
