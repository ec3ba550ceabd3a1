"""Isolate fused-kernel cost components on TPU via chain-slope timing.

Variants (same grid, specs, scalar prefetch as the real fused kernel):
  empty    — body writes zeros (per-grid-step overhead)
  dma      — + window DMA wait + prefetch next
  compare  — + key compares (one-hot build), result folded cheaply
  matmul   — + gather matmuls into gcat
  full     — + final GEMM (the real kernel)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
import mink_octtree_stablediffusion_tpu as mt  # noqa: E402
from mink_octtree_stablediffusion_tpu.ops import onehot_conv as oc  # noqa

N_POINTS = 26098
CAPACITY = 32768
CIN, COUT, K = 3, 32, 27
EXTENT = (160, 160, 60)
TILE = int(sys.argv[1]) if len(sys.argv) > 1 else 128
TW = int(sys.argv[2]) if len(sys.argv) > 2 else 256
GROUP = 9


def scannet_like_cloud(rng, n):
    n_floor, n_wall, n_clutter = n // 3, n // 3, n - 2 * (n // 3)
    floor = np.stack([rng.randint(0, 160, n_floor),
                      rng.randint(0, 160, n_floor),
                      rng.randint(0, 3, n_floor)], 1)
    wall = np.stack([rng.randint(0, 3, n_wall),
                     rng.randint(0, 160, n_wall),
                     rng.randint(0, 60, n_wall)], 1)
    blob = rng.randn(n_clutter, 3) * 12 + np.array([80, 80, 20])
    clutter = np.clip(blob, 0, [159, 159, 59]).astype(np.int64)
    return np.concatenate([floor, wall, clutter]).astype(np.int32)


rng = np.random.RandomState(0)
cloud = scannet_like_cloud(rng, N_POINTS)
coords = np.concatenate([np.zeros((N_POINTS, 1), np.int32), cloud], 1)
cpad, valid = mt.ops.pad_to_capacity(coords, CAPACITY)
spec = mt.ops.KernelSpec(3, 1, 1, ndim=3)
cpj, vj = jnp.asarray(cpad), jnp.asarray(valid)
kj = jnp.asarray((rng.randn(K, CIN, COUT) * 0.1).astype(np.float32))


def variant_conv(mode):
    """Build a conv-like fn(features, kernel, grid) for the given variant."""
    def fn(features, kernel, grid):
        cinp = 128
        key_lane = cinp - 1
        cd = jnp.bfloat16
        n = features.shape[0]
        n_out = grid.capacity
        nt = n_out // TILE
        k_pad = K
        n_groups = K // GROUP

        from mink_octtree_stablediffusion_tpu.ops.coords import (
            flat_cell_key)
        import numpy as _np
        d = grid.ndim
        s_in = _np.asarray(grid.stride, _np.int64)
        cells = _np.asarray([int(_np.ceil(e / s)) for e, s in
                             zip(grid.extent, s_in)], _np.int64)
        flat_strides = _np.concatenate(
            [_np.cumprod(cells[::-1])[::-1][1:], [1]]).astype(_np.int64)
        offs = spec.absolute_offsets(grid.stride)
        offs_cells = (offs // s_in[None, :]).astype(_np.int64)
        c_k = (offs_cells @ flat_strides).astype(_np.int32)

        pos = jnp.floor_divide(grid.coords[:, 1:],
                               jnp.asarray(s_in, jnp.int32))
        base_key = (grid.coords[:, 0] * _np.int32(int(_np.prod(cells))) +
                    pos @ jnp.asarray(flat_strides, jnp.int32))
        qpos = pos[:, None, :] + jnp.asarray(offs_cells, jnp.int32)[None]
        ok = jnp.all((qpos >= 0) & (qpos < jnp.asarray(cells, jnp.int32)),
                     axis=-1) & grid.valid[:, None]
        qk = jnp.where(ok, base_key[:, None] + jnp.asarray(c_k)[None, :],
                       _np.int32(-1))
        qk_tiles = qk.reshape(nt, TILE, K).transpose(0, 2, 1).reshape(
            nt, 1, K * TILE)

        in_keys = flat_cell_key(grid.coords, grid.valid, grid.stride,
                                grid.extent)
        qvalid = qk_tiles >= 0
        qmin = jnp.min(jnp.where(qvalid, qk_tiles, _np.int32(2 ** 30)),
                       axis=(1, 2))
        qmax = jnp.max(jnp.where(qvalid, qk_tiles, _np.int32(-1)),
                       axis=(1, 2))
        any_valid = jnp.any(qvalid, axis=(1, 2))
        lo = jnp.searchsorted(in_keys, qmin).astype(jnp.int32)
        hi = jnp.searchsorted(in_keys, qmax, side="right").astype(jnp.int32)
        lo = jnp.where(any_valid, (lo // 8) * 8, 0)
        nch = jnp.where(any_valid,
                        (jnp.maximum(hi - lo, 1) - 1) // TW + 1, 0)

        key_f32 = jax.lax.bitcast_convert_type(
            jnp.minimum(in_keys, _np.int32(2 ** 30)), jnp.float32)
        f_aug = jnp.zeros((n + TW, cinp), jnp.float32)
        f_aug = f_aug.at[:n, :CIN].set(features)
        f_aug = f_aug.at[:n, key_lane].set(key_f32)
        w_stack = jnp.pad(kernel.astype(cd),
                          ((0, 0), (0, cinp - CIN), (0, 0))).reshape(
                              K * cinp, COUT)

        def kern(lo_ref, nch_ref, qk_ref, f_ref, w_ref, out_ref, fwin2,
                 gcat, sem2):
            t = pl.program_id(0)
            n_prog = pl.num_programs(0)
            slot = jax.lax.rem(t, 2)

            def mk_dma(tt, s):
                base = pl.multiple_of(lo_ref[tt], 8)
                return pltpu.make_async_copy(
                    f_ref.at[pl.ds(base, TW), :], fwin2.at[s], sem2.at[s])

            if mode == "empty":
                out_ref[:] = jnp.zeros_like(out_ref)
                return

            @pl.when(t == 0)
            def _():
                mk_dma(0, 0).start()

            mk_dma(t, slot).wait()

            @pl.when(t + 1 < n_prog)
            def _():
                mk_dma(t + 1, 1 - slot).start()

            if mode == "dma":
                out_ref[:] = fwin2[slot, :TILE, :COUT].astype(out_ref.dtype)
                return

            fw_f32 = fwin2[slot]
            keys_w = jax.lax.bitcast_convert_type(
                fw_f32[:, key_lane:key_lane + 1], jnp.int32)
            fw = fw_f32.astype(cd)
            acc = jnp.zeros((TILE, COUT), jnp.float32)
            for g in range(n_groups):
                sl_q = slice(g * GROUP * TILE, (g + 1) * GROUP * TILE)
                qg = qk_ref[0, 0:1, sl_q]
                oht = (keys_w == qg).astype(cd)
                if mode == "compare":
                    # fold cheaply: one [TW, g*T] x [TW, CinP] matmul worth
                    # skipped; reduce over lanes via slices
                    acc = acc + jax.lax.dot_general(
                        oht[:, :TILE].T[:, :1] * 0, fw[:1, :COUT],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    continue
                gg = jax.lax.dot_general(
                    oht, fw, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for j in range(GROUP):
                    sl_c = slice((g * GROUP + j) * cinp,
                                 (g * GROUP + j + 1) * cinp)
                    gcat[:, sl_c] = gg[j * TILE:(j + 1) * TILE].astype(cd)
            if mode == "compare":
                out_ref[:] = acc.astype(out_ref.dtype)
                return
            if mode == "matmul":
                out_ref[:] = gcat[:, :COUT].astype(out_ref.dtype)
                return
            out_ref[:] = jax.lax.dot_general(
                gcat[...], w_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((1, 1, K * TILE),
                             lambda t, lo, nch: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((K * cinp, COUT), lambda t, lo, nch: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, COUT),
                                   lambda t, lo, nch: (t, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, TW, cinp), jnp.float32),
                pltpu.VMEM((TILE, K * cinp), cd),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_out, COUT), features.dtype),
        )(lo, nch, qk_tiles, f_aug, w_stack)
    return fn


def timed(mode, steps, trials=3):
    conv = variant_conv(mode)

    @jax.jit
    def run(cpad, feats, kernel):
        def body(carry, f_i):
            grid, inverse, _ = mt.ops.make_grid(carry, vj, CAPACITY,
                                                batch_size=1, extent=EXTENT)
            f = mt.ops.reduce_by_inverse(f_i, inverse, vj, CAPACITY, "sum")
            s = jnp.sum(conv(f, kernel, grid))
            return carry + (s * 1e-30).astype(jnp.int32), s
        _, sums = jax.lax.scan(body, cpad, feats)
        return jnp.sum(sums)

    def mk(steps):
        return jnp.asarray((rng.randn(steps, CAPACITY, CIN) *
                            valid[None, :, None]).astype(np.float32))
    fs = mk(steps)
    float(jnp.sum(fs))
    float(run(cpj, fs, kj))
    best = float("inf")
    for _ in range(trials):
        fs2 = mk(steps)
        float(jnp.sum(fs2))
        t0 = time.perf_counter()
        float(run(cpj, fs2, kj))
        best = min(best, time.perf_counter() - t0)
    return best


modes = (sys.argv[3].split(",") if len(sys.argv) > 3 else
         ["empty", "dma", "compare", "matmul", "full"])
for mode in modes:
    t0, t1 = timed(mode, 4), timed(mode, 24)
    print(f"{mode:8s} {(t1 - t0) / 20 * 1e3:8.3f} ms/step")
