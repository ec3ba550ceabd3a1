"""Cost attribution of the per-group fused conv at the finest octree level.

Variants (cumulative, chain-slope on-chip timing; 4-sphere batch,
cap 131072, 32->32, k=27, group=9):
  geom     — sparse_tensor build only
  prep     — + XLA-side query keys / window bounds / f_aug / w_stack
  empty    — + pallas_call whose body only zeroes the output block
  dma      — + per-group window DMAs (double-buffered, spill loop)
  compare  — + one-hot key compares (result folded cheaply)
  matmul   — + gather matmuls into gcat
  full     — + final GEMM (the real kernel, via fused_sparse_conv)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import mink_octtree_stablediffusion_tpu as mt  # noqa: E402
from mink_octtree_stablediffusion_tpu.ops import onehot_conv as oc  # noqa
from mink_octtree_stablediffusion_tpu.ops.coords import flat_cell_key  # noqa

N, CAP, CIN, COUT, B, RES = 90000, 131072, 32, 32, 4, 64
TILE, TW, GROUP = 128, 256, 9
K = 27
spec = mt.ops.KernelSpec(3, 1, ndim=3)
MODES = ("geom", "prep", "empty", "dma", "compare", "matmul", "full")


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


def prep(features, kernel, grid):
    """Replicates _fused_impl's XLA-side prep for this shape."""
    cd = jnp.bfloat16
    sep, cinp = oc._key_layout(CIN)
    nt = CAP // TILE
    s_in = np.asarray(grid.stride, np.int64)
    cells = np.asarray([int(np.ceil(e / s)) for e, s in
                        zip(grid.extent, s_in)], np.int64)
    flat_strides = np.concatenate(
        [np.cumprod(cells[::-1])[::-1][1:], [1]]).astype(np.int64)
    offs_abs = spec.absolute_offsets(grid.stride).astype(np.int64)
    perm = oc._offset_perm(offs_abs, s_in, flat_strides)
    offs_abs = offs_abs[perm]
    n_groups = K // GROUP

    qc = grid.coords[:, None, 1:] + jnp.asarray(offs_abs, jnp.int32)[None]
    sj = jnp.asarray(s_in, jnp.int32)
    qpos = jnp.floor_divide(qc, sj)
    aligned = jnp.all(qc - qpos * sj == 0, axis=-1)
    ok = jnp.all((qpos >= 0) & (qpos < jnp.asarray(cells, jnp.int32)),
                 axis=-1)
    ok = ok & aligned & grid.valid[:, None]
    qkey = (grid.coords[:, :1] * np.int32(int(np.prod(cells))) +
            qpos @ jnp.asarray(flat_strides, jnp.int32))
    qk = jnp.where(ok, qkey, np.int32(-1))
    qk_tiles = qk.reshape(nt, TILE, K).transpose(0, 2, 1).reshape(
        nt, 1, K * TILE)
    in_keys = flat_cell_key(grid.coords, grid.valid, grid.stride, grid.extent)
    lo, nch = oc._group_bounds(qk, nt, TILE, n_groups, GROUP, in_keys, TW)
    f_aug, _ = oc._window_arrays(features, in_keys, TW, CIN, cinp, sep, cd)
    w_stack = jnp.pad(jnp.take(kernel, jnp.asarray(perm), axis=0).astype(cd),
                      ((0, 0), (0, cinp - CIN), (0, 0))).reshape(
                          K * cinp, COUT)
    return lo, nch, qk_tiles, f_aug, w_stack, cinp, n_groups


def variant(mode):
    def fn(features, kernel, grid):
        lo, nch, qk_tiles, f_aug, w_stack, cinp, n_groups = prep(
            features, kernel, grid)
        if mode == "prep":
            return (jnp.sum(lo) + jnp.sum(nch)).astype(jnp.float32) * 1e-9 + \
                f_aug[0, 0] * 1e-9 + w_stack[0, 0].astype(jnp.float32) * 1e-9
        cd = jnp.bfloat16
        nt = CAP // TILE

        def kern(lo_ref, nch_ref, qk_ref, f_ref, w_ref, out_ref, fwin2,
                 gcat, sem2):
            t = pl.program_id(0)
            n_prog = pl.num_programs(0)

            if mode == "empty":
                out_ref[:] = jnp.zeros_like(out_ref)
                return

            def mk_dma(tt, gg, s, c):
                base = pl.multiple_of(lo_ref[tt * n_groups + gg], 8) + c * TW
                return pltpu.make_async_copy(
                    f_ref.at[pl.ds(base, TW), :], fwin2.at[s], sem2.at[s])

            def compute(g, s, first):
                fw_f32 = fwin2[s]
                keys_w = jax.lax.bitcast_convert_type(
                    fw_f32[:, cinp - 1:cinp], jnp.int32)
                fw = fw_f32.astype(cd)
                sl_q = slice(g * GROUP * TILE, (g + 1) * GROUP * TILE)
                qg = qk_ref[0, 0:1, sl_q]
                oht = (keys_w == qg).astype(cd)
                if mode == "compare":
                    gcat[:, 0:cinp] = (gcat[:, 0:cinp] +
                                       oht[:TILE, :cinp] * fw[:TILE])
                    return
                gg_ = jax.lax.dot_general(
                    oht, fw, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for j in range(GROUP):
                    sl_c = slice((g * GROUP + j) * cinp,
                                 (g * GROUP + j + 1) * cinp)
                    v = gg_[j * TILE:(j + 1) * TILE].astype(cd)
                    if first:
                        gcat[:, sl_c] = v
                    else:
                        gcat[:, sl_c] = gcat[:, sl_c] + v

            for g in range(n_groups):
                slot = jax.lax.rem(t * n_groups + g, 2)
                if g == 0:
                    @pl.when(t == 0)
                    def _():
                        mk_dma(0, 0, 0, 0).start()
                mk_dma(t, g, slot, 0).wait()
                if g + 1 < n_groups:
                    mk_dma(t, g + 1, 1 - slot, 0).start()
                else:
                    @pl.when(t + 1 < n_prog)
                    def _():
                        mk_dma(t + 1, 0, 1 - slot, 0).start()
                if mode == "dma":
                    continue
                compute(g, slot, first=True)

                def spill(c, _, g=g, slot=slot):
                    d = mk_dma(t, g, slot, c)
                    d.start()
                    d.wait()
                    compute(g, slot, first=False)
                    return 0

                jax.lax.fori_loop(1, nch_ref[t * n_groups + g], spill, 0)

            if mode == "dma":
                out_ref[:] = fwin2[0, :TILE, :COUT].astype(out_ref.dtype)
            elif mode == "compare":
                out_ref[:] = gcat[:TILE, :COUT].astype(out_ref.dtype)
            elif mode == "matmul":
                out_ref[:] = gcat[:, :COUT].astype(out_ref.dtype)
            else:
                out_ref[:] = jax.lax.dot_general(
                    gcat[...], w_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(out_ref.dtype)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((1, 1, K * TILE), lambda t, lo, nch: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((K * cinp, COUT), lambda t, lo, nch: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, COUT), lambda t, lo, nch: (t, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, TW, cinp), jnp.float32),
                pltpu.VMEM((TILE, K * cinp), cd),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        out = pl.pallas_call(kern, grid_spec=grid_spec,
                             out_shape=jax.ShapeDtypeStruct(
                                 (CAP, COUT), jnp.float32))(
            lo, nch, qk_tiles, f_aug, w_stack)
        return jnp.sum(out[:, 0]) * 1e-9
    return fn


def main():
    rng = np.random.RandomState(0)
    steps_data = [mk(s) for s in range(6)]
    cs = jnp.asarray(np.stack([c for c, _ in steps_data]))
    vs = jnp.asarray(np.stack([v for _, v in steps_data]))
    feats0 = jnp.asarray(rng.randn(CAP, CIN).astype(np.float32))
    kern0 = jnp.asarray((rng.randn(K, CIN, COUT) * 0.1).astype(np.float32))
    gout = jnp.asarray(rng.randn(CAP, COUT).astype(np.float32))

    for mode in (sys.argv[1:] or MODES):
        if mode == "full":
            def run(c, v):
                st = mt.sparse_tensor(c, feats0, capacity=CAP, valid=v,
                                      batch_size=B, extent=(RES,) * 3)
                return jnp.vdot(mt.ops.fused_sparse_conv(
                    st.features, kern0, st.grid, st.grid, spec, tile=TILE,
                    tw=TW, compute_dtype=jnp.bfloat16), gout) * 1e-9
        elif mode == "geom":
            def run(c, v):
                st = mt.sparse_tensor(c, feats0, capacity=CAP, valid=v,
                                      batch_size=B, extent=(RES,) * 3)
                return jnp.sum(st.grid.coords).astype(jnp.float32) * 1e-9
        else:
            vfn = variant(mode)

            def run(c, v, vfn=vfn):
                st = mt.sparse_tensor(c, feats0, capacity=CAP, valid=v,
                                      batch_size=B, extent=(RES,) * 3)
                return vfn(st.features, kern0, st.grid).astype(jnp.float32)

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
