"""Pallas dense-volume 3-D conv: the brick-level kernel for fine octree
levels.

Why this exists (DESIGN §7 / VERDICT r1 item 3): the finest decoder level
(131k rows, 32 ch) is bound by the fused one-hot conv's window machinery —
in-kernel neighbor search plus gather-as-matmul FLOPs that are ``tw/C ≈ 8×``
the real conv math.  At fine strides the occupied voxels are locally dense,
and the bounded extent makes the *whole* volume small (64³·4 ≈ 1M cells),
so the conv is better computed densely — but XLA's own 3-D conv lowering
is weak at small channel counts (measured 2–20× slower, ops/dense_conv.py).
This kernel does what XLA won't: per 8³ output tile, ONE strided DMA pulls
the 10³ input halo window into VMEM (double-buffered across tiles), and the
27 kernel taps become static-slice [512, C]×[C, Co] MXU GEMMs accumulated
in fp32 — no neighbor tables, no search, ~2× total HBM traffic.

Layout notes (Mosaic):
- channels ride the lane dim padded to 128; the window scratch is
  [10, 10, 10, 128] so a (dx, dy) tap is an outer-dim slice, dz is a
  sublane-offset slice, and [8, 8, 8, 128] → [512, 128] is a
  layout-preserving reshape (minor (8,128) tile untouched).
- the output is written in BRICK order ([tile, 512, Co]) — exactly the
  addressing `ops.brick.BrickLayout` uses, so sparse callers scatter rows
  to the volume once and gather rows from brick order once.

The XLA reference implementation is `brick_conv_xla` (ops/brick.py); the
interpret-mode test pins this kernel to it bit-for-bit (fp32).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 8  # output tile side (8³ = 512 rows = 4 sublane tiles)
W = T + 2  # input window side for k=3
# The window DMA pulls one full W×W×(Z+8) z-COLUMN per program (x/y are
# outer memref dims and slice freely at 10; z is the sublane dim, padded
# +8 so Mosaic's 8-aligned slicing holds and the k=3 halo fits).  VMEM
# scratch therefore scales with the full z extent — applicability bounds
# cells[2] (see brick_pallas_applicable).


def _kernel(vol_ref, w_ref, out_ref, win, sem, *, ncols, bd, zc, zp, cp, co,
            cd):
    """One full z-COLUMN of 8³ tiles per grid step (amortizes per-program
    overhead ~bz×); window DMA double-buffered across steps."""
    t = pl.program_id(0)
    bx, by, bz = bd

    def col_origin(tt):
        b, rem = tt // (bx * by), tt % (bx * by)
        x, y = rem // by, rem % by
        return b, x * T, y * T

    def dma(slot, tt):
        b, x0, y0 = col_origin(tt)
        return pltpu.make_async_copy(
            vol_ref.at[b, pl.ds(x0, W), pl.ds(y0, W), :, :],
            win.at[slot],
            sem.at[slot],
        )

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()

    @pl.when(t + 1 < ncols)
    def _():
        dma((t + 1) % 2, t + 1).start()

    dma(t % 2, t).wait()
    w = win[t % 2]

    acc = jnp.zeros((T * T * zc, co), jnp.float32)
    k = 0
    for dx in (0, 1, 2):
        for dy in (0, 1, 2):
            for dz in (0, 1, 2):
                slab = w[dx:dx + T, dy:dy + T, dz:dz + zc, :]
                lhs = slab.reshape(T * T * zc, cp)
                acc = acc + jax.lax.dot(
                    lhs, w_ref[k],
                    preferred_element_type=jnp.float32)
                k += 1
    # rows are (x, y, zz) — regroup to brick order (ztile, x, y, zl): the
    # out block is [bz, 512, co] and brick row = (x*8 + y)*8 + zl
    a4 = acc.reshape(T * T, bz, T, co).transpose(1, 0, 2, 3)
    out_ref[...] = a4.reshape(bz, T * T * T, co)


@functools.partial(jax.jit, static_argnames=("interpret",))
def vol_conv_tiles(volp: jnp.ndarray, kernel: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """k=3 s=1 VALID conv of a spatially 1-padded volume.

    volp: [B, X+2, Y+2, Z+2, CP] (CP = 128-padded channels, bf16 or fp32)
    kernel: [27, CP, Co] in C-order over (dx, dy, dz) ∈ {-1,0,1}³
    returns: [B·(X/8)·(Y/8)·(Z/8), 512, Co] fp32 — brick (tile) order.
    X, Y, Z must be multiples of 8.
    """
    b = volp.shape[0]
    x, y = volp.shape[1] - 2, volp.shape[2] - 2
    zp = volp.shape[3]  # pad_volume pads z+2 → z+8 for aligned z DMA
    z = zp - 8
    cp = volp.shape[-1]
    co = kernel.shape[-1]
    assert x % T == y % T == z % T == 0, (x, y, z)
    bd = (x // T, y // T, z // T)
    ntiles = b * bd[0] * bd[1] * bd[2]
    ncols = b * bd[0] * bd[1]
    cd = volp.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ncols,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # volume stays in HBM
            pl.BlockSpec((27, cp, co), lambda t: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bd[2], T ** 3, co), lambda t: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, W, W, zp, cp), cd),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, ncols=ncols, bd=bd, zc=z, zp=zp, cp=cp,
                          co=co, cd=cd),
        out_shape=jax.ShapeDtypeStruct((ntiles, T ** 3, co), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(volp, kernel.astype(cd))
    return out


def pad_volume(vol: jnp.ndarray, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """[B, X, Y, Z, C] → spatially 1-padded (z tail-padded to Z+8 so every
    16-deep z-window DMA stays in bounds at an 8-aligned offset), channel
    128-padded, cast."""
    c = vol.shape[-1]
    cp = max(-(-c // 128) * 128, 128)
    return jnp.pad(vol.astype(compute_dtype),
                   ((0, 0), (1, 1), (1, 1), (1, 7), (0, cp - c)))


def pad_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """[27, C, Co] → [27, CP, Co]."""
    c = kernel.shape[1]
    cp = max(-(-c // 128) * 128, 128)
    return jnp.pad(kernel, ((0, 0), (0, cp - c), (0, 0)))


def vol_conv(vol: jnp.ndarray, kernel: jnp.ndarray,
             compute_dtype=jnp.bfloat16, interpret: bool = False
             ) -> jnp.ndarray:
    """Dense k=3 s=1 SAME conv, [B, X, Y, Z, C] → [B, X, Y, Z, Co]."""
    b, x, y, z, _ = vol.shape
    co = kernel.shape[-1]
    tiles = vol_conv_tiles(pad_volume(vol, compute_dtype), pad_kernel(kernel),
                           interpret=interpret)
    bd = (x // T, y // T, z // T)
    t5 = tiles.reshape(b, bd[0], bd[1], bd[2], T, T, T, co)
    return t5.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, x, y, z, co)


def _dw_kernel(vol_ref, g_ref, out_ref, win, sem, *, ncols, bd, zc, zp, cp,
               co, cd):
    """dW[k] = Σ_columns slab_k(col)ᵀ · g(col) — same z-column windows as
    forward, fp32 accumulation into the single (grid-constant) block."""
    t = pl.program_id(0)
    bx, by, bz = bd

    def col_origin(tt):
        b, rem = tt // (bx * by), tt % (bx * by)
        x, y = rem // by, rem % by
        return b, x * T, y * T

    def dma(slot, tt):
        b, x0, y0 = col_origin(tt)
        return pltpu.make_async_copy(
            vol_ref.at[b, pl.ds(x0, W), pl.ds(y0, W), :, :],
            win.at[slot],
            sem.at[slot],
        )

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()

    @pl.when(t + 1 < ncols)
    def _():
        dma((t + 1) % 2, t + 1).start()

    dma(t % 2, t).wait()
    w = win[t % 2]
    # g arrives in brick order (ztile, (x,y), zl) — reorder to the window's
    # (x, y, zz) row order
    g0 = g_ref[...].reshape(bz, T * T, T, co).transpose(1, 0, 2, 3) \
        .reshape(T * T * zc, co)

    parts = []
    for dx in (0, 1, 2):
        for dy in (0, 1, 2):
            for dz in (0, 1, 2):
                slab = w[dx:dx + T, dy:dy + T, dz:dz + zc, :]
                lhs = slab.reshape(T * T * zc, cp)
                parts.append(jax.lax.dot_general(
                    lhs, g0, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
    contrib = jnp.stack(parts)  # [27, CP, Co]

    @pl.when(t == 0)
    def _():
        out_ref[...] = contrib

    @pl.when(t > 0)
    def _():
        out_ref[...] = out_ref[...] + contrib


@functools.partial(jax.jit, static_argnames=("interpret",))
def vol_conv_dw(volp: jnp.ndarray, g_tiles: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """dW [27, CP, Co] fp32 from the padded volume and brick-order grads."""
    b = volp.shape[0]
    x, y = volp.shape[1] - 2, volp.shape[2] - 2
    zp = volp.shape[3]
    z = zp - 8
    cp = volp.shape[-1]
    co = g_tiles.shape[-1]
    bd = (x // T, y // T, z // T)
    ncols = b * bd[0] * bd[1]
    cd = volp.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ncols,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((bd[2], T ** 3, co), lambda t: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((27, cp, co), lambda t: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, W, W, zp, cp), cd),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_dw_kernel, ncols=ncols, bd=bd, zc=z, zp=zp, cp=cp,
                          co=co, cd=cd),
        out_shape=jax.ShapeDtypeStruct((27, cp, co), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(volp, g_tiles.astype(cd))


# ---------------------------------------------------------------------------
# Differentiable sparse row-world entry
# ---------------------------------------------------------------------------


def _mirror_transpose(kernel: jnp.ndarray) -> jnp.ndarray:
    """W'[k] = W[26-k]ᵀ — the dF conv kernel for a k=3 s=1 self-grid conv."""
    return jnp.swapaxes(kernel[::-1], 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _brick_conv(static, features, kernel, coords, valid):
    return _brick_fwd(static, features, kernel, coords, valid)[0]


def _brick_impl(static, features, kernel, coords, valid):
    from .brick import BrickLayout, from_bricks  # local: avoid import cycle

    (bsz, stride, extent, cd_name, interpret) = static
    cd = jnp.dtype(cd_name)
    d = coords.shape[1] - 1
    cells = [-(-int(e) // int(s)) for e, s in zip(extent, stride)]
    sa = jnp.asarray(np.asarray(stride, np.int32))
    pos = jnp.floor_divide(coords[:, 1:], sa)
    # scatter rows DIRECTLY into the spatially-padded, 128-lane volume (one
    # pass — a separate jnp.pad re-writes the whole ~300MB volume)
    c = features.shape[1]
    cp = max(-(-c // 128) * 128, 128)
    pdims = (cells[0] + 2, cells[1] + 2, cells[2] + 8)
    total = bsz * int(np.prod(pdims))
    flat = coords[:, 0]
    for i, (cl, pd) in enumerate(zip(cells, pdims)):
        flat = flat * pd + jnp.clip(pos[:, i], 0, cl - 1) + 1
    dest = jnp.where(valid, flat, total)
    fpad = jnp.pad(features.astype(cd), ((0, 0), (0, cp - c)))
    dense = jnp.zeros((total + 1, cp), cd)
    dense = dense.at[dest].set(fpad * valid[:, None].astype(cd))
    volp = dense[:total].reshape((bsz,) + pdims + (cp,))

    tiles = vol_conv_tiles(volp, pad_kernel(kernel).astype(cd),
                           interpret=interpret)

    # brick addressing for the row gather (tile order == brick slot order)
    bd = tuple(c // T for c in cells)
    bx, by, bz = pos[:, 0] // T, pos[:, 1] // T, pos[:, 2] // T
    slot = ((coords[:, 0] * bd[0] + bx) * bd[1] + by) * bd[2] + bz
    nb = bsz * int(np.prod(bd))
    slot = jnp.where(valid, slot, nb).astype(jnp.int32)
    within = ((pos[:, 0] % T) * T + pos[:, 1] % T) * T + pos[:, 2] % T
    within = jnp.where(valid, within, 0).astype(jnp.int32)
    layout = BrickLayout(slot=slot, within=within, nb=nb, bdims=bd,
                         batch_size=bsz)
    rows = from_bricks(tiles, layout, valid).astype(features.dtype)
    return rows, (volp, layout)


def _brick_fwd(static, features, kernel, coords, valid):
    rows, (volp, layout) = _brick_impl(static, features, kernel, coords,
                                       valid)
    return rows, (volp, layout, kernel, coords, valid)


def _brick_bwd(static, res, g):
    from .brick import to_bricks  # noqa: F811

    volp, layout, kernel, coords, valid = res
    (bsz, stride, extent, cd_name, interpret) = static
    c = kernel.shape[1]
    fdtype = g.dtype  # cotangent dtype == primal feature dtype
    # dF: transpose conv of the cotangent == conv with mirrored-transposed
    # kernel — one more dense pass over the cotangent volume
    g_rows = g.astype(fdtype) * valid[:, None].astype(fdtype)
    dfeat, _ = _brick_impl(static, g_rows, _mirror_transpose(kernel),
                           coords, valid)
    # dW from the saved padded volume and the cotangent in brick order
    g_tiles = to_bricks(g.astype(jnp.float32), layout)
    dk = vol_conv_dw(volp, g_tiles, interpret=interpret)[:, :c, :]
    f0 = jax.dtypes.float0
    return (dfeat.astype(fdtype), dk.astype(kernel.dtype),
            np.zeros(coords.shape, f0), np.zeros(valid.shape, f0))


_brick_conv.defvjp(_brick_fwd, _brick_bwd)


def brick_pallas_applicable(spec, grid) -> bool:
    """k=3 s=1 HYPER_CUBE self-conv, bounded 3-D extent with 8-aligned cell
    dims and a volume small enough to densify (≤ ~4M cells)."""
    from .kernels import RegionType

    if grid.extent is None or grid.ndim != 3 or spec.transpose:
        return False
    if spec.region_type != RegionType.HYPER_CUBE:
        return False
    if any(k != 3 for k in spec.kernel_size) or any(
            s != 1 for s in spec.stride) or any(d != 1 for d in spec.dilation):
        return False
    cells = [-(-int(e) // int(s)) for e, s in zip(grid.extent, grid.stride)]
    if any(cl % T != 0 for cl in cells):
        return False
    # the window DMA stages a full z column in VMEM (2 double-buffer slots x
    # W*W*(z+8)*cp) — a long-thin grid would fail VMEM at compile
    if cells[2] > 256:
        return False
    return grid.batch_size * int(np.prod(cells)) <= 4_194_304


def brick_pallas_conv(features: jnp.ndarray, kernel: jnp.ndarray, grid,
                      compute_dtype=jnp.bfloat16,
                      interpret: bool = False) -> jnp.ndarray:
    """Differentiable sparse k=3 s=1 conv via the dense-tile Pallas kernel.

    Callers must satisfy `brick_pallas_applicable` (bounded 3-D extent,
    8-aligned cell dims, z ≤ 256); checked here so a bad extent fails with
    context instead of a bare shape assert deep in `vol_conv_tiles`."""
    assert grid.extent is not None and grid.ndim == 3, (
        "brick_pallas_conv needs a bounded 3-D grid (extent=...)")
    cells = [-(-int(e) // int(s)) for e, s in zip(grid.extent, grid.stride)]
    assert all(cl % T == 0 for cl in cells) and cells[2] <= 256, (
        f"brick_pallas_conv: cell dims {cells} must be multiples of {T} with "
        f"z <= 256 (pad the extent or use the one-hot/gather conv path)")
    static = (grid.batch_size, tuple(int(s) for s in grid.stride),
              tuple(int(e) for e in grid.extent),
              jnp.dtype(compute_dtype).name, interpret)
    return _brick_conv(static, features, kernel, grid.coords, grid.valid)


# ---------------------------------------------------------------------------
# Routing gate (mirrors ops.onehot_conv.enabled / ops.dense_conv flags)
# ---------------------------------------------------------------------------

_BRICK_ENABLED = False


def enable_brick_conv(flag: bool) -> None:
    """Route applicable narrow-channel self-grid convs through the Pallas
    dense-volume kernel (A/B gate; default off until on-chip validation)."""
    global _BRICK_ENABLED
    _BRICK_ENABLED = flag


def brick_preferred(spec, grid, cin: int, cout: int) -> bool:
    """Where this kernel beats the one-hot conv: k=3 s=1 self-grid convs at
    narrow widths (the finest octree levels) on bounded 8-aligned extents.
    Wide layers keep the one-hot path (its window cost amortizes and the
    dense volume would not fit VMEM blocking at cout > 128)."""
    import jax

    if not _BRICK_ENABLED or jax.default_backend() == "cpu":
        return False
    if cin > 128 or cout > 128:
        return False
    return brick_pallas_applicable(spec, grid)
