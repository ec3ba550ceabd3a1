"""8³-brick block-sparse layout for the finest octree levels.

The finest decoder level is the standing conv bottleneck (docs/DESIGN.md §7:
~26 ms of the 82 ms VAE step at 131k cap / 32 ch).  The fused one-hot conv
pays for its generality twice there: the in-kernel neighbor SEARCH scales
with the window span, and the gather-as-matmul does ``tw/C ≈ 16×`` the
FLOPs of the actual conv.  But surface voxels at fine strides are LOCALLY
DENSE: grouped into 8×8×8 bricks, a brick's 27-neighborhood is 27 brick
slots found by pure index arithmetic (no search), and the conv becomes
dense slab shifts + MXU GEMMs.

Layout (bounded grids only — brick-slot indexing needs the extent):
  slot(b, x, y, z) = ((b·Bx + x/8)·By + y/8)·Bz + z/8     (dense brick space)
  within(x, y, z)  = ((x%8)·8 + y%8)·8 + z%8              (voxel in brick)
so scatter/gather between the row world and the brick world is a single
addressing pass, there is no unique/overflow bookkeeping, and a brick's
spatial neighbors are ``slot ± {Bz·By, Bz, 1}`` with boundary masks.

`brick_conv_xla` is the straight-XLA formulation (halo assembly by 27
static slab slices + one accumulated GEMM per kernel offset) — the
correctness reference and CPU path; the Pallas kernel (VMEM-resident halo,
one DMA per brick instead of 27 slab re-reads) builds on the same layout.

Reference anchor: this replaces the same hot loop as the reference's
gather-scatter conv (`pybind/extern.hpp:53-115`) at fine levels; the
reference has no block-sparse path.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .coords import SparseGrid
from .kernels import KernelSpec, RegionType

BRICK = 8  # voxels per side; 8³ = 512 = 4 MXU sublane tiles of 128


class BrickLayout(NamedTuple):
    """Static addressing between grid rows and dense brick slots."""

    slot: jnp.ndarray  # int32[N] — brick slot per row (nb for padding rows)
    within: jnp.ndarray  # int32[N] — voxel index inside the brick [0, 512)
    nb: int  # total brick slots (batch · prod(ceil(cells / 8)))
    bdims: Tuple[int, int, int]  # brick-space dimensions per instance
    batch_size: int


def brick_dims(grid: SparseGrid) -> Tuple[int, int, int]:
    cells = [-(-int(e) // int(s)) for e, s in zip(grid.extent, grid.stride)]
    return tuple(-(-c // BRICK) for c in cells)


def brick_applicable(spec: KernelSpec, grid: SparseGrid,
                     max_slots: int = 1 << 16) -> bool:
    """k=3 s=1 d=1 HYPER_CUBE self-conv on a bounded 3-D grid whose brick
    space is small enough to materialize densely."""
    if grid.extent is None or grid.ndim != 3 or spec.transpose:
        return False
    if spec.region_type != RegionType.HYPER_CUBE:
        return False
    if any(k != 3 for k in spec.kernel_size) or any(
            s != 1 for s in spec.stride) or any(d != 1 for d in spec.dilation):
        return False
    bd = brick_dims(grid)
    return grid.batch_size * int(np.prod(bd)) <= max_slots


def brick_layout(grid: SparseGrid) -> BrickLayout:
    bd = brick_dims(grid)
    nb = grid.batch_size * int(np.prod(bd))
    c = grid.coords
    cell = [c[:, i + 1] // int(grid.stride[i]) for i in range(3)]
    bx, by, bz = (cell[0] // BRICK, cell[1] // BRICK, cell[2] // BRICK)
    slot = ((c[:, 0] * bd[0] + bx) * bd[1] + by) * bd[2] + bz
    slot = jnp.where(grid.valid, slot, nb).astype(jnp.int32)
    within = ((cell[0] % BRICK) * BRICK + cell[1] % BRICK) * BRICK + \
        cell[2] % BRICK
    within = jnp.where(grid.valid, within, 0).astype(jnp.int32)
    return BrickLayout(slot=slot, within=within, nb=nb, bdims=bd,
                       batch_size=grid.batch_size)


def to_bricks(features: jnp.ndarray, layout: BrickLayout) -> jnp.ndarray:
    """[N, C] rows → dense bricks [nb, 512, C] (padding rows drop into the
    nb sentinel slab, empty cells hold exact zeros)."""
    c = features.shape[-1]
    buf = jnp.zeros((layout.nb + 1, BRICK ** 3, c), features.dtype)
    buf = buf.at[layout.slot, layout.within].set(features, mode="drop")
    return buf[:-1]


def from_bricks(bricks: jnp.ndarray, layout: BrickLayout,
                valid: jnp.ndarray) -> jnp.ndarray:
    """Dense bricks back to rows; padding rows (slot == nb sentinel) read a
    clamped slot and are masked — no sentinel row is materialized (a
    concat-with-zero-row would copy the whole [nb, 512, C] array)."""
    slot = jnp.clip(layout.slot, 0, layout.nb - 1)
    out = bricks[slot, layout.within]
    ok = valid & (layout.slot < layout.nb)
    return out * ok[:, None].astype(out.dtype)


def _neighbor_slots(layout: BrickLayout) -> jnp.ndarray:
    """int32[27, nb] neighbor slot per (brick-offset, slot); nb = missing.

    Offset order is C-order over (dx, dy, dz) ∈ {-1,0,1}³ — the same
    convention as `KernelSpec.offsets`."""
    bdx, bdy, bdz = layout.bdims
    nb = layout.nb
    slots = jnp.arange(nb, dtype=jnp.int32)
    b, rem = slots // (bdx * bdy * bdz), slots % (bdx * bdy * bdz)
    x, rem = rem // (bdy * bdz), rem % (bdy * bdz)
    y, z = rem // bdz, rem % bdz
    out = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                nx, ny, nz = x + dx, y + dy, z + dz
                ok = ((nx >= 0) & (nx < bdx) & (ny >= 0) & (ny < bdy) &
                      (nz >= 0) & (nz < bdz))
                s = ((b * bdx + nx) * bdy + ny) * bdz + nz
                out.append(jnp.where(ok, s, nb).astype(jnp.int32))
    return jnp.stack(out)


def _halo(bricks: jnp.ndarray, layout: BrickLayout) -> jnp.ndarray:
    """[nb, 10, 10, 10, C] halo volumes: own 8³ centered + 1-voxel shells
    copied from the 26 spatial neighbors (missing neighbors → zeros)."""
    nb, _, c = bricks.shape
    vol = bricks.reshape(nb, BRICK, BRICK, BRICK, c)
    volp = jnp.concatenate(
        [vol, jnp.zeros((1, BRICK, BRICK, BRICK, c), vol.dtype)], axis=0)
    nbr = _neighbor_slots(layout)  # [27, nb]
    halo = jnp.zeros((nb, BRICK + 2, BRICK + 2, BRICK + 2, c), vol.dtype)

    def src_dst(d):
        # neighbor at offset -1 contributes its LAST slice to halo row 0;
        # +1 its FIRST slice to halo row 9; 0 the full extent to rows 1..9
        if d == -1:
            return slice(BRICK - 1, BRICK), slice(0, 1)
        if d == 1:
            return slice(0, 1), slice(BRICK + 1, BRICK + 2)
        return slice(0, BRICK), slice(1, BRICK + 1)

    k = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                sx, hx = src_dst(dx)
                sy, hy = src_dst(dy)
                sz, hz = src_dst(dz)
                # slice FIRST, then gather: only slab bytes move
                slab = volp[:, sx, sy, sz, :][nbr[k]]
                halo = halo.at[:, hx, hy, hz, :].set(slab)
                k += 1
    return halo


def brick_conv_xla(bricks: jnp.ndarray, kernel: jnp.ndarray,
                   layout: BrickLayout) -> jnp.ndarray:
    """k=3 s=1 conv on the brick layout: halo + 27 shifted-slab GEMMs
    (avoids XLA's weak small-channel 3-D conv lowering — each term is a
    [nb·512, C] × [C, Co] matmul the MXU runs directly).

    kernel: [27, C, Co] in `KernelSpec.offsets` C-order over (dx,dy,dz).
    Empty cells hold zeros, so missing neighbors contribute exactly zero —
    bit-compatible with the gather-GEMM path up to reduction order."""
    nb, _, c = bricks.shape
    co = kernel.shape[-1]
    halo = _halo(bricks, layout)
    out = jnp.zeros((nb * BRICK ** 3, co), jnp.promote_types(bricks.dtype,
                                                             kernel.dtype))
    k = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                # out[p] += in[p + d] · W_d ⇒ slab starts at 1+d in halo
                slab = halo[:, 1 + dx:9 + dx, 1 + dy:9 + dy, 1 + dz:9 + dz, :]
                out = out + slab.reshape(nb * BRICK ** 3, c) @ kernel[k]
                k += 1
    return out.reshape(nb, BRICK ** 3, co)


def brick_sparse_conv(features: jnp.ndarray, kernel: jnp.ndarray,
                      grid: SparseGrid) -> jnp.ndarray:
    """Whole-hog row-world wrapper: scatter → brick conv → gather."""
    layout = brick_layout(grid)
    bricks = to_bricks(features, layout)
    out = brick_conv_xla(bricks, kernel, layout)
    return from_bricks(out, layout, grid.valid)
