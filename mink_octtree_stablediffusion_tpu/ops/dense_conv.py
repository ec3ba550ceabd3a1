"""Densify-conv-sparsify fast path for bounded grids.

On TPU the generalized sparse conv's row gather is the bottleneck: gathering
K neighborhoods of narrow feature rows runs orders of magnitude below HBM
bandwidth, while the MXU convolves dense grids at petaflop rates.  For
bounded extents at moderate occupancy it is therefore FASTER to scatter the
sparse features onto the dense [B, X, Y, Z, C] grid, run one
`lax.conv_general_dilated` (pure MXU), and gather the output rows back —
even though that does work on empty cells.  Padding rows hold zero features
(the SparseTensor invariant), so empty cells contribute exactly zero and the
result equals the gather-GEMM path bit-for-bit up to matmul reduction order.

Applicability (else callers fall back to gather-GEMM): HYPER_CUBE region,
odd kernel size, stride 1, non-transpose, bounded extent within the cell
budget.  Measured on the reference benchmark workload (26k pts, 160×160×60,
k=3, 3→32ch) this is ~10× faster than the gather path on TPU v5e.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .coords import SparseGrid
from .kernels import KernelSpec, RegionType

# max dense cells (B · prod(extent/stride)); ~4M cells × 32ch × 4B = 512 MB
DENSE_CONV_MAX_CELLS = 4_194_304

# opt-in: measured SLOWER than the gather path on TPU v5e for the benchmark
# workload (XLA's NDHWC conv lowers poorly at small channel counts); may win
# for very high occupancy / wide channels — enable per-model to test.
DENSE_CONV_ENABLED = False

# "no-growth" dense routing: when the dense cell count is no larger than the
# sparse buffer's capacity, densifying cannot grow the working set, the
# lax.conv is pure MXU work on a SMALLER array than any sparse schedule
# touches, and the scatter/gather bracket is one cheap addressing pass.
# This catches the coarse levels of the diffusion UNet (stride-32 over a
# 64³ extent: 8 cells/instance vs 128-row buffers) whose sparse gather
# convs were pure overhead.  On by default; independent of the opt-in
# DENSE_CONV_ENABLED switch (which forces dense at ANY occupancy).
DENSE_NO_GROWTH = True


def enable_dense_conv(flag: bool) -> None:
    global DENSE_CONV_ENABLED
    DENSE_CONV_ENABLED = flag


def enable_dense_no_growth(flag: bool) -> None:
    global DENSE_NO_GROWTH
    DENSE_NO_GROWTH = flag


def _dense_shape_ok(spec: KernelSpec, grid: SparseGrid) -> bool:
    if grid.extent is None or spec.transpose:
        return False
    if spec.region_type != RegionType.HYPER_CUBE:
        return False
    if any(s != 1 for s in spec.stride):
        return False
    if any(k % 2 == 0 for k in spec.kernel_size):
        return False
    return True


def _total_cells(grid: SparseGrid) -> int:
    cells = [int(np.ceil(e / s)) for e, s in zip(grid.extent, grid.stride)]
    return grid.batch_size * int(np.prod(cells))


def dense_conv_applicable(spec: KernelSpec, grid: SparseGrid,
                          cin: int, cout: int,
                          max_cells: Optional[int] = None) -> bool:
    if not DENSE_CONV_ENABLED:
        return False
    if not _dense_shape_ok(spec, grid):
        return False
    total = _total_cells(grid)
    budget = max_cells if max_cells is not None else DENSE_CONV_MAX_CELLS
    # weight the budget by channel width so wide layers stay gather-based
    return total * max(cin, cout) <= budget * 32


def dense_no_growth_preferred(spec: KernelSpec, grid: SparseGrid) -> bool:
    """True when densifying cannot grow the buffer (cells ≤ capacity), so
    the dense path strictly dominates any sparse schedule for this conv."""
    if not DENSE_NO_GROWTH:
        return False
    if not _dense_shape_ok(spec, grid):
        return False
    return _total_cells(grid) <= grid.coords.shape[0]


def _cells_of(grid: SparseGrid) -> list:
    return [int(np.ceil(e / s)) for e, s in zip(grid.extent, grid.stride)]


def _densify(features: jnp.ndarray, grid: SparseGrid, cells, cd):
    """[B, *cells, C] dense grid from valid rows (invalid rows dropped);
    also returns (flat, ok) for gathering back."""
    b = grid.batch_size
    total = b * int(np.prod(cells))
    sa = jnp.asarray(np.asarray(grid.stride, np.int32))
    pos = jnp.floor_divide(grid.coords[:, 1:], sa)
    flat = grid.coords[:, 0]
    ok = grid.valid
    for i, c in enumerate(cells):
        ok = ok & (pos[:, i] >= 0) & (pos[:, i] < c)
        flat = flat * c + jnp.clip(pos[:, i], 0, c - 1)
    dest = jnp.where(ok, flat, total)
    dense = jnp.zeros((total + 1, features.shape[1]), cd)
    dense = dense.at[dest].set(features.astype(cd) * ok[:, None].astype(cd))
    return dense[:total].reshape((b,) + tuple(cells) + (-1,)), flat, ok


def _gather_rows(out_dense, grid: SparseGrid, cells, out_dtype,
                 bias=None):
    """Rows of the dense result at the grid's (valid) coordinates."""
    total = grid.batch_size * int(np.prod(cells))
    sa = jnp.asarray(np.asarray(grid.stride, np.int32))
    pos = jnp.floor_divide(grid.coords[:, 1:], sa)
    flat = grid.coords[:, 0]
    ok = grid.valid
    for i, c in enumerate(cells):
        ok = ok & (pos[:, i] >= 0) & (pos[:, i] < c)
        flat = flat * c + jnp.clip(pos[:, i], 0, c - 1)
    out_flat = out_dense.reshape(total, -1)
    out = out_flat[jnp.where(ok, flat, 0)] * ok[:, None].astype(
        out_flat.dtype)
    out = out.astype(out_dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def dense_no_growth_preferred2(spec: KernelSpec, in_grid: SparseGrid,
                               out_grid: SparseGrid) -> bool:
    """General no-growth predicate covering strided and k==s transpose
    convs: densifying can't grow EITHER buffer, so the dense formulation
    does strictly less work than any sparse schedule."""
    if not DENSE_NO_GROWTH:
        return False
    if in_grid.extent is None or out_grid.extent is None:
        return False
    if spec.region_type != RegionType.HYPER_CUBE:
        return False
    if spec.transpose:
        # exact-children case only: every output cell has exactly one
        # source (k == upsample factor per axis), dilation 1
        if any(k != s for k, s in zip(spec.kernel_size, spec.stride)):
            return False
        if any(d != 1 for d in spec.dilation):
            return False
    elif in_grid.ndim not in (2, 3):
        return False  # lax.conv dimension_numbers written for 2-D/3-D
    if _total_cells(in_grid) > in_grid.coords.shape[0]:
        return False
    return _total_cells(out_grid) <= out_grid.coords.shape[0]


def dense_conv_general_apply(
    features: jnp.ndarray,  # [N_in, Cin] (zero on invalid rows)
    kernel: jnp.ndarray,  # [K, Cin, Cout], C-order offsets
    in_grid: SparseGrid,
    out_grid: SparseGrid,
    spec: KernelSpec,
    bias: jnp.ndarray | None = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """Dense formulation of a strided or (k==s) transposed sparse conv.

    Non-transpose (`kernel_map` pairing in = out + delta, offsets
    [-lo, k-1-lo]·in_stride·dil): `lax.conv_general_dilated` over the
    in-cell grid with window_strides = spec.stride and explicit padding
    lo·dil so output cell j reads input cells j·s + (t-lo)·dil.

    Transpose with k == s (the reference's Upsample / pool-transpose unit,
    out = in + offsets·out_stride, offsets [0, k)): each output cell has
    EXACTLY ONE source — out[i·s + o] = in[i] @ W[o] — an einsum +
    spatial interleave, no conv needed."""
    d = in_grid.ndim
    cin = features.shape[1]
    cout = kernel.shape[2]
    cd = compute_dtype or features.dtype
    ci = _cells_of(in_grid)
    co = _cells_of(out_grid)
    dense, _, _ = _densify(features, in_grid, ci, cd)
    if spec.transpose:
        ks = spec.kernel_size
        # [B, *ci, K, Cout] -> interleave each axis's kernel index after
        # its cell axis -> [B, *(ci*k)] -> crop to co
        w = kernel.astype(cd)
        out_d = jnp.einsum("...c,kcf->...kf", dense, w)
        out_d = out_d.reshape(out_d.shape[:-2] + tuple(ks) + (cout,))
        # axes: [b, x1..xd, k1..kd, f] -> [b, x1, k1, x2, k2, ..., f]
        perm = [0]
        for i in range(d):
            perm += [1 + i, 1 + d + i]
        perm += [1 + 2 * d]
        out_d = out_d.transpose(perm)
        out_d = out_d.reshape((in_grid.batch_size,)
                              + tuple(c * k for c, k in zip(ci, ks))
                              + (cout,))
        out_d = out_d[(slice(None),) + tuple(slice(0, c) for c in co)]
    else:
        ks = spec.kernel_size
        lo = [int(np.floor((k - 1) / 2)) for k in ks]
        pads = []
        for i in range(d):
            p_lo = lo[i] * spec.dilation[i]
            p_hi = ((co[i] - 1) * spec.stride[i]
                    + (ks[i] - 1) * spec.dilation[i] - p_lo - (ci[i] - 1))
            pads.append((p_lo, p_hi))
        w = kernel.reshape(tuple(ks) + (cin, cout)).astype(cd)
        dn = (("NDHWC", "DHWIO", "NDHWC") if d == 3
              else ("NHWC", "HWIO", "NHWC"))
        out_d = jax.lax.conv_general_dilated(
            dense, w, window_strides=tuple(spec.stride), padding=pads,
            rhs_dilation=tuple(spec.dilation), dimension_numbers=dn)
    return _gather_rows(out_d, out_grid, co, features.dtype, bias)


def dense_conv_apply(
    features: jnp.ndarray,  # [N, Cin] (zero on invalid rows)
    kernel: jnp.ndarray,  # [K, Cin, Cout], K = prod(kernel_size), C-order
    grid: SparseGrid,  # in == out grid (stride-1 conv)
    spec: KernelSpec,
    bias: jnp.ndarray | None = None,
    compute_dtype=None,
) -> jnp.ndarray:
    d = grid.ndim
    cin = features.shape[1]
    cout = kernel.shape[2]
    cells = [int(np.ceil(e / s)) for e, s in zip(grid.extent, grid.stride)]
    b = grid.batch_size
    total = b * int(np.prod(cells))
    sa = jnp.asarray(np.asarray(grid.stride, np.int32))
    pos = jnp.floor_divide(grid.coords[:, 1:], sa)
    flat = grid.coords[:, 0]
    ok = grid.valid
    for i, c in enumerate(cells):
        ok = ok & (pos[:, i] >= 0) & (pos[:, i] < c)
        flat = flat * c + jnp.clip(pos[:, i], 0, c - 1)
    dest = jnp.where(ok, flat, total)

    cd = compute_dtype or features.dtype
    dense = jnp.zeros((total + 1, cin), cd)
    dense = dense.at[dest].set(features.astype(cd) *
                               ok[:, None].astype(cd))
    dense = dense[:total].reshape((b,) + tuple(cells) + (cin,))

    ks = spec.kernel_size
    w = kernel.reshape(tuple(ks) + (cin, cout)).astype(cd)
    dn = ("NDHWC", "DHWIO", "NDHWC") if d == 3 else ("NHWC", "HWIO", "NHWC")
    # no preferred_element_type: a widened output dtype breaks the conv
    # TRANSPOSE rule under autodiff (f32 cotangent meets a bf16 kernel);
    # XLA accumulates MXU convs in fp32 internally either way, so keeping
    # the output in the compute dtype just rounds once — same as the fused
    # path's final astype
    out_dense = jax.lax.conv_general_dilated(
        dense, w, window_strides=(1,) * d, padding="SAME",
        rhs_dilation=tuple(spec.dilation), dimension_numbers=dn)
    out_flat = out_dense.reshape(total, cout)
    out = out_flat[jnp.where(ok, flat, 0)] * ok[:, None].astype(out_flat.dtype)
    out = out.astype(features.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
