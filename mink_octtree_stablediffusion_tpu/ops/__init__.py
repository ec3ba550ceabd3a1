"""Core sparse-tensor ops: the TPU-native engine layer.

Replaces the reference's native C++/CUDA layer (`pybind/extern.hpp`) with
shape-static XLA computations over fixed-capacity buffers.
"""

from .coords import (
    INVALID_COORD,
    SparseGrid,
    batched_coordinates_np,
    canonical_order,
    expand_grid,
    make_grid,
    origin_grid,
    pad_to_capacity,
    sparse_quantize_np,
    stride_grid,
    unique_coords,
)
from .canvas import canvas_grid, expand_to_canvas
from .conv import gather_rows, linear_apply, sparse_conv_apply
from .conv import default_compute_dtype, set_default_compute_dtype
from .dense_conv import dense_conv_applicable, dense_conv_apply, enable_dense_conv
from .hashtable import HashTable, build_table, lookup, pack_keys
from .interp import interpolate, interpolation_weights, splat, splat_coordinates
from .kernels import KernelSpec, RegionType, hybrid_region_offsets, region_offsets
from .morton import morton_decode, morton_encode, morton_encode_np
from .lut import LUT_MAX_ENTRIES, build_lut, lut_lookup
from .neighbors import get_coords_map, grid_lookup, identity_map, kernel_map, membership
from .onehot_conv import fused_sparse_conv, onehot_sparse_conv, use_onehot_conv
# NB: alias the dense entry as vol_conv3d — importing the name `vol_conv`
# here would rebind the package attribute from the SUBMODULE to the
# function and break `from ops import vol_conv as module` users
from .vol_conv import brick_pallas_conv, enable_brick_conv
from .vol_conv import vol_conv as vol_conv3d
from .brick import brick_sparse_conv
from .search import lookup_sorted
from .pool import broadcast_batch, global_pool, local_pool_apply
from .pruning import prune, top_k_mask
from .reduce import coo_spmm, reduce_by_inverse, slice_by_inverse
from .union import union

__all__ = [
    "INVALID_COORD", "SparseGrid", "batched_coordinates_np", "canonical_order",
    "expand_grid", "make_grid", "origin_grid", "pad_to_capacity",
    "sparse_quantize_np", "stride_grid", "unique_coords", "gather_rows",
    "linear_apply", "sparse_conv_apply",
    "dense_conv_applicable", "dense_conv_apply", "enable_dense_conv", "HashTable", "build_table", "lookup",
    "pack_keys", "interpolate", "interpolation_weights", "splat",
    "splat_coordinates", "KernelSpec", "RegionType", "hybrid_region_offsets", "region_offsets",
    "morton_decode", "morton_encode", "morton_encode_np", "identity_map",
    "get_coords_map", "grid_lookup", "kernel_map", "membership",
    "LUT_MAX_ENTRIES", "build_lut", "lut_lookup", "lookup_sorted", "broadcast_batch", "global_pool",
    "local_pool_apply", "prune", "top_k_mask", "coo_spmm", "reduce_by_inverse",
    "slice_by_inverse", "union", "default_compute_dtype", "set_default_compute_dtype",
    "fused_sparse_conv", "onehot_sparse_conv", "use_onehot_conv",
    "brick_pallas_conv", "enable_brick_conv", "vol_conv3d",
    "brick_sparse_conv", "canvas_grid", "expand_to_canvas",
]
