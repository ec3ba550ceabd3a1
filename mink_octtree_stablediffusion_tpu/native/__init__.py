"""Native host-side kernels (C++ via ctypes) for the data pipeline.

The device compute path is pure XLA/Pallas; this package accelerates the
*host* side — voxelization, first-occurrence unique, label consensus,
Morton codes, fused batch collation — the role the reference's native
`src/quantization.cpp` + CPU coordinate maps play for its CPU path
(`pybind/extern.hpp:471-483`).  Falls back to the numpy implementations in
`ops.coords` when the shared library isn't built.

Build (once per machine):
    python -m mink_octtree_stablediffusion_tpu.native.build
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libvoxelize.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i64, i32, f32, u8 = (ctypes.c_int64, ctypes.c_int32, ctypes.c_float,
                         ctypes.c_uint8)
    ptr = np.ctypeslib.ndpointer
    lib.voxelize_unique.restype = i64
    lib.voxelize_unique.argtypes = [
        ptr(np.float32, flags="C"), i64, i32, f32,
        ptr(np.int32, flags="C,W"), ptr(np.int32, flags="C,W")]
    lib.unique_coords.restype = i64
    lib.unique_coords.argtypes = [
        ptr(np.int32, flags="C"), i64, i32,
        ptr(np.int32, flags="C,W"), ptr(np.int32, flags="C,W")]
    lib.unique_coords_label.restype = i64
    lib.unique_coords_label.argtypes = [
        ptr(np.int32, flags="C"), ptr(np.int32, flags="C"), i64, i32, i32,
        ptr(np.int32, flags="C,W"), ptr(np.int32, flags="C,W"),
        ptr(np.int32, flags="C,W")]
    lib.morton_codes.restype = None
    lib.morton_codes.argtypes = [
        ptr(np.int32, flags="C"), i64, i32, i32, ptr(np.int32, flags="C,W")]
    lib.collate_batch.restype = i64
    lib.collate_batch.argtypes = [
        ptr(np.float32, flags="C"), ptr(np.int64, flags="C"), i32, i32, f32,
        i64, i32, ptr(np.int32, flags="C,W"), ptr(np.uint8, flags="C,W")]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def sparse_quantize(points: np.ndarray, quantization_size: float = 1.0,
                    return_inverse: bool = False):
    """Native `sparse_quantize` (reference `utils/quantization.py:136-332`):
    voxelize + first-occurrence unique.  Falls back to numpy."""
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    n, d = pts.shape
    if lib is None:
        from ..ops.coords import sparse_quantize_np

        out = sparse_quantize_np(pts, quantization_size,
                                 return_inverse=return_inverse)
        return out
    out_coords = np.empty((n, d), np.int32)
    inverse = np.empty((n,), np.int32)
    nu = lib.voxelize_unique(pts, n, d, float(quantization_size), out_coords,
                             inverse)
    coords = out_coords[:nu].copy()
    return (coords, inverse) if return_inverse else coords


def quantize_label(coords: np.ndarray, labels: np.ndarray,
                   invalid_label: int = -100):
    """Label-consensus unique (reference `utils/quantization.py:96-122`)."""
    lib = _load()
    c = np.ascontiguousarray(coords, np.int32)
    l = np.ascontiguousarray(labels, np.int32)
    n, d = c.shape
    if lib is None:
        uniq, index, inverse = np.unique(c, axis=0, return_index=True,
                                         return_inverse=True)
        order = np.argsort(index)
        rank = np.empty_like(order)
        rank[order] = np.arange(len(order))
        out_labels = np.full(len(uniq), 0, np.int32)
        seen = {}
        for i in range(n):
            u = inverse[i]
            if u in seen and seen[u] != l[i]:
                out_labels[u] = invalid_label
            else:
                if u not in seen:
                    out_labels[u] = l[i]
                seen[u] = l[i]
        return c[np.sort(index)], out_labels[np.argsort(rank)][rank[
            np.arange(len(uniq))]], rank[inverse]
    out_coords = np.empty((n, d), np.int32)
    out_labels = np.empty((n,), np.int32)
    inverse = np.empty((n,), np.int32)
    nu = lib.unique_coords_label(c, l, n, d, invalid_label, out_coords,
                                 out_labels, inverse)
    return out_coords[:nu].copy(), out_labels[:nu].copy(), inverse


def morton_codes(xyz: np.ndarray, stride: int = 1) -> np.ndarray:
    """Native twin of `ops.morton.morton_encode_np` (bit-identical)."""
    lib = _load()
    x = np.ascontiguousarray(xyz, np.int32)
    n, d = x.shape
    if lib is None:
        from ..ops.morton import morton_encode_np

        return morton_encode_np(x, stride)
    out = np.empty((n,), np.int32)
    lib.morton_codes(x, n, d, int(stride), out)
    return out


def collate_batch(point_list, quantization_size: float, capacity: int,
                  pad_value: int) -> Tuple[np.ndarray, np.ndarray]:
    """Fused voxelize+dedup+batch-index+pad of B clouds → (coords, valid)."""
    lib = _load()
    if lib is None:
        from ..ops.coords import (batched_coordinates_np, pad_to_capacity,
                                  sparse_quantize_np)

        vox = [sparse_quantize_np(np.asarray(p), quantization_size)
               for p in point_list]
        return pad_to_capacity(batched_coordinates_np(vox), capacity)
    pts = np.ascontiguousarray(np.concatenate(point_list, 0), np.float32)
    offsets = np.zeros(len(point_list) + 1, np.int64)
    np.cumsum([len(p) for p in point_list], out=offsets[1:])
    d = pts.shape[1]
    out_coords = np.empty((capacity, d + 1), np.int32)
    out_valid = np.empty((capacity,), np.uint8)
    lib.collate_batch(pts, offsets, len(point_list), d,
                      float(quantization_size), capacity, pad_value,
                      out_coords, out_valid)
    return out_coords, out_valid.astype(bool)
