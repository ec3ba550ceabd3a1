"""Mesh → point-cloud sampling (host-side numpy).

Re-implements the reference's `resample_mesh`
(`examples/reconstruction.py:81-144`, reused by `ae_res.py:143-214`):
barycentric face sampling proportional to face area (no open3d dependency —
plain numpy over (vertices, faces) arrays), plus the rotation augmentation
(`ae_res.py:282-309`) and the per-resolution point-count budget
(`ae_res.py:153-154`).
"""

from __future__ import annotations

import numpy as np


def face_areas(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    v0, v1, v2 = (vertices[faces[:, i]] for i in range(3))
    return 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)


def resample_mesh(vertices: np.ndarray, faces: np.ndarray, density: float = 1.0,
                  rng: np.random.RandomState | None = None) -> np.ndarray:
    """Sample ~density points per unit area via barycentric coordinates."""
    rng = rng or np.random.RandomState()
    areas = face_areas(vertices, faces)
    n_total = max(int(areas.sum() * density), 1)
    probs = areas / max(areas.sum(), 1e-12)
    counts = rng.multinomial(n_total, probs)
    face_idx = np.repeat(np.arange(len(faces)), counts)
    r1 = np.sqrt(rng.rand(len(face_idx), 1))
    r2 = rng.rand(len(face_idx), 1)
    a, b, c = (vertices[faces[face_idx, i]] for i in range(3))
    return (1 - r1) * a + r1 * (1 - r2) * b + r1 * r2 * c


def resample_mesh_count(vertices: np.ndarray, faces: np.ndarray, n: int,
                        rng: np.random.RandomState | None = None) -> np.ndarray:
    """Sample exactly n points area-uniformly."""
    rng = rng or np.random.RandomState()
    areas = face_areas(vertices, faces)
    probs = areas / max(areas.sum(), 1e-12)
    counts = rng.multinomial(n, probs)
    face_idx = np.repeat(np.arange(len(faces)), counts)
    r1 = np.sqrt(rng.rand(len(face_idx), 1))
    r2 = rng.rand(len(face_idx), 1)
    a, b, c = (vertices[faces[face_idx, i]] for i in range(3))
    return (1 - r1) * a + r1 * (1 - r2) * b + r1 * r2 * c


def normalize_to_resolution(xyz: np.ndarray, resolution: int) -> np.ndarray:
    """Scale/shift a cloud into [0, resolution) (the datasets' scaling,
    `ae_res.py:183-199`)."""
    lo, hi = xyz.min(0), xyz.max(0)
    scale = (resolution - 1.01) / max((hi - lo).max(), 1e-9)
    return (xyz - lo) * scale


def point_budget(resolution: int) -> tuple[int, int]:
    """(min, max) resample-reject point counts (`ae_res.py:153-154`)."""
    return (int(resolution ** 1.25 + 1000), int(resolution ** 2.4 + 50000))


def rotate_point_cloud(xyz: np.ndarray, rng: np.random.RandomState,
                       axis: str = "all") -> np.ndarray:
    """Random rotation augmentation (`ae_res.py:282-309`)."""
    def rot(theta, u):
        c, s = np.cos(theta), np.sin(theta)
        x, y, z = u
        return np.array([
            [c + x * x * (1 - c), x * y * (1 - c) - z * s, x * z * (1 - c) + y * s],
            [y * x * (1 - c) + z * s, c + y * y * (1 - c), y * z * (1 - c) - x * s],
            [z * x * (1 - c) - y * s, z * y * (1 - c) + x * s, c + z * z * (1 - c)],
        ])
    if axis == "z":
        m = rot(rng.uniform(0, 2 * np.pi), (0, 0, 1))
    else:
        m = (rot(rng.uniform(0, 2 * np.pi), (1, 0, 0))
             @ rot(rng.uniform(0, 2 * np.pi), (0, 1, 0))
             @ rot(rng.uniform(0, 2 * np.pi), (0, 0, 1)))
    center = xyz.mean(0)
    return (xyz - center) @ m.T + center


def load_glb(path: str):
    """Minimal GLB (glTF binary) mesh reader: positions + triangle indices of
    every mesh primitive, concatenated.  Covers the Objaverse dataset's GLB
    inputs (reference `examples/dataset.py:345-452`) without external mesh
    libraries."""
    import json as _json
    import struct as _struct

    with open(path, "rb") as f:
        magic, version, _length = _struct.unpack("<III", f.read(12))
        assert magic == 0x46546C67, "not a GLB file"
        data = f.read()
    # chunk 0: JSON, chunk 1: BIN
    off = 0
    gltf, bin_buf = None, None
    while off < len(data):
        clen, ctype = _struct.unpack_from("<II", data, off)
        chunk = data[off + 8: off + 8 + clen]
        if ctype == 0x4E4F534A:
            gltf = _json.loads(chunk.decode("utf-8"))
        elif ctype == 0x004E4942:
            bin_buf = chunk
        off += 8 + clen + (-clen) % 4

    def read_accessor(idx):
        acc = gltf["accessors"][idx]
        view = gltf["bufferViews"][acc["bufferView"]]
        start = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
        comp = {5120: np.int8, 5121: np.uint8, 5122: np.int16,
                5123: np.uint16, 5125: np.uint32, 5126: np.float32}[
            acc["componentType"]]
        ncomp = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4}[acc["type"]]
        count = acc["count"]
        stride = view.get("byteStride")
        itemsize = np.dtype(comp).itemsize * ncomp
        if stride and stride != itemsize:
            rows = [np.frombuffer(bin_buf, comp, ncomp, start + i * stride)
                    for i in range(count)]
            arr = np.stack(rows)
        else:
            arr = np.frombuffer(bin_buf, comp, count * ncomp, start).reshape(
                count, ncomp)
        return arr

    verts_all, faces_all, base = [], [], 0
    for mesh in gltf.get("meshes", []):
        for prim in mesh.get("primitives", []):
            if "POSITION" not in prim.get("attributes", {}):
                continue
            v = read_accessor(prim["attributes"]["POSITION"]).astype(
                np.float64)
            if "indices" in prim:
                idx = read_accessor(prim["indices"]).reshape(-1).astype(
                    np.int64)
            else:
                idx = np.arange(len(v), dtype=np.int64)
            mode = prim.get("mode", 4)
            if mode != 4:  # triangles only
                continue
            verts_all.append(v)
            faces_all.append(idx.reshape(-1, 3) + base)
            base += len(v)
    if not verts_all:
        raise ValueError(f"no triangle meshes in {path}")
    return np.concatenate(verts_all), np.concatenate(faces_all)
