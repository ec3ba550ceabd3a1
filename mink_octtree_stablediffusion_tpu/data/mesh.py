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
