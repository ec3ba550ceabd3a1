"""Data pipeline: mesh sampling, voxelization, fixed-capacity collation."""

from .collate import collate_fields, collate_pointclouds, stack_devices
from .device_shapes import pack_voxels, procedural_batch, sample_shape
from .prefetch import PrefetchLoader
from .datasets import (
    ModelNet40Dataset,
    ObjaverseDataset,
    ProceduralShapes,
    ShapeNetDataset,
    SyntheticShapes,
    batch_iterator,
    load_obj,
    load_off,
)
from .mesh import (
    load_glb,
    normalize_to_resolution,
    point_budget,
    resample_mesh,
    resample_mesh_count,
    rotate_point_cloud,
)

__all__ = [
    "collate_fields", "collate_pointclouds", "stack_devices", "PrefetchLoader",
    "ModelNet40Dataset", "ObjaverseDataset", "ProceduralShapes",
    "ShapeNetDataset", "SyntheticShapes",
    "batch_iterator", "load_glb", "load_obj", "load_off", "normalize_to_resolution", "point_budget",
    "pack_voxels", "procedural_batch", "resample_mesh",
    "resample_mesh_count", "rotate_point_cloud", "sample_shape",
]
