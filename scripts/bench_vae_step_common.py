"""Shared workload fixture for the VAE train-step benchmarks."""

import numpy as np

import jax.numpy as jnp

import mink_octtree_stablediffusion_tpu as mt


def shell_cloud(rng, n, res):
    """Sphere-shell point cloud (ModelNet40-like surface occupancy)."""
    p = rng.randn(n, 3)
    p /= np.linalg.norm(p, axis=1, keepdims=True) + 1e-9
    r = res / 2 - 1.51
    v = np.unique(((p * r) + res / 2).astype(np.int32), axis=0)
    return np.clip(v, 0, res - 1)


def make_batch(rng, steps, b, cap, res, pts):
    """[steps, cap, 4] coords + [steps, cap] valid, distinct per step."""
    cs, vs = [], []
    for _ in range(steps):
        vox = [shell_cloud(rng, pts, res) for _ in range(b)]
        coords = mt.ops.batched_coordinates_np(vox)
        cpad, vpad = mt.ops.pad_to_capacity(coords, cap)
        cs.append(cpad)
        vs.append(vpad)
    # transfer per-step slices, stack on device: one big [steps, cap, 4]
    # host->device message can stall the remote tunnel at res-128 sizes
    return (jnp.stack([jnp.asarray(c) for c in cs]),
            jnp.stack([jnp.asarray(v) for v in vs]))
