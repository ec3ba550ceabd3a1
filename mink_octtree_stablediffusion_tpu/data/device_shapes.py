"""Device-side procedural shape generation (jit/TPU-native streaming).

`ProceduralShapes` (datasets.py) generates parametric primitive surfaces
on the HOST with numpy — at res 128 a fresh batch costs ~2.75 s on this
1-core host against a ~0.75 s device step, so TRUE streaming training was
host-bound 3.7x (RESULTS.md r4).  The shapes are closed-form primitives,
so the TPU-first move is to synthesize them ON DEVICE: this module is a
pure-jnp re-expression of the same parametric family (per-axis aspect,
full SO(3) pose, class-specific parameters, class-preserving composite
unions — the diversity role of ModelNet40's meshes,
`/root/reference/examples/dataset.py:129-220`), ending in a batched
sort-based voxel dedup that emits the exact (coords, valid, feats)
padded-batch layout `collate_pointclouds` produces.

The whole generator jits and fuses with the train step: a streamed batch
costs device-milliseconds and ZERO host work / host->device transfer.
Distribution-equivalent to `ProceduralShapes` (same parameter ranges),
not bit-identical (jax.random vs np.random streams).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

CLASSES = ("sphere", "torus", "box", "cylinder")
_I32_MAX = jnp.iinfo(jnp.int32).max


def _sphere(key, n):
    ku, kv = jax.random.split(key)
    u = jax.random.uniform(ku, (n,))
    v = jax.random.uniform(kv, (n,))
    th = 2 * jnp.pi * u
    ph = jnp.arccos(jnp.clip(2 * v - 1, -1.0, 1.0))
    return jnp.stack([jnp.sin(ph) * jnp.cos(th),
                      jnp.sin(ph) * jnp.sin(th),
                      jnp.cos(ph)], -1)


def _torus(key, n):
    ku, kv, kr = jax.random.split(key, 3)
    u = jax.random.uniform(ku, (n,))
    v = jax.random.uniform(kv, (n,))
    r = jax.random.uniform(kr, (), minval=0.12, maxval=0.42)
    R = 1.0 - r
    th, ph = 2 * jnp.pi * u, 2 * jnp.pi * v
    return jnp.stack([(R + r * jnp.cos(ph)) * jnp.cos(th),
                      (R + r * jnp.cos(ph)) * jnp.sin(th),
                      r * jnp.sin(ph)], -1)


def _cylinder(key, n):
    ku, kv, kh, ks, kc = jax.random.split(key, 5)
    u = jax.random.uniform(ku, (n,))
    v = jax.random.uniform(kv, (n,))
    h = jax.random.uniform(kh, (), minval=0.5, maxval=1.3)
    th = 2 * jnp.pi * u
    # area-uniform side-vs-cap split as a per-point Bernoulli (the host
    # version splits the index range; the expected fractions match)
    p_side = 2 * h / (2 * h + 1)
    is_side = jax.random.uniform(kc, (n,)) < p_side
    side = jnp.stack([jnp.cos(th), jnp.sin(th), h * (2 * v - 1)], -1)
    rr = jnp.sqrt(v)
    sign = jax.random.randint(ks, (n,), 0, 2) * 2 - 1
    caps = jnp.stack([rr * jnp.cos(th), rr * jnp.sin(th),
                      sign.astype(jnp.float32) * h], -1)
    return jnp.where(is_side[:, None], side, caps)


def _box(key, n):
    kh, kf, kp = jax.random.split(key, 3)
    half = jax.random.uniform(kh, (3,), minval=0.5, maxval=1.0)
    areas = jnp.stack([half[1] * half[2], half[0] * half[2],
                       half[0] * half[1]])
    probs = jnp.repeat(areas / areas.sum() / 2.0, 2)
    face = jax.random.categorical(kf, jnp.log(probs), shape=(n,))
    ax = face // 2
    sign = ((face % 2) * 2 - 1).astype(jnp.float32)
    p = jax.random.uniform(kp, (n, 3)) * 2 - 1
    onehot = jax.nn.one_hot(ax, 3)
    p = p * (1 - onehot) + sign[:, None] * onehot
    return p * half[None, :]


_PRIMS = (_sphere, _torus, _box, _cylinder)  # CLASSES order


def _primitive(key, label, n):
    """One aspect-scaled, randomly-rotated primitive surface [n, 3]."""
    kp, ka, kq = jax.random.split(key, 3)
    p = jax.lax.switch(label, [partial(f, kp, n) for f in _PRIMS])
    p = p * jax.random.uniform(ka, (3,), minval=0.55, maxval=1.0)[None, :]
    q, _ = jnp.linalg.qr(jax.random.normal(kq, (3, 3)))
    q = q * jnp.where(jnp.linalg.det(q) < 0,
                      jnp.array([-1.0, 1.0, 1.0]),
                      jnp.ones(3))[None, :]
    return p @ q.T


def sample_shape(key, label, n, resolution, composite_prob=0.25):
    """One shape's surface cloud, normalized into [0, resolution)."""
    k1, k2, kc, kf, ks, kd, ko = jax.random.split(key, 7)
    a = _primitive(k1, label, n)
    b = _primitive(k2, label, n)
    composite = jax.random.uniform(kc, ()) < composite_prob
    frac = jax.random.uniform(kf, (), minval=0.6, maxval=0.8)
    scale = jax.random.uniform(ks, (), minval=0.35, maxval=0.65)
    direction = jax.random.normal(kd, (3,))
    direction = direction / jnp.maximum(jnp.linalg.norm(direction), 1e-9)
    offset = direction * jax.random.uniform(ko, (), minval=0.6, maxval=1.0)
    use_a = jnp.arange(n) < (frac * n).astype(jnp.int32)
    xyz = jnp.where((use_a | ~composite)[:, None], a, b * scale + offset)
    # normalize_to_resolution (mesh.py:50): scale/shift into [0, res)
    lo, hi = xyz.min(0), xyz.max(0)
    s = (resolution - 1.01) / jnp.maximum((hi - lo).max(), 1e-9)
    return (xyz - lo) * s


def pack_voxels(vox, resolution, capacity):
    """Batched voxel dedup + pad: [b, n, 3] int32 -> the
    `collate_pointclouds` layout (coords [cap,4], valid [cap],
    feats [cap,1]).

    Sort-based: flat keys (batch-major) -> sort -> first-occurrence mask
    -> re-sort with invalids at +inf -> take the first `capacity`.  If
    the unique count exceeds capacity the LARGEST keys (last batch
    entries) drop — size the capacity with headroom, as the host collate
    does."""
    b, n, _ = vox.shape
    assert b * resolution ** 3 < _I32_MAX, "flat key overflows int32"
    bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
    flat = vox.reshape(-1, 3)
    key_flat = (((bidx * resolution + flat[:, 0]) * resolution
                 + flat[:, 1]) * resolution + flat[:, 2])
    s = jnp.sort(key_flat)
    uniq = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    masked = jnp.where(uniq, s, _I32_MAX)
    s2 = jnp.sort(masked)
    if capacity <= s2.shape[0]:
        take = s2[:capacity]
    else:
        take = jnp.concatenate(
            [s2, jnp.full((capacity - s2.shape[0],), _I32_MAX, jnp.int32)])
    valid = take < _I32_MAX
    safe = jnp.where(valid, take, 0)
    z = safe % resolution
    y = (safe // resolution) % resolution
    x = (safe // (resolution * resolution)) % resolution
    bi = safe // (resolution ** 3)
    cpad = jnp.stack([bi, x, y, z], -1).astype(jnp.int32) * valid[:, None]
    feats = valid[:, None].astype(jnp.float32)
    return cpad, valid, feats


@partial(jax.jit, static_argnames=("batch_size", "points", "resolution",
                                   "capacity", "composite_prob"))
def procedural_batch(key, batch_size, points, resolution, capacity,
                     composite_prob=0.25, labels=None):
    """A fresh procedural batch, entirely on device.

    Returns (coords [capacity,4] i32, valid [capacity] bool,
    feats [capacity,1] f32, labels [batch_size] i32) — drop-in for the
    host `collate_pointclouds(ProceduralShapes...)` streaming path."""
    if labels is None:
        labels = jnp.arange(batch_size, dtype=jnp.int32) % len(CLASSES)
    keys = jax.random.split(key, batch_size)
    xyz = jax.vmap(
        lambda k, l: sample_shape(k, l, points, resolution,
                                  composite_prob))(keys, labels)
    vox = jnp.clip(jnp.floor(xyz), 0, resolution - 1).astype(jnp.int32)
    cpad, valid, feats = pack_voxels(vox, resolution, capacity)
    return cpad, valid, feats, labels
