"""API walk-through — the reference's demo scripts
(`examples/sparse_tensor_basic.py`, `examples/convolution.py`,
`examples/example.py`) in one file: tensor construction & quantization modes,
conv/transpose/generative growth, pooling/broadcast, pruning/union,
TensorField voxelize/slice/splat, dense round-trip.

Run:  python examples/api_demo.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# persistent compile cache + JAX_PLATFORMS re-apply (the sitecustomize pins
# the platform, so the env var alone is ignored)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import os as _os
if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu import nn as mnn


def main():
    rng = np.random.RandomState(0)

    # --- SparseTensor construction (sparse_tensor_basic.py) ------------
    pts = rng.rand(200, 3) * 16
    vox = mt.ops.sparse_quantize_np(pts, 1.0)
    coords = mt.ops.batched_coordinates_np([vox])
    cpad, valid = mt.ops.pad_to_capacity(coords, 256)
    feats = jnp.ones((256, 1)) * jnp.asarray(valid)[:, None]
    st = jax.jit(lambda c, v: mt.sparse_tensor(
        c, feats, capacity=256, valid=v, extent=(16,) * 3))(
        jnp.asarray(cpad), jnp.asarray(valid))
    print(f"voxelized {len(pts)} points -> {int(st.count())} voxels")
    print(mt.utils.capacity_report(st, names=["input"]))

    # --- convolution (convolution.py) -----------------------------------
    conv = mnn.SparseConv(8, kernel_size=3)
    params = jax.jit(conv.init)(jax.random.PRNGKey(0), st)
    out = jax.jit(conv.apply)(params, st)
    print("conv k3:", out.F.shape, "stride", out.tensor_stride)

    down = mnn.SparseConv(8, kernel_size=2, stride=2, out_capacity=64)
    pd = jax.jit(down.init)(jax.random.PRNGKey(1), out)
    mid = jax.jit(down.apply)(pd, out)
    print("strided conv:", int(mid.count()), "voxels at stride",
          mid.tensor_stride)

    up = mnn.GenerativeConvTranspose(4, out_capacity=512)
    pu = jax.jit(up.init)(jax.random.PRNGKey(2), mid)
    grown = jax.jit(up.apply)(pu, mid)
    print("generative transpose grew to", int(grown.count()), "voxels")

    # --- pruning (reconstruction.py pattern) ----------------------------
    keep = grown.features[:, 0] > 0
    grid, f = jax.jit(lambda g, f, k: mt.ops.prune(g, f, k))(
        grown.grid, grown.features, keep)
    pruned = mt.SparseTensor(grid=grid, features=f)
    print("pruned to", int(pruned.count()), "voxels")

    # --- global pool + broadcast (SELayer pattern) -----------------------
    g = mnn.global_pool_features(out, "avg")
    back = mnn.broadcast_op(out, g, "add")
    print("global avg pool:", g.shape, "broadcast back:", back.F.shape)

    # --- TensorField voxelize / slice / splat ----------------------------
    field = mt.TensorField(
        jnp.asarray(np.concatenate(
            [np.zeros((200, 1), np.float32), pts.astype(np.float32)], 1)),
        jnp.asarray(rng.randn(200, 4).astype(np.float32)),
        jnp.ones((200,), bool))
    stf, inverse = jax.jit(lambda f: f.sparse(capacity=256))(field)
    sliced = mt.slice_to_field(stf, field, inverse)
    print("field -> sparse:", int(stf.count()), "voxels; slice back:",
          sliced.F.shape)

    # --- dense round-trip -------------------------------------------------
    dense = jax.jit(lambda s: s.dense((16, 16, 16)))(st)
    st2 = jax.jit(lambda d: mt.to_sparse_dense(d, capacity=256))(dense)
    print("dense:", dense.shape, "-> sparse:", int(st2.count()), "voxels")

    print("API demo OK")


if __name__ == "__main__":
    main()
