"""mink_octtree_stablediffusion_tpu — a TPU-native sparse octree generative
framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
dreaming-huang/Mink-OctTree-StableDiffusion (a MinkowskiEngine v0.5.4 fork
with an octree VAE/VQ-VAE + sparse latent diffusion stack): generalized sparse
convolutions over COO voxel sets, octree growth/pruning, per-instance
attention/normalization, DDPM/DDIM latent diffusion — all as shape-static,
jit-compilable computations over fixed-capacity buffers, data-parallel via
jax.sharding meshes.
"""

__version__ = "0.1.0"

from . import config, data, diffusion, models, nn, ops, parallel, serve, tensor, train, utils
from .config import Algorithm, get_algorithm, set_algorithm
from .ops import SparseGrid
from .tensor import (
    SparseTensor,
    cat_slice,
    dense_coordinates,
    TensorField,
    cat,
    interpolate_at,
    slice_to_field,
    sparse_tensor,
    stack_mean,
    stack_sum,
    stack_var,
    to_sparse_dense,
)

__all__ = [
    "Algorithm", "config", "get_algorithm", "set_algorithm",
    "data", "diffusion", "models", "nn", "ops", "parallel", "tensor",
    "train", "SparseGrid",
    "SparseTensor", "TensorField",
    "cat", "cat_slice", "dense_coordinates", "interpolate_at", "slice_to_field", "sparse_tensor", "stack_mean",
    "stack_sum", "stack_var", "to_sparse_dense", "__version__",
]
