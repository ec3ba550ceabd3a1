"""Tensor-parallel parameter sharding over a 2-D (data, model) mesh.

The reference has no tensor parallelism (SURVEY.md §2.5) — its widest
layers (27·640·960 conv kernels, ~50 MB each in fp32) simply replicate per
GPU.  On TPU the idiomatic growth path is GSPMD: build a
``Mesh(("data", "model"))``, annotate the big parameters with
`NamedSharding`, and let XLA insert the all-gathers / reduce-scatters over
ICI (the scaling-book recipe — pick a mesh, annotate, let the partitioner
work).  No model code changes: sparse conv contractions are plain
`dot_general`s over the channel axes, which the SPMD partitioner splits on
the ``model`` axis like any dense matmul.

`shard_model_params` shards, per leaf:
  - `(K, Cin, Cout)` conv kernels on **Cout**,
  - `(Cin, Cout)` dense/linear kernels on **Cout**,
  - biases/norm scales stay replicated,
choosing replication whenever a dimension does not divide the axis size
(small layers are not worth splitting).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def dp_tp_mesh(n_data: int, n_model: int,
               devices: Optional[Any] = None) -> Mesh:
    """2-D ``(data, model)`` mesh.  Adjacent devices share the model axis so
    tensor-parallel collectives ride the fastest ICI links."""
    devs = np.asarray(devices if devices is not None
                      else jax.devices()[:n_data * n_model])
    return Mesh(devs.reshape(n_data, n_model), ("data", "model"))


def param_spec(leaf, n_model: int, min_dim: int = 2) -> P:
    """PartitionSpec for one parameter leaf (see module docstring)."""
    shape = leaf.shape
    if len(shape) == 3 and shape[0] > 1 and shape[2] % n_model == 0 \
            and shape[2] // n_model >= min_dim:
        return P(None, None, "model")  # (K, Cin, Cout) conv kernel
    if len(shape) == 2 and shape[1] % n_model == 0 \
            and shape[1] // n_model >= min_dim:
        return P(None, "model")  # dense kernel (in, out)
    return P()


def shard_model_params(variables, mesh: Mesh, min_dim: int = 2):
    """Commit a variables pytree to its tensor-parallel layout on `mesh`."""
    n_model = mesh.shape["model"]

    def put(leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, param_spec(leaf, n_model, min_dim)))

    return jax.tree.map(put, variables)


def param_shardings(variables, mesh: Mesh, min_dim: int = 2):
    """The matching shardings pytree (for `jax.jit` in_shardings /
    out_shardings so optimizer states keep the layout)."""
    n_model = mesh.shape["model"]
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh,
                                   param_spec(leaf, n_model, min_dim)),
        variables)
