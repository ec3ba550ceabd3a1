"""PointNet baselines.

TPU-native re-design of `examples/pointnet.py:72-156`: the dense `PointNet`
(fixed points-per-cloud, pure MLP + max pool) and `MinkowskiPointNet`
(TensorField per-point MLPs + masked global max pool — arbitrary points per
instance).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import global_pool
from ..tensor import TensorField


class PointNet(nn.Module):
    """Dense PointNet (`pointnet.py:72-113`); input [B, N, 3]."""

    out_channel: int = 40
    embedding_channel: int = 1024

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 dropout_rng: jax.Array | None = None) -> jnp.ndarray:
        def cbr(h, ch, name):
            h = nn.Dense(ch, use_bias=False, name=f"{name}_fc")(h)
            h = nn.BatchNorm(use_running_average=not train,
                             name=f"{name}_bn")(h)
            return jax.nn.relu(h)

        h = cbr(x, 64, "c1")
        h = cbr(h, 64, "c2")
        h = cbr(h, 64, "c3")
        h = cbr(h, 128, "c4")
        h = cbr(h, self.embedding_channel, "c5")
        h = jnp.max(h, axis=1)
        h = cbr(h, 512, "l1")
        if train and dropout_rng is not None:
            h = nn.Dropout(0.5, deterministic=False)(h, rng=dropout_rng)
        return nn.Dense(self.out_channel, use_bias=True, name="l2")(h)


class MinkowskiPointNet(nn.Module):
    """TensorField PointNet (`pointnet.py:108-156`): per-point Linear-BN-ReLU
    stack, masked per-instance global max pool, MLP head."""

    out_channel: int = 40
    embedding_channel: int = 1024

    @nn.compact
    def __call__(self, field: TensorField, train: bool = True,
                 dropout_rng: jax.Array | None = None) -> jnp.ndarray:
        h = field.features
        v = field.valid

        def cbr(h, ch, name):
            h = nn.Dense(ch, use_bias=False, name=f"{name}_fc")(h)
            # masked batch norm over valid points
            w = v.astype(h.dtype)[:, None]
            n = jnp.maximum(jnp.sum(w), 1.0)
            mean = jnp.sum(h * w, 0) / n
            var = jnp.maximum(jnp.sum(h ** 2 * w, 0) / n - mean ** 2, 0.0)
            scale = self.param(f"{name}_scale", nn.initializers.ones,
                               (ch,))
            bias = self.param(f"{name}_bias", nn.initializers.zeros, (ch,))
            h = (h - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
            return jax.nn.relu(h)

        h = cbr(h, 64, "c1")
        h = cbr(h, 64, "c2")
        h = cbr(h, 64, "c3")
        h = cbr(h, 128, "c4")
        h = cbr(h, self.embedding_channel, "c5")
        bid = jnp.where(v, field.coordinates[:, 0].astype(jnp.int32),
                        field.batch_size)
        g, _ = global_pool(h, bid, field.batch_size, v, "max")
        g = nn.Dense(512, use_bias=False, name="l1_fc")(g)
        g = nn.BatchNorm(use_running_average=not train, name="l1_bn")(g)
        g = jax.nn.relu(g)
        if train and dropout_rng is not None:
            g = nn.Dropout(0.5, deterministic=False)(g, rng=dropout_rng)
        return nn.Dense(self.out_channel, use_bias=True, name="l2")(g)
