"""Normalization layers over sparse tensors (flax.linen).

TPU-native re-design of `MinkowskiEngine/MinkowskiNormalization.py`.  All
statistics are *masked*: padding rows never contribute.  SyncBatchNorm is the
same module with ``axis_name`` set — statistics are `lax.pmean`-ed across the
data-parallel mesh axis, replacing the reference's
`MinkowskiSyncBatchNorm`/NCCL process-group sync
(`MinkowskiNormalization.py:105-195`).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import broadcast_batch, global_pool
from ..tensor import SparseTensor


class BatchNorm(nn.Module):
    """Masked BatchNorm over all valid rows (reference `MinkowskiBatchNorm`
    wraps `nn.BatchNorm1d` on `.F`, `MinkowskiNormalization.py:55-102`).

    Set ``axis_name`` to a mesh axis for SyncBN (`lax.pmean` of the batch
    statistics — `MinkowskiSyncBatchNorm` parity)."""

    momentum: float = 0.9
    eps: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: SparseTensor, train: bool = True) -> SparseTensor:
        c = x.num_channels
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), self.dtype))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), self.dtype))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            w = x.valid.astype(x.features.dtype)
            n = jnp.sum(w)
            s1 = jnp.sum(x.features * w[:, None], axis=0)
            s2 = jnp.sum(x.features ** 2 * w[:, None], axis=0)
            # cross-replica sync (SyncBN); skipped at init time, when the
            # module may be built outside the shard_map scope
            if self.axis_name is not None and not self.is_initializing():
                n = jax.lax.psum(n, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
            n = jnp.maximum(n, 1.0)
            mean = s1 / n
            var = jnp.maximum(s2 / n - mean ** 2, 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x.features - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return x.with_features(y)


def _instance_moments(x: SparseTensor):
    """Per-instance per-channel (mean, var) via masked segment reductions —
    the composition of global-avg-pool + broadcast the reference builds its
    instance norms from (`MinkowskiNormalization.py:198-314`)."""
    bid = x.grid.batch_ids()
    mean_b, _ = global_pool(x.features, bid, x.batch_size, x.valid, mode="avg")
    mean = broadcast_batch(mean_b, bid, x.valid)
    centered = (x.features - mean) * x.valid[:, None].astype(x.features.dtype)
    var_b, _ = global_pool(centered ** 2, bid, x.batch_size, x.valid, mode="avg")
    return mean_b, var_b, centered, bid


class InstanceNorm(nn.Module):
    """Per-instance normalization (reference `MinkowskiInstanceNorm`,
    `MinkowskiNormalization.py:480-518`)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: SparseTensor) -> SparseTensor:
        c = x.num_channels
        weight = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        _, var_b, centered, bid = _instance_moments(x)
        inv = jax.lax.rsqrt(var_b + self.eps)
        y = centered * broadcast_batch(inv, bid, x.valid)
        return x.with_features(y * weight + bias)


class StableInstanceNorm(nn.Module):
    """Fork-added group-averaged instance norm
    (`MinkowskiStableInstanceNorm`, `MinkowskiNormalization.py:317-402`):
    per-instance mean/var are averaged over channel groups of size ``group``
    and the affine has one (weight, bias) per group, repeat-interleaved back
    to C channels."""

    group: int = 1
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: SparseTensor) -> SparseTensor:
        c = x.num_channels
        g = min(self.group, c)
        assert c % g == 0, f"channels {c} not divisible by group {g}"
        ng = c // g
        weight = self.param("weight", nn.initializers.ones, (ng,))
        bias = self.param("bias", nn.initializers.zeros, (ng,))

        def group_avg(v):  # [B, C] → group-averaged, re-expanded [B, C]
            return jnp.repeat(v.reshape(-1, ng, g).mean(-1), g, axis=-1)

        bid = x.grid.batch_ids()
        mean_b, _ = global_pool(x.features, bid, x.batch_size, x.valid, "avg")
        mean_b = group_avg(mean_b)
        centered = (x.features - broadcast_batch(mean_b, bid, x.valid)) * \
            x.valid[:, None].astype(x.features.dtype)
        var_b, _ = global_pool(centered ** 2, bid, x.batch_size, x.valid, "avg")
        var_b = group_avg(var_b)
        # reference uses 1/sqrt(var + eps) without max-clamp
        inv = 1.0 / jnp.sqrt(var_b + self.eps)
        y = centered * broadcast_batch(inv, bid, x.valid)
        scale = jnp.repeat(weight, g)
        shift = jnp.repeat(bias, g)
        return x.with_features(y * scale + shift)


class StableGroupNorm(nn.Module):
    """Fork-added `MinkowskiStableGroupNorm`
    (`MinkowskiNormalization.py:405-478`): per-instance statistics averaged
    over *all* channels (group defaults to num_features), full per-channel
    affine."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: SparseTensor) -> SparseTensor:
        c = x.num_channels
        weight = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        bid = x.grid.batch_ids()
        mean_b, _ = global_pool(x.features, bid, x.batch_size, x.valid, "avg")
        mean_b = jnp.broadcast_to(mean_b.mean(-1, keepdims=True), mean_b.shape)
        centered = (x.features - broadcast_batch(mean_b, bid, x.valid)) * \
            x.valid[:, None].astype(x.features.dtype)
        var_b, _ = global_pool(centered ** 2, bid, x.batch_size, x.valid, "avg")
        var_b = jnp.broadcast_to(var_b.mean(-1, keepdims=True), var_b.shape)
        inv = 1.0 / jnp.sqrt(var_b + self.eps)
        y = centered * broadcast_batch(inv, bid, x.valid)
        return x.with_features(y * weight + bias)


class AdaStableInstanceNorm(nn.Module):
    """AdaIN conditioning (fork-added `AdaStableInstanceNorm`,
    `MinkowskiNormalization.py:546-620`): instance-normalize, then
    ``(x̂·w + b)·(1 + scale) + shift`` where (scale, shift) come from a linear
    projection of a per-instance conditioning embedding, indexed per voxel by
    the batch column."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: SparseTensor, emb: jnp.ndarray) -> SparseTensor:
        c = x.num_channels
        weight = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        proj = nn.Dense(2 * c,
                        kernel_init=nn.initializers.normal(0.01),
                        bias_init=nn.initializers.zeros)
        scale, shift = jnp.split(proj(emb), 2, axis=-1)  # [B, C] each

        _, var_b, centered, bid = _instance_moments(x)
        inv = 1.0 / jnp.sqrt(var_b + self.eps)
        y = centered * broadcast_batch(inv, bid, x.valid)
        y = y * weight + bias
        y = y * (1.0 + broadcast_batch(scale, bid, x.valid)) + \
            broadcast_batch(shift, bid, x.valid)
        return x.with_features(y)


class GroupNormDense(nn.Module):
    """Dense GroupNorm with per-group affine repeated to channels — the
    fork's `HjmGroupNorm` (`MinkowskiNormalization.py:624-711`), used by the
    dense 3D baselines.  Operates on channel-last dense arrays [..., C]."""

    num_groups: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        assert c % self.num_groups == 0
        gsz = c // self.num_groups
        weight = self.param("weight", nn.initializers.ones, (self.num_groups,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_groups,))
        shp = x.shape[:-1] + (self.num_groups, gsz)
        xg = x.reshape(shp)
        axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)
        mean = xg.mean(axis=axes, keepdims=True)
        var = xg.var(axis=axes, keepdims=True)
        y = (xg - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * weight[:, None] + bias[:, None]
        return y.reshape(x.shape)


class HjmInstanceNorm(nn.Module):
    """Fork's `HjmInstanceNorm` (`MinkowskiNormalization.py:520-544`):
    BatchNorm applied separately to each instance — per-instance masked
    mean/var normalize each instance's rows in train mode (shared BN
    affine), while eval mode uses the running stats for every row exactly
    like plain BN eval.

    The torch original loops instances in batch order and feeds each
    through the same `nn.BatchNorm1d`, so the running stats receive K
    sequential momentum updates per forward; we reproduce that ordered
    accumulation in closed form (weight ``(1-m)·m^(#present after i)`` per
    present instance), skipping empty instances like `np.unique` does.

    Note ``momentum=0.9`` here is the *decay* of the old running stat —
    the inverse of torch's ``momentum=0.1`` update-weight convention.
    Like torch BatchNorm1d, the running variance receives the
    Bessel-corrected (unbiased, n/(n-1)) per-instance variance while the
    normalization itself uses the biased one."""

    momentum: float = 0.9
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: SparseTensor, train: bool = True) -> SparseTensor:
        c = x.num_channels
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), self.dtype))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), self.dtype))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            bid = x.grid.batch_ids()
            mean_b, counts = global_pool(x.features, bid, x.batch_size,
                                         x.valid, "avg")
            centered = (x.features - broadcast_batch(mean_b, bid, x.valid)) \
                * x.valid[:, None].astype(x.features.dtype)
            var_b, _ = global_pool(centered ** 2, bid, x.batch_size,
                                   x.valid, "avg")
            inv = jax.lax.rsqrt(var_b + self.eps)
            y = centered * broadcast_batch(inv, bid, x.valid)
            if not self.is_initializing():
                m = self.momentum
                present = (counts > 0).astype(self.dtype)  # [B]
                # suffix count of present instances strictly after i
                after = (jnp.cumsum(present[::-1])[::-1] - present)
                w = (1.0 - m) * jnp.power(m, after) * present  # [B]
                ra_decay = jnp.power(m, jnp.sum(present))
                # torch updates running_var with the UNBIASED variance
                bessel = counts / jnp.maximum(counts - 1.0, 1.0)
                ra_mean.value = ra_decay * ra_mean.value + w @ mean_b
                ra_var.value = ra_decay * ra_var.value + \
                    w @ (var_b * bessel[:, None])
        else:
            y = (x.features - ra_mean.value) * \
                jax.lax.rsqrt(ra_var.value + self.eps)
        return x.with_features(y * scale + bias)
