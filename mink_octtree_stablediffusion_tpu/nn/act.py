"""Activations on sparse tensors.

The reference wraps every `torch.nn` activation to act on `.F`
(`MinkowskiNonlinearity.py:34-174`); here a single :func:`apply_fn` plus thin
named wrappers do the same on the features array while preserving the padding
invariant.  Includes the fork's `MinkowskiSinusoidal`
(`MinkowskiNonlinearity.py:175-200`).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

_ACTS: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "elu": jax.nn.elu,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "celu": jax.nn.celu,
    "selu": jax.nn.selu,
    "leaky_relu": jax.nn.leaky_relu,
    "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
    "sigmoid": jax.nn.sigmoid,
    "hardsigmoid": jax.nn.hard_sigmoid,
    "tanh": jnp.tanh,
    "hardtanh": lambda x: jnp.clip(x, -1.0, 1.0),
    "softplus": jax.nn.softplus,
    "softsign": jax.nn.soft_sign,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "hardswish": jax.nn.hard_swish,
    "softmax": lambda x: jax.nn.softmax(x, axis=-1),
    "log_softmax": lambda x: jax.nn.log_softmax(x, axis=-1),
}


def get_act(name: str) -> Callable:
    """Named activation lookup — the reference's `get_ME_act`."""
    return _ACTS[name]


def apply_fn(x, fn: Callable):
    """Apply an elementwise function to features (SparseTensor/TensorField)."""
    return x.with_features(fn(x.features))


def relu(x):
    return apply_fn(x, jax.nn.relu)


def elu(x):
    return apply_fn(x, jax.nn.elu)


def silu(x):
    return apply_fn(x, jax.nn.silu)


def gelu(x):
    return apply_fn(x, jax.nn.gelu)


def sigmoid(x):
    return apply_fn(x, jax.nn.sigmoid)


def tanh(x):
    return apply_fn(x, jnp.tanh)


def softmax(x):
    return apply_fn(x, lambda f: jax.nn.softmax(f, axis=-1))


class Dropout(nn.Module):
    """Feature dropout (reference `MinkowskiDropout`)."""

    rate: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        drop = nn.Dropout(self.rate, deterministic=deterministic)
        return x.with_features(drop(x.features))


class Sinusoidal(nn.Module):
    """`MinkowskiSinusoidal`: ``cos(x W + b) @ coef`` feature map
    (`MinkowskiNonlinearity.py:175-200`)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        c = self.out_channels
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.features.shape[-1], c))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        coef = self.param("coef", nn.initializers.lecun_normal(), (c, c))
        return x.with_features(jnp.cos(x.features @ kernel + bias) @ coef)
