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
    "softmin": lambda x: jax.nn.softmax(-x, axis=-1),
    "log_sigmoid": jax.nn.log_sigmoid,
    # shrink family (torch defaults: lambd=0.5)
    "hardshrink": lambda x: jnp.where(jnp.abs(x) > 0.5, x, 0.0),
    "softshrink": lambda x: jnp.sign(x) * jnp.maximum(jnp.abs(x) - 0.5, 0.0),
    "tanhshrink": lambda x: x - jnp.tanh(x),
}


def hardshrink(x, lambd: float = 0.5):
    """`torch.nn.Hardshrink` semantics (`MinkowskiHardshrink`)."""
    return jnp.where(jnp.abs(x) > lambd, x, jnp.zeros_like(x))


def softshrink(x, lambd: float = 0.5):
    """`torch.nn.Softshrink` semantics (`MinkowskiSoftshrink`)."""
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - lambd, 0.0)


def threshold(x, thresh: float, value: float):
    """`torch.nn.Threshold` semantics (`MinkowskiThreshold`)."""
    return jnp.where(x > thresh, x, jnp.full_like(x, value))


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


class PReLU(nn.Module):
    """`MinkowskiPReLU`: learnable negative slope, shared across channels by
    default (torch `num_parameters=1`, init 0.25); set
    ``num_parameters=C`` for per-channel slopes."""

    num_parameters: int = 1
    alpha_init: float = 0.25  # torch's `init` (that name shadows Module.init)

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha",
                       nn.initializers.constant(self.alpha_init),
                       (self.num_parameters,))
        f = x.features
        return x.with_features(jnp.where(f >= 0, f, f * a))


class RReLU(nn.Module):
    """`MinkowskiRReLU`: randomized leaky ReLU — per-element negative slope
    ~U[lower, upper] in training (needs an ``rrelu`` rng collection), fixed
    mean slope in eval (torch semantics)."""

    lower: float = 1.0 / 8.0
    upper: float = 1.0 / 3.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        f = x.features
        if deterministic:
            slope = (self.lower + self.upper) / 2.0
        else:
            slope = jax.random.uniform(self.make_rng("rrelu"), f.shape,
                                       f.dtype, self.lower, self.upper)
        return x.with_features(jnp.where(f >= 0, f, f * slope))


class AlphaDropout(nn.Module):
    """`MinkowskiAlphaDropout` (torch `nn.AlphaDropout`): SELU-compatible
    dropout — dropped units are set to the SELU saturation value and the
    output is affinely rescaled so mean/variance are preserved."""

    rate: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        f = x.features
        alpha_p = -1.7580993408473766  # -scale * alpha of SELU
        q = 1.0 - self.rate
        a = (q + alpha_p ** 2 * q * self.rate) ** -0.5
        b = -a * alpha_p * self.rate
        keep = jax.random.bernoulli(self.make_rng("dropout"), q, f.shape)
        return x.with_features(a * jnp.where(keep, f, alpha_p) + b)


class AdaptiveLogSoftmaxWithLoss(nn.Module):
    """`MinkowskiAdaptiveLogSoftmaxWithLoss` (torch
    `nn.AdaptiveLogSoftmaxWithLoss`): hierarchical softmax over frequency
    bands — the head scores the first-cutoff classes plus one bucket per
    tail cluster; each tail cluster is scored through a low-rank projection.
    Returns ``(per_row_logprob_of_target, mean_nll)`` like torch.

    TPU note: instead of torch's data-dependent index_select per cluster,
    every cluster's log-probs are computed densely for all rows and the
    target's band is selected with `jnp.where` — static shapes, no host
    sync, negligible cost at the module's intended "few hot clusters"
    scale."""

    in_features: int
    n_classes: int
    cutoffs: tuple = ()
    div_value: float = 4.0

    @nn.compact
    def __call__(self, x, target: jnp.ndarray):
        f = x.features if hasattr(x, "features") else x
        cutoffs = tuple(self.cutoffs) + (self.n_classes,)
        n_clusters = len(cutoffs) - 1
        head_size = cutoffs[0] + n_clusters
        head = nn.Dense(head_size, use_bias=False, name="head")(f)
        head_lp = jax.nn.log_softmax(head, axis=-1)

        # band 0: target < cutoffs[0] → head directly
        lp = jnp.take_along_axis(
            head_lp, jnp.clip(target, 0, cutoffs[0] - 1)[:, None], axis=-1
        )[:, 0]
        for i in range(n_clusters):
            lo, hi = cutoffs[i], cutoffs[i + 1]
            dim = max(int(self.in_features / (self.div_value ** (i + 1))), 1)
            h = nn.Dense(dim, use_bias=False, name=f"tail{i}_proj")(f)
            logits = nn.Dense(hi - lo, use_bias=False, name=f"tail{i}_out")(h)
            tail_lp = jax.nn.log_softmax(logits, axis=-1)
            cluster_lp = head_lp[:, cutoffs[0] + i]
            in_band = (target >= lo) & (target < hi)
            t_lp = jnp.take_along_axis(
                tail_lp, (jnp.clip(target, lo, hi - 1) - lo)[:, None], axis=-1
            )[:, 0]
            lp = jnp.where(in_band, cluster_lp + t_lp, lp)
        return lp, -jnp.mean(lp)
