"""Optimizers & LR schedules.

Parity with the reference's training recipes: Adam for the VAE
(`examples/ae_res.py:908-913`), AdamW + linear-warmup→cosine-annealing
`SequentialLR` for diffusion (`examples/diffusion.py:661-694`), gradient
clipping 0.5 (`examples/diffusion.py:834`).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


def warmup_cosine(base_lr: float, warmup_steps: int, total_steps: int,
                  final_scale: float = 0.0) -> optax.Schedule:
    """Linear warmup → cosine annealing (`diffusion.py:661-694`)."""
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, base_lr, max(warmup_steps, 1)),
            optax.cosine_decay_schedule(
                base_lr, max(total_steps - warmup_steps, 1),
                alpha=final_scale),
        ],
        [warmup_steps],
    )


def vae_optimizer(lr: float = 1e-3) -> optax.GradientTransformation:
    """Adam (`ae_res.py:908-913`)."""
    return optax.adam(lr)


def cast_params(params, dtype=jnp.bfloat16):
    """Cast the float leaves of a params tree to ``dtype`` (ints untouched).

    Use together with `mixed_precision_params` to switch a model to bf16
    parameter *storage* — prefer ``TrainState.create_mixed_precision(params,
    bs, mixed_precision_params(tx))``, which seeds the fp32 master from the
    ORIGINAL params and only rounds the live copy (calling
    ``create(cast_params(params), ...)`` instead would lose the fp32
    initialization precision once at setup)."""
    return jax.tree.map(
        lambda p: p.astype(dtype)
        if jnp.issubdtype(jnp.asarray(p).dtype, jnp.floating) else p, params)


class MixedPrecisionParamsState(NamedTuple):
    master: Any  # fp32 master copy of the float params
    inner: Any  # inner optimizer state (built over the master)


def mixed_precision_params(
        inner: optax.GradientTransformation,
        master_dtype=jnp.float32) -> optax.GradientTransformation:
    """Half-precision parameter storage with a full-precision master copy.

    The live params tree stays in bf16 (cast it once with `cast_params`),
    so every jitted step reads half-width weights with NO per-step
    fp32→bf16 weight casts — on the reference-size UNet those casts are
    ~40% of the device step (one ~0.14 ms `convert_element_type` per k=27
    conv per direction; see docs/DESIGN.md §7).  The fp32 master rides in
    the optimizer state: `inner` (Adam/AdamW/…) runs entirely on the
    master with fp32-upcast gradients, so sub-bf16-ulp updates accumulate
    instead of rounding away.  The emitted update is ``new_master −
    upcast(params)``; `optax.apply_updates` adds it in fp32 and casts back
    to the param dtype, so the live params are always
    ``round(master)`` exactly.

    Weight decay note: `optax.adamw` inside sees the MASTER params —
    decay is applied at full precision, matching fp32 training.
    """

    def _is_float(p):
        return jnp.issubdtype(jnp.asarray(p).dtype, jnp.floating)

    def init(params):
        master = jax.tree.map(
            lambda p: p.astype(master_dtype) if _is_float(p) else p, params)
        return MixedPrecisionParamsState(master=master,
                                         inner=inner.init(master))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError(
                "mixed_precision_params requires the params argument")
        g = jax.tree.map(
            lambda u: u.astype(master_dtype) if _is_float(u) else u, updates)
        inner_updates, inner_state = inner.update(g, state.inner,
                                                  state.master)
        new_master = optax.apply_updates(state.master, inner_updates)
        emitted = jax.tree.map(
            lambda m, p: (m - p.astype(master_dtype)) if _is_float(p)
            else jnp.zeros_like(p), new_master, params)
        return emitted, MixedPrecisionParamsState(master=new_master,
                                                  inner=inner_state)

    return optax.GradientTransformation(init, update)


def diffusion_optimizer(base_lr: float = 1e-4, warmup_steps: int = 1000,
                        total_steps: int = 100_000, weight_decay: float = 1e-2,
                        clip_norm: float = 0.5) -> optax.GradientTransformation:
    """AdamW + warmup-cosine + grad-clip 0.5 (`diffusion.py:661-694,834`)."""
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(warmup_cosine(base_lr, warmup_steps, total_steps),
                    weight_decay=weight_decay),
    )


def adafactor_diffusion_optimizer(
        base_lr: float = 1e-4, warmup_steps: int = 1000,
        total_steps: int = 100_000,
        clip_norm: float = 0.5) -> optax.GradientTransformation:
    """Memory-lean recipe for the reference-width (~1B param) UNet on one
    chip: Adafactor's factored second moments replace Adam's per-param
    m/v (16 GB of state at 1B params — more than a v5e's HBM), keeping the
    same warmup-cosine schedule + grad clip as `diffusion_optimizer`."""
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adafactor(
            learning_rate=warmup_cosine(base_lr, warmup_steps, total_steps),
            multiply_by_parameter_scale=False, clipping_threshold=None,
            momentum=None),
    )
