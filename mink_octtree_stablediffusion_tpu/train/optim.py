"""Optimizers & LR schedules.

Parity with the reference's training recipes: Adam for the VAE
(`examples/ae_res.py:908-913`), AdamW + linear-warmup→cosine-annealing
`SequentialLR` for diffusion (`examples/diffusion.py:661-694`), gradient
clipping 0.5 (`examples/diffusion.py:834`).
"""

from __future__ import annotations

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


def diffusion_optimizer(base_lr: float = 1e-4, warmup_steps: int = 1000,
                        total_steps: int = 100_000, weight_decay: float = 1e-2,
                        clip_norm: float = 0.5) -> optax.GradientTransformation:
    """AdamW + warmup-cosine + grad-clip 0.5 (`diffusion.py:661-694,834`)."""
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(warmup_cosine(base_lr, warmup_steps, total_steps),
                    weight_decay=weight_decay),
    )
