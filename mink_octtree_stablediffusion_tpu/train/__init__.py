"""Training harness: optimizers, train steps, checkpoint/resume."""

from .optim import (
    adafactor_diffusion_optimizer,
    cast_params,
    diffusion_optimizer,
    mixed_precision_params,
    vae_optimizer,
    warmup_cosine,
)
from .trainer import (
    CheckpointManager,
    TrainState,
    make_dp_train_step,
    make_train_step,
    split_device_rngs,
)

__all__ = [
    "adafactor_diffusion_optimizer",
    "cast_params", "diffusion_optimizer", "mixed_precision_params",
    "vae_optimizer", "warmup_cosine",
    "CheckpointManager", "TrainState", "make_dp_train_step",
    "make_train_step", "split_device_rngs",
]
