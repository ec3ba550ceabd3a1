"""Training harness: optimizers, train steps, checkpoint/resume."""

from .optim import diffusion_optimizer, vae_optimizer, warmup_cosine
from .trainer import (
    CheckpointManager,
    TrainState,
    make_dp_train_step,
    make_train_step,
    split_device_rngs,
)

__all__ = [
    "diffusion_optimizer", "vae_optimizer", "warmup_cosine",
    "CheckpointManager", "TrainState", "make_dp_train_step",
    "make_train_step", "split_device_rngs",
]
