"""Diffusion stack: native DDPM/DDIM schedulers + latent-diffusion logic."""

from .module import (
    CoordNLLParams,
    add_noise_per_instance,
    coord_nll,
    denoise_loss,
    diffusion_training_loss,
    sample_latent,
)
from .noise_points import inject_noise_points
from .schedulers import DDIMScheduler, DDPMScheduler, make_betas

__all__ = [
    "CoordNLLParams", "add_noise_per_instance", "coord_nll", "denoise_loss",
    "diffusion_training_loss", "sample_latent", "inject_noise_points",
    "DDIMScheduler",
    "DDPMScheduler", "make_betas",
]
