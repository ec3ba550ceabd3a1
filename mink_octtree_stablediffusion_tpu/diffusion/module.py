"""Latent-diffusion training/sampling logic.

TPU-native re-design of the reference `diffusionModule`
(`examples/diffusion.py:286-658`): a frozen VAE encoder produces the latent,
features are noised with *per-instance* timesteps
(`diffusion.py:443-456`), the sparse UNet predicts ε (or x0 with SNR
weighting), plus an auxiliary Gaussian NLL on the latent coordinates with a
learnable (μ, Σ) (`diffusion.py:328-329,381-384`).  Sampling denoises pure
noise on a *fixed* latent coordinate set over a `lax.scan`
(`diffusion.py:597-629` — the reference also keeps latent coords fixed), then
the frozen VAE decoder re-grows geometry.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..tensor import SparseTensor
from .schedulers import DDIMScheduler, DDPMScheduler


class CoordNLLParams(NamedTuple):
    """Learnable (μ, Σ) of the latent-coordinate Gaussian
    (`diffusion.py:328-329`: noise_point_mu zeros(3), noise_point_sigma
    eye(3))."""

    mu: jnp.ndarray  # [D]
    sigma: jnp.ndarray  # [D, D]

    @classmethod
    def create(cls, ndim: int = 3) -> "CoordNLLParams":
        return cls(jnp.zeros((ndim,)), jnp.eye(ndim))


def coord_nll(params: CoordNLLParams, latent: SparseTensor,
              resolution: int) -> jnp.ndarray:
    """−mean log N(coords/resolution; μ, Σ) over valid rows
    (`diffusion.py:381-384`)."""
    d = latent.grid.ndim
    x = latent.C[:, 1:].astype(jnp.float32) / float(resolution)
    # symmetrize + jitter for a valid covariance under optimization
    sym = 0.5 * (params.sigma + params.sigma.T) + 1e-4 * jnp.eye(d)
    chol = jnp.linalg.cholesky(sym)
    diff = x - params.mu[None, :]
    sol = jax.scipy.linalg.solve_triangular(chol, diff.T, lower=True)
    maha = jnp.sum(sol ** 2, axis=0)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
    ll = -0.5 * (maha + logdet + d * np.log(2.0 * np.pi))
    v = latent.valid.astype(jnp.float32)
    return -jnp.sum(ll * v) / jnp.maximum(jnp.sum(v), 1.0)


def add_noise_per_instance(scheduler, latent: SparseTensor,
                           timesteps: jnp.ndarray, noise: jnp.ndarray
                           ) -> SparseTensor:
    """x_t with each batch instance carrying its own timestep
    (`diffusion.py:447-456`); rows index their instance's t via the batch
    column."""
    bid = jnp.clip(latent.grid.batch_ids(), 0, latent.batch_size - 1)
    row_t = timesteps[bid]
    noised = scheduler.add_noise(latent.features, noise, row_t)
    return latent.with_features(noised)


def denoise_loss(scheduler, model_output: SparseTensor, latent: SparseTensor,
                 noise: jnp.ndarray, timesteps: jnp.ndarray,
                 prediction_type: str = "epsilon") -> jnp.ndarray:
    """ε-prediction masked MSE (`diffusion.py:472-485`) or SNR-weighted
    sample-prediction (`diffusion.py:487-504`)."""
    v = model_output.valid.astype(jnp.float32)[:, None]
    if prediction_type == "epsilon":
        se = (model_output.features - noise) ** 2 * v
        return jnp.sum(se) / jnp.maximum(jnp.sum(v) * noise.shape[1], 1.0)
    if prediction_type == "v_prediction":
        bid = jnp.clip(latent.grid.batch_ids(), 0, latent.batch_size - 1)
        target = scheduler.get_velocity(latent.features, noise,
                                        timesteps[bid])
        se = (model_output.features - target) ** 2 * v
        return jnp.sum(se) / jnp.maximum(jnp.sum(v) * noise.shape[1], 1.0)
    # sample prediction: per-instance mean MSE weighted by SNR = ᾱ/(1−ᾱ)
    ac = scheduler.alphas_cumprod[timesteps]
    snr = ac / (1.0 - ac)
    bid = latent.grid.batch_ids()
    se = jnp.mean((model_output.features - latent.features) ** 2, axis=-1)
    se = se * model_output.valid.astype(se.dtype)
    num = jax.ops.segment_sum(se, bid, num_segments=latent.batch_size + 1)
    cnt = jax.ops.segment_sum(model_output.valid.astype(se.dtype), bid,
                              num_segments=latent.batch_size + 1)
    per_inst = num[:latent.batch_size] / jnp.maximum(
        cnt[:latent.batch_size], 1.0)
    return jnp.mean(snr * per_inst)


def diffusion_training_loss(
    unet_apply,
    scheduler,
    latent: SparseTensor,  # clean latent, already scaled by vae_scale
    rng: jax.Array,
    nll_params: Optional[CoordNLLParams] = None,
    resolution: int = 128,
    prediction_type: str = "epsilon",
    nll_weight: float = 0.01,
    encoder_hidden_state: Optional[jnp.ndarray] = None,
):
    """One training-loss evaluation (`diffusionModule.training_step`,
    `diffusion.py:361-508`).  ``unet_apply(noised, timesteps)`` closes over
    the UNet params so the caller controls differentiation."""
    r_t, r_n = jax.random.split(rng)
    timesteps = jax.random.randint(
        r_t, (latent.batch_size,), 0, scheduler.num_train_timesteps)
    noise = jax.random.normal(r_n, latent.features.shape,
                              latent.features.dtype)
    noised = add_noise_per_instance(scheduler, latent, timesteps, noise)
    model_output = unet_apply(noised, timesteps, encoder_hidden_state)
    loss = denoise_loss(scheduler, model_output, latent, noise, timesteps,
                        prediction_type)
    aux = {"denoise_loss": loss}
    if nll_params is not None:
        nll = coord_nll(nll_params, latent, resolution)
        aux["nll_loss"] = nll
        loss = loss + nll_weight * nll
    return loss, aux


def sample_latent(
    unet_apply,
    scheduler,
    latent_template: SparseTensor,  # defines the fixed coordinate set
    rng: jax.Array,
    num_inference_steps: int = 50,
    encoder_hidden_state: Optional[jnp.ndarray] = None,
    guidance_scale: float = 1.0,
    uncond_hidden_state: Optional[jnp.ndarray] = None,
    steps_offset: int = 0,
) -> SparseTensor:
    """Denoise pure N(0,1) features on a fixed latent grid with a whole-graph
    `lax.scan` (`diffusion.py:597-629`; SURVEY.md §3.4 — sampling never
    generates latent coordinates).

    Classifier-free guidance: with ``guidance_scale != 1`` and a conditioning
    ``encoder_hidden_state``, the UNet is evaluated twice per step (cond +
    uncond) and the outputs combined as
    ``uncond + scale·(cond − uncond)`` (the reference has no CFG — this is a
    standard extension; ``uncond_hidden_state`` defaults to zeros, the usual
    null-conditioning embedding)."""
    ts = jnp.asarray(
        scheduler.timestep_schedule(num_inference_steps, steps_offset))
    prev_ts = jnp.concatenate(
        [ts[1:], jnp.full((1,), -1, ts.dtype)])
    r0, rloop = jax.random.split(rng)
    x = jax.random.normal(r0, latent_template.features.shape,
                          latent_template.features.dtype)
    use_cfg = guidance_scale != 1.0 and encoder_hidden_state is not None
    if use_cfg and uncond_hidden_state is None:
        uncond_hidden_state = jnp.zeros_like(encoder_hidden_state)

    def body(carry, t_pair):
        x, key = carry
        t, pt = t_pair
        key, sub = jax.random.split(key)
        noised = latent_template.with_features(x)
        bsz = latent_template.batch_size
        t_b = jnp.full((bsz,), t)
        out = unet_apply(noised, t_b, encoder_hidden_state).features
        if use_cfg:
            out_uncond = unet_apply(noised, t_b, uncond_hidden_state).features
            out = out_uncond + guidance_scale * (out - out_uncond)
        step_noise = jax.random.normal(sub, x.shape, x.dtype)
        x = scheduler.step(out, t, pt, x, step_noise)
        return (x, key), None

    (x, _), _ = jax.lax.scan(body, (x, rloop), (ts, prev_ts))
    return latent_template.with_features(x)
