"""DDPM / DDIM schedulers, pure JAX.

The reference uses `diffusers.DDPMScheduler` with
``beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
variance_type="fixed_small", clip_sample=False`` (`examples/diffusion.py:300-307`)
and 50-step sampling (`:597-599`).  This module re-implements that math
natively (SURVEY.md §7.2 phase 7 requires independence from `diffusers`) with
static tables so the whole sampling loop runs under `lax.scan`.

Supported: beta schedules linear | scaled_linear | squaredcos_cap_v2;
prediction types epsilon | sample | v_prediction; DDIM eta=0 deterministic
sampling.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_betas(num_train_timesteps: int = 1000, beta_start: float = 0.00085,
               beta_end: float = 0.012, beta_schedule: str = "scaled_linear"
               ) -> np.ndarray:
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps,
                           dtype=np.float64)
    if beta_schedule == "scaled_linear":
        return np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                           num_train_timesteps, dtype=np.float64) ** 2
    if beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        ts = np.arange(num_train_timesteps, dtype=np.float64)
        return np.minimum(
            1 - alpha_bar((ts + 1) / num_train_timesteps) /
            alpha_bar(ts / num_train_timesteps), 0.999)
    raise ValueError(beta_schedule)


class DDPMScheduler(NamedTuple):
    """Static α/β tables; methods are pure functions of (state-free) tables."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    num_train_timesteps: int
    prediction_type: str
    clip_sample: bool
    variance_type: str

    @classmethod
    def create(cls, num_train_timesteps: int = 1000,
               beta_start: float = 0.00085, beta_end: float = 0.012,
               beta_schedule: str = "scaled_linear",
               prediction_type: str = "epsilon", clip_sample: bool = False,
               variance_type: str = "fixed_small") -> "DDPMScheduler":
        betas = make_betas(num_train_timesteps, beta_start, beta_end,
                           beta_schedule)
        ac = np.cumprod(1.0 - betas)
        return cls(jnp.asarray(betas, jnp.float32),
                   jnp.asarray(ac, jnp.float32), num_train_timesteps,
                   prediction_type, clip_sample, variance_type)

    def add_noise(self, original: jnp.ndarray, noise: jnp.ndarray,
                  timesteps: jnp.ndarray) -> jnp.ndarray:
        """x_t = sqrt(ᾱ_t)·x_0 + sqrt(1−ᾱ_t)·ε.  ``timesteps`` broadcasts
        against original's leading axis (per-row timesteps supported — the
        reference noises each batch instance with its own t,
        `diffusion.py:447-456`)."""
        ac = self.alphas_cumprod[timesteps]
        while ac.ndim < original.ndim:
            ac = ac[..., None]
        return jnp.sqrt(ac) * original + jnp.sqrt(1.0 - ac) * noise

    def get_velocity(self, sample: jnp.ndarray, noise: jnp.ndarray,
                     timesteps: jnp.ndarray) -> jnp.ndarray:
        ac = self.alphas_cumprod[timesteps]
        while ac.ndim < sample.ndim:
            ac = ac[..., None]
        return jnp.sqrt(ac) * noise - jnp.sqrt(1.0 - ac) * sample

    def _predict_x0_eps(self, model_output, sample, t):
        ac_t = self.alphas_cumprod[t]
        if self.prediction_type == "epsilon":
            x0 = (sample - jnp.sqrt(1.0 - ac_t) * model_output) / jnp.sqrt(ac_t)
            eps = model_output
        elif self.prediction_type == "sample":
            x0 = model_output
            eps = (sample - jnp.sqrt(ac_t) * x0) / jnp.sqrt(1.0 - ac_t)
        elif self.prediction_type == "v_prediction":
            x0 = jnp.sqrt(ac_t) * sample - jnp.sqrt(1.0 - ac_t) * model_output
            eps = jnp.sqrt(ac_t) * model_output + jnp.sqrt(1.0 - ac_t) * sample
        else:
            raise ValueError(self.prediction_type)
        if self.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0, eps

    def step(self, model_output: jnp.ndarray, t: jnp.ndarray,
             prev_t: jnp.ndarray, sample: jnp.ndarray, noise: jnp.ndarray
             ) -> jnp.ndarray:
        """One ancestral DDPM step t → prev_t (diffusers `DDPMScheduler.step`
        with fixed_small variance).  ``noise`` must be pre-sampled (pure fn);
        prev_t < 0 means final step (no noise added)."""
        ac_t = self.alphas_cumprod[t]
        ac_prev = jnp.where(prev_t >= 0,
                            self.alphas_cumprod[jnp.maximum(prev_t, 0)], 1.0)
        alpha_t = ac_t / ac_prev
        beta_t = 1.0 - alpha_t
        x0, _ = self._predict_x0_eps(model_output, sample, t)
        # μ = (√ᾱ_{t-1}·β_t)/(1−ᾱ_t)·x0 + (√α_t·(1−ᾱ_{t-1}))/(1−ᾱ_t)·x_t
        coef_x0 = jnp.sqrt(ac_prev) * beta_t / (1.0 - ac_t)
        coef_xt = jnp.sqrt(alpha_t) * (1.0 - ac_prev) / (1.0 - ac_t)
        mean = coef_x0 * x0 + coef_xt * sample
        if self.variance_type == "fixed_small":
            var = jnp.clip((1.0 - ac_prev) / (1.0 - ac_t) * beta_t, 1e-20)
        elif self.variance_type == "fixed_large":
            var = jnp.clip(beta_t, 1e-20)
        else:
            raise ValueError(self.variance_type)
        add = jnp.where(prev_t >= 0, jnp.sqrt(var), 0.0)
        return mean + add * noise

    def timestep_schedule(self, num_inference_steps: int,
                          steps_offset: int = 0) -> np.ndarray:
        """Evenly spaced descending timesteps (diffusers `set_timesteps`,
        "leading" spacing).  ``steps_offset`` shifts every timestep up by a
        constant (diffusers `steps_offset` config; Stable Diffusion pipelines
        use 1 so the final step lands on t=1 rather than t=0)."""
        step = self.num_train_timesteps // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step).round()[::-1].astype(
            np.int32) + steps_offset
        return np.clip(ts, 0, self.num_train_timesteps - 1).astype(np.int32)


class DDIMScheduler(NamedTuple):
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    num_train_timesteps: int
    prediction_type: str
    clip_sample: bool
    eta: float
    # diffusers `set_alpha_to_one`: ᾱ used for the final step (prev_t < 0).
    # True → 1.0 (x0 returned exactly); False → ᾱ_0 of the train schedule.
    final_alpha_cumprod: float = 1.0

    @classmethod
    def create(cls, num_train_timesteps: int = 1000,
               beta_start: float = 0.00085, beta_end: float = 0.012,
               beta_schedule: str = "scaled_linear",
               prediction_type: str = "epsilon", clip_sample: bool = False,
               eta: float = 0.0,
               set_alpha_to_one: bool = True) -> "DDIMScheduler":
        betas = make_betas(num_train_timesteps, beta_start, beta_end,
                           beta_schedule)
        ac = np.cumprod(1.0 - betas)
        final_ac = 1.0 if set_alpha_to_one else float(ac[0])
        return cls(jnp.asarray(betas, jnp.float32),
                   jnp.asarray(ac, jnp.float32), num_train_timesteps,
                   prediction_type, clip_sample, eta, final_ac)

    add_noise = DDPMScheduler.add_noise
    get_velocity = DDPMScheduler.get_velocity
    _predict_x0_eps = DDPMScheduler._predict_x0_eps
    timestep_schedule = DDPMScheduler.timestep_schedule

    def step(self, model_output: jnp.ndarray, t: jnp.ndarray,
             prev_t: jnp.ndarray, sample: jnp.ndarray,
             noise: jnp.ndarray | None = None) -> jnp.ndarray:
        """One DDIM step (deterministic for eta=0)."""
        ac_t = self.alphas_cumprod[t]
        ac_prev = jnp.where(prev_t >= 0,
                            self.alphas_cumprod[jnp.maximum(prev_t, 0)],
                            self.final_alpha_cumprod)
        x0, eps = self._predict_x0_eps(model_output, sample, t)
        if self.eta > 0.0:
            assert noise is not None
            sigma = self.eta * jnp.sqrt(
                (1.0 - ac_prev) / (1.0 - ac_t)) * jnp.sqrt(1.0 - ac_t / ac_prev)
        else:
            sigma = 0.0
        dir_xt = jnp.sqrt(jnp.clip(1.0 - ac_prev - sigma ** 2, 0.0)) * eps
        prev = jnp.sqrt(ac_prev) * x0 + dir_xt
        if self.eta > 0.0:
            prev = prev + sigma * noise
        return prev
