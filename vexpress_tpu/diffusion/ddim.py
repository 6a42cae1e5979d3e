"""DDIM scheduler, pure JAX/numpy, stateless.

Implements exactly the configuration V-Express uses at inference
(/root/reference/inference_v2.yaml:24-33): scaled_linear betas
[0.00085, 0.012], 1000 train steps, v-prediction, zero-terminal-SNR beta
rescale, trailing timestep spacing, steps_offset=1, clip_sample=False,
eta=0 — and at training (training_configs/stage_1.yaml noise_scheduler_kwargs,
train.py:274-282): epsilon or v-prediction with optional zero-SNR.

Unlike the torch scheduler this holds no mutable state: `timesteps(n)` is a
pure function and `step` takes everything it needs, so the whole denoise loop
jits.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    clip_sample: bool = False
    steps_offset: int = 1
    prediction_type: str = "v_prediction"
    rescale_betas_zero_snr: bool = True
    timestep_spacing: str = "trailing"
    set_alpha_to_one: bool = True


def _make_betas(config: SchedulerConfig) -> np.ndarray:
    n = config.num_train_timesteps
    if config.beta_schedule == "scaled_linear":
        betas = np.linspace(config.beta_start**0.5, config.beta_end**0.5, n, dtype=np.float64) ** 2
    elif config.beta_schedule == "linear":
        betas = np.linspace(config.beta_start, config.beta_end, n, dtype=np.float64)
    else:
        raise ValueError(f"unsupported beta_schedule: {config.beta_schedule}")
    return betas


def _rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Shi et al. 2023 (arXiv:2305.08891): rescale so alphas_cumprod[-1] == 0."""
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_bar_sqrt = np.sqrt(alphas_cumprod)

    alphas_bar_sqrt_0 = alphas_bar_sqrt[0].copy()
    alphas_bar_sqrt_t = alphas_bar_sqrt[-1].copy()
    alphas_bar_sqrt = alphas_bar_sqrt - alphas_bar_sqrt_t
    alphas_bar_sqrt = alphas_bar_sqrt * alphas_bar_sqrt_0 / (alphas_bar_sqrt_0 - alphas_bar_sqrt_t)

    alphas_bar = alphas_bar_sqrt**2
    alphas = alphas_bar[1:] / alphas_bar[:-1]
    alphas = np.concatenate([alphas_bar[0:1], alphas])
    return 1.0 - alphas


class DDIMScheduler:
    """Stateless DDIM. All schedule tables are host numpy; step math is jnp."""

    def __init__(self, config: Optional[SchedulerConfig] = None, **kwargs):
        if config is None:
            config = SchedulerConfig(**kwargs)
        elif kwargs:
            config = dataclasses.replace(config, **kwargs)
        self.config = config

        betas = _make_betas(config)
        if config.rescale_betas_zero_snr:
            betas = _rescale_zero_terminal_snr(betas)
        self.betas = betas.astype(np.float32)
        alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(alphas).astype(np.float32)
        self.final_alpha_cumprod = (
            np.float32(1.0) if config.set_alpha_to_one else self.alphas_cumprod[0]
        )
        self.init_noise_sigma = 1.0

    # ------------------------------------------------------------------ setup

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Inference timestep schedule (int64, descending)."""
        n = self.config.num_train_timesteps
        if num_inference_steps > n:
            raise ValueError(f"num_inference_steps {num_inference_steps} > {n}")
        spacing = self.config.timestep_spacing
        if spacing == "trailing":
            step_ratio = n / num_inference_steps
            ts = np.round(np.arange(n, 0, -step_ratio)).astype(np.int64) - 1
        elif spacing == "leading":
            step_ratio = n // num_inference_steps
            ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].copy()
            ts = ts.astype(np.int64) + self.config.steps_offset
        elif spacing == "linspace":
            ts = np.linspace(0, n - 1, num_inference_steps).round()[::-1].copy().astype(np.int64)
        else:
            raise ValueError(f"unsupported timestep_spacing: {spacing}")
        return ts

    def scale_model_input(self, sample: jax.Array, timestep=None) -> jax.Array:
        return sample

    # ------------------------------------------------------------------- step

    def _alpha_prod(self, t: jax.Array) -> jax.Array:
        table = jnp.asarray(self.alphas_cumprod)
        return table[t]

    def step(
        self,
        model_output: jax.Array,
        timestep: jax.Array,
        sample: jax.Array,
        num_inference_steps: int,
        eta: float = 0.0,
        noise_key: Optional[jax.Array] = None,
    ) -> jax.Array:
        """One DDIM step. `timestep` may be traced.

        eta=0 (the reference's inference setting) is deterministic; eta>0 adds
        the DDIM paper's (Song et al. 2020, eq. 12) stochastic term with
        sigma_t = eta * sqrt((1-a_prev)/(1-a_t)) * sqrt(1 - a_t/a_prev) and
        requires `noise_key`. Returns prev_sample. Math follows diffusers
        DDIMScheduler.step with clip_sample=False, thresholding off.
        """
        if eta != 0.0 and noise_key is None:
            raise ValueError("eta > 0 requires a noise_key (stochastic DDIM)")
        cfg = self.config
        timestep = jnp.asarray(timestep).astype(jnp.int32)
        prev_timestep = timestep - cfg.num_train_timesteps // num_inference_steps

        alpha_prod_t = self._alpha_prod(timestep)
        alpha_prod_prev = jnp.where(
            prev_timestep >= 0,
            self._alpha_prod(jnp.maximum(prev_timestep, 0)),
            jnp.asarray(self.final_alpha_cumprod),
        )
        beta_prod_t = 1.0 - alpha_prod_t

        dtype = sample.dtype
        sample32 = sample.astype(jnp.float32)
        model_output32 = model_output.astype(jnp.float32)
        sqrt_a = jnp.sqrt(alpha_prod_t)
        sqrt_b = jnp.sqrt(beta_prod_t)

        if cfg.prediction_type == "epsilon":
            pred_x0 = (sample32 - sqrt_b * model_output32) / jnp.maximum(sqrt_a, 1e-12)
            pred_eps = model_output32
        elif cfg.prediction_type == "v_prediction":
            pred_x0 = sqrt_a * sample32 - sqrt_b * model_output32
            pred_eps = sqrt_a * model_output32 + sqrt_b * sample32
        elif cfg.prediction_type == "sample":
            pred_x0 = model_output32
            pred_eps = (sample32 - sqrt_a * pred_x0) / jnp.maximum(sqrt_b, 1e-12)
        else:
            raise ValueError(f"unsupported prediction_type: {cfg.prediction_type}")

        if cfg.clip_sample:
            pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)

        if eta == 0.0:
            prev_sample = (jnp.sqrt(alpha_prod_prev) * pred_x0
                           + jnp.sqrt(1.0 - alpha_prod_prev) * pred_eps)
        else:
            # sigma_t per DDIM eq. 12 (equals diffusers _get_variance**0.5 * eta)
            variance = ((1.0 - alpha_prod_prev) / jnp.maximum(beta_prod_t, 1e-20)
                        * (1.0 - alpha_prod_t / alpha_prod_prev))
            sigma = eta * jnp.sqrt(jnp.maximum(variance, 0.0))
            dir_coeff = jnp.sqrt(jnp.maximum(1.0 - alpha_prod_prev - sigma**2, 0.0))
            noise = jax.random.normal(noise_key, sample32.shape, jnp.float32)
            prev_sample = (jnp.sqrt(alpha_prod_prev) * pred_x0
                           + dir_coeff * pred_eps + sigma * noise)
        return prev_sample.astype(dtype)

    # --------------------------------------------------------------- training

    def add_noise(self, original: jax.Array, noise: jax.Array, timesteps: jax.Array) -> jax.Array:
        a = self._alpha_prod(timesteps).astype(jnp.float32)
        while a.ndim < original.ndim:
            a = a[..., None]
        return (jnp.sqrt(a) * original.astype(jnp.float32) + jnp.sqrt(1 - a) * noise.astype(jnp.float32)).astype(
            original.dtype
        )

    def get_velocity(self, sample: jax.Array, noise: jax.Array, timesteps: jax.Array) -> jax.Array:
        a = self._alpha_prod(timesteps).astype(jnp.float32)
        while a.ndim < sample.ndim:
            a = a[..., None]
        return (jnp.sqrt(a) * noise.astype(jnp.float32) - jnp.sqrt(1 - a) * sample.astype(jnp.float32)).astype(
            sample.dtype
        )

    def snr(self, timesteps: jax.Array) -> jax.Array:
        """Signal-to-noise ratio per timestep (train.py:188-215 Min-SNR weighting)."""
        a = self._alpha_prod(timesteps).astype(jnp.float32)
        return a / jnp.maximum(1.0 - a, 1e-20)
