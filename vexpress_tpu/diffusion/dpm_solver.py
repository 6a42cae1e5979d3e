"""DPM-Solver++ (2M) multistep scheduler, pure JAX, stateless-with-explicit-state.

Lu et al. 2022, "DPM-Solver++: Fast Solver for Guided Sampling of Diffusion
Probabilistic Models" (arXiv:2211.01095), algorithm 2 (the data-prediction
multistep variant, order 2) — the standard low-step sampler for SD-family
models. The reference pipeline imports diffusers' DPMSolverMultistepScheduler
but never instantiates it (only DDIM ships,
/root/reference/pipelines/v_express_pipeline.py:9-16, inference.py); this is
a beyond-parity extension: second-order accuracy means equal ODE-solution
error at roughly HALF the steps (measured on an analytic Gaussian oracle,
tests/test_dpm_solver.py: 25-step DPM++ ≈ 50-step DDIM, 50 ≈ 100), which
cuts the denoise-loop cost ~2x on the same checkpoints wherever the quality
target allows fewer steps.

Same schedule tables as `DDIMScheduler` (scaled_linear betas, optional
zero-terminal-SNR rescale, trailing spacing) so it drops into the V-Express
inference configuration unchanged. Unlike the torch scheduler there is no
mutable `self` state: the caller threads an explicit `state` pytree (the
previous step's x0 prediction) through the loop, so every step jits and the
scheduler object can be shared across concurrent denoise loops.

Notes vs diffusers' implementation:
- data-prediction formulation ("dpmsolver++"), final step lowered to first
  order (lower_order_final), no thresholding/clipping (SD latents).
- zero-terminal-SNR: alpha_bar[-1]==0 makes lambda(T) = -inf; like
  diffusers we clamp sigma via `lambda_min_clipped` on the t=T table entry.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ddim import DDIMScheduler, SchedulerConfig


class DpmState(NamedTuple):
    """Multistep history threaded through the denoise loop."""

    prev_x0: jax.Array  # x0 prediction at the previous model call
    has_prev: jax.Array  # scalar bool: prev_x0 is valid (step_index > 0)


class DPMSolverMultistepScheduler:
    """DPM-Solver++ (2M). Reuses DDIM's beta/alpha tables and timestep grid.

    Usage:
        sched = DPMSolverMultistepScheduler(**ddim_kwargs)
        ts = sched.timesteps(10)
        state = sched.init_state(latents)
        for i in range(len(ts)):
            pred = model(latents, ts[i])
            latents, state = sched.step(pred, i, ts, latents, state)
    """

    order = 2

    def __init__(self, config: Optional[SchedulerConfig] = None, **kwargs):
        self._ddim = DDIMScheduler(config, **kwargs)
        self.config = self._ddim.config
        self.init_noise_sigma = 1.0

    # ------------------------------------------------------------------ setup

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        return self._ddim.timesteps(num_inference_steps)

    def scale_model_input(self, sample: jax.Array, timestep=None) -> jax.Array:
        return sample

    def init_state(self, sample: jax.Array) -> DpmState:
        return DpmState(prev_x0=jnp.zeros_like(sample, dtype=jnp.float32),
                        has_prev=jnp.asarray(False))

    # ----------------------------------------------------------------- tables

    def _alpha_sigma_lambda(self, t: jax.Array):
        """Continuous-time parameterisation at discrete table index t:
        alpha_t = sqrt(alpha_bar), sigma_t = sqrt(1-alpha_bar),
        lambda_t = log(alpha_t/sigma_t). alpha_bar is clamped away from
        exact 0/1 so lambda stays finite under zero-terminal-SNR tables."""
        a_bar = jnp.clip(self._ddim._alpha_prod(t).astype(jnp.float32),
                         1e-8, 1.0 - 1e-8)
        alpha = jnp.sqrt(a_bar)
        sigma = jnp.sqrt(1.0 - a_bar)
        lam = jnp.log(alpha) - jnp.log(sigma)
        return alpha, sigma, lam

    def _pred_x0(self, model_output: jax.Array, t: jax.Array,
                 sample: jax.Array) -> jax.Array:
        """Convert the model output to the data prediction (x0)."""
        cfg = self.config
        a_bar = self._ddim._alpha_prod(t).astype(jnp.float32)
        sqrt_a = jnp.sqrt(a_bar)
        sqrt_b = jnp.sqrt(1.0 - a_bar)
        x = sample.astype(jnp.float32)
        out = model_output.astype(jnp.float32)
        if cfg.prediction_type == "epsilon":
            return (x - sqrt_b * out) / jnp.maximum(sqrt_a, 1e-12)
        if cfg.prediction_type == "v_prediction":
            return sqrt_a * x - sqrt_b * out
        if cfg.prediction_type == "sample":
            return out
        raise ValueError(f"unsupported prediction_type: {cfg.prediction_type}")

    # ------------------------------------------------------- traced step fn

    def build_step(self, num_inference_steps: int):
        """Build ONE traced step function covering every grid index — the
        per-step tables are baked as length-n constants and gathered by a
        traced `idx`, so the whole denoise loop reuses a single compiled
        program (the pipeline's per-mode jit pattern; a static-`step_index`
        jit per step would cost n remote compiles through the axon service).

        Returns `fn(model_output, idx, sample, prev_x0, has_prev) ->
        (prev_sample, new_prev_x0, new_has_prev)`; thread the last two
        outputs back in as the multistep state. Matches `step()` (tested).
        """
        ts = self.timesteps(num_inference_steps)
        n = len(ts)
        a_bar_raw = self._ddim.alphas_cumprod[ts].astype(np.float64)
        a_bar = np.clip(a_bar_raw, 1e-8, 1.0 - 1e-8)
        alpha = np.sqrt(a_bar)
        sigma = np.sqrt(1.0 - a_bar)
        lam = np.log(alpha) - np.log(sigma)
        # integration target: next grid point; after the last, the clean
        # endpoint (alpha=1, sigma=0, lambda=+inf) — there ratio==0 and
        # expm1(-inf)==-1 make the first-order update return x0 exactly,
        # mirroring step()'s lowered final step
        alpha_p = np.concatenate([alpha[1:], [1.0]])
        sigma_p = np.concatenate([sigma[1:], [0.0]])
        lam_p = np.concatenate([lam[1:], [np.inf]])
        h = lam_p - lam
        h_safe = np.where(np.isfinite(h), h, 1.0)
        h_last = np.concatenate([[1.0], lam[1:] - lam[:-1]])
        tables = dict(
            sqrt_a=np.sqrt(a_bar_raw),      # raw, as in _pred_x0
            sqrt_b=np.sqrt(1.0 - a_bar_raw),
            ratio=sigma_p / np.maximum(sigma, 1e-20),
            alpha_p=alpha_p,
            emh=np.expm1(-h),               # expm1(-inf) == -1 exactly
            emh_safe=np.expm1(-h_safe),
            inv_2r=h_safe / np.maximum(2.0 * h_last, 1e-20),  # 1/(2r), r=h_last/h
        )
        T = {k: jnp.asarray(v.astype(np.float32)) for k, v in tables.items()}
        pt = self.config.prediction_type
        if pt not in ("epsilon", "v_prediction", "sample"):
            raise ValueError(f"unsupported prediction_type: {pt}")

        def fn(model_output, idx, sample, prev_x0, has_prev):
            idx = jnp.asarray(idx).astype(jnp.int32)
            x = sample.astype(jnp.float32)
            out = model_output.astype(jnp.float32)
            sa, sb = T["sqrt_a"][idx], T["sqrt_b"][idx]
            if pt == "epsilon":
                x0 = (x - sb * out) / jnp.maximum(sa, 1e-12)
            elif pt == "v_prediction":
                x0 = sa * x - sb * out
            else:
                x0 = out
            base = T["ratio"][idx] * x
            first = base - T["alpha_p"][idx] * T["emh"][idx] * x0
            inv_2r = T["inv_2r"][idx]
            d = (1.0 + inv_2r) * x0 - inv_2r * prev_x0
            second = base - T["alpha_p"][idx] * T["emh_safe"][idx] * d
            use_second = has_prev & (idx > 0) & (idx < n - 1)
            prev = jnp.where(use_second, second, first)
            return (prev.astype(sample.dtype), x0,
                    jnp.ones((), dtype=bool))

        return fn

    # ------------------------------------------------------------------- step

    def step(
        self,
        model_output: jax.Array,
        step_index: int,
        timesteps: np.ndarray,
        sample: jax.Array,
        state: DpmState,
    ) -> tuple[jax.Array, DpmState]:
        """One DPM-Solver++(2M) step.

        `step_index` and `timesteps` (the full descending grid from
        `timesteps(n)`) are static Python values — each step_index traces its
        own tiny program, exactly like the per-step DDIM calls in the
        pipeline loops. Returns (prev_sample, new_state).
        """
        n = len(timesteps)
        t = jnp.asarray(int(timesteps[step_index])).astype(jnp.int32)
        # t_prev: next grid point, or the clean endpoint (index "-1" ==
        # alpha_bar -> 1) after the last step, mirroring DDIM's
        # final_alpha_cumprod handling
        last = step_index == n - 1

        dtype = sample.dtype
        x = sample.astype(jnp.float32)
        x0 = self._pred_x0(model_output, t, sample)

        _, sigma_t, lam_t = self._alpha_sigma_lambda(t)

        if last:
            # final step: sigma(prev) = 0 -> x_prev = x0 exactly (first order)
            prev = x0
            return prev.astype(dtype), DpmState(prev_x0=x0,
                                                has_prev=jnp.asarray(True))

        t_prev = jnp.asarray(int(timesteps[step_index + 1])).astype(jnp.int32)
        alpha_p, sigma_p, lam_p = self._alpha_sigma_lambda(t_prev)
        h = lam_p - lam_t

        # first-order (DPM-Solver++ 1S / DDIM-like) update toward t_prev
        ratio = sigma_p / jnp.maximum(sigma_t, 1e-20)
        first = ratio * x - alpha_p * jnp.expm1(-h) * x0

        if step_index == 0:
            prev = first
        else:
            # 2M: extrapolate x0 with the previous step's data prediction
            t_pp = jnp.asarray(int(timesteps[step_index - 1])).astype(jnp.int32)
            _, _, lam_pp = self._alpha_sigma_lambda(t_pp)
            h_last = lam_t - lam_pp
            r = h_last / h
            d = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * state.prev_x0
            second = ratio * x - alpha_p * jnp.expm1(-h) * d
            # guard against an invalid history (e.g. caller reset state)
            prev = jnp.where(state.has_prev, second, first)

        return prev.astype(dtype), DpmState(prev_x0=x0,
                                            has_prev=jnp.asarray(True))
