"""DDIM scheduler with precomputed per-index tables.

Semantics match the reference DDIMScheduler
(/root/reference/trt_inference/utilities.py:370-529), the default serving
scheduler: scaled-linear betas, steps_offset=1, set_alpha_to_one=False
(final alpha = alphas_cumprod[0]), idx-indexed tables rebuilt whenever the
requested step count changes (reference inpaint_pipeline.py:39-50).

TPU design: `set_timesteps` precomputes numpy tables on host;
`scan_rows()` exposes them as stacked per-step rows for `lax.scan`; `step`
is pure jnp math that XLA fuses into the denoise loop program.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .base import Scheduler, alphas_cumprod_from_betas, leading_timesteps, scaled_linear_betas


class DDIMScheduler(Scheduler):
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        clip_sample: bool = False,
        set_alpha_to_one: bool = False,
        steps_offset: int = 1,
        prediction_type: str = "epsilon",
    ):
        self.num_train_timesteps = num_train_timesteps
        self.beta_start = beta_start
        self.beta_end = beta_end
        self.clip_sample = clip_sample
        self.steps_offset = steps_offset
        self.prediction_type = prediction_type
        self.init_noise_sigma = 1.0

        betas = scaled_linear_betas(num_train_timesteps, beta_start, beta_end)
        self._alphas_cumprod_full = alphas_cumprod_from_betas(betas)
        self.final_alpha_cumprod = (
            np.float32(1.0) if set_alpha_to_one else self._alphas_cumprod_full[0]
        )
        self.num_inference_steps = None

    def set_timesteps(self, num_inference_steps: int):
        n = int(num_inference_steps)
        self.num_inference_steps = n
        self.timesteps = leading_timesteps(self.num_train_timesteps, n, self.steps_offset)

        ac = self._alphas_cumprod_full
        # Per-index alpha tables (the reference's `configure()` gather).
        self.alpha_prod = ac[self.timesteps].astype(np.float32)
        # prev index = idx+1 (timesteps are descending); past the end -> final
        self.alpha_prod_prev = np.concatenate(
            [self.alpha_prod[1:], np.float32([self.final_alpha_cumprod])]
        ).astype(np.float32)

        # Variance table computed against the *full* schedule with
        # prev_timestep = t - N//n (reference `configure`/`_get_variance`).
        step_ratio = self.num_train_timesteps // n
        prev_t = self.timesteps - step_ratio
        alpha_t = ac[self.timesteps]
        alpha_prev = np.where(prev_t >= 0, ac[np.clip(prev_t, 0, None)], self.final_alpha_cumprod)
        self.variance = (
            ((1.0 - alpha_prev) / (1.0 - alpha_t)) * (1.0 - alpha_t / alpha_prev)
        ).astype(np.float32)
        return self

    def scan_rows(self):
        """Stacked per-step rows for lax.scan, all float32 length-n arrays."""
        return {
            "timestep": self.timesteps.astype(np.float32),
            "alpha_prod": self.alpha_prod,
            "alpha_prod_prev": self.alpha_prod_prev,
            "variance": self.variance,
        }

    def step(self, model_output, sample, row, state=None, noise=None,
             eta: float = 0.0):
        """One deterministic (eta=0) or stochastic DDIM update.

        Args:
            model_output: predicted noise (or v), same shape as sample.
            sample: current latents x_t.
            row: dict of per-step scalars from scan_rows().
            state: unused (DDIM is single-step); returned unchanged.
        """
        alpha_prod_t = row["alpha_prod"]
        alpha_prod_prev = row["alpha_prod_prev"]
        beta_prod_t = 1.0 - alpha_prod_t

        if self.prediction_type == "epsilon":
            pred_x0 = (sample - jnp.sqrt(beta_prod_t) * model_output) / jnp.sqrt(alpha_prod_t)
            eps = model_output
        elif self.prediction_type == "v_prediction":
            pred_x0 = jnp.sqrt(alpha_prod_t) * sample - jnp.sqrt(beta_prod_t) * model_output
            eps = jnp.sqrt(alpha_prod_t) * model_output + jnp.sqrt(beta_prod_t) * sample
        elif self.prediction_type == "sample":
            pred_x0 = model_output
            eps = (sample - jnp.sqrt(alpha_prod_t) * pred_x0) / jnp.sqrt(beta_prod_t)
        else:
            raise ValueError(f"unknown prediction_type {self.prediction_type}")

        if self.clip_sample:
            pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)

        std_dev_t = eta * jnp.sqrt(row["variance"])
        pred_dir = jnp.sqrt(1.0 - alpha_prod_prev - std_dev_t**2) * eps
        prev_sample = jnp.sqrt(alpha_prod_prev) * pred_x0 + pred_dir
        if eta > 0.0 and noise is not None:
            prev_sample = prev_sample + std_dev_t * noise
        return prev_sample, (state if state is not None else {})

    def add_noise(self, original, noise, idx: int):
        a = self.alpha_prod[idx]
        return jnp.sqrt(a) * original + jnp.sqrt(1.0 - a) * noise
