"""Euler-Ancestral scheduler, per-index tables.

Semantics match the reference EulerAncestralDiscreteScheduler
(utilities.py:532-646): SD scaled-linear betas (0.0001/0.02), linspace
float timesteps, sigmas interpolated onto them, per-step ancestral noise
with precomputed (dt, sigma_up) tables, and 1/sqrt(sigma^2+1) model-input
scaling.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .base import Scheduler, alphas_cumprod_from_betas, scaled_linear_betas


class EulerAncestralScheduler(Scheduler):
    stochastic = True

    def __init__(self, num_train_timesteps: int = 1000,
                 beta_start: float = 0.0001, beta_end: float = 0.02,
                 prediction_type: str = "epsilon"):
        self.num_train_timesteps = num_train_timesteps
        self.prediction_type = prediction_type
        ac = alphas_cumprod_from_betas(
            scaled_linear_betas(num_train_timesteps, beta_start, beta_end))
        self._sigmas_full = np.sqrt((1.0 - ac) / ac)
        self.num_inference_steps = None

    def set_timesteps(self, num_inference_steps: int):
        n = int(num_inference_steps)
        self.num_inference_steps = n
        timesteps = np.linspace(0, self.num_train_timesteps - 1, n,
                                dtype=np.float64)[::-1].copy()
        sigmas = np.interp(timesteps, np.arange(self.num_train_timesteps),
                           self._sigmas_full)
        sigmas = np.concatenate([sigmas, [0.0]])
        self.timesteps = timesteps.astype(np.float32)
        self.sigmas = sigmas.astype(np.float32)
        self.init_noise_sigma = float(sigmas.max())

        s_from, s_to = sigmas[:-1], sigmas[1:]
        sigma_up = np.sqrt(
            np.maximum(s_to**2 * (s_from**2 - s_to**2) / np.maximum(s_from**2, 1e-20), 0.0))
        sigma_down = np.sqrt(np.maximum(s_to**2 - sigma_up**2, 0.0))
        self.dts = (sigma_down - s_from).astype(np.float32)
        self.sigmas_up = sigma_up.astype(np.float32)
        return self

    def scan_rows(self):
        return {
            "timestep": self.timesteps,
            "sigma": self.sigmas[:-1].astype(np.float32),
            "dt": self.dts,
            "sigma_up": self.sigmas_up,
            "latent_scale": (1.0 / np.sqrt(self.sigmas[:-1] ** 2 + 1.0)).astype(np.float32),
        }

    def scale_model_input(self, sample, row):
        return sample * row["latent_scale"]

    def step(self, model_output, sample, row, state=None, noise=None):
        sigma = row["sigma"]
        if self.prediction_type == "epsilon":
            pred_x0 = sample - sigma * model_output
        elif self.prediction_type == "v_prediction":
            pred_x0 = (model_output * (-sigma / jnp.sqrt(sigma**2 + 1.0))
                       + sample / (sigma**2 + 1.0))
        else:
            raise ValueError(self.prediction_type)
        derivative = (sample - pred_x0) / sigma
        prev = sample + derivative * row["dt"]
        if noise is not None:
            prev = prev + noise * row["sigma_up"]
        return prev, (state if state is not None else {})

    def add_noise(self, original, noise, idx: int):
        return original + noise * self.sigmas[idx]
