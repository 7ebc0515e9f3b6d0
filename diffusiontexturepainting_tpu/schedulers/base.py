"""Scheduler base: precomputed per-step-index tables.

TPU-first design note. The reference implements five schedulers whose
`step()` takes a step *index* into precomputed tables
(/root/reference/trt_inference/utilities.py:267-1127) so the inner loop is
cheap math. That design is even more natural under XLA: every table is a
static numpy array baked into the jitted program, the denoise loop is a
`lax.scan` over stacked per-step rows, and `step()` is pure elementwise
math that XLA fuses into the surrounding UNet program. Nothing here is a
Module; schedulers are plain dataclass-like objects producing arrays.

The scalar-beta schedule is the "scaled_linear" SD schedule:
betas = linspace(beta_start^0.5, beta_end^0.5, N)^2.
"""

from __future__ import annotations

import numpy as np


def scaled_linear_betas(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.0001,
    beta_end: float = 0.02,
) -> np.ndarray:
    """float64 betas; tables are cast to float32 only at the very end so the
    cumulative product keeps full precision (the reference computes the
    cumprod in float32, but float64 here strictly reduces table error)."""
    return (
        np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64)
        ** 2
    )


def alphas_cumprod_from_betas(betas: np.ndarray) -> np.ndarray:
    return np.cumprod(1.0 - betas.astype(np.float64), axis=0)


def leading_timesteps(num_train_timesteps: int, num_inference_steps: int,
                      steps_offset: int = 1) -> np.ndarray:
    """Descending inference timesteps with the SD "leading" spacing.

    t_i = round(i * N/n) + steps_offset, reversed (reference
    utilities.py DDIMScheduler.set_timesteps).
    """
    step_ratio = num_train_timesteps // num_inference_steps
    timesteps = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].copy()
    return timesteps.astype(np.int64) + steps_offset


class Scheduler:
    """Common interface: precompute tables for a step count, expose
    per-index arrays for `lax.scan`, plus a functional `step`.

    Subclasses define:
      set_timesteps(n): (re)build tables
      scan_rows(): dict of stacked per-step float32 arrays (each of length
        num_iterations) to be scanned over, always including 'timestep'
      init_state(shape): pytree of carried multistep history (may be {})
      step(model_output, sample, row, state, noise=None)
        -> (prev_sample, new_state); `noise` is a fresh standard normal of
        sample's shape, only consumed when `stochastic` is True.

    The scan length is len(scan_rows()['timestep']) - PNDM runs n+1 model
    calls for n requested steps, everything else runs n.
    """

    order = 1  # number of model calls per scheduler step
    init_noise_sigma = 1.0
    stochastic = False  # needs per-step noise input

    def num_iterations(self) -> int:
        return len(self.scan_rows()["timestep"])

    def init_state(self, shape):
        return {}

    def scale_model_input(self, sample, row):
        """Scale UNet input (identity for DDIM/PNDM/DPM; sigma-scale for
        k-diffusion style schedulers)."""
        return sample

    def add_noise(self, original, noise, idx):
        raise NotImplementedError
