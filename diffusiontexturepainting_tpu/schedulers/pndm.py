"""PNDM (PLMS) scheduler, per-index tables + explicit history state.

Semantics match the reference PNDMScheduler (utilities.py:1011-1127):
SD betas 0.00085/0.012, PRK steps skipped, the second timestep repeated
(so n requested steps run n+1 model calls), Adams-Bashforth blending of
the last <=4 epsilon predictions with the startup sequence
  call 0: plain epsilon (caches the sample)
  call 1: average with previous epsilon, re-stepping from the CACHED sample
  call 2: AB2; call 3: AB3; call >=4: AB4.

Scan design: the data-dependent `len(ets)`/`counter` branching becomes
precomputed per-index blend-weight rows and 0/1 flags, so the scan body is
branch-free; the epsilon history is a fixed (4, ...) newest-first stack in
carried state.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .base import Scheduler, alphas_cumprod_from_betas, scaled_linear_betas


class PNDMScheduler(Scheduler):
    def __init__(self, num_train_timesteps: int = 1000,
                 beta_start: float = 0.00085, beta_end: float = 0.012,
                 steps_offset: int = 0, prediction_type: str = "epsilon"):
        self.num_train_timesteps = num_train_timesteps
        self.steps_offset = steps_offset
        self.prediction_type = prediction_type
        self._ac = alphas_cumprod_from_betas(
            scaled_linear_betas(num_train_timesteps, beta_start, beta_end))
        self.final_alpha_cumprod = self._ac[0]
        self.init_noise_sigma = 1.0
        self.num_inference_steps = None

    def set_timesteps(self, num_inference_steps: int):
        n = int(num_inference_steps)
        self.num_inference_steps = n
        step_ratio = self.num_train_timesteps // n
        base = (np.arange(0, n) * step_ratio).round().astype(np.int64)
        base += self.steps_offset
        # skip PRK; repeat the second-to-last ascending entry
        plms = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1].copy()
        self.timesteps = plms

        ac, final = self._ac, self.final_alpha_cumprod
        ac_prev_full = np.roll(ac, step_ratio)
        ac_prev_full[:step_ratio] = final
        sample_coeff = np.sqrt(ac_prev_full / ac)
        beta_c = 1.0 - ac
        beta_c_prev = 1.0 - ac_prev_full
        denom = ac * np.sqrt(beta_c_prev) + np.sqrt(ac * beta_c * ac_prev_full)

        t = plms
        self.ac_idx = ac[t].astype(np.float32)
        self.beta_c_idx = beta_c[t].astype(np.float32)
        self.ac_prev_idx = ac_prev_full[t].astype(np.float32)
        self.sample_coeff_idx = sample_coeff[t].astype(np.float32)
        self.denom_idx = denom[t].astype(np.float32)

        # Per-call blend weights over [current_output, hist0..hist3]
        # (hist = newest-first stack AFTER the conditional push).
        iters = len(plms)
        W = np.zeros((iters, 5), dtype=np.float32)
        push = np.ones(iters, dtype=np.float32)
        use_cached = np.zeros(iters, dtype=np.float32)
        cache = np.zeros(iters, dtype=np.float32)
        cache[0] = 1.0  # iteration 0 caches its input sample
        for i in range(iters):
            if i == 0:
                W[i, 1] = 1.0  # just-pushed output
            elif i == 1:
                push[i] = 0.0
                use_cached[i] = 1.0
                W[i, 0] = 0.5
                W[i, 1] = 0.5
            elif i == 2:
                W[i, 1], W[i, 2] = 1.5, -0.5
            elif i == 3:
                W[i, 1], W[i, 2], W[i, 3] = 23 / 12, -16 / 12, 5 / 12
            else:
                W[i, 1:5] = np.array([55, -59, 37, -9]) / 24.0
        self.blend_weights = W
        self.push_flag = push
        self.use_cached_flag = use_cached
        self.cache_flag = cache
        return self

    def scan_rows(self):
        return {
            "timestep": self.timesteps.astype(np.float32),
            "ac": self.ac_idx,
            "beta_c": self.beta_c_idx,
            "ac_prev": self.ac_prev_idx,
            "sample_coeff": self.sample_coeff_idx,
            "denom": self.denom_idx,
            "w": self.blend_weights,
            "push": self.push_flag,
            "use_cached": self.use_cached_flag,
            "cache": self.cache_flag,
        }

    def init_state(self, shape):
        return {
            "ets": jnp.zeros((4,) + tuple(shape), jnp.float32),
            "cached_sample": jnp.zeros(shape, jnp.float32),
        }

    def step(self, model_output, sample, row, state, noise=None):
        push = row["push"]
        pushed = jnp.concatenate(
            [model_output[None], state["ets"][:-1]], axis=0)
        ets = push * pushed + (1.0 - push) * state["ets"]

        w = row["w"]
        eff = w[0] * model_output + jnp.tensordot(w[1:], ets, axes=1)

        # Cached-sample substitution BEFORE the v-prediction conversion:
        # the reference assigns `sample = self.cur_sample` on the repeated
        # (counter==1) call ahead of the conversion (utilities.py:
        # 1095-1098 then 1106-1107), so the conversion's sample term must
        # use the cached pre-step-0 latents too, not just the x_prev term.
        s = (row["use_cached"] * state["cached_sample"]
             + (1.0 - row["use_cached"]) * sample)

        if self.prediction_type == "v_prediction":
            eff = jnp.sqrt(row["ac"]) * eff + jnp.sqrt(row["beta_c"]) * s
        elif self.prediction_type != "epsilon":
            raise ValueError(self.prediction_type)

        prev = (row["sample_coeff"] * s
                - (row["ac_prev"] - row["ac"]) * eff / row["denom"])

        cached = (row["cache"] * sample
                  + (1.0 - row["cache"]) * state["cached_sample"])
        return prev, {"ets": ets, "cached_sample": cached}

    def add_noise(self, original, noise, idx: int):
        a = self.ac_idx[idx]
        return jnp.sqrt(a) * original + jnp.sqrt(1.0 - a) * noise
