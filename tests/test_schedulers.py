"""Scheduler table/step parity tests.

Oracle: an independent numpy transcription of the published DDIM update
equations with the SD scaled-linear schedule, leading timestep spacing
(steps_offset=1) and final_alpha = alphas_cumprod[0] — the exact operating
point of the reference server (utilities.py:370-529). We simulate a full
denoise trajectory with a deterministic fake "model" and require exact
agreement, plus table-level invariants.
"""

import numpy as np
import pytest

from diffusiontexturepainting_tpu.schedulers.ddim import DDIMScheduler


def _oracle_tables(n, N=1000, beta_start=1e-4, beta_end=0.02):
    betas = np.linspace(beta_start**0.5, beta_end**0.5, N, dtype=np.float64) ** 2
    ac = np.cumprod(1 - betas)
    ratio = N // n
    ts = (np.arange(n) * ratio).round()[::-1].astype(np.int64) + 1
    final = ac[0]
    return betas, ac, ts, final


@pytest.mark.parametrize("n", [4, 20, 50])
def test_ddim_tables(n):
    sched = DDIMScheduler().set_timesteps(n)
    _, ac, ts, final = _oracle_tables(n)

    np.testing.assert_array_equal(sched.timesteps, ts)
    np.testing.assert_allclose(sched.alpha_prod, ac[ts], rtol=1e-6)
    expected_prev = np.concatenate([ac[ts][1:], [final]])
    np.testing.assert_allclose(sched.alpha_prod_prev, expected_prev, rtol=1e-6)

    # variance vs full-schedule prev timestep
    prev_t = ts - (1000 // n)
    a_t = ac[ts]
    a_prev = np.where(prev_t >= 0, ac[np.clip(prev_t, 0, None)], final)
    var = ((1 - a_prev) / (1 - a_t)) * (1 - a_t / a_prev)
    np.testing.assert_allclose(sched.variance, var, rtol=1e-5)


@pytest.mark.parametrize("n", [4, 20])
def test_ddim_trajectory_matches_oracle(n):
    """Full eta=0 epsilon-pred trajectory with a deterministic fake model."""
    sched = DDIMScheduler().set_timesteps(n)
    rows = sched.scan_rows()
    _, ac, ts, final = _oracle_tables(n)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    x_ref = x.copy().astype(np.float64)

    def fake_model(sample, t):
        # arbitrary but deterministic epsilon prediction
        return 0.1 * sample + 0.01 * np.float64(t) / 1000.0

    for i in range(n):
        row = {k: v[i] for k, v in rows.items()}
        eps = fake_model(np.asarray(x, np.float32), rows["timestep"][i])
        x, _ = sched.step(eps.astype(np.float32), x, row)
        x = np.asarray(x)

        # oracle update (float64)
        a_t = ac[ts[i]]
        a_prev = ac[ts[i + 1]] if i + 1 < n else final
        eps_ref = fake_model(x_ref, float(ts[i]))
        x0 = (x_ref - np.sqrt(1 - a_t) * eps_ref) / np.sqrt(a_t)
        x_ref = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps_ref

    np.testing.assert_allclose(x, x_ref, rtol=2e-4, atol=2e-4)


def test_ddim_add_noise():
    sched = DDIMScheduler().set_timesteps(10)
    x = np.ones((2, 4, 4, 1), np.float32)
    noise = np.full_like(x, 0.5)
    out = np.asarray(sched.add_noise(x, noise, 0))
    a = sched.alpha_prod[0]
    np.testing.assert_allclose(out, np.sqrt(a) * 1.0 + np.sqrt(1 - a) * 0.5, rtol=1e-6)


def test_ddim_v_prediction_consistency():
    """v-pred and epsilon-pred agree when v is derived from the same eps."""
    n = 8
    s_eps = DDIMScheduler(prediction_type="epsilon").set_timesteps(n)
    s_v = DDIMScheduler(prediction_type="v_prediction").set_timesteps(n)
    rows = s_eps.scan_rows()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    eps = rng.standard_normal(x.shape).astype(np.float32)
    i = 3
    row = {k: v[i] for k, v in rows.items()}
    a = row["alpha_prod"]
    x0 = (x - np.sqrt(1 - a) * eps) / np.sqrt(a)
    v = np.sqrt(a) * eps - np.sqrt(1 - a) * x0  # v definition
    out_eps = np.asarray(s_eps.step(eps, x, row)[0])
    out_v = np.asarray(s_v.step(v.astype(np.float32), x, row)[0])
    np.testing.assert_allclose(out_eps, out_v, rtol=1e-4, atol=1e-5)
