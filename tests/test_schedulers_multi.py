"""Oracle-trajectory tests for EulerAncestral, DPM++, PNDM, LMS.

Each oracle is an independent float64 numpy transcription of the
published update equations at the reference's operating point; the
scan-style implementations must reproduce the full trajectory with a
deterministic fake model.
"""

import numpy as np
import pytest

from diffusiontexturepainting_tpu.schedulers import make_scheduler

N = 1000


def _ac(beta_start, beta_end):
    betas = np.linspace(beta_start**0.5, beta_end**0.5, N, dtype=np.float64) ** 2
    return np.cumprod(1 - betas)


def fake_model(sample, t):
    return 0.05 * sample + 0.02 * np.sin(np.float64(t) / 100.0)


def _run_ours(sched, x, noises=None):
    rows = sched.scan_rows()
    n_iters = sched.num_iterations()
    state = sched.init_state(x.shape)
    for i in range(n_iters):
        row = {k: v[i] for k, v in rows.items()}
        scaled = np.asarray(sched.scale_model_input(x, row))
        eps = fake_model(scaled, rows["timestep"][i]).astype(np.float32)
        noise = noises[i] if noises is not None else None
        x_new, state = sched.step(eps, x, row, state, noise)
        x = np.asarray(x_new)
    return x


@pytest.mark.parametrize("n", [4, 10])
def test_euler_ancestral_matches_oracle(n):
    sched = make_scheduler("EulerA").set_timesteps(n)
    ac = _ac(1e-4, 0.02)
    sig_full = np.sqrt((1 - ac) / ac)
    ts = np.linspace(0, N - 1, n, dtype=np.float64)[::-1]
    sig = np.interp(ts, np.arange(N), sig_full)
    sig = np.concatenate([sig, [0.0]])

    rng = np.random.default_rng(0)
    shape = (1, 4, 4, 2)
    x = rng.standard_normal(shape).astype(np.float32)
    noises = [rng.standard_normal(shape).astype(np.float32) for _ in range(n)]

    x_ref = x.astype(np.float64)
    for i in range(n):
        scaled = x_ref / np.sqrt(sig[i] ** 2 + 1)
        eps = fake_model(scaled, ts[i])
        x0 = x_ref - sig[i] * eps
        s_from, s_to = sig[i], sig[i + 1]
        s_up = np.sqrt(s_to**2 * (s_from**2 - s_to**2) / s_from**2)
        s_down = np.sqrt(s_to**2 - s_up**2)
        d = (x_ref - x0) / s_from
        x_ref = x_ref + d * (s_down - s_from) + noises[i] * s_up

    ours = _run_ours(sched, x, noises)
    np.testing.assert_allclose(ours, x_ref, rtol=1e-3, atol=1e-4)
    assert sched.init_noise_sigma == pytest.approx(float(sig.max()), rel=1e-4)


@pytest.mark.parametrize("n", [4, 10, 20])
def test_dpmpp_2m_matches_oracle(n):
    sched = make_scheduler("DPM++").set_timesteps(n)
    ac = _ac(0.00085, 0.012)
    alpha, sigma = np.sqrt(ac), np.sqrt(1 - ac)
    lam = np.log(alpha) - np.log(sigma)
    ts = (np.linspace(0, N - 1, n + 1).round()[::-1][:-1]).astype(np.int64)

    rng = np.random.default_rng(1)
    shape = (1, 4, 4, 2)
    x = rng.standard_normal(shape).astype(np.float32)

    x_ref = x.astype(np.float64)
    m_prev = None
    for i in range(n):
        t = ts[i]
        t_prev = 0 if i == n - 1 else ts[i + 1]
        eps = fake_model(x_ref, float(t))
        x0 = (x_ref - sigma[t] * eps) / alpha[t]
        h = lam[t_prev] - lam[t]
        first = (i == 0) or (i == n - 1 and n < 15)
        if first:
            x_ref = (sigma[t_prev] / sigma[t]) * x_ref - alpha[t_prev] * (
                np.exp(-h) - 1.0) * x0
        else:
            h0 = lam[t] - lam[ts[i - 1]]
            r0 = h0 / h
            d1 = (x0 - m_prev) / r0
            x_ref = ((sigma[t_prev] / sigma[t]) * x_ref
                     - alpha[t_prev] * (np.exp(-h) - 1.0) * x0
                     - 0.5 * alpha[t_prev] * (np.exp(-h) - 1.0) * d1)
        m_prev = x0

    ours = _run_ours(sched, x)
    np.testing.assert_allclose(ours, x_ref, rtol=2e-3, atol=2e-4)


def _dpm_reference_oracle(x, n, solver_order, algorithm, solver_type,
                          lower_order_final=True):
    """Independent float64 transcription of the reference DPMScheduler's
    full stepping logic (utilities.py:649-1008): convert_model_output,
    the lower_order_nums warmup ladder, lower_order_final/second
    step-downs, and the order-1/2/3 update equations."""
    ac = _ac(0.00085, 0.012)
    alpha, sigma = np.sqrt(ac), np.sqrt(1 - ac)
    lam = np.log(alpha) - np.log(sigma)
    ts = (np.linspace(0, N - 1, n + 1).round()[::-1][:-1]).astype(np.int64)
    plus = algorithm == "dpmsolver++"

    x_ref = x.astype(np.float64)
    m = [None] * solver_order
    lon = 0  # lower_order_nums
    for i in range(n):
        t = ts[i]
        t_prev = 0 if i == n - 1 else ts[i + 1]
        lof = (i == n - 1) and lower_order_final and n < 15
        los = (i == n - 2) and lower_order_final and n < 15
        eps = fake_model(x_ref, float(t))
        out = (x_ref - sigma[t] * eps) / alpha[t] if plus else eps
        m = m[1:] + [out]
        h = lam[t_prev] - lam[t]
        if solver_order == 1 or lon < 1 or lof:
            if plus:
                x_ref = (sigma[t_prev] / sigma[t]) * x_ref - alpha[t_prev] * (
                    np.exp(-h) - 1.0) * out
            else:
                x_ref = (alpha[t_prev] / alpha[t]) * x_ref - sigma[t_prev] * (
                    np.exp(h) - 1.0) * out
        elif solver_order == 2 or lon < 2 or los:
            h0 = lam[t] - lam[ts[i - 1]]
            r0 = h0 / h
            d0, d1 = m[-1], (1.0 / r0) * (m[-1] - m[-2])
            if plus:
                c0 = sigma[t_prev] / sigma[t]
                c1 = alpha[t_prev] * (np.exp(-h) - 1.0)
                if solver_type == "midpoint":
                    x_ref = c0 * x_ref - c1 * d0 - 0.5 * c1 * d1
                else:
                    c2 = alpha[t_prev] * ((np.exp(-h) - 1.0) / h + 1.0)
                    x_ref = c0 * x_ref - c1 * d0 + c2 * d1
            else:
                c0 = alpha[t_prev] / alpha[t]
                c1 = sigma[t_prev] * (np.exp(h) - 1.0)
                if solver_type == "midpoint":
                    x_ref = c0 * x_ref - c1 * d0 - 0.5 * c1 * d1
                else:
                    c2 = sigma[t_prev] * ((np.exp(h) - 1.0) / h - 1.0)
                    x_ref = c0 * x_ref - c1 * d0 - c2 * d1
        else:
            h0 = lam[t] - lam[ts[i - 1]]
            h1 = lam[ts[i - 1]] - lam[ts[i - 2]]
            r0, r1 = h0 / h, h1 / h
            d0 = m[-1]
            d1_0, d1_1 = (m[-1] - m[-2]) / r0, (m[-2] - m[-3]) / r1
            d1 = d1_0 + (r0 / (r0 + r1)) * (d1_0 - d1_1)
            d2 = (d1_0 - d1_1) / (r0 + r1)
            if plus:
                c0 = sigma[t_prev] / sigma[t]
                c1 = alpha[t_prev] * (np.exp(-h) - 1.0)
                c2 = alpha[t_prev] * ((np.exp(-h) - 1.0) / h + 1.0)
                c3 = alpha[t_prev] * ((np.exp(-h) - 1.0 + h) / h**2 - 0.5)
                x_ref = c0 * x_ref - c1 * d0 + c2 * d1 - c3 * d2
            else:
                c0 = alpha[t_prev] / alpha[t]
                c1 = sigma[t_prev] * (np.exp(h) - 1.0)
                c2 = sigma[t_prev] * ((np.exp(h) - 1.0) / h - 1.0)
                c3 = sigma[t_prev] * ((np.exp(h) - 1.0 - h) / h**2 - 0.5)
                x_ref = c0 * x_ref - c1 * d0 - c2 * d1 - c3 * d2
        lon = min(lon + 1, solver_order)
    return x_ref


@pytest.mark.parametrize("n", [4, 6, 10, 20])
@pytest.mark.parametrize("algorithm", ["dpmsolver++", "dpmsolver"])
def test_dpm_order3_matches_oracle(n, algorithm):
    sched = make_scheduler("DPM++", solver_order=3,
                           algorithm_type=algorithm).set_timesteps(n)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    x_ref = _dpm_reference_oracle(x, n, 3, algorithm, "midpoint")
    ours = _run_ours(sched, x)
    np.testing.assert_allclose(ours, x_ref, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("solver_type", ["midpoint", "heun"])
@pytest.mark.parametrize("algorithm", ["dpmsolver++", "dpmsolver"])
@pytest.mark.parametrize("order", [1, 2])
def test_dpm_variants_match_oracle(order, algorithm, solver_type):
    n = 8
    sched = make_scheduler("DPM++", solver_order=order,
                           algorithm_type=algorithm,
                           solver_type=solver_type).set_timesteps(n)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    x_ref = _dpm_reference_oracle(x, n, order, algorithm, solver_type)
    ours = _run_ours(sched, x)
    np.testing.assert_allclose(ours, x_ref, rtol=2e-3, atol=2e-4)


def test_dpm_order3_warmup_ladder_flags():
    """Order selection: 1 -> 2 -> 3 warmup, then 2 -> 1 step-down on the
    final steps when n < 15 (reference utilities.py:985-1001)."""
    sched = make_scheduler("DPM++", solver_order=3).set_timesteps(6)
    rows = sched.scan_rows()
    orders = (rows["o1"] + 2 * rows["o2"] + 3 * rows["o3"]).astype(int)
    assert list(orders) == [1, 2, 3, 3, 2, 1]
    # n >= 15: no final step-down
    sched = make_scheduler("DPM++", solver_order=3).set_timesteps(16)
    rows = sched.scan_rows()
    orders = (rows["o1"] + 2 * rows["o2"] + 3 * rows["o3"]).astype(int)
    assert list(orders) == [1, 2] + [3] * 14


@pytest.mark.parametrize("n", [4, 10])
def test_pndm_matches_oracle(n):
    sched = make_scheduler("PNDM").set_timesteps(n)
    ac = _ac(0.00085, 0.012)
    final = ac[0]
    ratio = N // n
    base = (np.arange(n) * ratio).round().astype(np.int64)
    plms = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1]

    ac_prev_full = np.roll(ac, ratio)
    ac_prev_full[:ratio] = final

    rng = np.random.default_rng(2)
    shape = (1, 4, 4, 2)
    x = rng.standard_normal(shape).astype(np.float32)

    x_ref = x.astype(np.float64)
    ets, counter, cur_sample = [], 0, None
    for t in plms:
        eps = fake_model(x_ref, float(t))
        sample = x_ref
        if counter != 1:
            ets = ets[-3:]
            ets.append(eps)
        if len(ets) == 1 and counter == 0:
            out = eps
            cur_sample = sample
        elif len(ets) == 1 and counter == 1:
            out = (eps + ets[-1]) / 2
            sample = cur_sample
        elif len(ets) == 2:
            out = (3 * ets[-1] - ets[-2]) / 2
        elif len(ets) == 3:
            out = (23 * ets[-1] - 16 * ets[-2] + 5 * ets[-3]) / 12
        else:
            out = (55 * ets[-1] - 59 * ets[-2] + 37 * ets[-3] - 9 * ets[-4]) / 24
        a_t, a_prev = ac[t], ac_prev_full[t]
        coeff = np.sqrt(a_prev / a_t)
        denom = a_t * np.sqrt(1 - a_prev) + np.sqrt(a_t * (1 - a_t) * a_prev)
        x_ref = coeff * sample - (a_prev - a_t) * out / denom
        counter += 1

    ours = _run_ours(sched, x)
    np.testing.assert_allclose(ours, x_ref, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("n", [6, 10])
def test_pndm_v_prediction_matches_oracle(n):
    """v_prediction PNDM: the reference substitutes the CACHED sample on
    the repeated (counter==1) call BEFORE the v->eps conversion
    (utilities.py:1095-1098 then 1106-1107), so the conversion's sample
    term uses the pre-step-0 latents too."""
    sched = make_scheduler(
        "PNDM", prediction_type="v_prediction").set_timesteps(n)
    ac = _ac(0.00085, 0.012)
    final = ac[0]
    ratio = N // n
    base = (np.arange(n) * ratio).round().astype(np.int64)
    plms = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1]
    ac_prev_full = np.roll(ac, ratio)
    ac_prev_full[:ratio] = final

    rng = np.random.default_rng(3)
    shape = (1, 4, 4, 2)
    x = rng.standard_normal(shape).astype(np.float32)

    x_ref = x.astype(np.float64)
    ets, counter, cur_sample = [], 0, None
    for t in plms:
        v = fake_model(x_ref, float(t))
        sample = x_ref
        if counter != 1:
            ets = ets[-3:]
            ets.append(v)
        if len(ets) == 1 and counter == 0:
            out = v
            cur_sample = sample
        elif len(ets) == 1 and counter == 1:
            out = (v + ets[-1]) / 2
            sample = cur_sample  # BEFORE the conversion below
        elif len(ets) == 2:
            out = (3 * ets[-1] - ets[-2]) / 2
        elif len(ets) == 3:
            out = (23 * ets[-1] - 16 * ets[-2] + 5 * ets[-3]) / 12
        else:
            out = (55 * ets[-1] - 59 * ets[-2] + 37 * ets[-3]
                   - 9 * ets[-4]) / 24
        a_t, a_prev = ac[t], ac_prev_full[t]
        out = np.sqrt(a_t) * out + np.sqrt(1 - a_t) * sample
        coeff = np.sqrt(a_prev / a_t)
        denom = a_t * np.sqrt(1 - a_prev) + np.sqrt(a_t * (1 - a_t) * a_prev)
        x_ref = coeff * sample - (a_prev - a_t) * out / denom
        counter += 1

    ours = _run_ours(sched, x)
    np.testing.assert_allclose(ours, x_ref, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("n", [4, 10])
def test_lms_matches_oracle(n):
    from scipy import integrate

    sched = make_scheduler("LMS").set_timesteps(n)
    ac = _ac(0.00085, 0.012)
    sig_full = np.sqrt((1 - ac) / ac)
    ts = np.linspace(0, N - 1, n, dtype=np.float64)[::-1]
    sig = np.concatenate([np.interp(ts, np.arange(N), sig_full), [0.0]])

    rng = np.random.default_rng(3)
    shape = (1, 4, 4, 2)
    x = rng.standard_normal(shape).astype(np.float32)

    def coeff(order, t, k):
        def f(tau):
            prod = 1.0
            for m in range(order):
                if m == k:
                    continue
                prod *= (tau - sig[t - m]) / (sig[t - k] - sig[t - m])
            return prod

        return integrate.quad(f, sig[t], sig[t + 1], epsrel=1e-4)[0]

    x_ref = x.astype(np.float64)
    derivs = []
    for i in range(n):
        scaled = x_ref / np.sqrt(sig[i] ** 2 + 1)
        eps = fake_model(scaled, ts[i])
        x0 = x_ref - sig[i] * eps
        derivs.append((x_ref - x0) / sig[i])
        derivs = derivs[-4:]
        order = min(i + 1, 4)
        cs = [coeff(order, i, k) for k in range(order)]
        x_ref = x_ref + sum(c * d for c, d in zip(cs, reversed(derivs)))

    ours = _run_ours(sched, x)
    np.testing.assert_allclose(ours, x_ref, rtol=2e-3, atol=2e-4)


def test_registry():
    from diffusiontexturepainting_tpu.schedulers import available_schedulers

    for name in ("DDIM", "DPM++", "EulerA", "PNDM", "LMS"):
        assert name in available_schedulers()


def test_pndm_runs_extra_iteration():
    sched = make_scheduler("PNDM").set_timesteps(6)
    assert sched.num_iterations() == 7
