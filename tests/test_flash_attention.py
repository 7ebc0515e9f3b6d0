"""Pallas fused-attention correctness vs the XLA reference path
(interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from diffusiontexturepainting_tpu.ops.attention import xla_attention
from diffusiontexturepainting_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize("b,l,heads,hd", [
    (2, 256, 8, 40),   # SD level-0 self-attention head dim
    (1, 128, 8, 80),
    (1, 256, 1, 64),
    (3, 128, 4, 32),
])
def test_flash_matches_xla_self_attention(b, l, heads, hd):
    d = heads * hd
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    ref = xla_attention(q, k, v, heads)
    with pltpu.force_tpu_interpret_mode():
        ours = flash_attention(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_flash_exp2_bf16_within_bf16_rounding():
    """The bf16-softmax perf knob: probabilities feed a bf16 matmul on
    the default path too, so the knob must stay within bf16 rounding of
    the default kernel's output."""
    rng = np.random.default_rng(3)
    b, l, heads, hd = 2, 256, 8, 40
    d = heads * hd
    q = jnp.asarray(rng.standard_normal((b, l, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, l, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, l, d)), jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        base = flash_attention(q, k, v, heads)
        fast = flash_attention(q, k, v, heads, exp2_bf16=True)
    np.testing.assert_allclose(
        np.asarray(fast, np.float32), np.asarray(base, np.float32),
        atol=2e-2, rtol=2e-2)


def test_flash_cross_attention_kv14():
    """The serving cross-attention shape: 14 conditioning tokens (padded to
    128 inside the kernel with -inf masking)."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((2, 256, 320)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 14, 320)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 14, 320)), jnp.float32)
    ref = xla_attention(q, k, v, 8)
    with pltpu.force_tpu_interpret_mode():
        ours = flash_attention(q, k, v, 8)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_flash_non_multiple_q_len():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((1, 200, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 200, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 200, 64)), jnp.float32)
    ref = xla_attention(q, k, v, 2)
    with pltpu.force_tpu_interpret_mode():
        ours = flash_attention(q, k, v, 2)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_flash_bf16():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((1, 256, 128)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 256, 128)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 256, 128)), jnp.bfloat16)
    ref = xla_attention(q, k, v, 2)
    with pltpu.force_tpu_interpret_mode():
        ours = flash_attention(q, k, v, 2)
    np.testing.assert_allclose(np.asarray(ours, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)


@pytest.mark.parametrize("b,l,heads,hd,bq,bk", [
    (1, 512, 8, 40, 128, 256),   # multi-block in both q and kv
    (1, 384, 2, 64, 256, 128),   # Lk not a multiple of the kv block
    (2, 256, 1, 512, 128, 128),  # fat head (VAE mid style)
])
def test_streaming_flash_matches_xla(b, l, heads, hd, bq, bk):
    from diffusiontexturepainting_tpu.ops.flash_attention import (
        flash_attention_streaming)

    d = heads * hd
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    ref = xla_attention(q, k, v, heads)
    with pltpu.force_tpu_interpret_mode():
        ours = flash_attention_streaming(q, k, v, heads,
                                         q_block=bq, kv_block=bk)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_long_sequence_dispatches_streaming(monkeypatch):
    """16384-token self-attention (the 1024px engine point) must route to
    the streaming kernel - the resident kernel or unfused XLA would need
    GBs. Checked structurally (dispatch decision), not by running 16384
    tokens in the interpreter."""
    import diffusiontexturepainting_tpu.ops.attention as attnmod

    called = {}

    def fake_stream(q, k, v, h, scale=None):
        called["stream"] = True
        return q

    monkeypatch.setattr(attnmod, "jax", attnmod.jax)
    import diffusiontexturepainting_tpu.ops.flash_attention as fa
    monkeypatch.setattr(fa, "flash_attention_streaming", fake_stream)
    monkeypatch.setattr(attnmod.jax, "default_backend", lambda: "tpu",
                        raising=False)
    q = jnp.zeros((1, 16384, 320), jnp.float32)
    out = attnmod.attention(q, q, q, 8)
    assert called.get("stream")
    assert out.shape == q.shape


def test_slotted_kernel_matches_xla():
    """flash_attention_slotted over head-slotted inputs == xla_attention
    over the plain layout (slot pad lanes zero; bf16-rounding tolerance
    since the slotted softmax runs exp2 on bf16 logits)."""
    from diffusiontexturepainting_tpu.ops.flash_attention import (
        flash_attention_slotted,
        slotted_self_attention_fits,
    )

    b, l, heads, hd = 2, 256, 4, 40
    assert slotted_self_attention_fits(l, l, hd)
    rng = np.random.default_rng(5)
    d = heads * hd
    q = jnp.asarray(rng.standard_normal((b, l, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, l, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, l, d)), jnp.bfloat16)
    ref = xla_attention(q, k, v, heads)

    def slot(x):
        x4 = x.reshape(b, l, heads, hd)
        return jnp.pad(x4, ((0, 0), (0, 0), (0, 0), (0, 128 - hd))
                       ).reshape(b, l, heads * 128)

    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_slotted(slot(q), slot(k), slot(v), heads,
                                      scale=hd**-0.5)
    out4 = np.asarray(out, np.float32).reshape(b, l, heads, 128)
    np.testing.assert_allclose(out4[..., :hd].reshape(b, l, d),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)
    assert np.all(out4[..., hd:] == 0)


def test_slotted_attention_module_matches_plain():
    """The Attention module's slotted branch (weight slotting + kernel +
    slotted out-proj) == the plain branch, same params."""
    from diffusiontexturepainting_tpu.models import layers as L

    b, l, heads, hd = 1, 128, 4, 32
    d = heads * hd
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    plain = L.Attention(heads, hd, dtype=jnp.float32)
    slotted = L.Attention(heads, hd, slotted=True, dtype=jnp.float32)
    params = plain.init(jax.random.PRNGKey(0), x)["params"]
    ref = plain.apply({"params": params}, x)
    # force the slotted branch on CPU (interpret-mode kernel)
    real_backend = jax.default_backend
    try:
        jax.default_backend = lambda: "tpu"
        import jax.experimental.pallas as _pl  # noqa: F401
        with pltpu.force_tpu_interpret_mode():
            out = slotted.apply({"params": params}, x)
    finally:
        jax.default_backend = real_backend
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_nomax_softmax_matches_rowmax():
    """The static-shift (no row-max pass) softmax is exact up to f32
    rounding vs the row-max kernel for normalized-magnitude logits."""
    rng = np.random.default_rng(11)
    b, l, heads, hd = 2, 256, 8, 40
    d = heads * hd
    q = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        nomax = flash_attention(q, k, v, heads, nomax=True)
        rowmax = flash_attention(q, k, v, heads, nomax=False)
    np.testing.assert_allclose(np.asarray(nomax), np.asarray(rowmax),
                               atol=3e-6, rtol=1e-5)


def test_nomax_softmax_guard_rails():
    """Saturation instead of NaN at absurd logits, zeros instead of 0/0
    when every probability underflows."""
    b, l, heads, hd = 1, 128, 1, 128
    # huge logits: q.k ~ hd * 1e3^2 * scale >> clamp threshold
    q = jnp.full((b, l, heads * hd), 1e3, jnp.float32)
    k = jnp.full((b, l, heads * hd), 1e3, jnp.float32)
    v = jnp.ones((b, l, heads * hd), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, heads, nomax=True)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)
    # all-underflow: every base-2 logit far below shift - 126
    q2 = jnp.full((b, l, heads * hd), -80.0, jnp.float32)
    k2 = jnp.full((b, l, heads * hd), 80.0, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out2 = flash_attention(q2, k2, v, heads, nomax=True)
    assert np.all(np.isfinite(np.asarray(out2)))


def test_conv_impl_xla_disables_flash_dispatch(monkeypatch):
    """The engine's scoped-VMEM fallback re-traces under conv_impl("xla")
    and must get a genuinely pallas-free program: attention() must not
    pick the flash kernels while the override is active (regression: the
    r3 fidelity run's XLA-only fallback still OOM'd inside
    flash_attention). Checked structurally (dispatch decision)."""
    import diffusiontexturepainting_tpu.ops.attention as attnmod
    import diffusiontexturepainting_tpu.ops.flash_attention as fa
    from diffusiontexturepainting_tpu.ops.conv3x3 import conv_impl

    called = {}

    def fake_flash(q, k, v, h, scale=None, exp2_bf16=False):
        called["flash"] = True
        return q

    def fake_stream(q, k, v, h, scale=None):
        called["flash"] = True
        return q

    monkeypatch.setattr(fa, "flash_attention", fake_flash)
    monkeypatch.setattr(fa, "flash_attention_streaming", fake_stream)
    monkeypatch.setattr(attnmod.jax, "default_backend", lambda: "tpu",
                        raising=False)
    q = jnp.zeros((1, 4096, 320), jnp.float32)

    with conv_impl("xla"):
        attnmod.attention(q, q, q, 8)
    assert "flash" not in called  # override active -> XLA path

    attnmod.attention(q, q, q, 8)
    assert called.get("flash")  # override lifted -> flash again
