"""Pallas implicit-GEMM 3x3 conv: parity vs XLA conv, grads, gating."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusiontexturepainting_tpu.ops.conv3x3 import (
    Conv3x3,
    conv3x3,
    pallas_plan,
)


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32)


@pytest.mark.parametrize("shape", [
    (2, 8, 8, 16, 128),    # small spatial
    (3, 16, 8, 32, 256),   # CFG-like batch, cout tiling
    (1, 4, 12, 16, 128),   # odd W
])
def test_pallas_matches_xla(shape):
    B, H, W, Cin, Cout = shape
    x = _rand((B, H, W, Cin), 0)
    w = _rand((3, 3, Cin, Cout), 1) * 0.1
    b = _rand((Cout,), 2)
    assert pallas_plan(x.shape, w.shape) is not None
    ref = conv3x3(x, w, b, "xla")
    out = conv3x3(x, w, b, "pallas")  # interpret mode on CPU
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_grad_matches_xla():
    x = _rand((2, 8, 8, 16), 0)
    w = _rand((3, 3, 16, 128), 1) * 0.1
    b = _rand((128,), 2)
    t = _rand((2, 8, 8, 128), 3)

    def loss(force):
        def f(x_, w_, b_):
            return jnp.mean((conv3x3(x_, w_, b_, force) - t) ** 2)
        return f

    gx0, gw0, gb0 = jax.grad(loss("xla"), argnums=(0, 1, 2))(x, w, b)
    gx1, gw1, gb1 = jax.grad(loss("pallas"), argnums=(0, 1, 2))(x, w, b)
    for a, r in [(gx1, gx0), (gw1, gw0), (gb1, gb0)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-4, rtol=1e-3)


def test_gate_rejects_unsupported():
    # large spatial image exceeds the VMEM budget -> auto falls back
    assert pallas_plan((1, 512, 512, 128), (3, 3, 128, 128)) is None
    # tiny cout -> not worth a kernel
    assert pallas_plan((1, 8, 8, 16), (3, 3, 16, 32)) is None
    # 5x5 kernel unsupported
    assert pallas_plan((1, 8, 8, 16), (5, 5, 16, 128)) is None
    # auto path still computes correctly through XLA
    x = _rand((1, 8, 8, 16), 0)
    w = _rand((3, 3, 16, 32), 1)
    out = conv3x3(x, w, None, "auto")
    assert out.shape == (1, 8, 8, 32)


def test_module_param_tree_matches_nn_conv():
    from flax import linen as nn

    x = _rand((1, 8, 8, 16), 0)
    m1 = Conv3x3(128)
    m2 = nn.Conv(128, (3, 3), padding=1)
    p1 = m1.init(jax.random.PRNGKey(0), x)["params"]
    p2 = m2.init(jax.random.PRNGKey(0), x)["params"]
    assert {k: v.shape for k, v in p1.items()} == \
           {k: v.shape for k, v in p2.items()}
    # same params -> same output as nn.Conv (XLA path)
    y1 = m1.apply({"params": p1}, x)
    y2 = m2.apply({"params": p1}, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               atol=1e-5, rtol=1e-5)


def _gn_ref(x, scale, bias, g, eps=1e-5):
    import jax.numpy as jnp
    c = x.shape[-1]
    xg = x.reshape(x.shape[:-1] + (g, c // g)).astype(jnp.float32)
    axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    m = jnp.mean(xg, axis=axes, keepdims=True)
    v = jnp.mean(jnp.square(xg - m), axis=axes, keepdims=True)
    y = ((xg - m) * jax.lax.rsqrt(v + eps)).reshape(x.shape)
    return y * scale + bias


@pytest.mark.parametrize("extras", ["none", "temb", "residual", "both"])
def test_fused_gn_silu_conv(extras):
    from diffusiontexturepainting_tpu.ops.conv3x3 import gn_silu_conv3x3

    B, H, W, Cin, Cout, G = 2, 8, 8, 32, 128, 4
    x = _rand((B, H, W, Cin), 0)
    scale = _rand((Cin,), 1) * 0.3 + 1.0
    bias = _rand((Cin,), 2) * 0.3
    w = _rand((3, 3, Cin, Cout), 3) * 0.1
    b = _rand((Cout,), 4) * 0.1
    temb = _rand((B, Cout), 5) if extras in ("temb", "both") else None
    res = _rand((B, H, W, Cout), 6) if extras in ("residual", "both") else None

    # hand-rolled unfused reference
    h = _gn_ref(x, scale, bias, G)
    h = h * jax.nn.sigmoid(h)
    ref = conv3x3(h, w, b, "xla").astype(jnp.float32)
    if temb is not None:
        ref = ref + temb[:, None, None, :]
    if res is not None:
        ref = ref + res

    out_xla = gn_silu_conv3x3(x, scale, bias, w, b, temb, res, G,
                              1e-5, "xla")
    np.testing.assert_allclose(np.asarray(out_xla), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)
    out_pl = gn_silu_conv3x3(x, scale, bias, w, b, temb, res, G,
                             1e-5, "pallas")  # interpret mode on CPU
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


def test_fused_gn_silu_conv_grads():
    from diffusiontexturepainting_tpu.ops.conv3x3 import gn_silu_conv3x3

    B, H, W, Cin, Cout, G = 2, 8, 8, 32, 128, 4
    x = _rand((B, H, W, Cin), 0)
    scale = _rand((Cin,), 1) * 0.3 + 1.0
    bias = _rand((Cin,), 2) * 0.3
    w = _rand((3, 3, Cin, Cout), 3) * 0.1
    b = _rand((Cout,), 4) * 0.1
    t = _rand((B, H, W, Cout), 7)

    def loss(force):
        def f(x_, s_, b_, w_, wb_):
            out = gn_silu_conv3x3(x_, s_, b_, w_, wb_, None, None, G,
                                  1e-5, force)
            return jnp.mean((out - t) ** 2)
        return f

    g0 = jax.grad(loss("xla"), argnums=(0, 1, 2, 3, 4))(x, scale, bias, w, b)
    g1 = jax.grad(loss("pallas"), argnums=(0, 1, 2, 3, 4))(x, scale, bias, w, b)
    for a, r in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-4, rtol=1e-3)


def test_spatial_moments_pallas_matches_reference():
    from diffusiontexturepainting_tpu.ops.groupnorm import (
        spatial_moments, stats_plan)

    x = _rand((2, 16, 16, 128), 0)  # below size gate -> force pallas
    assert stats_plan((2, 512, 512, 128)) is not None
    s1_ref, s2_ref = spatial_moments(x, "xla")
    s1, s2 = spatial_moments(x, "pallas")  # interpret mode on CPU
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s1_ref),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2_ref),
                               rtol=1e-5, atol=1e-3)
    # gradient flows through the custom vjp
    g = jax.grad(lambda x_: jnp.sum(spatial_moments(x_, "pallas")[1]))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(2.0 * x),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("shape", [
    (2, 8, 8, 32, 128),
    (3, 4, 12, 16, 256),
])
def test_upsample_conv_matches_reference(shape):
    from diffusiontexturepainting_tpu.ops.conv3x3 import upsample2x_conv3x3

    B, H, W, Cin, Cout = shape
    x = _rand((B, H, W, Cin), 0)
    w = _rand((3, 3, Cin, Cout), 1) * 0.1
    b = _rand((Cout,), 2) * 0.1
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    ref = conv3x3(up, w, b, "xla")
    out_xla = upsample2x_conv3x3(x, w, b, "xla")
    np.testing.assert_allclose(np.asarray(out_xla), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    out_pl = upsample2x_conv3x3(x, w, b, "pallas")  # interpret on CPU
    assert out_pl.shape == (B, 2 * H, 2 * W, Cout)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_upsample_conv_grads():
    from diffusiontexturepainting_tpu.ops.conv3x3 import upsample2x_conv3x3

    x = _rand((1, 8, 8, 16), 0)
    w = _rand((3, 3, 16, 128), 1) * 0.1
    b = _rand((128,), 2) * 0.1
    t = _rand((1, 16, 16, 128), 3)

    def loss(force):
        return lambda x_, w_, b_: jnp.mean(
            (upsample2x_conv3x3(x_, w_, b_, force) - t) ** 2)

    g0 = jax.grad(loss("xla"), argnums=(0, 1, 2))(x, w, b)
    g1 = jax.grad(loss("pallas"), argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-4, rtol=1e-3)


def test_streaming_conv_matches_xla():
    from diffusiontexturepainting_tpu.ops.conv3x3 import (
        _conv3x3_stream, streaming_plan)

    # big shapes get a streaming plan (the VAE encoder levels)
    assert streaming_plan((2, 128, 128, 512), (3, 3, 512, 512)) is not None
    assert streaming_plan((1, 512, 512, 128), (3, 3, 128, 128)) is not None

    x = _rand((1, 16, 8, 16), 0)
    w = _rand((3, 3, 16, 128), 1) * 0.1
    b = _rand((128,), 2)
    ref = conv3x3(x, w, b, "xla")
    out = _conv3x3_stream(x, w, b, (8, 128), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_inpad_kernels_match_xla():
    """The in-kernel-padding variants (off by default; see _IN_PAD) must
    stay numerically identical to the padded/XLA paths."""
    import diffusiontexturepainting_tpu.ops.conv3x3 as convmod
    from diffusiontexturepainting_tpu.ops.conv3x3 import upsample2x_conv3x3

    x = _rand((2, 16, 16, 32), 0)
    w = _rand((3, 3, 32, 128), 1) * 0.1
    b = _rand((128,), 2) * 0.1
    ref = conv3x3(x, w, b, "xla")
    up_ref = upsample2x_conv3x3(x, w, b, "xla")
    old = convmod._IN_PAD
    convmod._IN_PAD = True
    try:
        out = conv3x3(x, w, b, "pallas")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)
        up = upsample2x_conv3x3(x, w, b, "pallas")
        np.testing.assert_allclose(np.asarray(up), np.asarray(up_ref),
                                   atol=1e-4, rtol=1e-4)
    finally:
        convmod._IN_PAD = old


def test_grad_through_bf16_conv():
    """Mixed-precision training backward: f32 cotangent into a bf16 conv
    (the custom-vjp must cast; regression for the bf16 train step)."""
    x = _rand((1, 8, 8, 16), 0).astype(jnp.bfloat16)
    w = (_rand((3, 3, 16, 128), 1) * 0.1).astype(jnp.bfloat16)
    b = (_rand((128,), 2) * 0.1).astype(jnp.bfloat16)

    def loss(w_):
        y = conv3x3(x, w_, b).astype(jnp.float32)
        return jnp.mean(jnp.square(y))

    g = jax.grad(loss)(w)
    assert g.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(g, np.float32)).all()

    from diffusiontexturepainting_tpu.ops.conv3x3 import upsample2x_conv3x3

    def loss_up(w_):
        y = upsample2x_conv3x3(x, w_, b).astype(jnp.float32)
        return jnp.mean(jnp.square(y))

    gu = jax.grad(loss_up)(w)
    assert np.isfinite(np.asarray(gu, np.float32)).all()
