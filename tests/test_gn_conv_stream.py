"""Streaming fused GN->SiLU->conv kernel: parity, stats chaining, and the
fused VAE execution path vs the Flax modules."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusiontexturepainting_tpu.ops.gn_conv_stream import (
    gn_affine_from_stats,
    gn_conv_stream,
    shift_stats_for_temb,
    stats_of,
    stream_fused_plan,
)


# compile-heavy: full-size models / whole-pipeline jit on CPU
pytestmark = pytest.mark.slow


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape) * scale,
        jnp.float32)


@pytest.mark.parametrize("res,stats", [(False, True), (True, True),
                                       (False, False), (True, False)])
def test_kernel_matches_reference(res, stats):
    B, H, W, Cin, Cout = 2, 16, 16, 128, 128
    x = _rand((B, H, W, Cin), 0)
    a = _rand((B, Cin), 1, 0.2) + 1.0
    c = _rand((B, Cin), 2, 0.2)
    w = _rand((3, 3, Cin, Cout), 3, 0.05)
    b = _rand((Cout,), 4)
    r = _rand((B, H, W, Cout), 5) if res else None
    assert stream_fused_plan(x.shape, w.shape, 4) is not None
    ref_out, ref_st = gn_conv_stream(x, a, c, w, b, r, stats, True, "xla")
    out, st = gn_conv_stream(x, a, c, w, b, r, stats, True, "pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-3, rtol=1e-3)
    if stats:
        np.testing.assert_allclose(np.asarray(st[:, :2]),
                                   np.asarray(ref_st[:, :2]),
                                   atol=1e-2, rtol=1e-3)
    else:
        assert st is None and ref_st is None


def test_kernel_no_gn_prologue():
    """apply_gn=False: plain conv + stats epilogue."""
    B, H, W, C = 1, 16, 16, 128
    x = _rand((B, H, W, C), 0)
    w = _rand((3, 3, C, C), 1, 0.05)
    b = _rand((C,), 2)
    ref, ref_st = gn_conv_stream(x, None, None, w, b, None, True, False, "xla")
    out, st = gn_conv_stream(x, None, None, w, b, None, True, False, "pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(st[:, :2]), np.asarray(ref_st[:, :2]),
                               atol=1e-2, rtol=1e-3)


@pytest.mark.parametrize("tap_mode", ["plain", "reps", "cat"])
def test_kernel_tap_modes_match(tap_mode):
    """All three tap arrangements (per-tap offset reads, column-shifted
    replicas, channel-concatenated K=3*Cin dots) compute the same conv."""
    from diffusiontexturepainting_tpu.ops.gn_conv_stream import (
        _stream_fused_pallas,
        stream_fused_plan,
    )

    B, H, W, Cin, Cout = 2, 16, 24, 128, 128
    x = _rand((B, H, W, Cin), 0)
    a = _rand((B, Cin), 1, 0.2) + 1.0
    c = _rand((B, Cin), 2, 0.2)
    w = _rand((3, 3, Cin, Cout), 3, 0.05)
    b = _rand((Cout,), 4)
    r = _rand((B, H, W, Cout), 5)
    plan = stream_fused_plan(x.shape, w.shape, 4)
    assert plan is not None
    ref_out, ref_st = gn_conv_stream(x, a, c, w, b, r, True, True, "xla")
    out, st = _stream_fused_pallas(x, a, c, w, b, r, True, True, plan,
                                   interpret=jax.default_backend() != "tpu",
                                   tap_mode=tap_mode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(st[:, :2]),
                               np.asarray(ref_st[:, :2]),
                               atol=1e-2, rtol=1e-3)


def test_affine_from_stats_matches_groupnorm():
    """x*a + c with (a, c) from chained stats == GroupNorm32(x)*scale+bias."""
    from diffusiontexturepainting_tpu.models.layers import GroupNorm32

    B, H, W, C, G = 2, 8, 8, 64, 8
    x = _rand((B, H, W, C), 0)
    gn = GroupNorm32(G)
    params = gn.init(jax.random.PRNGKey(0), x)["params"]
    scale = params["norm"]["scale"] + 0.3
    bias = params["norm"]["bias"] - 0.1
    params = {"norm": {"scale": scale, "bias": bias}}
    ref = gn.apply({"params": params}, x)
    a, c = gn_affine_from_stats(stats_of(x), scale, bias, G, H * W)
    out = x * a[:, None, None, :] + c[:, None, None, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_temb_stats_shift():
    B, H, W, C = 2, 8, 8, 32
    h = _rand((B, H, W, C), 0)
    t = _rand((B, C), 1)
    shifted = shift_stats_for_temb(stats_of(h), t, H * W)
    direct = stats_of(h + t[:, None, None, :])
    np.testing.assert_allclose(np.asarray(shifted[:, :2]),
                               np.asarray(direct[:, :2]),
                               atol=1e-2, rtol=1e-4)


@pytest.fixture(scope="module")
def vae_setup():
    from diffusiontexturepainting_tpu.core.config import VAEConfig
    from diffusiontexturepainting_tpu.models.vae import VAEDecoder, VAEEncoder

    cfg = VAEConfig()
    enc = VAEEncoder(cfg, dtype=jnp.float32)
    dec = VAEDecoder(cfg, dtype=jnp.float32)
    img = _rand((1, 32, 32, 3), 0, 0.5)
    lat = _rand((1, 4, 4, 4), 1)
    pe = enc.init(jax.random.PRNGKey(0), img)["params"]
    pd = dec.init(jax.random.PRNGKey(1), lat)["params"]
    return cfg, enc, dec, img, lat, pe, pd


def test_fused_encode_matches_module(vae_setup):
    from diffusiontexturepainting_tpu.models.vae import fused_encode

    cfg, enc, _, img, _, pe, _ = vae_setup
    ref = enc.apply({"params": pe}, img)
    out = fused_encode(pe, img, cfg, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_fused_encode_matches_module_bf16(vae_setup):
    """Characterize the serving dtype: the fused path derives each layer's
    GroupNorm affine from stats of the previous conv's PRE-cast f32
    output, while the module path computes stats on the bf16 tensor
    upcast to f32 — a small systematic stats/data mismatch. This pins
    the expected deviation under bf16 so it stays characterized
    (ADVICE r1: vae.py fused-path stats source)."""
    from diffusiontexturepainting_tpu.models.vae import fused_encode

    cfg, _, _, img, _, pe, _ = vae_setup
    from diffusiontexturepainting_tpu.models.vae import VAEEncoder

    enc16 = VAEEncoder(cfg, dtype=jnp.bfloat16)
    ref = enc16.apply({"params": pe}, img).astype(jnp.float32)
    out = fused_encode(pe, img, cfg, jnp.bfloat16).astype(jnp.float32)
    # bf16 has ~3 decimal digits; the stats-source mismatch adds a small
    # systematic term on top. 5e-2 abs on unit-scale latents.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)


def test_fused_decode_matches_module(vae_setup):
    from diffusiontexturepainting_tpu.models.vae import fused_decode

    cfg, _, dec, _, lat, _, pd = vae_setup
    ref = dec.apply({"params": pd}, lat)
    out = fused_decode(pd, lat, cfg, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_upconv_stream_matches_reference():
    """Streamed subpixel upsample-conv (+stats epilogue) vs the XLA
    reference (nearest-2x + conv)."""
    from diffusiontexturepainting_tpu.ops.gn_conv_stream import (
        upconv_stream,
        upconv_stream_plan,
    )

    B, H, W, C = 1, 16, 16, 128
    x = _rand((B, H, W, C), 0)
    w = _rand((3, 3, C, C), 1, 0.05)
    b = _rand((C,), 2)
    assert upconv_stream_plan(x.shape, w.shape, 4) is not None
    ref_out, ref_st = upconv_stream(x, w, b, True, force="xla")
    out, st = upconv_stream(x, w, b, True, force="pallas")
    assert out.shape == (B, 2 * H, 2 * W, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(st[:, :2]),
                               np.asarray(ref_st[:, :2]),
                               atol=1e-2, rtol=1e-3)


def test_prologue_chunk_wide_shape():
    """Adaptive prologue row-chunk: a wide shape (the decoder's 256-wide
    512-channel level used to fall off to XLA) must still match the
    reference bit-for-tolerance with chunk_rows < 8."""
    from diffusiontexturepainting_tpu.ops.gn_conv_stream import (
        _prologue_rows,
        stream_fused_plan,
    )

    assert _prologue_rows(258, 512) < 8
    assert stream_fused_plan((1, 256, 256, 512), (3, 3, 512, 256), 2) \
        is not None
    B, H, W, Cin, Cout = 1, 8, 256, 256, 128
    x = _rand((B, H, W, Cin), 0)
    a = _rand((B, Cin), 1, 0.2) + 1.0
    c = _rand((B, Cin), 2, 0.2)
    w = _rand((3, 3, Cin, Cout), 3, 0.05)
    b = _rand((Cout,), 4)
    ref_out, ref_st = gn_conv_stream(x, a, c, w, b, None, True, True, "xla")
    out, st = gn_conv_stream(x, a, c, w, b, None, True, True, "pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(st[:, :2]), np.asarray(ref_st[:, :2]),
                               atol=1e-2, rtol=1e-3)


@pytest.mark.parametrize("chain_in,chain_res", [(False, False),
                                                (True, False), (True, True)])
def test_kernel_wpadded_layouts(chain_in, chain_res):
    """Width-padded chained layouts (in_w / out_wpad / res_wpad) vs the
    plain-layout reference; H spans 3 row tiles so the edge-clamped
    first/middle/last window DMAs all execute."""
    B, H, W, Cin, Cout = 1, 192, 8, 128, 128
    x = _rand((B, H, W, Cin), 0)
    a = _rand((B, Cin), 1, 0.2) + 1.0
    c = _rand((B, Cin), 2, 0.2)
    w = _rand((3, 3, Cin, Cout), 3, 0.05)
    b = _rand((Cout,), 4)
    r = _rand((B, H, W, Cout), 5)
    wpad = (-(W + 2)) % 8
    wp = lambda t: jnp.pad(t, ((0, 0), (0, 0), (1, 1 + wpad), (0, 0)))
    ref_out, ref_st = gn_conv_stream(x, a, c, w, b, r, True, True, "xla")
    xin = wp(x) if chain_in else x
    rin = wp(r) if chain_res else r
    out, st = gn_conv_stream(xin, a, c, w, b, rin, True, True, "pallas",
                             in_w=W if chain_in else 0, out_wpad=True,
                             res_wpad=chain_res)
    out = np.asarray(out)
    assert out.shape == (B, H, W + 2 + wpad, Cout)
    np.testing.assert_allclose(out[:, :, 1:W + 1], np.asarray(ref_out),
                               atol=1e-3, rtol=1e-3)
    assert np.all(out[:, :, 0] == 0) and np.all(out[:, :, W + 1:] == 0)
    np.testing.assert_allclose(np.asarray(st[:, :2]),
                               np.asarray(ref_st[:, :2]),
                               atol=1e-2, rtol=1e-3)


@pytest.mark.parametrize("chain_in,chain_out", [(False, False),
                                                (True, True), (True, False)])
def test_downconv_stream_matches_reference(chain_in, chain_out):
    """Streamed stride-2 downsample (asymmetric (0,1),(0,1) pad) vs the
    XLA strided conv, across chained layouts; H spans several row tiles
    so the bottom-pad clamped DMA executes."""
    from diffusiontexturepainting_tpu.ops.gn_conv_stream import (
        downconv_stream,
        downconv_stream_plan,
    )

    B, H, W, Cin, Cout = 1, 64, 16, 128, 128
    x = _rand((B, H, W, Cin), 0)
    w = _rand((3, 3, Cin, Cout), 1, 0.05)
    b = _rand((Cout,), 2)
    assert downconv_stream_plan(x.shape, w.shape, 4) is not None
    ref, ref_st = downconv_stream(x, w, b, True, force="xla")
    wpad = (-(W + 2)) % 8
    xin = (jnp.pad(x, ((0, 0), (0, 0), (1, 1 + wpad), (0, 0)))
           if chain_in else x)
    out, st = downconv_stream(xin, w, b, True, force="pallas",
                              in_w=W if chain_in else 0, out_wpad=chain_out)
    out = np.asarray(out)
    Wout = W // 2
    if chain_out:
        wpo = (-(Wout + 2)) % 8
        assert out.shape == (B, H // 2, Wout + 2 + wpo, Cout)
        assert np.all(out[:, :, 0] == 0) and np.all(out[:, :, Wout + 1:] == 0)
        out = out[:, :, 1:Wout + 1]
    np.testing.assert_allclose(out, np.asarray(ref), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(st[:, :2]),
                               np.asarray(ref_st[:, :2]),
                               atol=1e-2, rtol=1e-3)


def test_upconv_stream_wpadded_chaining():
    """upconv_stream with in_w/out_wpad: in-kernel interleave + chained
    layouts vs the plain reference."""
    from diffusiontexturepainting_tpu.ops.gn_conv_stream import (
        upconv_stream,
    )

    B, H, W, C = 1, 48, 8, 128
    x = _rand((B, H, W, C), 0)
    w = _rand((3, 3, C, C), 1, 0.05)
    b = _rand((C,), 2)
    ref, ref_st = upconv_stream(x, w, b, True, force="xla")
    wpad = (-(W + 2)) % 8
    xin = jnp.pad(x, ((0, 0), (0, 0), (1, 1 + wpad), (0, 0)))
    out, st = upconv_stream(xin, w, b, True, force="pallas", in_w=W,
                            out_wpad=True)
    out = np.asarray(out)
    Wout = 2 * W
    wpo = (-(Wout + 2)) % 8
    assert out.shape == (B, 2 * H, Wout + 2 + wpo, C)
    assert np.all(out[:, :, 0] == 0) and np.all(out[:, :, Wout + 1:] == 0)
    np.testing.assert_allclose(out[:, :, 1:Wout + 1], np.asarray(ref),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(st[:, :2]),
                               np.asarray(ref_st[:, :2]),
                               atol=1e-2, rtol=1e-3)


def test_vjp_bf16_and_none_args():
    """The custom VJP must work under the serving mixed-precision case
    (bf16 primals - the conv transpose rule mixes dtypes unless the
    re-derivation runs in f32, mirroring conv3x3._conv3x3_bwd) and with
    the optional args None (jax.vjp cannot take None positionally)."""
    import jax
    import jax.numpy as jnp

    B, H, W, C = 1, 16, 16, 128
    x = _rand((B, H, W, C), 0).astype(jnp.bfloat16)
    a = (_rand((B, C), 1, 0.2) + 1.0).astype(jnp.bfloat16)
    c = _rand((B, C), 2, 0.2).astype(jnp.bfloat16)
    w = _rand((3, 3, C, C), 3, 0.05).astype(jnp.bfloat16)

    def loss(x, a, c, w):
        out, _ = gn_conv_stream(x, a, c, w, None, None, False, True, "xla")
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gx, ga, gc, gw = jax.grad(loss, argnums=(0, 1, 2, 3))(x, a, c, w)
    assert gx.dtype == jnp.bfloat16 and gw.dtype == jnp.bfloat16
    for gr in (gx, ga, gc, gw):
        assert np.isfinite(np.asarray(gr, dtype=np.float32)).all()
    # grads agree with the all-f32 derivation
    f32 = [v.astype(jnp.float32) for v in (x, a, c, w)]
    gx32, _, _, gw32 = jax.grad(loss, argnums=(0, 1, 2, 3))(*f32)
    np.testing.assert_allclose(np.asarray(gx, np.float32),
                               np.asarray(gx32), atol=0.2, rtol=0.15)
    # weight grads sum bf16-rounded products over 16x16 spatial - a few
    # percent relative deviation from the f32-forward derivation is the
    # bf16 rounding itself, not a VJP bug
    np.testing.assert_allclose(np.asarray(gw, np.float32),
                               np.asarray(gw32), atol=2.0, rtol=0.25)
