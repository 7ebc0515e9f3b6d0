"""SD AutoencoderKL (VAE encoder + decoder) as Flax modules, NHWC.

Architecture per the reference's VAE engines (models.py:1237-1320 decoder,
1328-1420 encoder with `latent_dist.sample()`): 4 resolution levels
(128/256/512/512), mid block with single-head spatial attention,
scaling factor 0.18215 applied by the pipeline (stable_diffusion_
pipeline.py:464-474 encode x0.18215, denoise_latent /0.18215).

TPU notes: NHWC convs; the encoder's stride-2 convs use the SD
asymmetric (0,1,0,1) padding; attention at the bottleneck runs over
(H/8 * W/8) tokens through ops/attention.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import VAEConfig
from .layers import Attention, Downsample, GroupNorm32, ResnetBlock, Upsample


class _MidBlock(nn.Module):
    channels: int
    num_groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock(self.channels, self.num_groups, use_temb=False,
                        eps=1e-6, dtype=self.dtype, name="resnet_0")(x)
        b, h, w, c = x.shape
        a = GroupNorm32(self.num_groups, eps=1e-6, name="attn_norm")(x)
        a = a.reshape(b, h * w, c)
        a = Attention(num_heads=1, head_dim=c, qkv_bias=True,
                      dtype=self.dtype, name="attn")(a)
        x = x + a.reshape(b, h, w, c)
        x = ResnetBlock(self.channels, self.num_groups, use_temb=False,
                        eps=1e-6, dtype=self.dtype, name="resnet_1")(x)
        return x


class VAEEncoder(nn.Module):
    """images (B,H,W,3) in [-1,1] -> moments (B,H/8,W/8,2*latent)."""

    cfg: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = x.astype(self.dtype)
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(ch, cfg.norm_num_groups, use_temb=False, eps=1e-6,
                                dtype=self.dtype, name=f"down_{i}_resnet_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                h = Downsample(ch, asymmetric_pad=True, dtype=self.dtype,
                               name=f"down_{i}_downsample")(h)
        h = _MidBlock(cfg.block_out_channels[-1], cfg.norm_num_groups,
                      dtype=self.dtype, name="mid")(h)
        h = GroupNorm32(cfg.norm_num_groups, eps=1e-6, name="conv_norm_out")(h)
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_out")(nn.silu(h))
        h = nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="quant_conv")(h)
        return h.astype(jnp.float32)


def sample_latents(moments, rng):
    """Reparameterized sample from the diagonal gaussian posterior
    (the reference's `latent_dist.sample()`, models.py:1341)."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)


def latent_mode(moments):
    mean, _ = jnp.split(moments, 2, axis=-1)
    return mean


# ---------------------------------------------------------------------------
# Fused execution path (serving): the same parameter tree executed as a
# chain of streaming GroupNorm-prologue / stats-epilogue conv kernels
# (ops/gn_conv_stream.py). GroupNorm statistics never require their own
# pass over a big tensor: every conv emits the (sum, sumsq) of its output
# and the next layer's norm is folded into a per-(B, C) affine. This is
# the TPU equivalent of what the reference gets from TensorRT fusing its
# GroupNorm plugin into the conv chain (reference models.py:250-302).
# ---------------------------------------------------------------------------


def _conv(x, p, dtype, strides=(1, 1), padding="SAME"):
    # bf16 output: the MXU accumulates in f32 regardless; asking XLA for an
    # f32 result makes it materialize a transposed f32 tensor + a separate
    # convert (profiled ~1 ms per 512px conv). Bias add stays f32.
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), p["kernel"].astype(dtype), strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype)
    return (y.astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(dtype)


def _conv_in_im2col(x, p, dtype):
    """3x3 SAME conv with tiny Cin (the RGB stem) as one im2col matmul.

    XLA's conv at Cin=3 runs ~1.2 ms at 512px in an f32 transposed layout
    (the MXU contraction dim is 3 wide); gathering the 9 taps into a
    (B*H*W, 9*Cin) panel and doing a single K=27 GEMM is ~4x faster and
    lands directly in the NHWC bf16 layout the stream kernels consume.
    """
    b, h, w, cin = x.shape
    cout = p["kernel"].shape[-1]
    xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [xp[:, di:di + h, dj:dj + w, :] for di in range(3)
            for dj in range(3)]
    panel = jnp.concatenate(taps, axis=-1)  # (B, H, W, 9*Cin)
    kmat = p["kernel"].astype(dtype).reshape(9 * cin, cout)
    y = jax.lax.dot_general(panel, kmat, (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (y + p["bias"].astype(jnp.float32)).astype(dtype)


def _dense1x1(x, p, dtype):
    y = jnp.einsum("bhwc,cd->bhwd", x.astype(dtype),
                   p["kernel"][0, 0].astype(dtype),
                   preferred_element_type=jnp.float32)
    return (y + p["bias"].astype(jnp.float32)).astype(dtype)


def _fused_resnet(p, h, stats, num_groups, dtype, eps=1e-6, in_w=0,
                  out_wpad=False, name="resnet"):
    """One ResnetBlock (no temb) as two fused kernels; returns
    (out, out_stats).

    in_w/out_wpad thread the width-padded chained layout
    (ops/gn_conv_stream.py): conv1 always HANDS conv2 a wpadded tensor
    (no pad pass between them), and the block's input/output layouts
    follow the caller so whole encoder levels chain pad-free."""
    from ..ops.gn_conv_stream import gn_affine_from_stats, gn_conv_stream

    w_int = in_w if in_w else h.shape[2]
    n_spatial = h.shape[1] * w_int
    a1, c1 = gn_affine_from_stats(stats, p["norm1"]["norm"]["scale"],
                                  p["norm1"]["norm"]["bias"], num_groups,
                                  n_spatial, eps)
    k1 = p["conv1"]["kernel"].astype(dtype)
    with jax.named_scope(f"{name}_c1"):
        h1, s1 = gn_conv_stream(h, a1, c1, k1,
                                p["conv1"]["bias"].astype(dtype),
                                None, True, in_w=in_w, out_wpad=True)
    a2, c2 = gn_affine_from_stats(s1, p["norm2"]["norm"]["scale"],
                                  p["norm2"]["norm"]["bias"], num_groups,
                                  n_spatial, eps)
    residual = (_dense1x1(h, p["conv_shortcut"], dtype)
                if "conv_shortcut" in p else h)
    k2 = p["conv2"]["kernel"].astype(dtype)
    with jax.named_scope(f"{name}_c2"):
        return gn_conv_stream(h1, a2, c2, k2,
                              p["conv2"]["bias"].astype(dtype),
                              residual, True, in_w=w_int,
                              out_wpad=out_wpad, res_wpad=bool(in_w))


def _fused_mid(p, h, stats, num_groups, dtype):
    from ..ops.gn_conv_stream import gn_affine_from_stats, stats_of

    h, stats = _fused_resnet(p["resnet_0"], h, stats, num_groups, dtype,
                             name="mid_resnet_0")
    b, hh, ww, c = h.shape
    a, cc = gn_affine_from_stats(stats, p["attn_norm"]["norm"]["scale"],
                                 p["attn_norm"]["norm"]["bias"], num_groups,
                                 hh * ww, eps=1e-6)
    hn = (h.astype(jnp.float32) * a[:, None, None, :]
          + cc[:, None, None, :]).astype(dtype)
    attn = Attention(num_heads=1, head_dim=c, qkv_bias=True, dtype=dtype,
                     name=None)
    out = attn.apply({"params": p["attn"]}, hn.reshape(b, hh * ww, c))
    h = h + out.reshape(b, hh, ww, c).astype(h.dtype)
    h, stats = _fused_resnet(p["resnet_1"], h, stats_of(h), num_groups, dtype,
                             name="mid_resnet_1")
    return h, stats


def _fused_norm_silu_conv(p_norm, p_conv, h, stats, num_groups, dtype,
                          eps=1e-6, in_w=0):
    """conv_norm_out -> SiLU -> conv_out head (small Cout: the kernel
    dispatcher falls back to the XLA reference, which is fine here)."""
    from ..ops.gn_conv_stream import gn_affine_from_stats, gn_conv_stream

    with jax.named_scope("conv_out_head"):
        w_int = in_w if in_w else h.shape[2]
        a, c = gn_affine_from_stats(stats, p_norm["norm"]["scale"],
                                    p_norm["norm"]["bias"], num_groups,
                                    h.shape[1] * w_int, eps)
        out, _ = gn_conv_stream(h, a, c, p_conv["kernel"].astype(dtype),
                                p_conv["bias"].astype(dtype), None, False,
                                in_w=in_w)
        return out


def fused_encode(params, images, cfg: VAEConfig = VAEConfig(),
                 dtype=jnp.bfloat16):
    """Fused-kernel equivalent of VAEEncoder.apply (same params/output)."""
    from ..ops.gn_conv_stream import stats_of

    p = params
    g = cfg.norm_num_groups
    with jax.named_scope("enc_stem"):
        h = _conv_in_im2col(images, p["conv_in"], dtype)
        stats = stats_of(h)
    n_levels = len(cfg.block_out_channels)
    cur_w = 0  # 0 = plain layout; else the wpadded interior width
    for i, ch in enumerate(cfg.block_out_channels):
        # Levels 0..n-2 chain the width-padded layout between resnet
        # convs and through the streamed stride-2 downsample (which also
        # emits the next level's GroupNorm stats), so levels exchange
        # tensors with no XLA pad or stats passes at all; the small
        # final level (and mid) stay in the plain layout.
        chained = i < n_levels - 1
        w_int = cur_w if cur_w else h.shape[2]
        for j in range(cfg.layers_per_block):
            h, stats = _fused_resnet(p[f"down_{i}_resnet_{j}"], h, stats, g,
                                     dtype, in_w=cur_w, out_wpad=chained,
                                     name=f"down_{i}_resnet_{j}")
            if chained:
                cur_w = w_int
        if i < n_levels - 1:
            # XLA strided conv (downconv_stream's pallas path is blocked
            # on Mosaic's 32-bit-only strided loads); the wpadded input's
            # cols [1, w+2) already carry the (0,1) right pad, and the
            # row pad fuses into the conv op - no pad pass either way.
            dp = p[f"down_{i}_downsample"]["conv"]
            with jax.named_scope(f"down_{i}_downsample"):
                hp = h[:, :, 1:w_int + 2, :] if cur_w else h
                h = _conv(hp, dp, dtype, strides=(2, 2),
                          padding=((0, 1), (0, 0) if cur_w else (0, 1)))
                stats = stats_of(h)
            cur_w = 0
    h, stats = _fused_mid(p["mid"], h, stats, g, dtype)
    with jax.named_scope("enc_head"):
        h = _fused_norm_silu_conv(p["conv_norm_out"], p["conv_out"], h,
                                  stats, g, dtype)
        h = _dense1x1(h, p["quant_conv"], dtype)
    return h.astype(jnp.float32)


def fused_decode(params, latents, cfg: VAEConfig = VAEConfig(),
                 dtype=jnp.bfloat16):
    """Fused-kernel equivalent of VAEDecoder.apply (same params/output)."""
    from ..ops.gn_conv_stream import stats_of, upconv_stream

    p = params
    g = cfg.norm_num_groups
    z = _dense1x1(latents, p["post_quant_conv"], dtype)
    h = _conv(z, p["conv_in"], dtype)
    stats = stats_of(h)
    h, stats = _fused_mid(p["mid"], h, stats, g, dtype)
    rev = tuple(reversed(cfg.block_out_channels))
    cur_w = 0  # 0 = plain; else the wpadded interior width
    for i in range(len(rev)):
        # width-padded chaining end-to-end: resnet convs, the streamed
        # subpixel upsample-conv (which interleaves its planes in VMEM
        # and emits the next GroupNorm's stats), and the output head all
        # exchange the wpadded layout - no XLA pad/stats/transpose
        # passes between them.
        w_int = cur_w if cur_w else h.shape[2]
        for j in range(cfg.layers_per_block + 1):
            h, stats = _fused_resnet(p[f"up_{i}_resnet_{j}"], h, stats, g,
                                     dtype, in_w=cur_w, out_wpad=True,
                                     name=f"up_{i}_resnet_{j}")
            cur_w = w_int
        if i < len(rev) - 1:
            up = p[f"up_{i}_upsample"]["conv"]
            with jax.named_scope(f"up_{i}_upsample"):
                h, up_stats = upconv_stream(h.astype(dtype),
                                            up["kernel"].astype(dtype),
                                            up["bias"].astype(dtype),
                                            in_w=cur_w, out_wpad=True)
            stats = up_stats if up_stats is not None else stats_of(h)
            cur_w = w_int * 2
    h = _fused_norm_silu_conv(p["conv_norm_out"], p["conv_out"], h, stats, g,
                              dtype, in_w=cur_w)
    return h.astype(jnp.float32)


class VAEDecoder(nn.Module):
    """latents (B,h,w,4) (already /scaling) -> images (B,8h,8w,3) in [-1,1]."""

    cfg: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        z = z.astype(self.dtype)
        z = nn.Conv(cfg.latent_channels, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="post_quant_conv")(z)
        ch = cfg.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(z)
        h = _MidBlock(ch, cfg.norm_num_groups, dtype=self.dtype, name="mid")(h)
        rev = tuple(reversed(cfg.block_out_channels))
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock(ch, cfg.norm_num_groups, use_temb=False, eps=1e-6,
                                dtype=self.dtype, name=f"up_{i}_resnet_{j}")(h)
            if i < len(rev) - 1:
                h = Upsample(ch, dtype=self.dtype, name=f"up_{i}_upsample")(h)
        h = GroupNorm32(cfg.norm_num_groups, eps=1e-6, name="conv_norm_out")(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_out")(nn.silu(h))
        return h.astype(jnp.float32)
