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
                        dtype=self.dtype, name="resnet_0")(x)
        b, h, w, c = x.shape
        a = GroupNorm32(self.num_groups, eps=1e-6, name="attn_norm")(x)
        a = a.reshape(b, h * w, c)
        a = Attention(num_heads=1, head_dim=c, qkv_bias=True,
                      dtype=self.dtype, name="attn")(a)
        x = x + a.reshape(b, h, w, c)
        x = ResnetBlock(self.channels, self.num_groups, use_temb=False,
                        dtype=self.dtype, name="resnet_1")(x)
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
                h = ResnetBlock(ch, cfg.norm_num_groups, use_temb=False,
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
                h = ResnetBlock(ch, cfg.norm_num_groups, use_temb=False,
                                dtype=self.dtype, name=f"up_{i}_resnet_{j}")(h)
            if i < len(rev) - 1:
                h = Upsample(ch, dtype=self.dtype, name=f"up_{i}_upsample")(h)
        h = GroupNorm32(cfg.norm_num_groups, eps=1e-6, name="conv_norm_out")(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_out")(nn.silu(h))
        return h.astype(jnp.float32)
