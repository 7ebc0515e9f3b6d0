"""SD-1.5 inpainting UNet (9-channel input) as a Flax module, NHWC.

Re-implements the architecture the reference obtains from HF
`UNet2DConditionModel` + TensorRT graph surgery (reference
models.py:1017-1228, make_UNet:1231-1234 with unet_dim=9): 4 resolution
levels (320/640/1280/1280), 2 resnets per level, cross-attention
transformers at the first three levels and in the mid block,
cross_attention_dim=768 (the 14 conditioning patch tokens), 8 heads.

TPU-first notes:
  - NHWC convs, bf16 compute, f32 params/norm stats.
  - The whole forward is pure; the denoise loop `lax.scan`s over it and
    XLA fuses GroupNorm/SiLU/GEGLU chains that the reference needed TRT
    plugins for (models.py:250-420).
  - LoRA is merged into the base weights at load time (weights/lora.py),
    matching the reference's offline fusion (models.py:1042-1094), so the
    hot path sees plain dense weights.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..core.config import UNetConfig
from .layers import (
    Downsample,
    GroupNorm32,
    ResnetBlock,
    Transformer2D,
    Upsample,
    timestep_embedding,
)


class UNet2DCondition(nn.Module):
    cfg: UNetConfig = UNetConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timestep, encoder_hidden_states):
        """
        Args:
            sample: (B, H, W, 9) latent+mask+masked-latent concat.
            timestep: scalar or (B,) diffusion timestep (float).
            encoder_hidden_states: (B, L, cross_attention_dim) cond tokens.

        Returns:
            (B, H, W, 4) predicted noise.
        """
        cfg = self.cfg
        conv = lambda name, ch, **kw: nn.Conv(
            ch, (3, 3), padding=1, dtype=self.dtype, param_dtype=jnp.float32,
            name=name, **kw)

        timestep = jnp.atleast_1d(jnp.asarray(timestep, jnp.float32))
        if timestep.shape[0] != sample.shape[0]:
            timestep = jnp.broadcast_to(timestep, (sample.shape[0],))
        temb = timestep_embedding(timestep, cfg.block_out_channels[0],
                                  cfg.flip_sin_to_cos, cfg.freq_shift)
        temb = nn.Dense(cfg.time_embed_dim, dtype=self.dtype,
                        param_dtype=jnp.float32, name="time_embedding_linear_1")(
            temb.astype(self.dtype))
        temb = nn.Dense(cfg.time_embed_dim, dtype=self.dtype,
                        param_dtype=jnp.float32, name="time_embedding_linear_2")(
            nn.silu(temb))

        ctx = encoder_hidden_states.astype(self.dtype)
        sample = sample.astype(self.dtype)

        h = conv("conv_in", cfg.block_out_channels[0])(sample)
        skips = [h]

        # --- down path ---
        for i, ch in enumerate(cfg.block_out_channels):
            heads = cfg.num_attention_heads
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                                name=f"down_{i}_resnet_{j}")(h, temb)
                if cfg.attn_down[i]:
                    h = Transformer2D(heads, ch // heads, kv_dim=cfg.cross_attention_dim,
                                      num_groups=cfg.norm_num_groups, dtype=self.dtype,
                                      name=f"down_{i}_attn_{j}")(h, ctx)
                skips.append(h)
            if i < len(cfg.block_out_channels) - 1:
                h = Downsample(ch, dtype=self.dtype, name=f"down_{i}_downsample")(h)
                skips.append(h)

        # --- mid ---
        ch = cfg.block_out_channels[-1]
        heads = cfg.num_attention_heads
        h = ResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                        name="mid_resnet_0")(h, temb)
        h = Transformer2D(heads, ch // heads, kv_dim=cfg.cross_attention_dim,
                          num_groups=cfg.norm_num_groups, dtype=self.dtype,
                          name="mid_attn")(h, ctx)
        h = ResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                        name="mid_resnet_1")(h, temb)

        # --- up path ---
        rev_channels = tuple(reversed(cfg.block_out_channels))
        rev_attn = tuple(reversed(cfg.attn_down))
        for i, ch in enumerate(rev_channels):
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                                name=f"up_{i}_resnet_{j}")(h, temb)
                if rev_attn[i]:
                    h = Transformer2D(heads, ch // heads,
                                      kv_dim=cfg.cross_attention_dim,
                                      num_groups=cfg.norm_num_groups,
                                      dtype=self.dtype,
                                      name=f"up_{i}_attn_{j}")(h, ctx)
            if i < len(rev_channels) - 1:
                h = Upsample(ch, dtype=self.dtype, name=f"up_{i}_upsample")(h)

        h = GroupNorm32(cfg.norm_num_groups, name="conv_norm_out")(h)
        h = conv("conv_out", cfg.out_channels)(nn.silu(h))
        return h.astype(jnp.float32)
