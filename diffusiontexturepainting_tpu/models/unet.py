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
    matching the reference's offline fusion (models.py:1042-1094).
  - Deep-feature caching (DeepCache-style, arXiv 2312.03209/2312.00858
    family): `forward_full` additionally returns the feature entering the
    shallowest up level; `forward_shallow` reuses it and computes only the
    outermost level - ~1/3 of the FLOPs. The pipeline statically
    interleaves full/shallow steps for step counts where caching pays.
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

    def setup(self):
        cfg = self.cfg
        conv = lambda ch: nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                                  param_dtype=jnp.float32)
        self.time_embedding_linear_1 = nn.Dense(
            cfg.time_embed_dim, dtype=self.dtype, param_dtype=jnp.float32)
        self.time_embedding_linear_2 = nn.Dense(
            cfg.time_embed_dim, dtype=self.dtype, param_dtype=jnp.float32)
        self.conv_in = conv(cfg.block_out_channels[0])

        heads = cfg.num_attention_heads
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                setattr(self, f"down_{i}_resnet_{j}",
                        ResnetBlock(ch, cfg.norm_num_groups,
                                    fused=cfg.fused_resnet, dtype=self.dtype))
                if cfg.attn_down[i]:
                    setattr(self, f"down_{i}_attn_{j}",
                            Transformer2D(heads, ch // heads,
                                          kv_dim=cfg.cross_attention_dim,
                                          num_groups=cfg.norm_num_groups,
                                          ff_fused=cfg.fused_ff,
                                          gn_folded=cfg.fused_norm,
                                          attn_slotted=cfg.fused_attn,
                                          dtype=self.dtype))
            if i < len(cfg.block_out_channels) - 1:
                setattr(self, f"down_{i}_downsample",
                        Downsample(ch, dtype=self.dtype))

        ch = cfg.block_out_channels[-1]
        self.mid_resnet_0 = ResnetBlock(ch, cfg.norm_num_groups,
                                        fused=cfg.fused_resnet,
                                        dtype=self.dtype)
        self.mid_attn = Transformer2D(heads, ch // heads,
                                      kv_dim=cfg.cross_attention_dim,
                                      num_groups=cfg.norm_num_groups,
                                      ff_fused=cfg.fused_ff,
                                      gn_folded=cfg.fused_norm,
                                      attn_slotted=cfg.fused_attn,
                                      dtype=self.dtype)
        self.mid_resnet_1 = ResnetBlock(ch, cfg.norm_num_groups,
                                        fused=cfg.fused_resnet,
                                        dtype=self.dtype)

        rev_channels = tuple(reversed(cfg.block_out_channels))
        rev_attn = tuple(reversed(cfg.attn_down))
        for i, ch in enumerate(rev_channels):
            for j in range(cfg.layers_per_block + 1):
                setattr(self, f"up_{i}_resnet_{j}",
                        ResnetBlock(ch, cfg.norm_num_groups,
                                    fused=cfg.fused_resnet, dtype=self.dtype))
                if rev_attn[i]:
                    setattr(self, f"up_{i}_attn_{j}",
                            Transformer2D(heads, ch // heads,
                                          kv_dim=cfg.cross_attention_dim,
                                          num_groups=cfg.norm_num_groups,
                                          ff_fused=cfg.fused_ff,
                                          gn_folded=cfg.fused_norm,
                                          attn_slotted=cfg.fused_attn,
                                          dtype=self.dtype))
            if i < len(rev_channels) - 1:
                setattr(self, f"up_{i}_upsample", Upsample(ch, dtype=self.dtype))

        self.conv_norm_out = GroupNorm32(cfg.norm_num_groups)
        self.conv_out = nn.Conv(cfg.out_channels, (3, 3), padding=1,
                                dtype=self.dtype, param_dtype=jnp.float32)

    # --- helpers ---

    def _temb(self, timestep, batch):
        cfg = self.cfg
        timestep = jnp.atleast_1d(jnp.asarray(timestep, jnp.float32))
        if timestep.shape[0] != batch:
            timestep = jnp.broadcast_to(timestep, (batch,))
        temb = timestep_embedding(timestep, cfg.block_out_channels[0],
                                  cfg.flip_sin_to_cos, cfg.freq_shift)
        temb = self.time_embedding_linear_1(temb.astype(self.dtype))
        return self.time_embedding_linear_2(nn.silu(temb))

    def _res_attn(self, resnet, attn, h, temb, ctx, skip=None):
        """resnet [-> attn]; with fused_norm the resnet's stats epilogue
        feeds the Transformer2D's folded GroupNorm, so the norm needs no
        extra pass over the tensor. `skip` is passed through to the
        ResnetBlock un-concatenated (split-weight concat elimination)."""
        if attn is not None and self.cfg.fused_norm:
            h, st = resnet(h, temb, return_stats=True, skip=skip)
            return attn(h, ctx, in_stats=st)
        h = resnet(h, temb, skip=skip)
        return attn(h, ctx) if attn is not None else h

    def _level0(self, sample, temb, ctx):
        """conv_in + outermost down level (no downsample); returns
        (h, skips) - everything the shallow pass shares with the full pass."""
        cfg = self.cfg
        h = self.conv_in(sample.astype(self.dtype))
        skips = [h]
        for j in range(cfg.layers_per_block):
            h = self._res_attn(
                getattr(self, f"down_0_resnet_{j}"),
                getattr(self, f"down_0_attn_{j}") if cfg.attn_down[0]
                else None, h, temb, ctx)
            skips.append(h)
        return h, skips

    def _level_last_up(self, h, skips, temb, ctx):
        """The shallowest up level + output head."""
        cfg = self.cfg
        i = len(cfg.block_out_channels) - 1
        rev_attn = tuple(reversed(cfg.attn_down))
        for j in range(cfg.layers_per_block + 1):
            h = self._res_attn(
                getattr(self, f"up_{i}_resnet_{j}"),
                getattr(self, f"up_{i}_attn_{j}") if rev_attn[i] else None,
                h, temb, ctx, skip=skips.pop())
        h = self.conv_norm_out(h)
        h = self.conv_out(nn.silu(h))
        return h.astype(jnp.float32)

    # --- forwards ---

    def __call__(self, sample, timestep, encoder_hidden_states):
        """(B, H, W, 9), t, (B, L, D) -> (B, H, W, 4) predicted noise."""
        out, _ = self.forward_full(sample, timestep, encoder_hidden_states)
        return out

    def forward_full(self, sample, timestep, encoder_hidden_states):
        """Full forward; also returns the deep-cache feature (the tensor
        entering the shallowest up level, i.e. the last upsample output)."""
        cfg = self.cfg
        ctx = encoder_hidden_states.astype(self.dtype)
        temb = self._temb(timestep, sample.shape[0])

        h, skips = self._level0(sample, temb, ctx)
        for i in range(1, len(cfg.block_out_channels)):
            h = getattr(self, f"down_{i - 1}_downsample")(h)
            skips.append(h)
            for j in range(cfg.layers_per_block):
                h = self._res_attn(
                    getattr(self, f"down_{i}_resnet_{j}"),
                    getattr(self, f"down_{i}_attn_{j}") if cfg.attn_down[i]
                    else None, h, temb, ctx)
                skips.append(h)

        h = self._res_attn(self.mid_resnet_0, self.mid_attn, h, temb, ctx)
        h = self.mid_resnet_1(h, temb)

        rev_channels = tuple(reversed(cfg.block_out_channels))
        rev_attn = tuple(reversed(cfg.attn_down))
        n_levels = len(rev_channels)
        for i in range(n_levels - 1):
            for j in range(cfg.layers_per_block + 1):
                h = self._res_attn(
                    getattr(self, f"up_{i}_resnet_{j}"),
                    getattr(self, f"up_{i}_attn_{j}") if rev_attn[i]
                    else None, h, temb, ctx, skip=skips.pop())
            h = getattr(self, f"up_{i}_upsample")(h)

        deep_cache = h  # (B, H, W, rev_channels[-2]) entering the last level
        out = self._level_last_up(h, skips, temb, ctx)
        return out, deep_cache

    def forward_shallow(self, sample, timestep, encoder_hidden_states,
                        deep_cache):
        """Cached forward: recompute only the outermost level, splice the
        cached deep feature in place of down levels 1..N + mid + up levels
        0..N-1 (DeepCache)."""
        ctx = encoder_hidden_states.astype(self.dtype)
        temb = self._temb(timestep, sample.shape[0])
        _, skips = self._level0(sample, temb, ctx)
        return self._level_last_up(deep_cache.astype(self.dtype), skips,
                                   temb, ctx)
