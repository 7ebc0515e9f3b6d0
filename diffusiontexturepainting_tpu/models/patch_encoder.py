"""ConditionPatchEncoder: multi-scale CLIP patch image conditioning.

Re-implements the reference encoder (trt_inference/image_encoder.py:43-115,
training/image_encoder.py:33-85): the 224x224 brush image becomes a
1 + 4 + 9 patch pyramid (whole image, 2x2 of 112^2, 3x3 of 74^2, each
resized back to 224^2), every patch is CLIP-ViT-B/32 encoded, 2D sin/cos
positional codes are added per scale, three independent 4-layer
transformer stacks process each scale, and a LayerNorm + Linear projects
the concatenated 14 tokens to the UNet's cross-attention space. A learned
`uncond_vector` is the negative embedding for CFG.

TPU notes: the pyramid build + 14 CLIP forwards run as ONE batched jitted
program (the reference runs this in eager PyTorch with a "switch to TRT"
TODO, trt_model.py:56); all resizes are MXU matmuls (ops/resize.py).

Checkpoint-compat quirk: the reference builds its positional buffer as
`positional_encoding_2d(C, s, s).view(1, s*s, C)` - a raw memory
reinterpretation of a (C, s, s) tensor as (s*s, C), which scrambles the
intended (position, channel) layout for s > 1. The trained checkpoint saw
those scrambled codes, so `positional_encoding_2d_flat` reproduces the
same values bit-for-bit rather than the "intended" layout.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.config import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD, PatchEncoderConfig
from ..ops.resize import resize2d
from .clip_vit import CLIPVisionTower
from .layers import BasicTransformerBlock


def positional_encoding_2d(channels: int, height: int, width: int) -> np.ndarray:
    """(C, H, W) interleaved sin/cos codes (arXiv:1908.11415 style), matching
    the reference construction (image_encoder.py:20-31)."""
    pos = np.zeros((channels, height, width), dtype=np.float32)
    d = channels // 2
    freq = 1.0 / (10000.0 ** (np.arange(0, d, 2, dtype=np.float32) / d))
    x = np.arange(width, dtype=np.float32)[:, None]  # (W, 1)
    y = np.arange(height, dtype=np.float32)[:, None]
    pos[0:d:2] = np.sin(x * freq).T[:, None, :]
    pos[1:d:2] = np.cos(x * freq).T[:, None, :]
    pos[d::2] = np.sin(y * freq).T[:, :, None]
    pos[d + 1 :: 2] = np.cos(y * freq).T[:, :, None]
    return pos


def positional_encoding_2d_flat(channels: int, n_patches: int) -> np.ndarray:
    """(n_patches, C) buffer reproducing the reference's raw `.view`
    reinterpretation (see module docstring)."""
    side = int(math.isqrt(n_patches))
    pos = positional_encoding_2d(channels, side, side)
    return pos.reshape(-1).reshape(n_patches, channels)


def build_pos_emb(cfg: PatchEncoderConfig) -> np.ndarray:
    return np.concatenate(
        [positional_encoding_2d_flat(cfg.hid_size, n) for n in cfg.num_patches],
        axis=0,
    )


def clip_normalize(images):
    """(…, H, W, 3) [0,1] -> CLIP-normalized."""
    mean = jnp.asarray(CLIP_IMAGE_MEAN, images.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, images.dtype)
    return (images - mean) / std


def build_patch_pyramid(image, num_patches: Tuple[int, ...], out_size: int = 224):
    """(B, S, S, 3) image -> (B, sum(num_patches), out, out, 3) pyramid.

    For each scale with n patches (n a perfect square, side s), the image
    is split into s x s tiles of size S//s (remainder cropped, matching
    torch `unfold`) and each tile is resized to `out_size` (bilinear,
    matching torchvision Resize on tensors). Row-major tile order.
    """
    b, size = image.shape[0], image.shape[1]
    levels = []
    for n in num_patches:
        side = int(math.isqrt(n))
        p = size // side
        crop = image[:, : side * p, : side * p, :]
        tiles = crop.reshape(b, side, p, side, p, 3).transpose(0, 1, 3, 2, 4, 5)
        tiles = tiles.reshape(b * n, p, p, 3)
        tiles = resize2d(tiles, out_size, out_size, mode="bilinear")
        levels.append(tiles.reshape(b, n, out_size, out_size, 3))
    return jnp.concatenate(levels, axis=1)


class ConditionPatchEncoder(nn.Module):
    cfg: PatchEncoderConfig = PatchEncoderConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_patches, return_uncond_vector: bool = False):
        """image_patches: (B, total, H, W, 3) CLIP-normalized.

        Returns (B, total, cross_attention_dim) tokens
        (+ (1, total, cross_attention_dim) uncond vector if requested).
        """
        cfg = self.cfg
        b = image_patches.shape[0]
        total = cfg.total_patches
        flat = image_patches.reshape((b * total,) + image_patches.shape[2:])
        clip_out = CLIPVisionTower(cfg.clip, dtype=self.dtype, name="clip")(flat)
        tokens = clip_out.reshape(b, total, cfg.hid_size)
        pos = jnp.asarray(build_pos_emb(cfg))
        tokens = (tokens + pos[None]).astype(self.dtype)

        # Per-scale transformer stacks; reference names its stacks
        # l/m/s in *descending patch-count order of assignment*:
        # l-layers process the first (whole-image) token group.
        splits = np.cumsum(cfg.num_patches)[:-1]
        groups = jnp.split(tokens, splits, axis=1)
        stack_names = ["l", "m", "s"]
        out_groups = []
        for g, name in zip(groups, stack_names):
            h = g
            for i in range(cfg.num_layers):
                h = BasicTransformerBlock(
                    cfg.num_heads, cfg.hid_size // cfg.num_heads,
                    qkv_bias=True, ff_activation="gelu", dtype=self.dtype,
                    name=f"{name}_block_{i}")(h)
            out_groups.append(h)
        latent = jnp.concatenate(out_groups, axis=1).astype(jnp.float32)
        latent = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32,
                              name="final_layer_norm")(latent)
        latent = nn.Dense(cfg.cross_attention_dim, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="proj_out")(latent)
        if return_uncond_vector:
            uncond = self.param(
                "uncond_vector", nn.initializers.normal(1.0),
                (1, total, cfg.cross_attention_dim), jnp.float32)
            return latent, uncond
        return latent


def encode_brush_image(module: ConditionPatchEncoder, params, image,
                       clip_size: int | None = None):
    """Full brush encoding: bicubic align-corners resize to the CLIP input
    size, CLIP normalize, pyramid, encoder forward.

    Matches reference preprocess_image + encode_image
    (image_encoder.py:100-115). `image`: (B, H, W, 3) float [0,1].
    Designed to be jitted as one program.
    """
    cfg = module.cfg
    size = clip_size or cfg.clip.image_size
    if image.shape[1] != size or image.shape[2] != size:
        image = resize2d(image, size, size, mode="bicubic", align_corners=True)
    image = clip_normalize(image)
    pyramid = build_patch_pyramid(image, cfg.num_patches, out_size=size)
    return module.apply({"params": params}, pyramid, return_uncond_vector=True)
