"""CLIP ViT-B/32 vision tower (Flax, NHWC patch conv).

One module serves both reference encoder flavors, which are
mathematically the same function at the feature we need:
  - inference flavor: OpenAI `clip.load("ViT-B/32")` with
    `visual.proj = None`, i.e. encode_image returns ln_post(CLS)
    (reference trt_inference/image_encoder.py:49-50, 81);
  - training flavor: HF `CLIPVisionModel(...).pooler_output`, i.e.
    post_layernorm(last_hidden[:, 0]) (training/image_encoder.py:39, 68).
Both are post-LayerNorm of the CLS token without the projection, so a
single weight conversion covers the shared `image_encoder.pth`
checkpoint (loaded with strict=False in the reference, trt_model.py:59).

Uses quick-GELU (x * sigmoid(1.702x)), the activation of the original
CLIP release.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import CLIPVisionConfig
from ..ops.attention import attention


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


def _causal_attention(q, k, v, num_heads: int):
    """Plain XLA attention with a causal mask (the text tower's 77-token
    sequences never warrant the Pallas kernels)."""
    b, l, d = q.shape
    hd = d // num_heads
    split = lambda t: t.reshape(b, l, num_heads, hd).transpose(0, 2, 1, 3)
    qh, kh, vh = split(q), split(k), split(v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    mask = jnp.triu(jnp.full((l, l), -jnp.inf, jnp.float32), k=1)
    probs = jax.nn.softmax(scores.astype(jnp.float32) + mask, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), vh,
                     preferred_element_type=jnp.float32)
    return out.transpose(0, 2, 1, 3).reshape(b, l, d).astype(q.dtype)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPVisionConfig
    causal: bool = False  # text tower reuses the layer with a causal mask
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dense = lambda name, feats: nn.Dense(feats, dtype=self.dtype,
                                             param_dtype=jnp.float32, name=name)
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                       dtype=jnp.float32,
                                       param_dtype=jnp.float32, name=name)
        h = ln("layer_norm1")(x.astype(jnp.float32)).astype(self.dtype)
        q = dense("q_proj", cfg.hidden_size)(h)
        k = dense("k_proj", cfg.hidden_size)(h)
        v = dense("v_proj", cfg.hidden_size)(h)
        if self.causal:
            a = _causal_attention(q, k, v, cfg.num_heads)
        else:
            a = attention(q, k, v, cfg.num_heads)
        x = x + dense("out_proj", cfg.hidden_size)(a)
        h = ln("layer_norm2")(x.astype(jnp.float32)).astype(self.dtype)
        h = dense("fc1", cfg.intermediate_size)(h)
        h = quick_gelu(h)
        x = x + dense("fc2", cfg.hidden_size)(h)
        return x


class CLIPVisionTower(nn.Module):
    cfg: CLIPVisionConfig = CLIPVisionConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):
        """pixel_values: (B, H, W, 3) CLIP-normalized -> (B, hidden) pooled
        feature = post_layernorm(CLS)."""
        cfg = self.cfg
        x = pixel_values.astype(self.dtype)
        patches = nn.Conv(cfg.hidden_size,
                          (cfg.patch_size, cfg.patch_size),
                          strides=(cfg.patch_size, cfg.patch_size),
                          padding="VALID", use_bias=False, dtype=self.dtype,
                          param_dtype=jnp.float32, name="patch_embedding")(x)
        b, gh, gw, c = patches.shape
        tokens = patches.reshape(b, gh * gw, c)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,), jnp.float32)
        cls = jnp.broadcast_to(cls.astype(self.dtype), (b, 1, c))
        tokens = jnp.concatenate([cls, tokens], axis=1)
        num_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (num_pos, cfg.hidden_size), jnp.float32)
        tokens = tokens + pos[None, : tokens.shape[1]].astype(self.dtype)
        tokens = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                              param_dtype=jnp.float32, name="pre_layernorm")(
            tokens.astype(jnp.float32)).astype(self.dtype)
        for i in range(cfg.num_layers):
            tokens = CLIPEncoderLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(tokens)
        pooled = tokens[:, 0].astype(jnp.float32)
        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                              param_dtype=jnp.float32, name="post_layernorm")(pooled)
        return pooled.astype(jnp.float32)
