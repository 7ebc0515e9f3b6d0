"""CLIP text encoder (SD-1.5's `text_encoder`) + `encode_prompt`.

Reference parity: the reference builds a TRT engine for HF
`CLIPTextModel` (models.py:943-1009; `text_embeddings` = the last hidden
state) and exposes `encode_prompt` on the pipeline
(stable_diffusion_pipeline.py:369-405: tokenize prompt + negative prompt
to 77 ids, run the engine twice, concat [uncond, cond] and cast to the
engine dtype). The reference's own inpaint serving path never calls
either - the 14-token image patch embeddings replace text conditioning
(trt_model.py:53-61) - so this module exists for full component parity
and for text-conditioned SD-1.5 deployments of the same engine layer.

Tokenization: the CLIP BPE vocab ships with checkpoints, not with this
repo (no network egress here), so `encode_prompt` takes either raw
77-token id arrays or plain strings WHEN a tokenizer directory is
available (`tokenizer_dir` pointing at the SD checkpoint's `tokenizer/`
folder, loaded through `transformers.CLIPTokenizer`).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.config import CLIPTextConfig, CLIPVisionConfig
from .clip_vit import CLIPEncoderLayer


class CLIPTextEncoder(nn.Module):
    """HF `CLIPTextModel`-equivalent tower: token + position embeddings,
    causal pre-LN transformer, final LayerNorm. Returns the last hidden
    state (B, L, hidden) - the `text_embeddings` TRT output the UNet
    consumes as encoder_hidden_states."""

    cfg: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids):
        cfg = self.cfg
        tok = self.param("token_embedding", nn.initializers.normal(0.02),
                         (cfg.vocab_size, cfg.hidden_size), jnp.float32)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (cfg.max_length, cfg.hidden_size), jnp.float32)
        ids = input_ids.astype(jnp.int32)
        x = tok[ids].astype(self.dtype)
        x = x + pos[None, : ids.shape[1]].astype(self.dtype)
        # the encoder layers are the vision tower's, with the causal mask
        layer_cfg = CLIPVisionConfig(
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_layers=cfg.num_layers, num_heads=cfg.num_heads,
            layer_norm_eps=cfg.layer_norm_eps)
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(layer_cfg, causal=True, dtype=self.dtype,
                                 name=f"layer_{i}")(x)
        out = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                           param_dtype=jnp.float32,
                           name="final_layer_norm")(x.astype(jnp.float32))
        return out.astype(self.dtype)


def tokenize(prompts: Sequence[str], tokenizer_dir: str,
             max_length: int = 77) -> np.ndarray:
    """Strings -> (B, 77) int32 ids via a LOCAL CLIPTokenizer directory
    (the SD checkpoint's `tokenizer/`). Mirrors the reference's
    tokenizer(..., padding='max_length', truncation=True)
    (stable_diffusion_pipeline.py:375-381)."""
    tk = _get_tokenizer(tokenizer_dir)
    enc = tk(list(prompts), padding="max_length", max_length=max_length,
             truncation=True, return_tensors="np")
    return enc["input_ids"].astype(np.int32)


@functools.lru_cache(maxsize=4)
def _get_tokenizer(tokenizer_dir: str):
    """Tokenizer per directory, loaded once: encode_prompt tokenizes both
    the prompt and the negative prompt, and a per-call from_pretrained
    would hit the disk twice per request."""
    from transformers import CLIPTokenizer

    return CLIPTokenizer.from_pretrained(tokenizer_dir)


def encode_prompt(apply_fn, params, prompt, negative_prompt,
                  tokenizer_dir: Optional[str] = None,
                  dtype=jnp.bfloat16):
    """[uncond, cond] text embeddings, reference semantics
    (stable_diffusion_pipeline.py:369-405: two tower runs, concat
    negative-first, cast to the engine dtype - fp16 there, bf16 here).

    prompt / negative_prompt: (B, 77) int id arrays, or strings/lists of
    strings when `tokenizer_dir` is given.
    """
    def ids_of(p):
        if isinstance(p, str):
            p = [p]
        if isinstance(p, (list, tuple)) and p and isinstance(p[0], str):
            if tokenizer_dir is None:
                raise ValueError(
                    "string prompts need tokenizer_dir (the checkpoint's "
                    "tokenizer/ folder); pass token id arrays otherwise")
            return jnp.asarray(tokenize(p, tokenizer_dir))
        return jnp.asarray(np.asarray(p, np.int32))

    cond = apply_fn(params, ids_of(prompt))
    uncond = apply_fn(params, ids_of(negative_prompt))
    if uncond.shape[0] != cond.shape[0]:
        # the common CFG call shape: a batch of prompts with ONE negative
        # prompt - the reference tokenizes both to the same batch
        # (stable_diffusion_pipeline.py:390-394); tile to match so the
        # downstream midpoint [uncond, cond] split stays balanced
        if uncond.shape[0] != 1:
            raise ValueError(
                f"negative_prompt batch {uncond.shape[0]} must be 1 or "
                f"match prompt batch {cond.shape[0]}")
        uncond = jnp.broadcast_to(uncond, cond.shape)
    return jnp.concatenate([uncond, cond], axis=0).astype(dtype)
