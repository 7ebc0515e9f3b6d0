"""Attention compute paths.

The reference relies on TensorRT's fused C++/CUDA attention plugins:
fMHCA for cross-attention (enabled, models.py:1160) and fMHA_V2 for
self-attention (present but disabled, models.py:1158). On TPU the
equivalents are (a) an XLA dot-softmax-dot path that XLA fuses well for
the short sequences this model sees (<= 4096 latent tokens, 14-token
cross-attention kv), and (b) a Pallas flash-attention kernel for the
longer self-attention sequences. `attention()` dispatches between them;
the choice mirrors the reference's own empirical policy (fused kernel for
one case, not the other) but is re-benchmarked on TPU — see
tools/bench_attention.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Toggled by pipeline config / benchmarks. Pallas path is used for
# self-attention with enough tokens to fill MXU tiles.
_FLASH_MIN_Q_LEN = 1024

# Evaluate the softmax exp2 on bf16 logits inside the fused kernel when
# the activations are bf16. Negative result, kept measurable: an early
# microbench (stale chained-timing carry) suggested 0.69 vs 1.16 ms per
# L0 self-attention; re-measured with the data-dependent carry it is a
# REGRESSION (1.503 vs 1.318 ms at L0, tools/bench_attn_variants.py on
# v5e) - the bf16 cast before exp2 adds a pass instead of removing one.
_EXP2_BF16 = False


def _split_heads(x, num_heads):
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, l, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * hd)


def xla_attention(q, k, v, num_heads: int, scale: float | None = None):
    """Plain attention: (B, Lq, D) x (B, Lk, D) -> (B, Lq, D).

    Softmax accumulates in float32 regardless of input dtype; the two
    matmuls run in the input dtype (bf16 on TPU) on the MXU.
    """
    orig_dtype = q.dtype
    head_dim = q.shape[-1] // num_heads
    if scale is None:
        scale = head_dim**-0.5
    qh = _split_heads(q, num_heads)
    kh = _split_heads(k, num_heads)
    vh = _split_heads(v, num_heads)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores.astype(jnp.float32) * scale, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(orig_dtype), vh,
                     preferred_element_type=jnp.float32)
    return _merge_heads(out.astype(orig_dtype))


def attention(q, k, v, num_heads: int, scale: float | None = None,
              use_flash: bool | None = None):
    """Dispatching attention entry point used by all models.

    Args:
        q, k, v: (B, L, D) projections (already linear-projected).
        num_heads: head count; D % num_heads == 0.
        use_flash: force the Pallas flash path on/off; None = auto
            (flash for long self-attention on TPU).
    """
    head_dim = q.shape[-1] // num_heads
    # VMEM budget of the whole-KV-resident kernel: the K/V panel
    # (2 * Lk * hd_pad bf16) plus a (q_block, Lk) f32 score block. Longer
    # sequences (the 1024 px engine point: 16384 tokens) stream K/V
    # blocks with online softmax instead.
    # same rounding the kernel uses (flash_attention pads head_dim to the
    # next multiple of 128); max() alone undercounts e.g. hd=160 -> 256
    hd_pad = ((head_dim + 127) // 128) * 128
    itemsize = jnp.dtype(q.dtype).itemsize
    qb = 512 if hd_pad <= 128 else 128
    if itemsize > 2:
        qb = min(qb, 256)  # matches flash_attention's f32 q_block cap
    kv_bytes = 2 * k.shape[1] * hd_pad * itemsize
    score_bytes = qb * k.shape[1] * 4
    resident_fits = kv_bytes + score_bytes <= 11 * 1024 * 1024
    if use_flash is None:
        # honor the scoped pallas-off override (ops/conv3x3.conv_impl):
        # the engine's scoped-VMEM fallback re-traces under
        # conv_impl("xla") and must get a genuinely pallas-free program
        from . import conv3x3

        use_flash = (
            conv3x3.current_impl() != "xla"
            and q.shape[1] >= _FLASH_MIN_Q_LEN
            and q.shape[1] == k.shape[1]
            and head_dim <= 512
            and jax.default_backend() == "tpu"
        )
    if use_flash:
        try:
            from .flash_attention import (flash_attention,
                                          flash_attention_streaming)

            if resident_fits:
                return flash_attention(
                    q, k, v, num_heads, scale=scale,
                    exp2_bf16=_EXP2_BF16 and q.dtype == jnp.bfloat16)
            return flash_attention_streaming(q, k, v, num_heads, scale=scale)
        except Exception:  # pragma: no cover - fallback if kernel unavailable
            pass
    return xla_attention(q, k, v, num_heads, scale=scale)
