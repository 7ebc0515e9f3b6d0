"""Pallas fused attention kernel for TPU.

The TPU counterpart of the reference's TensorRT fused-attention plugins
(fMHA_V2 / fMHCA, models.py:520-646). The UNet's attention shapes are
small-sequence (self-attention <= 4096 latent tokens at 512px stamps,
cross-attention kv = 14 conditioning tokens), so instead of a
kv-streaming "flash" loop the kernel keeps the ENTIRE K/V panel plus one
query block resident in VMEM and fuses QK^T -> softmax -> PV in a single
pass: the (Lq, Lk) score matrix never touches HBM - which is precisely
the win that matters at these sizes (at 4096 tokens the plain XLA path
materializes 3x8x4096^2 fp32 scores = ~1.6 GB of HBM traffic per layer).

Head dim is zero-padded to the 128-lane boundary (SD-1.5 uses head dims
40/80/160); zero pads contribute nothing to QK^T or PV.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_LOG2E = 1.4426950408889634  # log2(e)


# Static base-2 shift for the no-max softmax (see _attn_kernel nomax):
# any constant shift cancels exactly in the normalization; 32 centers
# the f32 exp2 range for typical attention logits (|base-2 logits| < 50
# for LayerNormed q/k).
_NOMAX_SHIFT = 32.0


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                 exp2_bf16: bool = False, nomax: bool = False):
    # VPU-lean softmax: the serial VPU work between the two MXU calls is
    # what keeps this kernel off the matmul floor (profiled 1.54 ms vs
    # the 1.05 ms padded-MXU floor at the 4096-token level), so every
    # O(Bq*Lk) elementwise op counts:
    #   - `scale` AND log2(e) are folded into q BEFORE the dot: the
    #     softmax then uses exp2 directly (the VPU computes exp as
    #     exp2(x*log2e) anyway - pre-folding deletes one O(Bq*Lk)
    #     multiply pass over the score block);
    #   - the softmax divide is deferred past PV: O(Bq*hd) divides on the
    #     output instead of O(Bq*Lk) on the probabilities;
    #   - exp2_bf16 evaluates exp2 on bf16 logits: the probabilities are
    #     cast to bf16 for the PV matmul ANYWAY, so precision is
    #     unchanged to first order (the bf16 rounding moves from after
    #     exp2 to before it) while the transcendental pass runs at the
    #     packed-bf16 VPU rate and the separate f32->bf16 cast pass
    #     disappears. The row sum still accumulates in f32.
    #   - nomax replaces the row-max reduce+subtract entirely with a
    #     STATIC shift (constant shifts cancel exactly in the final
    #     normalization): deletes one O(Bq*Lk) reduce pass. Measured
    #     1.455 vs 1.728 ms at the L0 shape (tools/bench_attn_variants
    #     "nomax-safe"). Guard rails make it total: logits clamp at
    #     shift+88 (fuses into the exp2 pass; saturation instead of
    #     f32 overflow needs raw logits > 83, far beyond LayerNormed
    #     q/k), and a 1e-30 epsilon on the row sum turns the
    #     all-underflow corner (every base-2 logit < shift-126) into a
    #     zero output instead of 0/0.
    q = q_ref[0]  # (Bq, hd)
    k = k_ref[0]  # (Lk, hd)
    v = v_ref[0]  # (Lk, hd)
    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    scores = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (Bq, Lk) f32, base-2 logits
    if nomax:
        s = jnp.minimum(scores, _NOMAX_SHIFT + 88.0) - _NOMAX_SHIFT
        e = jnp.exp2(s)
        l = jnp.sum(e, axis=-1, keepdims=True) + 1e-30
        o = jnp.dot(e.astype(v.dtype), v,
                    preferred_element_type=jnp.float32)
        o_ref[0] = (o / l).astype(o_ref.dtype)
        return
    m = jnp.max(scores, axis=-1, keepdims=True)
    if exp2_bf16:
        e = jnp.exp2((scores - m).astype(jnp.bfloat16))
        s = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
        o = jnp.dot(e.astype(v.dtype), v,
                    preferred_element_type=jnp.float32)
    else:
        e = jnp.exp2(scores - m)
        s = jnp.sum(e, axis=-1, keepdims=True)
        o = jnp.dot(e.astype(v.dtype), v,
                    preferred_element_type=jnp.float32)
    o_ref[0] = (o / s).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "q_block",
                                              "exp2_bf16", "nomax"))
def flash_attention(q, k, v, num_heads: int, scale: float | None = None,
                    q_block: int | None = None, exp2_bf16: bool = False,
                    nomax: bool = True):
    """Fused attention: (B, Lq, D) x (B, Lk, D) -> (B, Lq, D).

    D = num_heads * head_dim; head_dim is padded to 128 internally.
    exp2_bf16: evaluate the softmax exp2 on bf16 logits (see
    _attn_kernel; a perf A/B knob, numerics within bf16 rounding of the
    default because probabilities feed a bf16 matmul either way).
    nomax: static-shift softmax without the row-max pass (see
    _attn_kernel; exact up to f32 rounding for any input whose raw
    logits stay below ~83 - all normalized q/k do - and saturating,
    never NaN, beyond). Applies to the unpadded-kv kernel only.
    """
    B, Lq, D = q.shape
    Lk = k.shape[1]
    hd = D // num_heads
    if q_block is None:
        q_block = 512
    if hd > 128:
        # fat heads (VAE mid: hd 512) shrink the q block so the resident
        # K/V panel + f32 score block stay inside VMEM (q_block 512 at
        # hd 512 x Lk 4096 compiles to an 18 MB scoped allocation - OOM)
        q_block = min(q_block, 128)
    if jnp.dtype(q.dtype).itemsize > 2:
        # f32 inputs double the exp2-output block (e stays f32 instead of
        # bf16): q_block 512 at Lk 4096 compiles to a 16.25 MB scoped
        # allocation vs the 16 MB limit. Halving the q block keeps the
        # f32 fidelity-reference path (tools/check_bf16_fidelity.py)
        # compiling; bf16 serving is untouched.
        q_block = min(q_block, 256)
    if scale is None:
        scale = hd**-0.5

    def split(x, L):
        x = x.reshape(B, L, num_heads, hd).transpose(0, 2, 1, 3)
        return x.reshape(B * num_heads, L, hd)

    qh, kh, vh = split(q, Lq), split(k, Lk), split(v, Lk)

    lk_pad = _round_up(Lk, 128)
    bq = min(q_block, _round_up(Lq, 128))
    lq_pad = _round_up(Lq, bq)
    # The head dim is NOT explicitly padded on the main path: a block
    # whose last dim equals the full array dim is legal at any size, and
    # Mosaic pads the VMEM tiles internally - so the jnp.pad HBM pass
    # (and 3.2x kernel IO at hd 40) exists only on the padded-kv branch.
    # Measured 1.464 vs 1.505 ms at the L0 shape, 0.376 vs 0.429 at L1
    # (tools/bench_attn_variants.py nomax-unpadded).
    hd_pad = hd
    if lq_pad != Lq:
        qh = jnp.pad(qh, ((0, 0), (0, lq_pad - Lq), (0, 0)))
    if lk_pad != Lk:
        hd_pad = _round_up(hd, 128)
        pad = ((0, 0), (0, 0), (0, hd_pad - hd))
        qh, kh, vh = jnp.pad(qh, pad), jnp.pad(kh, pad), jnp.pad(vh, pad)
        # pad keys with -inf-scoring sentinels: zero k gives score 0, which
        # would pollute softmax - instead pad v with zeros and mask via a
        # large negative bias folded into k's pad? Simplest: pad k with
        # zeros and subtract inf on padded columns inside the kernel is
        # overkill here because every caller has Lk in {14, 64, 256, 1024,
        # 4096} -> only 14 needs padding, handled by the caller-side mask
        # below.
        kh = jnp.pad(kh, ((0, 0), (0, lk_pad - Lk), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, lk_pad - Lk), (0, 0)))

    grid = (B * num_heads, lq_pad // bq)
    kernel = _attn_kernel
    if lk_pad != Lk:
        # mask padded kv columns with -inf before softmax
        def kernel(q_ref, k_ref, v_ref, o_ref, *, scale=scale, true_lk=Lk):
            qb = q_ref[0]
            kb = k_ref[0]
            vb = v_ref[0]
            qs = (qb.astype(jnp.float32) * (scale * _LOG2E)).astype(qb.dtype)
            scores = jax.lax.dot_general(
                qs, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(col < true_lk, scores, -jnp.inf)
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp2(scores - m)
            s = jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.dot(e.astype(vb.dtype), vb,
                        preferred_element_type=jnp.float32)
            o_ref[0] = (o / s).astype(o_ref.dtype)
    else:
        kernel = functools.partial(_attn_kernel, scale=scale,
                                   exp2_bf16=exp2_bf16, nomax=nomax)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * num_heads, lq_pad, hd_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, hd_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, hd_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, hd_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, hd_pad), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * num_heads * lq_pad * lk_pad * hd_pad,
            bytes_accessed=(B * num_heads * (lq_pad + 2 * lk_pad + lq_pad)
                            * hd_pad * 2),
            transcendentals=B * num_heads * lq_pad * lk_pad,
        ),
    )(qh, kh, vh)

    out = out[:, :Lq, :hd]
    out = out.reshape(B, num_heads, Lq, hd).transpose(0, 2, 1, 3)
    return out.reshape(B, Lq, D)


# ---------------------------------------------------------------------------
# Slotted-layout fused attention.
#
# The entry above spends ~30% of its wall time OUTSIDE the kernel: the
# (B, L, h*hd) -> (B*h, L, hd_pad) head split + transpose + lane pad are
# three full HBM passes per operand (measured 0.30 ms of the ~1.0 ms L0
# call; tools/bench_attn_variants.py). This entry instead consumes
# tensors in a HEAD-SLOTTED layout (B, L, h*128): each head owns a
# 128-lane slot with the real head_dim in the first hd lanes and zeros
# after. The caller produces that layout FOR FREE by zero-padding the
# projection weights per head (models/layers.py Attention._slot_kernel:
# concat @ W_slotted is exact - pad lanes multiply zero weight columns),
# and the output projection consumes it directly with zero pad ROWS, so
# no relayout pass exists anywhere. The head becomes a pure grid
# dimension with lane-aligned block slices. The softmax runs exp2 on
# bf16 logits by default (measured 0.69 vs 1.16 ms at the L0 shape; see
# _attn_kernel's exp2_bf16 note for why precision is unchanged to first
# order).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "q_block",
                                              "exp2_bf16"))
def flash_attention_slotted(q, k, v, num_heads: int, scale: float,
                            q_block: int = 512, exp2_bf16: bool = True):
    """Fused attention over head-slotted tensors.

    q: (B, Lq, num_heads*128), k/v: (B, Lk, num_heads*128) - each head's
    features in lanes [h*128, h*128+hd) with zero pad lanes (the caller
    guarantees the pad lanes of k and v are zero; zero k-lanes add 0 to
    every score and zero v-lanes produce zero output pad lanes).
    Returns (B, Lq, num_heads*128) in the same layout. `scale` must be
    hd**-0.5 for the REAL head dim (the kernel cannot infer hd).
    """
    B, Lq, Dp = q.shape
    Lk = k.shape[1]
    assert Dp == num_heads * 128, (Dp, num_heads)
    bq = min(q_block, Lq)
    assert Lq % bq == 0 and Lk % 128 == 0, (Lq, Lk, bq)
    kernel = functools.partial(_attn_kernel, scale=scale,
                               exp2_bf16=exp2_bf16)
    return pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        out_shape=jax.ShapeDtypeStruct((B, Lq, Dp), q.dtype),
        grid=(B, num_heads, Lq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, 128), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, 128), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, 128), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, 128), lambda b, h, i: (b, i, h),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * num_heads * Lq * Lk * 128,
            bytes_accessed=B * num_heads * (2 * Lq + 2 * Lk) * 128 * 2,
            transcendentals=B * num_heads * Lq * Lk,
        ),
    )(q, k, v)


def slotted_self_attention_fits(Lq: int, Lk: int, head_dim: int,
                                q_block: int = 512) -> bool:
    """Whether the slotted kernel's resident K/V panel + score block fit
    VMEM and the shapes satisfy its blocking (one head-slot K/V panel of
    (Lk, 128) bf16 x2 plus a (q_block, Lk) f32 score block)."""
    if head_dim > 128 or Lq % 128 or Lk % 128:
        return False
    bq = min(q_block, Lq)
    if Lq % bq:
        return False
    kv_bytes = 2 * Lk * 128 * 2
    score_bytes = bq * Lk * 4
    return kv_bytes + score_bytes <= 11 * 1024 * 1024


# ---------------------------------------------------------------------------
# KV-streaming flash attention (online softmax).
#
# The whole-KV-resident kernel above needs lk * hd_pad * 2 * 2 bytes of
# VMEM for the K/V panel plus a (bq, lk) f32 score block - fine for the
# <= 4096-token sequences of 256/512 px stamps, impossible at the
# engine envelope's 1024 px point (128^2 latent = 16384 tokens: 8.4 MB
# panel + 33 MB scores; the unfused XLA path would materialize a 25 GB
# score tensor). This kernel streams K/V in blocks with the standard
# running (max, sum, acc) online-softmax state, so VMEM use is
# O(bq*hd + bk*hd + bq*bk) regardless of sequence length - the same
# algorithm as the reference's TRT fMHA flash plugins (models.py:594-646).
# ---------------------------------------------------------------------------


def _stream_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                   *, scale: float, true_lk: int, bk: int, nk: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    qb = q_ref[0]  # (bq, hd)
    kb = k_ref[0]  # (bk, hd)
    vb = v_ref[0]
    # scale and log2(e) folded into q: O(bq*hd) multiplies instead of
    # O(bq*bk), and the online softmax runs in base-2 (exp2 directly)
    qs = (qb.astype(jnp.float32) * (scale * _LOG2E)).astype(qb.dtype)
    s = jax.lax.dot_general(qs, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    col = ki * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < true_lk, s, -1e30)

    m_prev = m_scr[:, 0:1]           # (bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2(s - m_new)          # (bq, bk) f32
    corr = jnp.exp2(m_prev - m_new)  # (bq, 1)
    l_new = l_scr[:, 0:1] * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[...] = acc_scr[...] * corr + jnp.dot(
        p.astype(vb.dtype), vb, preferred_element_type=jnp.float32)
    m_scr[:, 0:1] = m_new
    l_scr[:, 0:1] = l_new

    @pl.when(ki == nk - 1)
    def _finish():
        o_ref[0] = (acc_scr[...] / l_scr[:, 0:1]).astype(o_ref.dtype)


def flash_attention_streaming(q, k, v, num_heads: int,
                              scale: float | None = None,
                              q_block: int = 256, kv_block: int = 1024):
    """Streaming-KV fused attention for long sequences (any Lk).

    Same interface/result as `flash_attention`; use for sequences whose
    K/V panel or score block exceeds VMEM (ops/attention.py dispatches).
    """
    B, Lq, D = q.shape
    Lk = k.shape[1]
    hd = D // num_heads
    if scale is None:
        scale = hd**-0.5

    def split(x, L):
        x = x.reshape(B, L, num_heads, hd).transpose(0, 2, 1, 3)
        return x.reshape(B * num_heads, L, hd)

    qh, kh, vh = split(q, Lq), split(k, Lk), split(v, Lk)
    hd_pad = _round_up(hd, 128)
    bq = min(q_block, _round_up(Lq, 128))
    bk = min(kv_block, _round_up(Lk, 128))
    lq_pad = _round_up(Lq, bq)
    lk_pad = _round_up(Lk, bk)
    if hd_pad != hd:
        pad = ((0, 0), (0, 0), (0, hd_pad - hd))
        qh, kh, vh = jnp.pad(qh, pad), jnp.pad(kh, pad), jnp.pad(vh, pad)
    if lq_pad != Lq:
        qh = jnp.pad(qh, ((0, 0), (0, lq_pad - Lq), (0, 0)))
    if lk_pad != Lk:
        kh = jnp.pad(kh, ((0, 0), (0, lk_pad - Lk), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, lk_pad - Lk), (0, 0)))

    nk = lk_pad // bk
    # Invariant the kernel's -1e30 column masking relies on: the pad is
    # strictly smaller than one KV block, so no block is ever FULLY
    # masked (a fully-masked block would make m_new = -1e30 and
    # p = exp(0) = 1 for every padded column, corrupting the softmax
    # denominator). Guaranteed by lk_pad = round_up(Lk, bk); keep it so
    # if block-size selection changes.
    assert lk_pad - Lk < bk, (lk_pad, Lk, bk)
    kernel = functools.partial(_stream_kernel, scale=scale, true_lk=Lk,
                               bk=bk, nk=nk)
    out = pl.pallas_call(
        kernel,
        grid=(B * num_heads, lq_pad // bq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, hd_pad), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, hd_pad), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, hd_pad), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, hd_pad), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * num_heads, lq_pad, hd_pad),
                                       q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),   # running max
            pltpu.VMEM((bq, 128), jnp.float32),   # running sum
            pltpu.VMEM((bq, hd_pad), jnp.float32),  # running output
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * num_heads * lq_pad * lk_pad * hd_pad,
            bytes_accessed=(B * num_heads
                            * (lq_pad + 2 * lk_pad + lq_pad) * hd_pad * 2),
            transcendentals=B * num_heads * lq_pad * lk_pad,
        ),
    )(qh, kh, vh)

    out = out[:, :Lq, :hd]
    out = out.reshape(B, num_heads, Lq, hd).transpose(0, 2, 1, 3)
    return out.reshape(B, Lq, D)
