"""Shared Flax building blocks for the diffusion model family.

NHWC layout throughout (TPU-native conv layout). Mixed precision policy:
params live in float32; `dtype` is the compute dtype (bf16 on TPU);
normalization statistics always accumulate in float32.

These blocks cover what the reference gets from diffusers modules +
TensorRT plugin graph surgery (models.py:250-420): GroupNorm+SiLU,
LayerNorm, GEGLU, and attention all fuse under XLA without plugins.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import attention
from ..ops.conv3x3 import Conv3x3, upsample2x_conv3x3


def timestep_embedding(timesteps, dim: int, flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0,
                       max_period: float = 10000.0):
    """Sinusoidal timestep embedding (SD convention: flip_sin_to_cos=True,
    freq_shift=0). timesteps: (B,) float -> (B, dim) float32."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


# Toggled by benchmarks; see _moment_sums.
_VARIADIC_STATS = False


def _moment_sums(xf, axes):
    """(sum, sum-of-squares) over `axes` of an f32 tensor.

    Negative result, kept measurable: a variadic lax.reduce computing
    both moments in "one pass" measured 1.7x SLOWER end-to-end on v5e
    (VAE decoder 30.6 vs 18.0 ms) than two jnp.sum calls - XLA already
    fuses the two reduces into one multi-output fusion that reads x
    once, while the variadic reduce lowers to a slow generic loop.
    """
    if _VARIADIC_STATS:
        return jax.lax.reduce(
            (xf, jnp.square(xf)), (jnp.float32(0), jnp.float32(0)),
            lambda acc, v: (acc[0] + v[0], acc[1] + v[1]), axes)
    return jnp.sum(xf, axis=axes), jnp.sum(jnp.square(xf), axis=axes)


class GroupNorm32(nn.Module):
    """GroupNorm: statistics in float32, normalization applied in the
    activation dtype.

    Bandwidth note: a full-f32 GroupNorm doubles HBM traffic on bf16
    activations (the VAE works on 512x512x128 tensors = 67 MB each);
    reducing in f32 but scaling in bf16 keeps the accuracy of the
    statistics while moving only bf16 bytes.
    """

    num_groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, params_only: bool = False):
        c = x.shape[-1]
        g = self.num_groups
        # child module named "norm" keeps the param paths (norm/scale,
        # norm/bias) identical to the previous nn.GroupNorm layout that the
        # weight converter targets.
        scale, bias = _ScaleBias(c, name="norm")()
        if params_only:
            # declare-only mode for callers that fold the norm into a
            # fused conv kernel (ResnetBlock fused path); x supplies only
            # the channel count.
            return scale, bias
        # Group statistics in two stages that never change the tensor's
        # native NHWC (C-in-lanes) layout:
        #   1. one fused pass over x reducing the spatial axes in f32
        #      (multi-output reduce: sum and sum-of-squares together),
        #   2. a tiny (B,C)@(C,g) matmul against a one-hot group matrix to
        #      collapse channels into groups.
        # The obvious reshape-to-(..., g, C/g)-and-reduce forces XLA into a
        # transposed (2,128)-tiled f32 materialization that cost ~8 ms per
        # VAE-scale tensor (profiled); this formulation is pure bandwidth.
        group_mat = jnp.asarray(
            np.kron(np.eye(g), np.ones((c // g, 1))), jnp.float32)  # (C, g)
        n_per_group = (c // g) * int(np.prod(x.shape[1:-1]))
        xf = x.astype(jnp.float32)
        axes = tuple(range(1, x.ndim - 1))
        s1, s2 = _moment_sums(xf, axes)
        s1 = s1 @ group_mat  # (B, g)
        s2 = s2 @ group_mat
        mean_g = s1 / n_per_group
        var_g = s2 / n_per_group - jnp.square(mean_g)
        inv_g = jax.lax.rsqrt(var_g + self.eps)
        # broadcast per-group stats back to per-channel via (g, C) gather
        mean_c = mean_g @ group_mat.T  # (B, C)
        inv_c = inv_g @ group_mat.T
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
        y = (x - mean_c.reshape(shape).astype(x.dtype)) \
            * inv_c.reshape(shape).astype(x.dtype)
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


class _ScaleBias(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return scale, bias


class _ProjParams(nn.Module):
    """Declares nn.Dense-shaped params (kernel (din, dout), bias (dout,))
    without computing, so callers can fuse several projections into one
    matmul while keeping the checkpoint tree identical to nn.Dense."""

    din: int
    dout: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.din, self.dout), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.dout,),
                           jnp.float32) if self.use_bias else None)
        return kernel, bias


# LayerNorm implementation switch (benchmarks flip this):
#   "f32"    - upcast x to f32, nn.LayerNorm in f32, cast back
#   "apply16" - stats in f32 (two fused reduces over the bf16 input),
#              normalization applied in the activation dtype; x is never
#              materialized in f32
_LN_IMPL = "f32"


class LayerNorm32(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        if _LN_IMPL == "apply16":
            c = x.shape[-1]
            scale, bias = _ScaleBias(c, name="norm")()
            xf = x.astype(jnp.float32)
            m = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) \
                - jnp.square(m)
            inv = jax.lax.rsqrt(var + self.eps)
            y = (x - m.astype(orig)) * inv.astype(orig)
            return y * scale.astype(orig) + bias.astype(orig)
        out = nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32,
                           param_dtype=jnp.float32,
                           name="norm")(x.astype(jnp.float32))
        return out.astype(orig)


def _slot_kernel(w, num_heads: int, head_dim: int):
    """(Din, h*hd) projection kernel -> (Din, h*128) head-slotted kernel:
    each head's hd output columns land at lane offset h*128, zeros after.
    x @ slotted == the slotted layout of x @ w, exactly (the pad columns
    are zero weights)."""
    din = w.shape[0]
    w3 = w.reshape(din, num_heads, head_dim)
    w3 = jnp.pad(w3, ((0, 0), (0, 0), (0, 128 - head_dim)))
    return w3.reshape(din, num_heads * 128)


def _slot_rows(w, num_heads: int, head_dim: int):
    """(h*hd, Dout) kernel -> (h*128, Dout) with zero pad ROWS, so a
    head-slotted activation consumes it directly: slotted @ out == the
    unslotted activation @ w (pad lanes hit zero rows)."""
    dout = w.shape[1]
    w3 = w.reshape(num_heads, head_dim, dout)
    w3 = jnp.pad(w3, ((0, 0), (0, 128 - head_dim), (0, 0)))
    return w3.reshape(num_heads * 128, dout)


def _slot_bias(b, num_heads: int, head_dim: int):
    b2 = b.reshape(num_heads, head_dim)
    return jnp.pad(b2, ((0, 0), (0, 128 - head_dim))).reshape(-1)


class Attention(nn.Module):
    """Multi-head attention with linear projections.

    Covers the UNet's self/cross attention (no qkv bias, out bias) and the
    patch encoder's attention (qkv bias), replacing the reference's TRT
    fMHA/fMHCA plugins with XLA/Pallas compute (ops/attention.py).

    slotted=True (serving-only, self-attention on TPU): the q/k/v
    projections run against head-SLOTTED weights (each head's head_dim
    columns zero-padded to a 128-lane slot), so the projection matmul
    itself emits the layout the fused attention kernel consumes and the
    output projection consumes the kernel's result directly - the
    (B, L, D) <-> (B*h, L, hd_pad) split/transpose/pad HBM passes of the
    plain path (~30% of the attention wall time at the UNet's L0 shape)
    do not exist. Identical param tree; no VJP on the kernel, so training
    keeps slotted=False.
    """

    num_heads: int
    head_dim: int
    kv_dim: Optional[int] = None  # cross-attention key/value feature dim
    qkv_bias: bool = False
    out_bias: bool = True
    slotted: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, batch=None):
        inner = self.num_heads * self.head_dim
        if (self.slotted and context is None and x.ndim == 3
                and jax.default_backend() == "tpu"):
            from ..ops.flash_attention import (
                flash_attention_slotted,
                slotted_self_attention_fits,
            )

            if slotted_self_attention_fits(x.shape[1], x.shape[1],
                                           self.head_dim):
                h, hd = self.num_heads, self.head_dim
                wq, bq = _ProjParams(x.shape[-1], inner, self.qkv_bias,
                                     name="to_q")()
                wk, bk = _ProjParams(x.shape[-1], inner, self.qkv_bias,
                                     name="to_k")()
                wv, bv = _ProjParams(x.shape[-1], inner, self.qkv_bias,
                                     name="to_v")()
                wqkv = jnp.concatenate(
                    [_slot_kernel(w, h, hd) for w in (wq, wk, wv)],
                    axis=-1).astype(self.dtype)
                qkv = jnp.dot(x.astype(self.dtype), wqkv)
                if self.qkv_bias:
                    bqkv = jnp.concatenate(
                        [_slot_bias(b, h, hd) for b in (bq, bk, bv)])
                    qkv = qkv + bqkv.astype(qkv.dtype)
                q, k, v = jnp.split(qkv, 3, axis=-1)
                out = flash_attention_slotted(q, k, v, h,
                                              scale=hd**-0.5)
                wo, bo = _ProjParams(inner, x.shape[-1], self.out_bias,
                                     name="to_out")()
                y = jnp.dot(out, _slot_rows(wo, h, hd).astype(self.dtype))
                return y if bo is None else y + bo.astype(y.dtype)
        # 4D NHWC input (see Transformer2D _T2D_4D): project in 4D, flatten
        # only around the attention math itself. 2D (B*L, C) input (see
        # _T2D_2D) requires `batch` to split back for the softmax.
        spatial = x.shape[1:-1] if x.ndim == 4 else None
        flat2d = x.ndim == 2
        if flat2d and batch is None:
            raise ValueError("2D attention input needs batch=")
        ctx = x if context is None else context
        # Param tree matches nn.Dense (to_q/kernel etc.) but the q/k/v
        # projections run as ONE matmul on the concatenated weights when
        # they share an input (self-attention), or q + fused kv
        # (cross-attention): same math column-for-column, fewer/larger
        # MXU calls than three separate gemms.
        proj = lambda name, din, dout, bias: _ProjParams(
            din, dout, bias, name=name)()
        wq, bq = proj("to_q", x.shape[-1], inner, self.qkv_bias)
        wk, bk = proj("to_k", ctx.shape[-1], inner, self.qkv_bias)
        wv, bv = proj("to_v", ctx.shape[-1], inner, self.qkv_bias)

        def matmul(inp, w, b):
            y = jnp.dot(inp.astype(self.dtype), w.astype(self.dtype))
            return y if b is None else y + b.astype(y.dtype)

        cat = lambda *ws: jnp.concatenate(ws, axis=-1)
        if context is None:
            qkv = matmul(x, cat(wq, wk, wv),
                         cat(bq, bk, bv) if self.qkv_bias else None)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = matmul(x, wq, bq)
            kv = matmul(ctx, cat(wk, wv),
                        cat(bk, bv) if self.qkv_bias else None)
            k, v = jnp.split(kv, 2, axis=-1)
        if spatial is not None:
            flat = lambda a: a.reshape(a.shape[0], -1, a.shape[-1])
            q = flat(q)
            if k.ndim == 4:
                k, v = flat(k), flat(v)
        if flat2d:
            q = q.reshape(batch, -1, inner)
            if k.ndim == 2:
                k = k.reshape(batch, -1, inner)
                v = v.reshape(batch, -1, inner)
        out = attention(q, k, v, self.num_heads)
        if spatial is not None:
            out = out.reshape((out.shape[0],) + spatial + (out.shape[-1],))
        if flat2d:
            out = out.reshape(-1, inner)
        return nn.Dense(x.shape[-1], use_bias=self.out_bias, dtype=self.dtype,
                        param_dtype=jnp.float32, name="to_out")(out)


class _DenseParams(nn.Module):
    """Declare-only twin of nn.Dense's param tree (kernel/bias, f32) for
    callers that consume the weights inside a fused pallas kernel."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class _Conv1x1Params(nn.Module):
    """Declare-only twin of nn.Conv(features, (1,1))'s param tree for
    callers that consume the weights algebraically (Transformer2D's
    folded-GN proj_in)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, self.in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class GEGLU(nn.Module):
    """Gated GELU feed-forward input projection (reference: the SplitGeLU
    TRT plugin, models.py:367-389; XLA fuses this natively)."""

    inner_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, params_only: bool = False):
        if params_only:
            return _DenseParams(self.inner_dim * 2, x.shape[-1],
                                name="proj")()
        proj = nn.Dense(self.inner_dim * 2, dtype=self.dtype,
                        param_dtype=jnp.float32, name="proj")(x)
        h, gate = jnp.split(proj, 2, axis=-1)
        return h * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """Transformer FF: GEGLU (UNet) or plain GELU (patch encoder).

    `fused=True` (serving-only, geglu flavor) runs the whole FF - both
    projections and the gate - as one token-blocked pallas kernel
    (ops/ff_geglu.py) so the (tokens, 4C) intermediate never touches HBM;
    the residual add rides the kernel epilogue. Identical param tree.
    """

    mult: int = 4
    activation: str = "geglu"
    fused: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None):
        dim = x.shape[-1]
        inner = dim * self.mult
        if self.fused and self.activation == "geglu" and residual is not None:
            from ..ops.ff_geglu import ff_geglu, ff_geglu_plan

            x2 = x.reshape(-1, dim)
            if (jax.default_backend() != "tpu"
                    or ff_geglu_plan(x2.shape[0], dim, inner) is not None):
                w0, b0 = GEGLU(inner, dtype=self.dtype,
                               name="net_0")(x, params_only=True)
                w2, b2 = _DenseParams(dim, inner, name="net_2")()
                dt = self.dtype
                out = ff_geglu(x2.astype(dt), w0.astype(dt), b0.astype(dt),
                               w2.astype(dt), b2.astype(dt),
                               residual.reshape(-1, dim).astype(dt))
                return out.reshape(residual.shape)
        if self.activation == "geglu":
            h = GEGLU(inner, dtype=self.dtype, name="net_0")(x)
        elif self.activation == "gelu":
            h = nn.Dense(inner, dtype=self.dtype, param_dtype=jnp.float32,
                         name="net_0")(x)
            h = nn.gelu(h, approximate=False)
        else:
            raise ValueError(self.activation)
        out = nn.Dense(dim, dtype=self.dtype, param_dtype=jnp.float32,
                       name="net_2")(h)
        return out if residual is None else residual + out


class BasicTransformerBlock(nn.Module):
    """LN -> self-attn -> LN -> cross-attn -> LN -> FF, all residual.

    Matches the topology of the diffusers block the reference uses for both
    the UNet (geglu, no attn bias, cross_dim=768) and the patch encoder
    (gelu, attn bias, attn2 degenerates to self-attention when no context
    is given - reference image_encoder.py:59-70).
    """

    num_heads: int
    head_dim: int
    kv_dim: Optional[int] = None
    qkv_bias: bool = False
    ff_activation: str = "geglu"
    ff_fused: bool = False
    attn_slotted: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        batch = None
        orig_shape = None
        if _T2D_2D and x.ndim == 3:
            # pointwise ops (LN / projections / FF) on (B*L, C); only the
            # attention math sees (B, L, C) - see the _T2D_2D note above
            batch = x.shape[0]
            orig_shape = x.shape
            x = x.reshape(-1, x.shape[-1])
        h = LayerNorm32(name="norm1")(x)
        x = x + Attention(self.num_heads, self.head_dim, qkv_bias=self.qkv_bias,
                          slotted=self.attn_slotted,
                          dtype=self.dtype, name="attn1")(h, batch=batch)
        h = LayerNorm32(name="norm2")(x)
        x = x + Attention(self.num_heads, self.head_dim, kv_dim=self.kv_dim,
                          qkv_bias=self.qkv_bias, dtype=self.dtype,
                          name="attn2")(h, context, batch=batch)
        h = LayerNorm32(name="norm3")(x)
        x = FeedForward(activation=self.ff_activation, fused=self.ff_fused,
                        dtype=self.dtype, name="ff")(h, residual=x)
        if orig_shape is not None:
            x = x.reshape(orig_shape)
        return x


class ResnetBlock(nn.Module):
    """SD resnet block: GN-SiLU-Conv x2 with optional time conditioning.

    The GroupNorm+SiLU pairs are what the reference fuses via its TRT
    GroupNorm plugin (models.py:250-302); XLA fuses them for free.
    """

    out_channels: int
    num_groups: int = 32
    use_temb: bool = True
    # diffusers convention: UNet resnets use norm_eps=1e-5
    # (UNet2DConditionModel default), the VAE's Encoder/Decoder hardcode
    # resnet_eps=1e-6 - callers must pass the right one for parity.
    eps: float = 1e-5
    # Serving-only chained-GN execution: both GroupNorm+SiLU pairs are
    # folded into the 3x3 convs (ops/conv3x3.py gn_conv_resident: affine
    # prologue in VMEM + stats epilogue), eliminating the standalone GN2
    # reduce and both GN-apply/SiLU HBM round trips; the time embedding is
    # folded algebraically into GN2's affine (stats shift + c' = c + t*a).
    # No VJP - training keeps the module path. Measured 11% faster per
    # resnet chain at the 512px L0 shape (tools/bench_resnet_chain.py).
    fused: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, return_stats: bool = False, skip=None):
        """return_stats=True -> (out, stats-or-None): the fused path's
        final kernel emits (sum, sumsq) of the post-residual output so a
        following Transformer2D can fold its GroupNorm without re-reading
        the tensor (None when this shape fell back to the module leg).

        skip: optional UNet up-path skip tensor, kept UN-concatenated.
        Math is identical to calling with x = concat([x, skip], -1), but
        the fused path never materializes the concat (split-weight
        algebra: concat @ W == x @ W[:Ca] + skip @ W[Ca:]):
          - GroupNorm stats are per-channel sums, so the concat's stats
            are just the channel-concat of each part's stats;
          - conv1 runs as two chained resident kernels (9 taps on each
            part, second accumulates onto the first via its residual
            input) - same MXU FLOPs as 9 taps over the concat;
          - the 1x1 conv_shortcut becomes two clean GEMMs on the parts.
        This removes the concat write+read (2x the concat bytes/resnet)
        and replaces XLA's concat-fused 1x1 convs (profiled at 28% MFU)
        with plain matmuls; it also splits concat convs whose padded
        image exceeds the resident kernel's VMEM budget (Cin 960 at
        64x64) into two halves that both fit.
        """
        in_ch = x.shape[-1] + (0 if skip is None else skip.shape[-1])
        # Conv3x3: pallas implicit-GEMM on TPU (ops/conv3x3.py), XLA conv
        # elsewhere; identical param tree to nn.Conv.
        conv = lambda name, ch: Conv3x3(ch, dtype=self.dtype, name=name)
        norm1 = GroupNorm32(self.num_groups, eps=self.eps, name="norm1")
        norm2 = GroupNorm32(self.num_groups, eps=self.eps, name="norm2")
        conv1 = conv("conv1", self.out_channels)
        conv2 = conv("conv2", self.out_channels)
        t = None
        if self.use_temb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         param_dtype=jnp.float32, name="time_emb_proj")(
                nn.silu(temb))
        if self.fused:
            from ..ops.conv3x3 import (
                gn_conv_resident,
                gn_conv_resident_plan,
            )
            from ..ops.gn_conv_stream import (
                gn_affine_from_stats,
                shift_stats_for_temb,
                stats_of,
            )

            dt = self.dtype
            B, H, W = x.shape[0], x.shape[1], x.shape[2]
            ca = x.shape[-1]
            out_sh = (B, H, W, self.out_channels)
            w1_sh = (3, 3, in_ch, self.out_channels)
            w2_sh = (3, 3, self.out_channels, self.out_channels)
            on_tpu = jax.default_backend() == "tpu"
            # Per-conv hybrid: a conv whose shape the resident kernel
            # cannot take falls back to the MODULE leg (GroupNorm fusion +
            # pallas implicit-GEMM conv), never to an unfused XLA conv -
            # the up-block concat conv1s (Cin 960-2560) turned into f32
            # XLA convs otherwise and cost +3.5 ms/UNet-step.
            it = jnp.dtype(dt).itemsize
            if skip is None:
                fuse1 = (not on_tpu
                         or gn_conv_resident_plan(x.shape, w1_sh, False,
                                                  itemsize=it)
                         is not None)
            else:
                # split path: both halves must take the resident kernel
                fuse1 = (not on_tpu or (
                    gn_conv_resident_plan(
                        x.shape, (3, 3, ca, self.out_channels), False,
                        itemsize=it)
                    is not None
                    and gn_conv_resident_plan(
                        skip.shape, (3, 3, in_ch - ca, self.out_channels),
                        True, itemsize=it) is not None))
            fuse2 = (not on_tpu
                     or gn_conv_resident_plan(out_sh, w2_sh, True,
                                              itemsize=it)
                     is not None)
            if fuse2:
                n_sp = H * W
                xd = x.astype(dt)
                dummy_in = jnp.zeros((1, 1, 1, in_ch), dt)
                if fuse1:
                    s1, b1 = norm1(dummy_in, params_only=True)
                    w1, cb1 = conv1(dummy_in, params_only=True)
                    if skip is None:
                        a1, c1 = gn_affine_from_stats(
                            stats_of(xd), s1, b1, self.num_groups, n_sp,
                            self.eps)
                        h, st_mid = gn_conv_resident(
                            xd, a1, c1, w1.astype(dt), cb1.astype(dt),
                            None, True, True)
                    else:
                        sd = skip.astype(dt)
                        st_in = jnp.concatenate(
                            [stats_of(xd), stats_of(sd)], axis=-1)
                        a1, c1 = gn_affine_from_stats(
                            st_in, s1, b1, self.num_groups, n_sp, self.eps)
                        h1, _ = gn_conv_resident(
                            xd, a1[:, :ca], c1[:, :ca],
                            w1[:, :, :ca].astype(dt), cb1.astype(dt),
                            None, False, True)
                        h, st_mid = gn_conv_resident(
                            sd, a1[:, ca:], c1[:, ca:],
                            w1[:, :, ca:].astype(dt), None, h1, True, True)
                else:
                    xcat = (x if skip is None
                            else jnp.concatenate([x, skip], axis=-1))
                    h = conv1(nn.silu(norm1(xcat)))
                    st_mid = stats_of(h)
                dummy_out = jnp.zeros((1, 1, 1, self.out_channels), dt)
                s2, b2 = norm2(dummy_out, params_only=True)
                w2, cb2 = conv2(dummy_out, params_only=True)
                if t is not None:
                    st_mid = shift_stats_for_temb(st_mid, t, n_sp)
                a2, c2 = gn_affine_from_stats(st_mid, s2, b2,
                                              self.num_groups, n_sp,
                                              self.eps)
                if t is not None:
                    c2 = c2 + t.astype(jnp.float32) * a2
                if skip is not None and in_ch != self.out_channels:
                    # split-weight 1x1 shortcut: two plain GEMMs instead
                    # of a concat-fused conv (concat@W = x@W[:ca]+s@W[ca:])
                    ksh, bsh = _Conv1x1Params(self.out_channels, in_ch,
                                              name="conv_shortcut")()
                    w00 = ksh[0, 0]
                    res = (jnp.einsum("bhwc,cd->bhwd", x.astype(dt),
                                      w00[:ca].astype(dt))
                           + jnp.einsum("bhwc,cd->bhwd", skip.astype(dt),
                                        w00[ca:].astype(dt))
                           + bsh.astype(dt))
                elif skip is not None:
                    res = jnp.concatenate([x, skip], axis=-1)
                else:
                    res = x
                    if in_ch != self.out_channels:
                        res = nn.Conv(self.out_channels, (1, 1),
                                      dtype=self.dtype,
                                      param_dtype=jnp.float32,
                                      name="conv_shortcut")(x)
                out, st = gn_conv_resident(h, a2, c2, w2.astype(dt),
                                           cb2.astype(dt), res.astype(dt),
                                           return_stats, True)
                return (out, st) if return_stats else out
            # conv2 ineligible (image exceeds the resident budget):
            # whole-module path below.
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        h = norm1(x)
        h = conv1(nn.silu(h))
        if t is not None:
            h = h + t[:, None, None, :]
        h = norm2(h)
        h = conv2(nn.silu(h))
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv_shortcut")(x)
        out = x + h
        return (out, None) if return_stats else out


class Downsample(nn.Module):
    """Stride-2 3x3 conv. `asymmetric_pad` matches the VAE encoder's
    (0,1,0,1) padding; the UNet uses symmetric pad=1."""

    out_channels: int
    asymmetric_pad: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.asymmetric_pad:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            pad = "VALID"
        else:
            pad = 1
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=pad,
                       dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)


class Upsample(nn.Module):
    """Nearest x2 + 3x3 conv, fused as four subpixel 2x2-tap convs on TPU
    (ops/conv3x3.py upsample2x_conv3x3): 2.25x fewer conv FLOPs and no 4x
    upsampled materialization. Param tree identical to the unfused
    Conv3x3/nn.Conv ("conv" child)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel, bias = Conv3x3(self.out_channels, dtype=self.dtype,
                               name="conv")(x, params_only=True)
        return upsample2x_conv3x3(x.astype(self.dtype),
                                  kernel.astype(self.dtype),
                                  bias.astype(self.dtype))


# Layout experiment switch - negative result, kept measurable: running
# the transformer blocks on the 4D NHWC tensor (flattening to (B, L, C)
# only inside the attention math) measured 34.2 vs 30.4 ms/UNet-step
# (within-session A/B on v5e) - the extra reshapes around every attention
# cost more than the token-minor {1,2,0} FF layouts they were meant to
# avoid; XLA's layout choice for the 3D form is already sound.
_T2D_4D = False

# Second layout experiment - negative result, kept measurable: run every
# POINTWISE op of the transformer blocks (LayerNorms, q/kv projections,
# FF) on a 2D (B*L, C) tensor, splitting back to (B, L, C) only around
# the attention math. Motivation was the 3D FF dots landing in
# token-minor {1,2,0} layouts at ~38 TF/s; measured 32.27 vs 31.36
# ms/UNet-step (within-session A/B on v5e, tools/bench_t2d_layout.py) -
# XLA re-inserts the layout transitions around the attention reshapes,
# so collapsing the batch dim buys nothing. Together with the 4D
# experiment above: XLA's token-minor FF layout choice for this program
# is deliberate and sound; do not revisit without a fused-FF kernel.
_T2D_2D = False


class Transformer2D(nn.Module):
    """Spatial transformer: GN -> 1x1 conv in -> blocks -> 1x1 conv out.

    SD-1.5 uses conv (not linear) projections (use_linear_projection=False).
    """

    num_heads: int
    head_dim: int
    depth: int = 1
    kv_dim: Optional[int] = None
    num_groups: int = 32
    ff_fused: bool = False
    # Serving-only: run self-attention in the head-slotted layout (see
    # Attention.slotted). No VJP - training keeps the plain path.
    attn_slotted: bool = False
    # Serving-only: fold the input GroupNorm into proj_in algebraically -
    # (x*a + c) @ W = (x*a) @ W + c @ W, where (a, c) come either from the
    # preceding fused ResnetBlock's stats epilogue (in_stats) or from one
    # fused (sum, sumsq) pass; the per-channel multiply rides the matmul
    # operand load, so the normalize-apply HBM round trip disappears.
    # Identical param tree; no VJP - training keeps the module path.
    gn_folded: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, in_stats=None):
        b, h, w, c = x.shape
        residual = x
        if self.gn_folded:
            from ..ops.gn_conv_stream import gn_affine_from_stats, stats_of

            dt = self.dtype
            st = in_stats if in_stats is not None else stats_of(x.astype(dt))
            scale, gbias = GroupNorm32(self.num_groups, eps=1e-6,
                                       name="norm")(x, params_only=True)
            a, cc = gn_affine_from_stats(st, scale, gbias, self.num_groups,
                                         h * w, 1e-6)
            k, kb = _Conv1x1Params(c, c, name="proj_in")()
            w00 = k[0, 0]
            # output directly in the activation dtype (the MXU still
            # accumulates f32 internally): an f32 result here cost a full
            # (3,64,64,320) f32 materialization + convert per transformer
            # (HLO cost table, round 4) and the module path's
            # nn.Conv(dtype=bf16) rounds identically.
            hidden = jnp.einsum(
                "bhwc,cd->bhwd",
                x.astype(dt) * a[:, None, None, :].astype(dt),
                w00.astype(dt))
            hidden = hidden + (cc @ w00 + kb)[:, None, None, :].astype(dt)
        else:
            hidden = GroupNorm32(self.num_groups, eps=1e-6, name="norm")(x)
            hidden = nn.Conv(c, (1, 1), dtype=self.dtype,
                             param_dtype=jnp.float32,
                             name="proj_in")(hidden)
        if not _T2D_4D:
            hidden = hidden.reshape(b, h * w, c)
        for i in range(self.depth):
            hidden = BasicTransformerBlock(
                self.num_heads, self.head_dim, kv_dim=self.kv_dim,
                ff_fused=self.ff_fused, attn_slotted=self.attn_slotted,
                dtype=self.dtype, name=f"transformer_blocks_{i}")(hidden, context)
        hidden = hidden.reshape(b, h, w, c)
        hidden = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                         name="proj_out")(hidden)
        return hidden + residual
