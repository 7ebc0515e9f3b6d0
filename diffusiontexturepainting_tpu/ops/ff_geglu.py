"""Fused transformer FeedForward (GEGLU) pallas kernel.

The UNet's FF pair - net_0: Dense(C -> 2*4C) chunked into (value, gate),
out = value * gelu(gate); net_2: Dense(4C -> C) - is where XLA's layout
choice costs the most in the profiled UNet step: the (tokens, 4C)
intermediate round-trips HBM and the out-projection runs inside an
`add_add_fusion` at ~38 TF/s (reference analog: the TRT engine fuses the
whole FF into the attention plugin's epilogue, models.py:520-646).

This kernel blocks over (token tiles x inner panels) and keeps the wide
intermediate entirely in VMEM:

    for each token tile (outer grid dim):
      acc = 0
      for each inner panel ii (inner grid dim):
        v = x_tile @ w0_value[:, ii]          (MXU, f32 acc)
        g = x_tile @ w0_gate[:, ii]
        h = v * gelu(g)                        (VPU, in VMEM)
        acc += h @ w2[ii, :]                   (MXU, f32)
      out_tile = acc + b2 + residual_tile

Weights are streamed panel-by-panel (double-buffered DMA overlaps the
MXU); the (tokens, 4C) tensor never exists in HBM. Serving-only (no
VJP) - training keeps the module path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gelu_exact(x):
    # diffusers GEGLU uses exact (erf) gelu
    return 0.5 * x * (1.0 + jax.lax.erf(x * 0.7071067811865476))


def _erf_approx(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7 - below
    f32 gelu resolution, invisible in bf16). Pallas TPU has no erf
    primitive; exp it has."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


# Kernel-path gelu flavor: "erf" = A-S rational erf (max err 1.5e-7,
# exact at bf16); "tanh" = the tanh-form approximation (max abs err
# ~1e-3, under bf16 rounding noise for the serving dtype) which costs
# ~4x less VPU time per FF call (0.59 -> 0.13 ms at the 512px L0 shape).
_FF_GELU_FLAVOR = "tanh"


def _gelu_kernel(x):
    if _FF_GELU_FLAVOR == "tanh":
        # x*sigmoid(1.5958x + 0.0714x^3) == the tanh-form gelu
        return x * jax.nn.sigmoid(1.595769 * x + 0.071354 * x * x * x)
    return 0.5 * x * (1.0 + _erf_approx(x * 0.7071067811865476))


def _ff_kernel(x_ref, w0v_ref, w0g_ref, b0v_ref, b0g_ref, w2_ref, b2_ref,
               res_ref, o_ref, acc_ref, *, n_inner):
    ii = pl.program_id(1)

    @pl.when(ii == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[0]
    v = jnp.dot(x, w0v_ref[...], preferred_element_type=jnp.float32) \
        + b0v_ref[0].astype(jnp.float32)[None]
    g = jnp.dot(x, w0g_ref[...], preferred_element_type=jnp.float32) \
        + b0g_ref[0].astype(jnp.float32)[None]
    h = (v * _gelu_kernel(g)).astype(x.dtype)
    acc_ref[...] += jnp.dot(h, w2_ref[...],
                            preferred_element_type=jnp.float32)

    @pl.when(ii == n_inner - 1)
    def _finish():
        y = acc_ref[...] + b2_ref[0].astype(jnp.float32)[None]
        y = y + res_ref[0].astype(jnp.float32)
        o_ref[0] = y.astype(o_ref.dtype)


def ff_geglu_plan(n_tokens: int, dim: int, inner: int):
    """(token_tile, inner_panel) or None.

    Weights are re-streamed once per token block, so few-token/fat-C
    levels (the UNet's 16x16 L2: 768 tokens x 10240 inner) only win when
    the whole token range fits ONE block - weights then read exactly
    once, like XLA. Candidates try that first; multi-block plans are
    declined when the extra weight re-reads exceed the intermediate
    HBM traffic the fusion saves ((blocks-1)*3*C*I vs N*4*I bytes)."""
    if dim < 128 or inner < 256 or inner % 128:
        return None
    cands = ([n_tokens] if n_tokens <= 1024 else []) + [2048, 1024, 512,
                                                        256, 128]
    for nt in cands:
        if n_tokens % nt:
            continue
        blocks = n_tokens // nt
        if (blocks - 1) * 3 * dim >= 4 * n_tokens:
            continue  # weight re-streaming would out-cost the fusion win
        dbl = 2 if blocks > 1 else 1
        xb = nt * dim * 2 * dbl
        accb = nt * dim * 4
        ores = 2 * nt * dim * 2 * dbl
        for bi in (512, 256, 128):
            if inner % bi:
                continue
            wdbl = 2 if inner > bi else 1
            wpan = (2 * dim * bi + bi * dim) * 2 * wdbl
            # in-kernel f32 temporaries (v, g, gelu poly, h): ~4 live
            # (nt, bi) f32 buffers on the scoped-vmem "stack" - omitting
            # them OOMed the 16 MB limit by 792 KB at the L2 shape
            # (768 tokens x 1280 x 5120) inside the full stamp program.
            tmp = 4 * nt * bi * 4
            if xb + accb + ores + wpan + tmp <= 14 * 1024 * 1024:
                return nt, bi
    return None


def _ff_geglu_pallas(x, w0, b0, w2, b2, residual, plan):
    N, C = x.shape
    inner = w2.shape[0]
    NT, BI = plan
    w0v, w0g = w0[:, :inner], w0[:, inner:]
    b0v, b0g = b0[:inner].reshape(1, inner), b0[inner:].reshape(1, inner)
    b2r = b2.reshape(1, C)
    kernel = functools.partial(_ff_kernel, n_inner=inner // BI)
    return pl.pallas_call(
        kernel,
        grid=(N // NT, inner // BI),
        in_specs=[
            pl.BlockSpec((1, NT, C), lambda t, i: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, BI), lambda t, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, BI), lambda t, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BI), lambda t, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BI), lambda t, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BI, C), lambda t, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NT, C), lambda t, i: (0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NT, C), lambda t, i: (0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((NT, C), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * C * inner * 3,
            bytes_accessed=(2 * N * C * 2
                            + (N // NT) * (3 * C * inner) * 2),
            transcendentals=N * inner,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x[None], w0v, w0g, b0v, b0g, w2, b2r, residual[None])[0]


def _reference(x, w0, b0, w2, b2, residual):
    inner = w2.shape[0]
    h = (x.astype(jnp.float32) @ w0.astype(jnp.float32)
         + b0.astype(jnp.float32))
    v, g = h[:, :inner], h[:, inner:]
    h = (v * _gelu_exact(g)).astype(x.dtype)
    y = jnp.dot(h, w2, preferred_element_type=jnp.float32) \
        + b2.astype(jnp.float32)
    return (y + residual.astype(jnp.float32)).astype(x.dtype)


def ff_geglu(x, w0, b0, w2, b2, residual, force="auto"):
    """residual + net_2(geglu(net_0(x))) over (N, C) tokens.

    w0: (C, 2*inner) [value | gate], b0: (2*inner,), w2: (inner, C),
    b2: (C,). Serving-only (no VJP).
    """
    N, C = x.shape
    inner = w2.shape[0]
    if force != "xla":
        plan = ff_geglu_plan(N, C, inner)
        if force == "pallas":
            if plan is None:
                raise ValueError(f"ff_geglu unsupported for N={N} C={C} "
                                 f"inner={inner}")
            return _ff_geglu_pallas(x, w0, b0, w2, b2, residual, plan)
        if plan is not None and jax.default_backend() == "tpu":
            return _ff_geglu_pallas(x, w0, b0, w2, b2, residual, plan)
    return _reference(x, w0, b0, w2, b2, residual)
