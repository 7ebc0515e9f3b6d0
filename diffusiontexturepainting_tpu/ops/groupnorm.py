"""Streaming GroupNorm statistics on TPU.

XLA lowers a spatial (B,H,W,C)->(B,C) sum/sum-of-squares reduction on
large NHWC tensors through a transposed (2,128)-tiled float32
materialization of the whole tensor (profiled at ~2.5 ms per VAE-scale
tensor vs a ~0.1 ms bandwidth floor). This kernel streams the tensor in
row bands (normal BlockSpec pipelining, no manual DMA) and accumulates
both moments into a revisited (B, 2, C) float32 output, reading the
input exactly once in its native layout.

The reference needs no analog: its GroupNorm runs inside TensorRT's
GroupNorm plugin (models.py:250-302).

STATUS: experimental, NOT wired into GroupNorm32. Measured end-to-end the
kernel boundary costs more than the reduce saves: XLA can no longer fuse
the normalization apply with the statistics pass, and the VAE portion of
the stamp regressed 55 -> 120 ms. Kept (with tests) as the starting point
for a future fully-fused GN+apply streaming kernel.

Backward: custom_vjp with the trivial analytic gradient of the moments
(d s1/dx = 1, d s2/dx = 2x).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Stream tensors larger than this through the pallas stats kernel.
# Deliberately above every UNet denoise-loop activation (max ~22 MB for the
# L0 skip-concat at 512px stamps is excluded by 24M): inside the loop XLA's
# fused reduce + surrounding elementwise win; the kernel only pays off for
# the VAE's >=16 MB encoder/decoder tensors where XLA materializes a
# transposed f32 copy.
_MIN_BYTES = 24 * 1024 * 1024


def _stats_kernel(x_ref, out_ref, *, HB, W, C):
    hi = pl.program_id(1)

    @pl.when(hi == 0)
    def _init():
        out_ref[0] = jnp.zeros((2, C), jnp.float32)

    chunk = x_ref[0].astype(jnp.float32)  # (HB, W, C)
    s1 = jnp.sum(chunk, axis=(0, 1))
    s2 = jnp.sum(chunk * chunk, axis=(0, 1))
    out_ref[0, 0:1, :] += s1[None]
    out_ref[0, 1:2, :] += s2[None]


def _pick_hb(h: int, w: int, c: int, itemsize: int = 2):
    for hb in (64, 32, 16, 8):
        if h % hb == 0 and hb * w * c * itemsize <= 2 * 1024 * 1024:
            return hb
    return 8 if h % 8 == 0 else None


def stats_plan(x_shape, min_bytes: int = _MIN_BYTES, itemsize: int = 2):
    """`itemsize` must be the INPUT dtype's: budgeting f32 shapes with
    bf16 sizes accepts plans whose (1, hb, W, C) block is 2x the VMEM
    budget (same bug class conv3x3.gn_conv_resident_plan fixed)."""
    if len(x_shape) != 4:
        return None
    B, H, W, C = x_shape
    if C % 128 != 0 or B * H * W * C * itemsize < min_bytes:
        return None
    return _pick_hb(H, W, C, itemsize)


def _stats_pallas(x, hb, interpret=False):
    B, H, W, C = x.shape
    kernel = functools.partial(_stats_kernel, HB=hb, W=W, C=C)
    out = pl.pallas_call(
        kernel,
        grid=(B, H // hb),
        in_specs=[pl.BlockSpec((1, hb, W, C), lambda bb, h: (bb, h, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, C), lambda bb, h: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * B * H * W * C,
            bytes_accessed=B * H * W * C * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x)
    return out[:, 0, :], out[:, 1, :]


def _stats_reference(x):
    axes = tuple(range(1, x.ndim - 1))
    xf = x.astype(jnp.float32)
    return jnp.sum(xf, axis=axes), jnp.sum(jnp.square(xf), axis=axes)


def _stats_dispatch(x, force):
    backend = jax.default_backend()
    if force == "xla":
        return _stats_reference(x)
    if force == "pallas":
        plan = stats_plan(x.shape, min_bytes=0, itemsize=x.dtype.itemsize)
        if plan is None:
            raise ValueError(f"pallas groupnorm stats unsupported for {x.shape}")
        return _stats_pallas(x, plan, interpret=(backend != "tpu"))
    plan = stats_plan(x.shape, itemsize=x.dtype.itemsize)
    if plan is not None and backend == "tpu":
        return _stats_pallas(x, plan)
    return _stats_reference(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def spatial_moments(x, force="auto"):
    """(B, H, W, C) -> (sum, sum_of_squares), each (B, C) float32."""
    return _stats_dispatch(x, force)


def _moments_fwd(x, force):
    return _stats_dispatch(x, force), x


def _moments_bwd(force, x, g):
    g1, g2 = g
    shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
    dx = (g1.reshape(shape) + 2.0 * x.astype(jnp.float32) * g2.reshape(shape))
    return (dx.astype(x.dtype),)


spatial_moments.defvjp(_moments_fwd, _moments_bwd)
