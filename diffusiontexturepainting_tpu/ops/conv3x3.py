"""Pallas implicit-GEMM 3x3 convolution (NHWC, stride 1, SAME).

Why: XLA's native conv on TPU runs the UNet's latent-resolution convs at
~15-30% of the MXU matmul rate for the CFG triple-batch (batch=3 gets
padded to the 8-sublane tile; measured on v5e: 3x64x64x320 conv at
0.92 ms vs a 0.23 ms pure-matmul FLOP ceiling). The reference solves the
same problem with TensorRT's conv kernels (SURVEY: models.py graph
surgery + TRT engine build); the TPU-native answer is an implicit-GEMM
kernel: keep the whole (padded) activation in VMEM, run the 9 kernel-tap
matmuls back-to-back on the MXU with a float32 accumulator that never
touches HBM, and fold batch x spatial into the GEMM M dimension so small
CFG batches waste nothing.

Scope: stride-1 SAME 3x3 convs on feature maps small enough to hold one
padded image in VMEM (everything in the SD UNet at stamp resolutions,
and the deep VAE levels). Large-spatial VAE convs and stride-2 convs
stay on XLA's conv, which is efficient there.

Backward pass: jax.custom_vjp whose reverse mode re-derives gradients
through the equivalent XLA conv (training cares about throughput over a
large batch, where XLA's conv is fine; serving never differentiates).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Max bytes of one padded activation image allowed in VMEM (leaves room
# for the weight block, accumulator, and output tile in ~16 MB VMEM).
_VMEM_X_BUDGET = int(9.5 * 1024 * 1024)
_VMEM_W_BUDGET = 6 * 1024 * 1024


def _lax_conv3x3(x, w, b):
    out = lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def _pick_nt(cout: int, cin: int) -> Optional[int]:
    """Largest divisor of cout whose (9, Cin, N_T) weight block fits the
    VMEM budget; prefer lane-aligned (multiple of 128) tiles."""
    candidates = ([cout] if cout <= 512 else []) + [512, 384, 256, 128]
    for nt in candidates:
        if cout % nt == 0 and 9 * cin * nt * 2 <= _VMEM_W_BUDGET:
            return nt
    return None


def _pick_ht(h: int, w: int) -> Optional[int]:
    """Rows per tile: aim for 1024-4096 GEMM rows per tap."""
    best = None
    for ht in (64, 32, 16, 8, 4, 2, 1):
        if h % ht:
            continue
        m = ht * w
        if m > 4096 and ht != 1:
            continue
        best = ht
        break
    return best


def pallas_plan(x_shape, w_shape):
    """Return (H_T, N_T) if the pallas kernel supports this conv, else None."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return None
    B, H, W, Cin = x_shape
    kh, kw, wcin, Cout = w_shape
    if (kh, kw) != (3, 3) or wcin != Cin:
        return None
    # Cin < 16 would pad the GEMM K dim to a full 128-lane tile (e.g. the
    # UNet's 9-channel conv_in) - XLA's conv handles those better.
    if H < 2 or W < 2 or Cin < 16 or Cout < 128:
        return None
    nt = _pick_nt(Cout, Cin)
    ht = _pick_ht(H, W)
    if nt is None or ht is None:
        return None
    # one padded image per grid step (batch is a grid dimension)
    if (H + 2) * (W + 2) * Cin * 2 > _VMEM_X_BUDGET:
        return None
    return ht, nt


def _conv_kernel(x_ref, w_ref, b_ref, out_ref, *, H_T, W, Cin, N_T):
    """One (batch, cout-tile, row-tile) grid step: 9 MXU taps.

    x_ref:  (1, H+2, W+2, Cin) - one whole padded image, resident in VMEM
    w_ref:  (9, Cin, N_T)      - weight taps for this cout tile
    b_ref:  (1, N_T)
    out_ref:(1, H_T, W, N_T)
    """
    hi = pl.program_id(2)
    bias = b_ref[0].astype(jnp.float32)
    acc = None
    for k in range(9):
        di, dj = k // 3, k % 3
        slab = x_ref[0, pl.ds(hi * H_T + di, H_T), pl.ds(dj, W), :]
        a = slab.reshape(H_T * W, Cin)
        d = jnp.dot(a, w_ref[k], preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    y = acc + bias[None, :]
    out_ref[0] = y.reshape(H_T, W, N_T).astype(out_ref.dtype)


def _conv3x3_pallas(x, w, b, plan, interpret=False):
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    H_T, N_T = plan
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w9 = w.reshape(9, Cin, Cout)
    b2 = (b if b is not None else jnp.zeros((Cout,), x.dtype)).reshape(1, Cout)

    kernel = functools.partial(_conv_kernel, H_T=H_T, W=W, Cin=Cin, N_T=N_T)
    flops = 2 * B * H * W * Cin * Cout * 9
    bytes_accessed = (xp.size + w9.size + B * H * W * Cout) * x.dtype.itemsize
    return pl.pallas_call(
        kernel,
        grid=(B, Cout // N_T, H // H_T),
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, Cin),
                         lambda bb, n, h: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, Cin, N_T), lambda bb, n, h: (0, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_T), lambda bb, n, h: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H_T, W, N_T),
                               lambda bb, n, h: (bb, h, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )(xp, w9, b2)


def _dispatch(x, w, b, force):
    if force == "xla":
        return _lax_conv3x3(x, w, b)
    plan = pallas_plan(x.shape, w.shape)
    backend = jax.default_backend()
    if force == "pallas":
        if plan is None:
            raise ValueError(
                f"pallas conv3x3 does not support {x.shape} x {w.shape}")
        return _conv3x3_pallas(x, w, b, plan, interpret=(backend != "tpu"))
    # auto: pallas on TPU when supported, XLA otherwise
    if plan is not None and backend == "tpu":
        return _conv3x3_pallas(x, w, b, plan)
    return _lax_conv3x3(x, w, b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3(x, w, b, force="auto"):
    """3x3 stride-1 SAME conv, NHWC, float32 accumulation.

    force: "auto" (pallas on TPU where supported), "pallas", or "xla".
    """
    return _dispatch(x, w, b, force)


def _conv3x3_fwd(x, w, b, force):
    return _dispatch(x, w, b, force), (x, w, b)


def _conv3x3_bwd(force, res, g):
    x, w, b = res
    _, vjp = jax.vjp(lambda x_, w_, b_: _lax_conv3x3(x_, w_, b_), x, w, b)
    return vjp(g)


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)


from flax import linen as nn  # noqa: E402


class Conv3x3(nn.Module):
    """Drop-in for nn.Conv(features, (3,3), padding=1): identical param
    tree ({kernel: (3,3,Cin,Cout), bias: (Cout,)}) so checkpoints and the
    torch->JAX converter are unaffected."""

    features: int
    dtype: jnp.dtype = jnp.float32
    force: str = "auto"

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return conv3x3(x.astype(self.dtype), kernel.astype(self.dtype),
                       bias.astype(self.dtype), self.force)
