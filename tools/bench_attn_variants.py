"""Attention-kernel variant A/B at the UNet's hot shapes (within-session).

Round-3 kernel hunt: the flash kernel runs ~1.3-1.5 ms at the L0 shape
vs a 1.05 ms padded-MXU floor; the gap is serial VPU softmax between the
two MXU calls, and the pad/transpose passes AROUND the kernel cost
another ~1.4 ms/UNet-step ("copy"+"pad" in the step profile). Variants:

  base       - ops/flash_attention.flash_attention as shipped
  exp2bf16   - same kernel, softmax exp2 evaluated on bf16 logits
  chunked    - kv-chunked online softmax INSIDE the kernel (static
               python loop): the MXU QK^T of chunk j+1 has no data
               dependency on the VPU softmax of chunk j, so Mosaic can
               overlap them
  slotted    - kernel consumes a head-slotted (B*h, L, 128) layout
               directly (the layout the projection matmul can produce
               with zero-padded weights), measuring the kernel WITHOUT
               the split/pad/transpose passes

Timing uses a chained fori_loop whose carry is the previous output
(data-dependent; a `q + 0.0*out` carry could be constant-folded).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_attn_variants.py
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffusiontexturepainting_tpu.ops.flash_attention import (
    _LOG2E,
    _round_up,
    flash_attention,
)

# N large enough that the tunnel's per-sync RTT jitter (tens of ms)
# amortizes below 0.1 ms/call; an early N=20 run "measured" a variant
# below the padded-MXU floor, which was pure RTT noise.
N = 100
sync = lambda o: np.asarray(o.ravel()[:1])


def chain_time(fn, q, k, v):
    def chained(q0, kk, vv):
        def body(i, qq):
            return fn(qq, kk, vv).astype(qq.dtype)
        return jax.lax.fori_loop(0, N, body, q0)

    f = jax.jit(chained)
    out = f(q, k, v)
    sync(out)
    best = 1e9
    for _ in range(4):
        tic = time.perf_counter()
        out = f(q, k, v)
        sync(out)
        best = min(best, (time.perf_counter() - tic) * 1e3)
    return best / N


# --- chunked online-softmax kernel (whole KV resident, chunked compute) ---


def _chunked_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, bk, nk, bf16_p):
    q = q_ref[0]
    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    m = jnp.full((q.shape[0], 1), -1e30, jnp.float32)
    l = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc = jnp.zeros((q.shape[0], k_ref.shape[-1]), jnp.float32)
    for j in range(nk):
        kj = k_ref[0, j * bk:(j + 1) * bk, :]
        vj = v_ref[0, j * bk:(j + 1) * bk, :]
        s = jax.lax.dot_general(qs, kj, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        if bf16_p:
            p = jnp.exp2((s - m_new).astype(jnp.bfloat16))
            psum = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
            pv = jnp.dot(p.astype(vj.dtype), vj,
                         preferred_element_type=jnp.float32)
        else:
            p = jnp.exp2(s - m_new)
            psum = jnp.sum(p, axis=-1, keepdims=True)
            pv = jnp.dot(p.astype(vj.dtype), vj,
                         preferred_element_type=jnp.float32)
        corr = jnp.exp2(m - m_new)
        l = l * corr + psum
        acc = acc * corr + pv
        m = m_new
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _nomax_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, shift, bk, nk,
                  bf16_p, safe=False):
    """Softmax WITHOUT the running-max pass: exp2(s - shift) with a
    static shift. Any constant shift cancels exactly in the final
    normalization; overflow needs base-2 logits > shift+126 (f32), i.e.
    raw attention logits > (shift+126)/log2e ~ 130 at shift 64 - far
    beyond anything LayerNormed q/k produce."""
    q = q_ref[0]
    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    l = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc = jnp.zeros((q.shape[0], k_ref.shape[-1]), jnp.float32)
    for j in range(nk):
        kj = k_ref[0, j * bk:(j + 1) * bk, :]
        vj = v_ref[0, j * bk:(j + 1) * bk, :]
        s = jax.lax.dot_general(qs, kj, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if safe:
            # clamp fuses into the exp2 pass (no extra HBM/VMEM pass,
            # unlike the row-max reduce): overflow becomes saturation
            s = jnp.minimum(s, shift + 88.0)
        if bf16_p:
            p = jnp.exp2((s - shift).astype(jnp.bfloat16))
            l = l + jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
            acc = acc + jnp.dot(p.astype(vj.dtype), vj,
                                preferred_element_type=jnp.float32)
        else:
            p = jnp.exp2(s - shift)
            l = l + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc + jnp.dot(p.astype(vj.dtype), vj,
                                preferred_element_type=jnp.float32)
    if safe:
        # all-row-underflow (every base-2 logit < shift-126) yields l=0;
        # the epsilon turns that NaN into 0 and is 1e-30-relative noise
        # otherwise
        l = l + 1e-30
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def nomax_attention(q, k, v, num_heads, bk=4096, bf16_p=False, q_block=512,
                    shift=32.0, safe=False):
    B, Lq, D = q.shape
    Lk = k.shape[1]
    hd = D // num_heads
    scale = hd**-0.5

    def split(x, L):
        x = x.reshape(B, L, num_heads, hd).transpose(0, 2, 1, 3)
        return x.reshape(B * num_heads, L, hd)

    qh, kh, vh = split(q, Lq), split(k, Lk), split(v, Lk)
    hd_pad = _round_up(hd, 128)
    if hd_pad != hd:
        pad = ((0, 0), (0, 0), (0, hd_pad - hd))
        qh, kh, vh = jnp.pad(qh, pad), jnp.pad(kh, pad), jnp.pad(vh, pad)
    bq = min(q_block, Lq)
    nk = Lk // bk
    kernel = functools.partial(_nomax_kernel, scale=scale, shift=shift,
                               bk=bk, nk=nk, bf16_p=bf16_p, safe=safe)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * num_heads, Lq, hd_pad), q.dtype),
        grid=(B * num_heads, Lq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, hd_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, hd_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, hd_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, hd_pad), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * num_heads * Lq * Lk * hd_pad,
            bytes_accessed=B * num_heads * (2 * Lq + 2 * Lk) * hd_pad * 2,
            transcendentals=B * num_heads * Lq * Lk,
        ),
    )(qh, kh, vh)
    out = out[:, :, :hd].reshape(B, num_heads, Lq, hd).transpose(0, 2, 1, 3)
    return out.reshape(B, Lq, D)


def chunked_attention(q, k, v, num_heads, bk=1024, bf16_p=False,
                      q_block=512):
    B, Lq, D = q.shape
    Lk = k.shape[1]
    hd = D // num_heads
    scale = hd**-0.5

    def split(x, L):
        x = x.reshape(B, L, num_heads, hd).transpose(0, 2, 1, 3)
        return x.reshape(B * num_heads, L, hd)

    qh, kh, vh = split(q, Lq), split(k, Lk), split(v, Lk)
    hd_pad = _round_up(hd, 128)
    if hd_pad != hd:
        pad = ((0, 0), (0, 0), (0, hd_pad - hd))
        qh, kh, vh = jnp.pad(qh, pad), jnp.pad(kh, pad), jnp.pad(vh, pad)
    bq = min(q_block, Lq)
    nk = Lk // bk
    kernel = functools.partial(_chunked_kernel, scale=scale, bk=bk, nk=nk,
                               bf16_p=bf16_p)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * num_heads, Lq, hd_pad), q.dtype),
        grid=(B * num_heads, Lq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, hd_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, hd_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, hd_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, hd_pad), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * num_heads * Lq * Lk * hd_pad,
            bytes_accessed=B * num_heads * (2 * Lq + 2 * Lk) * hd_pad * 2,
            transcendentals=B * num_heads * Lq * Lk,
        ),
    )(qh, kh, vh)
    out = out[:, :, :hd].reshape(B, num_heads, Lq, hd).transpose(0, 2, 1, 3)
    return out.reshape(B, Lq, D)


# --- slotted-layout kernel: inputs already (B*h, L, 128) ---


def slotted_kernel_call(qh, kh, vh, scale, bq=512, exp2_bf16=True):
    from diffusiontexturepainting_tpu.ops.flash_attention import _attn_kernel

    BH, Lq, hd_pad = qh.shape
    Lk = kh.shape[1]
    kernel = functools.partial(_attn_kernel, scale=scale,
                               exp2_bf16=exp2_bf16)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BH, Lq, hd_pad), qh.dtype),
        grid=(BH, Lq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, hd_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, hd_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, hd_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, hd_pad), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * BH * Lq * Lk * hd_pad,
            bytes_accessed=BH * (2 * Lq + 2 * Lk) * hd_pad * 2,
            transcendentals=BH * Lq * Lk,
        ),
    )(qh, kh, vh)


def _nomax_unpadded_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, shift):
    """No-max softmax over UNPADDED head-dim blocks: Mosaic pads the
    (bq, hd) / (Lk, hd) tiles to lanes inside VMEM, so no jnp.pad HBM
    pass exists outside the kernel."""
    q = q_ref[0] if q_ref.ndim == 3 else q_ref[0, :, 0, :]
    k = k_ref[0] if k_ref.ndim == 3 else k_ref[0, :, 0, :]
    v = v_ref[0] if v_ref.ndim == 3 else v_ref[0, :, 0, :]
    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = jnp.minimum(s, shift + 88.0) - shift
    e = jnp.exp2(s)
    l = jnp.sum(e, axis=-1, keepdims=True) + 1e-30
    o = jnp.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
    out = (o / l).astype(o_ref.dtype)
    if o_ref.ndim == 3:
        o_ref[0] = out
    else:
        o_ref[0, :, 0, :] = out


def nomax_unpadded(q, k, v, num_heads, q_block=512, shift=32.0):
    """Split heads outside (one transpose pass), but NO pad pass."""
    B, Lq, D = q.shape
    Lk = k.shape[1]
    hd = D // num_heads
    scale = hd**-0.5

    def split(x, L):
        x = x.reshape(B, L, num_heads, hd).transpose(0, 2, 1, 3)
        return x.reshape(B * num_heads, L, hd)

    qh, kh, vh = split(q, Lq), split(k, Lk), split(v, Lk)
    bq = min(q_block, Lq)
    kernel = functools.partial(_nomax_unpadded_kernel, scale=scale,
                               shift=shift)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * num_heads, Lq, hd), q.dtype),
        grid=(B * num_heads, Lq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, hd), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, hd), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, hd), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
    )(qh, kh, vh)
    out = out.reshape(B, num_heads, Lq, hd).transpose(0, 2, 1, 3)
    return out.reshape(B, Lq, D)


def nomax_4d(q, k, v, num_heads, q_block=512, shift=32.0):
    """NO split transpose and NO pad: blocks read straight out of the
    (B, L, h, hd) view of the projection output; h is a grid dim."""
    B, Lq, D = q.shape
    Lk = k.shape[1]
    hd = D // num_heads
    scale = hd**-0.5
    q4 = q.reshape(B, Lq, num_heads, hd)
    k4 = k.reshape(B, Lk, num_heads, hd)
    v4 = v.reshape(B, Lk, num_heads, hd)
    bq = min(q_block, Lq)
    kernel = functools.partial(_nomax_unpadded_kernel, scale=scale,
                               shift=shift)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Lq, num_heads, hd), q.dtype),
        grid=(B, num_heads, Lq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, 1, hd), lambda b, h, i: (b, i, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, 1, hd), lambda b, h, i: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, 1, hd), lambda b, h, i: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, 1, hd), lambda b, h, i: (b, i, h, 0),
                               memory_space=pltpu.VMEM),
    )(q4, k4, v4)
    return out.reshape(B, Lq, D)


def _nomax_allheads_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, shift,
                           num_heads):
    """All heads in one block (1, L, h, hd): the head loop runs INSIDE
    the kernel, so neither a split transpose nor a pad pass exists
    outside. Blocks satisfy Mosaic's (8,128)-or-full rule because the
    last two dims equal the array's (h, hd). The output stays 3D
    (1, bq, h*hd): per-head results lane-concat in VMEM (Mosaic rejects
    the 2D->4D shape cast a 4D output write would need)."""
    outs = []
    for h in range(num_heads):
        q = q_ref[0, :, h, :]
        k = k_ref[0, :, h, :]
        v = v_ref[0, :, h, :]
        qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
        s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.minimum(s, shift + 88.0) - shift
        e = jnp.exp2(s)
        l = jnp.sum(e, axis=-1, keepdims=True) + 1e-30
        o = jnp.dot(e.astype(v.dtype), v,
                    preferred_element_type=jnp.float32)
        outs.append((o / l).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def nomax_allheads(q, k, v, num_heads, q_block=256, shift=32.0):
    B, Lq, D = q.shape
    Lk = k.shape[1]
    hd = D // num_heads
    scale = hd**-0.5
    q4 = q.reshape(B, Lq, num_heads, hd)
    k4 = k.reshape(B, Lk, num_heads, hd)
    v4 = v.reshape(B, Lk, num_heads, hd)
    bq = min(q_block, Lq)
    kernel = functools.partial(_nomax_allheads_kernel, scale=scale,
                               shift=shift, num_heads=num_heads)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Lq, D), q.dtype),
        grid=(B, Lq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, num_heads, hd), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, num_heads, hd), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, num_heads, hd), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
    )(q4, k4, v4)


def _nomax_laneslice_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, shift,
                            hd):
    """Heads sliced from the packed (*, h*hd) lane dim INSIDE the kernel
    (grid dim = head): no split transpose or pad exists outside at all.
    The K/V (1, Lk, D) blocks stay VMEM-resident across the h and i grid
    dims; the out block is revisited across h (h fastest), each step
    writing its head's lane slice."""
    h = pl.program_id(2)
    q = q_ref[0, :, pl.ds(h * hd, hd)]
    k = k_ref[0, :, pl.ds(h * hd, hd)]
    v = v_ref[0, :, pl.ds(h * hd, hd)]
    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = jnp.minimum(s, shift + 88.0) - shift
    e = jnp.exp2(s)
    l = jnp.sum(e, axis=-1, keepdims=True) + 1e-30
    o = jnp.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
    out = (o / l).astype(o_ref.dtype)
    o_ref[0, :, pl.ds(h * hd, hd)] = out


def nomax_laneslice(q, k, v, num_heads, q_block=256, shift=32.0):
    B, Lq, D = q.shape
    Lk = k.shape[1]
    hd = D // num_heads
    scale = hd**-0.5
    bq = min(q_block, Lq)
    kernel = functools.partial(_nomax_laneslice_kernel, scale=scale,
                               shift=shift, hd=hd)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Lq, D), q.dtype),
        grid=(B, Lq // bq, num_heads),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i, h: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, D), lambda b, i, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, D), lambda b, i, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, i, h: (b, i, 0),
                               memory_space=pltpu.VMEM),
    )(q, k, v)


SHAPES = [
    ("unet L0 512px", 3, 4096, 4096, 320, 8),
    ("unet L1 512px", 3, 1024, 1024, 640, 8),
]


def main():
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    key = jax.random.PRNGKey(0)
    for label, b, lq, lk, d, h in SHAPES:
        hd = d // h
        scale = hd**-0.5
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.device_put(jax.random.normal(kq, (b, lq, d), jnp.bfloat16))
        k = jax.device_put(jax.random.normal(kk, (b, lk, d), jnp.bfloat16))
        v = jax.device_put(jax.random.normal(kv, (b, lk, d), jnp.bfloat16))
        rows = {}
        rows["base"] = chain_time(
            lambda a, b_, c: flash_attention(a, b_, c, h), q, k, v)
        rows["exp2bf16"] = chain_time(
            lambda a, b_, c: flash_attention(a, b_, c, h, exp2_bf16=True),
            q, k, v)
        for bk in (512, 1024, 2048):
            if lk % bk or lk == bk:
                continue
            rows[f"chunk{bk}"] = chain_time(
                lambda a, b_, c, bk=bk: chunked_attention(a, b_, c, h, bk=bk),
                q, k, v)
            rows[f"chunk{bk}/bf16p"] = chain_time(
                lambda a, b_, c, bk=bk: chunked_attention(a, b_, c, h, bk=bk,
                                                          bf16_p=True),
                q, k, v)
        if lk >= 2048:
            for bq in (512, 1024):
                rows[f"nomax-safe/q{bq}"] = chain_time(
                    lambda a, b_, c, bq=bq: nomax_attention(
                        a, b_, c, h, bk=lk, q_block=bq, safe=True),
                    q, k, v)
                rows[f"nomax-unpadded/q{bq}"] = chain_time(
                    lambda a, b_, c, bq=bq: nomax_unpadded(
                        a, b_, c, h, q_block=bq), q, k, v)
            for bq in (256, 512):
                # smaller q blocks: the f32 score block is reused across
                # the in-kernel head loop, but kv is all-heads resident
                rows[f"nomax-allheads/q{bq}"] = chain_time(
                    lambda a, b_, c, bq=bq: nomax_allheads(
                        a, b_, c, h, q_block=bq), q, k, v)
            ref = flash_attention(q, k, v, h)
            got4 = nomax_allheads(q, k, v, h)
            err4 = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                         - got4.astype(jnp.float32))))
            print(f"   nomax-allheads max|diff| vs base: {err4:.4f}",
                  file=sys.stderr)
            got = nomax_attention(q, k, v, h, bk=lk)
            err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                        - got.astype(jnp.float32))))
            print(f"   nomax max|diff| vs base: {err:.4f}", file=sys.stderr)
        # slotted: pre-split inputs, kernel only (layout produced upstream
        # by the projection matmul in the real integration)
        hd_pad = _round_up(hd, 128)
        qh = jnp.pad(
            q.reshape(b, lq, h, hd).transpose(0, 2, 1, 3).reshape(
                b * h, lq, hd), ((0, 0), (0, 0), (0, hd_pad - hd)))
        kh = jnp.pad(
            k.reshape(b, lk, h, hd).transpose(0, 2, 1, 3).reshape(
                b * h, lk, hd), ((0, 0), (0, 0), (0, hd_pad - hd)))
        vh = jnp.pad(
            v.reshape(b, lk, h, hd).transpose(0, 2, 1, 3).reshape(
                b * h, lk, hd), ((0, 0), (0, 0), (0, hd_pad - hd)))
        rows["slotted-kernel"] = chain_time(
            lambda a, b_, c: slotted_kernel_call(a, b_, c, scale),
            qh, kh, vh)
        rows["slotted-kernel/f32p"] = chain_time(
            lambda a, b_, c: slotted_kernel_call(a, b_, c, scale,
                                                 exp2_bf16=False),
            qh, kh, vh)
        # correctness spot check of the chunked kernel
        ref = flash_attention(q, k, v, h)
        got = chunked_attention(q, k, v, h, bk=1024)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        print(f"-- {label} (chunked max|diff| vs base: {err:.4f})")
        for name, ms in sorted(rows.items(), key=lambda kv_: kv_[1]):
            print(f"  {name:22s} {ms:7.3f} ms")


if __name__ == "__main__":
    main()
