"""Round-4 attention kernel A/B at the UNet L0/L1 shapes.

Variants vs the shipped path (ops/flash_attention.flash_attention,
nomax + unpadded head-dim blocks):

  ship          - flash_attention as dispatched by ops/attention.py
  pvT           - same kernel but the PV product computed transposed:
                  o^T = v^T @ e^T makes Lk (4096) the contraction depth
                  and bq the lane dim, so the MXU streams full 128-lane
                  tiles instead of hd/128-occupied ones (hd 40 -> 31%).
                  Microbench (tools/bench_pv_transpose.py): 64 vs 50
                  TF/s at L0. Costs an in-VMEM transpose of e and o.
  q256 / q128   - ship kernel at smaller q blocks (smaller f32 score
                  block; more K/V panel re-reads)

Timing: chained fori_loop with a data-dependent carry (see
bench_attn_variants.py) so nothing constant-folds; per-call ms.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_attn_round4.py
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffusiontexturepainting_tpu.ops.flash_attention import (
    _LOG2E,
    _NOMAX_SHIFT,
    flash_attention,
)

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


def _pvt_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, shift):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = jnp.minimum(s, shift + 88.0) - shift
    e = jnp.exp2(s)
    l = jnp.sum(e, axis=-1, keepdims=True) + 1e-30
    # o^T = v^T @ e^T: contraction over Lk (deep), bq on lanes
    ot = jax.lax.dot_general(v, e, (((0,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (hd, bq)
    o_ref[0] = (ot.T / l).astype(o_ref.dtype)


def pvt_attention(q, k, v, num_heads, q_block=512, shift=_NOMAX_SHIFT):
    B, Lq, D = q.shape
    Lk = k.shape[1]
    hd = D // num_heads
    scale = hd**-0.5

    def split(x, L):
        x = x.reshape(B, L, num_heads, hd).transpose(0, 2, 1, 3)
        return x.reshape(B * num_heads, L, hd)

    qh, kh, vh = split(q, Lq), split(k, Lk), split(v, Lk)
    bq = min(q_block, Lq)
    kernel = functools.partial(_pvt_kernel, scale=scale, shift=shift)
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


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    for (B, L, C, h, tag) in [(3, 4096, 320, 8, "L0"),
                              (3, 1024, 640, 8, "L1")]:
        q = jnp.asarray(rng.standard_normal((B, L, C)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, L, C)) * 0.2, jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, L, C)), jnp.bfloat16)
        ref = np.asarray(flash_attention(q, k, v, h), np.float32)
        new = np.asarray(pvt_attention(q, k, v, h), np.float32)
        err = np.abs(ref - new).max()
        rows = {
            "ship(q512)": lambda q, k, v: flash_attention(q, k, v, h),
            "ship(q256)": lambda q, k, v: flash_attention(q, k, v, h,
                                                          q_block=256),
            "ship(q128)": lambda q, k, v: flash_attention(q, k, v, h,
                                                          q_block=128),
            "pvT(q512)": lambda q, k, v: pvt_attention(q, k, v, h),
            "pvT(q256)": lambda q, k, v: pvt_attention(q, k, v, h,
                                                       q_block=256),
        }
        for name, fn in rows.items():
            try:
                t = chain_time(fn, q, k, v)
                print(f"{tag} {name}: {t:.3f} ms/call", flush=True)
            except Exception as e:
                print(f"{tag} {name}: FAIL ({type(e).__name__})", flush=True)
        print(f"{tag} pvT maxdiff vs ship: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
