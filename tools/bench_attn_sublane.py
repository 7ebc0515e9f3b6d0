"""A/B: lane-padded flash attention vs sublane-packed (transposed) kernel.

SD-1.5's attention head dims (40/80) waste up to 3.2x MXU on the lane
padding to 128 (VERDICT r1 weak #1b). This experiment keeps head_dim on
the SUBLANE axis instead: bf16 sublane tiles are 16 wide, so hd 40 pads
to 48 (1.2x) instead of 128 (3.2x).

Layouts (per head):
    qT (hd_s, bq)   kT (hd_s, Lk)   vT (hd_s, Lk)
    S^T = kT' qT    : dot_general c((0,),(0,)) -> (Lk, bq)  [TN form]
    softmax over axis 0 (Lk on sublanes)
    O^T = vT . P^T  : dot_general c((1,),(0,)) -> (hd_s, bq) [native NN]

Whether this wins depends on Mosaic's lowering of the TN-form dot (it
may relayout an operand, erasing the win) - hence: measure, don't guess.

MEASURED (v5e, chained in-jit timing, 2026-08-18): it does NOT win -
0.95x / 1.02x / 0.96x at hd 40/80/160. Mosaic relayouts the TN-form
contraction operand, erasing exactly the padding saving the layout was
meant to buy. Kept as a documented negative result; the lane-padded
kernel (ops/flash_attention.py) remains the production path.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_attn_sublane.py
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2E = 1.4426950408889634


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _sublane_kernel(qT_ref, kT_ref, vT_ref, o_ref, *, scale: float):
    qT = qT_ref[0]  # (hd_s, bq)
    kT = kT_ref[0]  # (hd_s, Lk)
    vT = vT_ref[0]  # (hd_s, Lk)
    qs = (qT.astype(jnp.float32) * (scale * _LOG2E)).astype(qT.dtype)
    # TN form: contraction over the sublane (hd) axis of both operands.
    sT = jax.lax.dot_general(kT, qs, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (Lk, bq)
    m = jnp.max(sT, axis=0, keepdims=True)  # (1, bq)
    e = jnp.exp2(sT - m)
    s = jnp.sum(e, axis=0, keepdims=True)
    # native NN form: (hd_s, Lk) x (Lk, bq)
    oT = jax.lax.dot_general(vT, e.astype(vT.dtype),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[0] = (oT / s).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "q_block"))
def sublane_attention(q, k, v, num_heads: int, q_block: int = 256):
    B, Lq, D = q.shape
    Lk = k.shape[1]
    hd = D // num_heads
    scale = hd ** -0.5
    sub = 16 if q.dtype == jnp.bfloat16 else 8
    hd_s = _round_up(hd, sub)

    def splitT(x, L):
        x = x.reshape(B, L, num_heads, hd).transpose(0, 2, 3, 1)
        return x.reshape(B * num_heads, hd, L)

    qT, kT, vT = splitT(q, Lq), splitT(k, Lk), splitT(v, Lk)
    pad = ((0, 0), (0, hd_s - hd), (0, 0))
    if hd_s != hd:
        qT, kT, vT = jnp.pad(qT, pad), jnp.pad(kT, pad), jnp.pad(vT, pad)
    bq = min(q_block, _round_up(Lq, 128))
    lq_pad = _round_up(Lq, bq)
    if lq_pad != Lq:
        qT = jnp.pad(qT, ((0, 0), (0, 0), (0, lq_pad - Lq)))

    grid = (B * num_heads, lq_pad // bq)
    out = pl.pallas_call(
        functools.partial(_sublane_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * num_heads, hd_s, lq_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hd_s, bq), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd_s, Lk), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd_s, Lk), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hd_s, bq), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * num_heads * lq_pad * Lk * hd_s,
            bytes_accessed=B * num_heads * (2 * lq_pad + 2 * Lk) * hd_s * 2,
            transcendentals=B * num_heads * lq_pad * Lk,
        ),
    )(qT, kT, vT)
    out = out[:, :hd, :]  # (BH, hd, Lq)
    out = out.reshape(B, num_heads, hd, Lq).transpose(0, 3, 1, 2)
    return out.reshape(B, Lq, D)


def main():
    from diffusiontexturepainting_tpu.core.engine import enable_persistent_cache
    from diffusiontexturepainting_tpu.ops.flash_attention import flash_attention

    enable_persistent_cache()
    key = jax.random.PRNGKey(0)
    sync = lambda o: np.asarray(o.ravel()[:1])

    # SD-1.5 self-attention shapes at the 512px stamp (CFG batch 3).
    shapes = [
        (3, 4096, 4096, 8, 40),   # level 0
        (3, 1024, 1024, 8, 80),   # level 1
        (3, 256, 256, 8, 160),    # level 2 (hd already 128+: expect parity)
    ]
    for (B, Lq, Lk, H, hd) in shapes:
        D = H * hd
        q = jax.random.normal(key, (B, Lq, D), jnp.bfloat16)
        k = jax.random.normal(key, (B, Lk, D), jnp.bfloat16)
        v = jax.random.normal(key, (B, Lk, D), jnp.bfloat16)

        ref = flash_attention(q, k, v, num_heads=H)
        got = sublane_attention(q, k, v, num_heads=H)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        # Chain N calls inside ONE jit (bench_attention.py methodology):
        # per-dispatch tunnel overhead (~3 ms) otherwise drowns the
        # kernel-time difference entirely.
        N = 20

        def chained(attn_fn):
            def run(q0, kk, vv):
                def body(i, qq):
                    out = attn_fn(qq, kk, vv)
                    # data-dependent carry (ADVICE r2):
                    # 0.0*out could be constant-folded
                    return qq + 1e-8 * out
                return jax.lax.fori_loop(0, N, body, q0)
            return jax.jit(run)

        rows = {}
        for name, attn in (
                ("lane-padded",
                 lambda a, b_, c: flash_attention(a, b_, c, num_heads=H)),
                ("sublane",
                 lambda a, b_, c: sublane_attention(a, b_, c, num_heads=H))):
            f = chained(attn)
            sync(f(q, k, v))
            best = 1e9
            for _ in range(4):
                tic = time.perf_counter()
                o = f(q, k, v)
                sync(o)
                best = min(best, (time.perf_counter() - tic) * 1e3 / N)
            rows[name] = best
        print(f"B{B} L{Lq} H{H} hd{hd}: lane={rows['lane-padded']:.3f} ms  "
              f"sublane={rows['sublane']:.3f} ms  "
              f"({rows['lane-padded'] / rows['sublane']:.2f}x)  maxerr={err:.4f}")


if __name__ == "__main__":
    main()
