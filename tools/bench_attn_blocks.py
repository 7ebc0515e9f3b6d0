"""Sweep flash-attention q_block sizes at the UNet's serving shapes.

The resident kernel (ops/flash_attention.py) defaults to q_block=512.
Per-block VMEM is (bq x lk_pad) f32 scores + the resident K/V panel, so
larger blocks amortize the K/V reload across more query rows while
smaller blocks pipeline more grid steps - which wins is an empirical
question per (Lq, Lk, hd). Chained-iteration timing per the axon recipe
(memory: repeated-dispatch micro timings are unreliable; chain inside
one jit and subtract the fetch RTT).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_attn_blocks.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


# (label, batch*CFG, tokens, channels, heads) at the 512px stamp point
SHAPES = [
    ("64x64 self (320c, 8h x hd40)", 3, 4096, 320, 8),
    ("32x32 self (640c, 8h x hd80)", 3, 1024, 640, 8),
    ("16x16 self (1280c, 8h x hd160)", 3, 256, 1280, 8),
]


def chained_time(fn, args, iters=20):
    """One jit whose body applies fn `iters` times, each consuming the
    previous output (prevents dispatch-pipelining artifacts)."""
    @jax.jit
    def chain(q, k, v):
        def body(_, acc):
            out = fn(acc, k, v)
            return out.astype(acc.dtype)
        return jax.lax.fori_loop(0, iters, body, q)

    out = chain(*args)
    np.asarray(out.ravel()[:1])  # warm + sync
    best = 1e9
    for _ in range(4):
        tic = time.perf_counter()
        out = chain(*args)
        np.asarray(out.ravel()[:1])
        best = min(best, (time.perf_counter() - tic) * 1e3)
    # subtract one fetch RTT estimate via an empty chain? Cheap proxy:
    # time a 0-iter variant once.
    return best / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=str, default="128,256,512,1024")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from diffusiontexturepainting_tpu.core.engine import (
        enable_persistent_cache,
    )
    from diffusiontexturepainting_tpu.ops.flash_attention import (
        flash_attention,
    )

    enable_persistent_cache()
    blocks = [int(b) for b in args.blocks.split(",")]
    key = jax.random.PRNGKey(0)

    for label, B, L, C, H in SHAPES:
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (B, L, C), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, L, C), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, L, C), jnp.bfloat16)
        print(f"--- {label}")
        for bq in blocks:
            if bq > L:
                continue
            for exp2_bf16 in (False, True):
                fn = lambda q_, k_, v_, bq=bq, xb=exp2_bf16: flash_attention(
                    q_, k_, v_, num_heads=H, q_block=bq, exp2_bf16=xb)
                tag = f"q_block={bq:5d}" + (" exp2_bf16" if exp2_bf16
                                            else "          ")
                try:
                    t = chained_time(fn, (q, k, v), iters=args.iters)
                    print(f"  {tag}: {t:7.3f} ms")
                except Exception as e:  # noqa: BLE001 - report and continue
                    print(f"  {tag}: FAILED {type(e).__name__}: "
                          f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
