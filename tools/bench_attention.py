"""Flash-vs-XLA attention A/B at the model's real shapes (within-session).

The dispatch policy in ops/attention.py (flash for long self-attention,
XLA dot-softmax for the kv=14 cross-attention and short sequences) was
set from these measurements; rerun after JAX/libtpu upgrades.

Usage: PYTHONPATH=. python tools/bench_attention.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from diffusiontexturepainting_tpu.ops.attention import xla_attention
from diffusiontexturepainting_tpu.ops.flash_attention import flash_attention

# (label, B, Lq, Lk, D, heads) - UNet levels at 512px/256px stamps,
# cross-attention (kv=14), VAE mid attention.
SHAPES = [
    ("unet L0 self 512px", 3, 4096, 4096, 320, 8),
    ("unet L1 self 512px", 3, 1024, 1024, 640, 8),
    ("unet L2 self 512px", 3, 256, 256, 1280, 8),
    ("unet L0 self 256px", 3, 1024, 1024, 320, 8),
    ("unet L0 cross kv14", 3, 4096, 14, 320, 8),
    ("vae mid 512px", 2, 4096, 4096, 512, 1),
]

N = 20
sync = lambda o: np.asarray(o.ravel()[:1])


def chain_time(fn, q, k, v):
    def chained(q0, kk, vv):
        def body(i, qq):
            out = fn(qq, kk, vv)
            # data-dependent carry (ADVICE r2: a 0.0*out carry
            # could be constant-folded, silently timing an empty
            # loop); 1e-8*out keeps the chain live and perturbs
            # q negligibly
            return qq + 1e-8 * out
        return jax.lax.fori_loop(0, N, body, q0)
    f = jax.jit(chained)
    out = f(q, k, v)
    sync(out)
    tic = time.perf_counter()
    sync(out)
    rtt = (time.perf_counter() - tic) * 1e3
    best = 1e9
    for _ in range(3):
        tic = time.perf_counter()
        out = f(q, k, v)
        sync(out)
        best = min(best, (time.perf_counter() - tic) * 1e3 - rtt)
    return best / N


def main():
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    key = jax.random.PRNGKey(0)
    for label, b, lq, lk, d, h in SHAPES:
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.device_put(jax.random.normal(kq, (b, lq, d), jnp.bfloat16))
        k = jax.device_put(jax.random.normal(kk, (b, lk, d), jnp.bfloat16))
        v = jax.device_put(jax.random.normal(kv, (b, lk, d), jnp.bfloat16))
        t_x = chain_time(lambda a, b_, c: xla_attention(a, b_, c, h), q, k, v)
        try:
            t_f = chain_time(
                lambda a, b_, c: flash_attention(a, b_, c, h), q, k, v)
            flash = f"{t_f:7.3f} ms"
            pick = "flash" if t_f < t_x else "XLA"
        except Exception as e:  # shape unsupported by the kernel
            flash, pick = f"n/a ({type(e).__name__})", "XLA"
        print(f"{label:22s} xla {t_x:7.3f} ms | flash {flash} -> {pick}",
              flush=True)


if __name__ == "__main__":
    main()
