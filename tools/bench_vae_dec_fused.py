"""A/B the VAE decoder execution: Flax module path (planner convs) vs
fused_decode (chained GroupNorm-prologue/stats-epilogue streaming convs +
streamed subpixel upsample-conv), at the 512px serving shape.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_vae_dec_fused.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def bench(fn, *args, iters=8, rounds=4):
    sync = lambda o: np.asarray(o.ravel()[:1])
    out = fn(*args)
    sync(out)
    best = 1e9
    for _ in range(rounds):
        tic = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - tic) * 1e3 / iters)
    return best, np.asarray(out)


def main():
    from diffusiontexturepainting_tpu.core.config import VAEConfig
    from diffusiontexturepainting_tpu.core.engine import (
        enable_persistent_cache,
    )
    from diffusiontexturepainting_tpu.models.vae import (
        VAEDecoder,
        fused_decode,
    )

    enable_persistent_cache()
    key = jax.random.PRNGKey(0)
    cfg = VAEConfig()
    model = VAEDecoder(cfg, dtype=jnp.bfloat16)
    z = jax.random.normal(key, (1, 64, 64, 4), jnp.float32)
    params = jax.jit(model.init)(key, z)["params"]
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)

    t_mod, out_mod = bench(
        jax.jit(lambda p, s: model.apply({"params": p}, s)), params, z)
    print(f"module path: {t_mod:7.2f} ms")
    try:
        t_fus, out_fus = bench(
            jax.jit(lambda p, s: fused_decode(p, s, cfg)), params, z)
        print(f"fused path:  {t_fus:7.2f} ms ({t_mod / t_fus:.2f}x)")
        err = np.abs(out_mod - out_fus).max()
        print(f"max |module - fused| = {err:.4e}")
    except Exception as e:
        print(f"fused path FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
