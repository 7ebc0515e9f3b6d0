"""A/B the transformer-block tensor layout at the real UNet step shape:
3D (B, L, C) baseline vs 2D (B*L, C) pointwise ops (_T2D_2D).

Motivation: round-1 profile shows the 3D FF dots in token-minor {1,2,0}
layouts at ~38 TF/s; this measures whether collapsing the batch dim
fixes the layout without the (failed) 4D experiment's reshape overhead.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_t2d_layout.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def bench_step(flag: bool):
    from diffusiontexturepainting_tpu.core.config import UNetConfig
    from diffusiontexturepainting_tpu.models import layers
    from diffusiontexturepainting_tpu.models.unet import UNet2DCondition

    layers._T2D_2D = flag
    key = jax.random.PRNGKey(0)
    model = UNet2DCondition(UNetConfig(), dtype=jnp.bfloat16)
    sample = jax.random.normal(key, (3, 64, 64, 9), jnp.float32)
    ctx = jax.random.normal(key, (3, 14, 768), jnp.float32)
    t = jnp.full((3,), 500.0, jnp.float32)
    params = jax.jit(model.init)(key, sample, t, ctx)["params"]
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    fn = jax.jit(lambda p, s: model.apply({"params": p}, s, t, ctx))
    sync = lambda o: np.asarray(o.ravel()[:1])
    out = fn(params, sample)
    sync(out)
    best = 1e9
    for _ in range(4):
        tic = time.perf_counter()
        for _ in range(8):
            out = fn(params, sample)
        sync(out)
        best = min(best, (time.perf_counter() - tic) * 1e3 / 8)
    return best, np.asarray(out)


def main():
    from diffusiontexturepainting_tpu.core.engine import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    t3, out3 = bench_step(False)
    print(f"3D (B, L, C) baseline : {t3:7.2f} ms/step")
    t2, out2 = bench_step(True)
    print(f"2D (B*L, C) pointwise : {t2:7.2f} ms/step")
    print(f"max |diff| = {np.abs(out3 - out2).max():.5f}")
    print("winner:", "2D" if t2 < t3 else "3D")


if __name__ == "__main__":
    main()
