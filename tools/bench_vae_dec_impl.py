"""A/B the VAE decoder's conv dispatch: planner (default) vs forced
pallas vs forced XLA, at the 512px serving shape.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_vae_dec_impl.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from diffusiontexturepainting_tpu.core.config import VAEConfig
    from diffusiontexturepainting_tpu.core.engine import (
        enable_persistent_cache,
    )
    from diffusiontexturepainting_tpu.models.vae import VAEDecoder
    from diffusiontexturepainting_tpu.ops.conv3x3 import conv_impl

    enable_persistent_cache()
    key = jax.random.PRNGKey(0)
    model = VAEDecoder(VAEConfig(), dtype=jnp.bfloat16)
    z = jax.random.normal(key, (1, 64, 64, 4), jnp.float32)
    params = jax.jit(model.init)(key, z)["params"]
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)

    sync = lambda o: np.asarray(o.ravel()[:1])
    outs = {}
    for impl in (None, "pallas", "xla"):
        with conv_impl(impl):
            fn = jax.jit(lambda p, s: model.apply({"params": p}, s))
            try:
                out = fn(params, z)
                sync(out)
            except Exception as e:
                print(f"impl={impl}: FAILED {type(e).__name__}: {e}")
                continue
            best = 1e9
            for _ in range(4):
                tic = time.perf_counter()
                for _ in range(8):
                    out = fn(params, z)
                sync(out)
                best = min(best, (time.perf_counter() - tic) * 1e3 / 8)
            outs[impl] = np.asarray(out)
            print(f"impl={impl}: {best:7.2f} ms/iter")
    if None in outs and "pallas" in outs:
        d = np.abs(outs[None].astype(np.float32)
                   - outs["pallas"].astype(np.float32)).max()
        print(f"max |planner - pallas| = {d:.4f}")




def bench_fused(profile_dir=None):
    """Time (and optionally trace) the fused_decode streaming path."""
    from diffusiontexturepainting_tpu.core.config import VAEConfig
    from diffusiontexturepainting_tpu.core.engine import (
        enable_persistent_cache,
    )
    from diffusiontexturepainting_tpu.models.vae import VAEDecoder, fused_decode

    enable_persistent_cache()
    key = jax.random.PRNGKey(0)
    cfg = VAEConfig()
    model = VAEDecoder(cfg, dtype=jnp.bfloat16)
    z = jax.random.normal(key, (1, 64, 64, 4), jnp.float32)
    params = jax.jit(model.init)(key, z)["params"]
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    fn = jax.jit(lambda p, s: fused_decode(p, s, cfg, jnp.bfloat16))
    sync = lambda o: np.asarray(o.ravel()[:1])
    out = fn(params, z)
    sync(out)
    best = 1e9
    for _ in range(4):
        tic = time.perf_counter()
        for _ in range(8):
            out = fn(params, z)
        sync(out)
        best = min(best, (time.perf_counter() - tic) * 1e3 / 8)
    print(f"fused_decode: {best:7.2f} ms/iter")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
        for _ in range(8):
            out = fn(params, z)
        sync(out)
        jax.profiler.stop_trace()


if __name__ == "__main__":
    import sys
    if "--fused" in sys.argv:
        bench_fused("/tmp/vdec_fused_trace" if "--trace" in sys.argv else None)
    else:
        main()
