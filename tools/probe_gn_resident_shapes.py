"""Probe gn_conv_resident (force=pallas) at every SD-1.5 UNet resnet conv
shape of the 256/512px operating points: does it compile embedded in a
jit on the real chip, and how fast vs the unfused module leg?

Used to calibrate gn_conv_resident_plan (VERDICT r1 weak #4: replace
empirical carve-outs with validated budgets).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_gn_resident_shapes.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

SHAPES = [
    # (B, H, W, Cin, Cout) - square convs (conv2 + down conv1)
    (3, 64, 64, 320, 320),
    (3, 32, 32, 640, 640),
    (3, 16, 16, 1280, 1280),
    (3, 8, 8, 1280, 1280),
    (3, 32, 32, 320, 640),
    (3, 16, 16, 640, 1280),
    # up-block conv1 concat shapes
    (3, 8, 8, 2560, 1280),
    (3, 16, 16, 2560, 1280),
    (3, 16, 16, 1920, 1280),
    (3, 32, 32, 1920, 640),
    (3, 32, 32, 1280, 640),
    (3, 32, 32, 960, 640),
    (3, 64, 64, 960, 320),
    (3, 64, 64, 640, 320),
    # 256px point (lat 32): the distinct extra shapes
    (3, 32, 32, 2560, 1280),
    (3, 8, 8, 1920, 1280),
    (3, 4, 4, 1280, 1280),
    (3, 4, 4, 2560, 1280),
]


def main():
    from diffusiontexturepainting_tpu.core.engine import (
        enable_persistent_cache,
    )
    from diffusiontexturepainting_tpu.ops.conv3x3 import (
        gn_conv_resident,
        gn_conv_resident_plan,
    )

    enable_persistent_cache()
    key = jax.random.PRNGKey(0)
    sync = lambda o: np.asarray(o[0].ravel()[:1])
    for (B, H, W, Cin, Cout) in SHAPES:
        x = (jax.random.normal(key, (B, H, W, Cin), jnp.float32) * 0.5
             ).astype(jnp.bfloat16)
        w = (jax.random.normal(key, (3, 3, Cin, Cout), jnp.float32) * 0.02
             ).astype(jnp.bfloat16)
        b = jnp.zeros((Cout,), jnp.bfloat16)
        a = jnp.ones((B, Cin), jnp.float32) * 0.7
        c = jnp.zeros((B, Cin), jnp.float32) + 0.1
        res = (jnp.zeros((B, H, W, Cout), jnp.bfloat16)
               if Cin == Cout else None)
        plan = gn_conv_resident_plan(x.shape, w.shape,
                                     has_res=res is not None)

        def run(n=12):
            f = jax.jit(lambda x, w: gn_conv_resident(
                x, a, c, w, b, res, True, True, force="pallas"))
            out = f(x, w)
            sync(out)
            best = 1e9
            for _ in range(3):
                tic = time.perf_counter()
                for _ in range(n):
                    out = f(x, w)
                sync(out)
                best = min(best, (time.perf_counter() - tic) * 1e3 / n)
            return best

        def run_ref(n=12):
            f = jax.jit(lambda x, w: gn_conv_resident(
                x, a, c, w, b, res, True, True, force="xla"))
            out = f(x, w)
            sync(out)
            best = 1e9
            for _ in range(3):
                tic = time.perf_counter()
                for _ in range(n):
                    out = f(x, w)
                sync(out)
                best = min(best, (time.perf_counter() - tic) * 1e3 / n)
            return best

        tag = f"({B},{H:3d},{W:3d},{Cin:4d})x{Cout:4d} plan={plan}"
        t_ref = run_ref()
        if plan is None:
            print(f"{tag}  NOPLAN  xla={t_ref:6.3f} ms")
            continue
        try:
            t = run()
            print(f"{tag}  pallas={t:6.3f} ms  xla={t_ref:6.3f} ms  "
                  f"{'WIN' if t < t_ref else 'lose'}")
        except Exception as e:
            print(f"{tag}  FAIL {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
