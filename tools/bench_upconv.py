"""Per-shape upsample2x+conv3x3 A/B on the real chip.

Measures, for each decoder upsample shape, the XLA repeat+conv path vs
the VMEM-resident pallas kernel (when planned) vs the streamed subpixel
kernel (ops/gn_conv_stream.upconv_stream) — so the dispatch in
ops/conv3x3._upconv_dispatch is gated on measured wins, not projections.
(Round-3 bisect: a blanket stream dispatch regressed full VAE decode
20.3 -> 43 ms despite an isolated 1.9 vs 3.4 ms win at one shape.)
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=30):
    # sync via a host read: block_until_ready is a no-op through the
    # axon loopback relay (measured 0.02 ms for a 311-GFLOP conv)
    sync = lambda o: np.asarray(o.ravel()[:1])
    f = jax.jit(fn)
    out = f(*args)
    sync(out)
    best = 1e9
    for _ in range(3):
        tic = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        sync(out)
        best = min(best, (time.perf_counter() - tic) / iters * 1000.0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from diffusiontexturepainting_tpu.ops import conv3x3 as c3
    from diffusiontexturepainting_tpu.ops.gn_conv_stream import (
        upconv_stream,
        upconv_stream_plan,
    )

    shapes = [
        # 512px decode: latent 64^2 -> 128 -> 256 -> 512
        (1, 64, 64, 512, 512),
        (1, 128, 128, 512, 512),
        (1, 256, 256, 256, 256),
        # 256px decode levels
        (1, 32, 32, 512, 512),
        (1, 64, 64, 512, 512),
        (1, 128, 128, 256, 256),
    ]
    seen = set()
    rng = np.random.default_rng(0)
    for (b, h, w_, cin, cout) in shapes:
        if (b, h, w_, cin, cout) in seen:
            continue
        seen.add((b, h, w_, cin, cout))
        x = jnp.asarray(rng.standard_normal((b, h, w_, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05,
                        jnp.bfloat16)
        bias = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
        row = [f"({b},{h},{w_},{cin})->{cout}"]
        t_xla = timeit(lambda x, w, bias: c3._upconv_reference(x, w, bias),
                       x, w, bias, iters=args.iters)
        row.append(f"xla={t_xla:.2f}ms")
        plan = c3._upconv_plan(x.shape, w.shape)
        if plan is not None:
            t_res = timeit(lambda x, w, bias: c3._upconv_pallas(
                x, w, bias, plan), x, w, bias, iters=args.iters)
            row.append(f"resident={t_res:.2f}ms")
        else:
            row.append("resident=n/a")
        if upconv_stream_plan(x.shape, w.shape, x.dtype.itemsize):
            t_st = timeit(lambda x, w, bias: upconv_stream(
                x, w, bias, want_stats=False)[0], x, w, bias,
                iters=args.iters)
            row.append(f"stream={t_st:.2f}ms")
        else:
            row.append("stream=n/a")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
