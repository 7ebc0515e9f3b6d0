"""Latency benchmark: p50/p99 ms per brush stamp on one TPU chip.

Headline config (BASELINE.md rebuild target): 512x512 stamp, 4-step DDIM,
CFG triple-batch, bf16, full-size SD-1.5 inpainting pipeline as ONE jitted
device program. Prints ONE JSON line to stdout; detail goes to stderr.

Usage: python bench.py [--resolution 512] [--steps 4] [--iters 30]
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--warmup-iters", type=int, default=5)
    ap.add_argument("--tiny", action="store_true", help="tiny model (CI smoke)")
    ap.add_argument("--deep-cache-interval", type=int, default=1,
                    help=">1 enables DeepCache UNet feature reuse")
    args = ap.parse_args()

    import numpy as np

    import jax

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          file=sys.stderr)

    from diffusiontexturepainting_tpu.pipeline.tpu_model import TPUConditionalInpainter
    from diffusiontexturepainting_tpu.utils.profiling import percentile_stats

    t0 = time.time()
    from diffusiontexturepainting_tpu.core.config import PipelineConfig

    config = (PipelineConfig(deep_cache_interval=args.deep_cache_interval)
              if args.deep_cache_interval > 1 else None)
    model = TPUConditionalInpainter(
        resolution=args.resolution,
        tiny=args.tiny,
        warmup=True,
        warmup_points=[(args.resolution, args.steps)],
        verbose_timing=False,
        config=config,
    )
    print(f"model ready in {time.time() - t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    model.set_brush(rng.random((args.resolution, args.resolution, 3)).astype(np.float32))

    # Half-painted canvas in the WIRE format (uint8 RGBA), exactly as the
    # websocket server hands it to the model (serving/handler.py ->
    # generate_u8): the benchmark measures the product request path, not
    # a float convenience wrapper that would add a host-side f32->u8
    # conversion the server never performs.
    canvas = np.zeros((args.resolution, args.resolution, 4), np.uint8)
    canvas[: args.resolution // 2, :, :3] = rng.integers(
        0, 256, (args.resolution // 2, args.resolution, 3), dtype=np.uint8)
    canvas[: args.resolution // 2, :, 3] = 255

    settings = dict(steps=args.steps, cfg_weight=2.0, tg_weight=1.0,
                    tg_steps=args.steps, context_pad=150)

    for _ in range(args.warmup_iters):
        model.generate_u8(canvas, **settings)

    samples = []
    for _ in range(args.iters):
        tic = time.perf_counter()
        out = model.generate_u8(canvas, **settings)
        samples.append((time.perf_counter() - tic) * 1000.0)

    stats = percentile_stats(samples)
    stamps_per_sec = 1000.0 / stats["mean"]
    print(f"stats: {stats}", file=sys.stderr)
    print(f"stamps/sec/chip: {stamps_per_sec:.2f}", file=sys.stderr)

    target_ms = 100.0  # BASELINE.json north-star: <100 ms p50
    print(json.dumps({
        "metric": f"p50 ms per {args.resolution}x{args.resolution} stamp "
                  f"({args.steps}-step DDIM"
                  + (f"+DeepCache/{args.deep_cache_interval}"
                     if args.deep_cache_interval > 1 else "")
                  + f", CFG triple-batch, "
                  f"p99={stats['p99']:.1f}ms, {stamps_per_sec:.2f} stamps/s/chip)",
        "value": round(stats["p50"], 2),
        "unit": "ms",
        "vs_baseline": round(target_ms / stats["p50"], 3),
    }))


if __name__ == "__main__":
    main()
