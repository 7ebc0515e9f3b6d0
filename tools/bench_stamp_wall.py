"""Decompose the 512px stamp's per-request WALL time on the tunneled TPU.

bench.py p50 ~306 ms vs ~137 ms device compute + ~80 ms measured tunnel
floor (tools/bench_overhead.py: 26 ms RTT + 17 ms/MB upload + 38 ms
fetch of 768 KB) leaves ~90 ms unaccounted. This splits one
model.generate call into:

    host-prep   (float->u8 canvas convert etc.)
    dispatch    (fn() call until it returns the output futures)
    fetch       (np.asarray of the composited u8 output)

and A/Bs: canvas passed as numpy (upload rides dispatch) vs pre-staged
device_put, and generate() vs generate_u8().

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_stamp_wall.py
"""

import argparse
import time

import numpy as np


def pct(xs, q):
    xs = sorted(xs)
    return xs[int(len(xs) * q)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax

    from diffusiontexturepainting_tpu.pipeline.tpu_model import (
        TPUConditionalInpainter,
    )

    t0 = time.time()
    model = TPUConditionalInpainter(
        resolution=args.resolution, warmup=True,
        warmup_points=[(args.resolution, args.steps)], verbose_timing=False)
    print(f"model ready in {time.time() - t0:.1f}s")

    rng = np.random.default_rng(0)
    model.set_brush(
        rng.random((args.resolution, args.resolution, 3)).astype(np.float32))
    res = args.resolution
    canvas = np.zeros((res, res, 4), np.float32)
    canvas[: res // 2, :, :3] = rng.random((res // 2, res, 3))
    canvas[: res // 2, :, 3] = 1.0
    canvas_u8 = (np.clip(canvas, 0, 1) * 255).astype(np.uint8)
    settings = dict(steps=args.steps, cfg_weight=2.0, tg_weight=1.0,
                    tg_steps=args.steps, context_pad=150)

    # warmup
    for _ in range(3):
        model.generate_u8(canvas_u8, **settings)

    rows = {"dispatch": [], "fetch": [], "total": []}
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out_dev = model._run_stamp(canvas_u8, **settings)[1]
        t1 = time.perf_counter()
        np.asarray(out_dev)
        t2 = time.perf_counter()
        rows["dispatch"].append((t1 - t0) * 1e3)
        rows["fetch"].append((t2 - t1) * 1e3)
        rows["total"].append((t2 - t0) * 1e3)
    for k, v in rows.items():
        print(f"numpy-canvas  {k:9s} p50={pct(v, 0.5):7.2f}  min={min(v):7.2f}")

    # pre-staged device canvas: is the upload synchronous on dispatch?
    canvas_dev = jax.device_put(canvas_u8)
    rows = {"dispatch": [], "fetch": [], "total": []}
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out_dev = model._run_stamp(canvas_dev, **settings)[1]
        t1 = time.perf_counter()
        np.asarray(out_dev)
        t2 = time.perf_counter()
        rows["dispatch"].append((t1 - t0) * 1e3)
        rows["fetch"].append((t2 - t1) * 1e3)
        rows["total"].append((t2 - t0) * 1e3)
    for k, v in rows.items():
        print(f"staged-canvas {k:9s} p50={pct(v, 0.5):7.2f}  min={min(v):7.2f}")

    # full generate() (float canvas) for reference
    samples = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        model.generate(canvas, **settings)
        samples.append((time.perf_counter() - t0) * 1e3)
    print(f"generate(float) total     p50={pct(samples, 0.5):7.2f}  "
          f"min={min(samples):7.2f}")

    samples = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        model.generate_u8(canvas_u8, **settings)
        samples.append((time.perf_counter() - t0) * 1e3)
    print(f"generate_u8 total         p50={pct(samples, 0.5):7.2f}  "
          f"min={min(samples):7.2f}")


if __name__ == "__main__":
    main()
