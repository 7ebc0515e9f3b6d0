"""Device-side per-stamp time of the stroke-session program.

bench.py's stroke-stream p50 is wall time through the tunnel: N
fire-and-forget session stamps + one synchronizing canvas fetch. This
tool isolates the DEVICE component: it fires `--stamps` chained session
stamps (each consumes the previous donated canvas, so they serialize on
the device exactly like a real stroke) and syncs ONCE by fetching a
single byte of the final canvas; per-stamp = total / N minus the
measured fetch RTT share. The difference between bench.py's stroke p50
and this number is pure tunnel/dispatch overhead.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/bench_session_device.py [--resolution 512] [--steps 4]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--stamps", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from diffusiontexturepainting_tpu.pipeline.tpu_model import (
        TPUConditionalInpainter,
    )

    t0 = time.time()
    model = TPUConditionalInpainter(
        resolution=args.resolution, tiny=args.tiny, warmup=True,
        warmup_points=[(args.resolution, args.steps)], verbose_timing=False)
    print(f"model ready in {time.time() - t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    model.set_brush(
        rng.random((args.resolution, args.resolution, 3)).astype(np.float32))

    res = args.resolution
    canvas = np.zeros((2 * res, 2 * res, 4), np.uint8)
    canvas[:res, :, :3] = rng.integers(0, 256, (res, 2 * res, 3),
                                       dtype=np.uint8)
    canvas[:res, :, 3] = 255
    settings = dict(steps=args.steps, cfg_weight=2.0, tg_weight=1.0,
                    tg_steps=args.steps, context_pad=150)
    step_px = max(1, res // 4)

    # Sync floor: one no-op canvas-byte fetch round trip.
    model.begin_session(canvas)
    model.stamp_at(0, 0, return_pixels=False, **settings)
    model.fetch_canvas()  # compiles + warms everything
    rtts = []
    for _ in range(5):
        tic = time.perf_counter()
        model.sync_session()
        rtts.append((time.perf_counter() - tic) * 1e3)
    rtt = float(np.median(rtts))
    model.end_session()
    print(f"sync RTT floor: {rtt:.1f} ms", file=sys.stderr)

    best = 1e9
    for _ in range(args.rounds):
        model.begin_session(canvas)
        model.sync_session()
        tic = time.perf_counter()
        for i in range(args.stamps):
            x0 = (i * step_px) % (res + 1)
            y0 = (i * step_px) // (res + 1) * (res // 2)
            model.stamp_at(x0, y0, return_pixels=False, **settings)
        model.sync_session()
        dt = (time.perf_counter() - tic) * 1e3
        model.end_session()
        per = (dt - rtt) / args.stamps
        best = min(best, per)
        print(f"  {args.stamps} stamps in {dt:.1f} ms -> "
              f"{per:.2f} ms/stamp (device-chained)", file=sys.stderr)

    print(f"device-chained per-stamp best: {best:.2f} ms "
          f"({args.resolution}px, {args.steps}-step)")


if __name__ == "__main__":
    main()
