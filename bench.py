"""Latency benchmark: p50/p99 ms per brush stamp on one TPU chip.

Headline config (BASELINE.md rebuild target): 512x512 stamp, 4-step DDIM,
CFG triple-batch, bf16, full-size SD-1.5 inpainting pipeline as ONE jitted
device program. Prints ONE JSON line to stdout; detail goes to stderr.

Two serving paths are measured:
  - isolated request (the reference's per-stamp request/response path):
    canvas up, stamp down, synchronized every request;
  - stroke stream (BASELINE.json config "Sequential brush stroke ... with
    crop/paste continuity"): a device-resident canvas session
    (pipeline/session.py) painting overlapping stamps back-to-back, with
    one synchronizing canvas fetch at the end - the interactive painting
    workload the product serves, where per-request transfers and
    round-trips amortize across the stroke.

The headline metric is the stroke-stream p50 per stamp; the isolated
p50 is reported alongside in the metric string and in stderr detail.

Usage: python bench.py [--resolution 512] [--steps 4] [--iters 30]
                       [--stroke 16] [--no-stroke]
"""

import argparse
import json
import signal
import sys
import time


def _ws_stroke(model, args, canvas_big, step_px, settings):
    """Run the stroke workload through a loopback websocket server
    wrapping `model`, timing per-stamp wall including ack frames.
    Returns percentile stats over --stroke-rounds strokes."""
    import asyncio
    import socket
    import threading
    import numpy as np

    import tornado.ioloop

    from diffusiontexturepainting_tpu.client.websocket_model import (
        WebsocketConditionalInpainter,
    )
    from diffusiontexturepainting_tpu.serving.run import create_server
    from diffusiontexturepainting_tpu.utils.profiling import percentile_stats

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    app = create_server(model=model, resolution=args.resolution,
                        warmup=False)
    loop_holder = {}
    ready = threading.Event()

    def serve():
        asyncio.set_event_loop(asyncio.new_event_loop())
        app.listen(port, address="127.0.0.1")
        loop_holder["loop"] = tornado.ioloop.IOLoop.current()
        ready.set()
        loop_holder["loop"].start()

    th = threading.Thread(target=serve, daemon=True)
    th.start()
    ready.wait(10)

    try:
        client = WebsocketConditionalInpainter(
            f"ws://127.0.0.1:{port}/websocket/",
            resolution=args.resolution)
        rng = np.random.default_rng(0)
        client.set_brush(rng.random(
            (args.resolution, args.resolution, 3)).astype(np.float32))

        def one_stroke():
            client.begin_session(canvas_big)
            tic = time.perf_counter()
            for i in range(args.stroke):
                x0 = (i * step_px) % (args.resolution + 1)
                y0 = ((i * step_px) // (args.resolution + 1)
                      * (args.resolution // 2))
                client.stamp_at(x0, y0, return_pixels=False, wait=False,
                                **settings)
            client.fetch_canvas()
            dt_ms = (time.perf_counter() - tic) * 1000.0
            client.end_session()
            return dt_ms / args.stroke

        one_stroke()  # warmup (server program already compiled)
        return percentile_stats([one_stroke()
                                 for _ in range(args.stroke_rounds)])
    finally:
        if "loop" in loop_holder:
            loop_holder["loop"].add_callback(loop_holder["loop"].stop)
        th.join(5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--warmup-iters", type=int, default=5)
    ap.add_argument("--tiny", action="store_true", help="tiny model (CI smoke)")
    ap.add_argument("--deep-cache-interval", type=int, default=1,
                    help=">1 enables DeepCache UNet feature reuse")
    ap.add_argument("--stroke", type=int, default=16,
                    help="stamps per stroke-stream measurement")
    ap.add_argument("--stroke-rounds", type=int, default=4,
                    help="independent strokes to sample")
    ap.add_argument("--no-stroke", action="store_true",
                    help="headline the isolated-request path instead")
    ap.add_argument("--ws", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="also time the stroke through a real local "
                         "websocket server (ack traffic included; the "
                         "server program is already compiled, so this "
                         "costs seconds). --no-ws to skip.")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (CI smoke; the axon PJRT "
                         "plugin ignores JAX_PLATFORMS, so this must go "
                         "through the config API)")
    args = ap.parse_args()

    import numpy as np

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          file=sys.stderr)

    from diffusiontexturepainting_tpu.pipeline.tpu_model import TPUConditionalInpainter
    from diffusiontexturepainting_tpu.utils.profiling import percentile_stats

    t0 = time.time()
    from diffusiontexturepainting_tpu.core.config import PipelineConfig

    # deep_cache_min_steps must not gate the benchmarked operating point
    # off: the default config only engages the cache at >=8 steps, but the
    # headline 4-step point is exactly where the <100 ms target needs it.
    config = (PipelineConfig(deep_cache_interval=args.deep_cache_interval,
                             deep_cache_min_steps=min(8, args.steps))
              if args.deep_cache_interval > 1 else None)
    print(f"[{time.time() - t0:.1f}s] building model (warmup compiles the "
          f"{args.resolution}px/{args.steps}-step stamp program; cold-cache "
          f"compile is minutes, warm cache seconds)", file=sys.stderr,
          flush=True)
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
    print(f"isolated-request stats: {stats}", file=sys.stderr)
    print(f"isolated stamps/sec/chip: {stamps_per_sec:.2f}", file=sys.stderr)

    # From here on a valid result exists. The stroke phase may hit a COLD
    # compile of the session program (~10+ min on a 1-core host); if an
    # outer timeout SIGTERMs us mid-compile, still emit the isolated
    # number instead of dying silently.
    target_ms = 100.0  # BASELINE.json north-star: <100 ms p50
    cfg_tag = (f"{args.steps}-step DDIM"
               + (f"+DeepCache/{args.deep_cache_interval}"
                  if args.deep_cache_interval > 1 else "")
               + ", CFG triple-batch")

    def isolated_json():
        return json.dumps({
            "metric": (f"p50 ms per {args.resolution}x{args.resolution} "
                       f"stamp ({cfg_tag}, p99={stats['p99']:.1f}ms, "
                       f"{stamps_per_sec:.2f} stamps/s/chip)"),
            "value": round(stats["p50"], 2),
            "unit": "ms",
            "vs_baseline": round(target_ms / stats["p50"], 3),
        })

    def _on_term(signum, frame):  # pragma: no cover - timeout path
        print("SIGTERM during stroke phase - emitting the isolated-request "
              "result", file=sys.stderr)
        print(isolated_json(), flush=True)
        sys.exit(0)

    signal.signal(signal.SIGTERM, _on_term)

    # --- stroke stream: device-resident canvas session -------------------
    # Overlapping stamps march across a 2x-resolution canvas; stamps are
    # fired without per-stamp fetches (return_pixels=False) and the
    # stroke is synchronized by ONE fetch_canvas at the end, exactly as
    # the stroke-session client paths do (client/websocket_model.py).
    stroke_stats = None
    if args.stroke > 0 and not args.no_stroke:
        res = args.resolution
        canvas_big = np.zeros((2 * res, 2 * res, 4), np.uint8)
        canvas_big[:res] = np.concatenate([canvas, canvas], axis=1)
        step_px = max(1, res // 4)  # heavy overlap, like a real stroke

        def one_stroke():
            model.begin_session(canvas_big)
            tic = time.perf_counter()
            for i in range(args.stroke):
                x0 = (i * step_px) % (res + 1)
                y0 = (i * step_px) // (res + 1) * (res // 2)
                model.stamp_at(x0, y0, return_pixels=False, **settings)
            model.fetch_canvas()
            dt_ms = (time.perf_counter() - tic) * 1000.0
            model.end_session()
            return dt_ms / args.stroke

        # Never let the stroke path take the whole benchmark down: if the
        # session program fails on this backend, fall back to headlining
        # the isolated-request numbers already measured above.
        try:
            one_stroke()  # warmup (compiles the session program)
            per_stamp = [one_stroke() for _ in range(args.stroke_rounds)]
            stroke_stats = percentile_stats(per_stamp)
            print(f"stroke-stream per-stamp (over {args.stroke}-stamp "
                  f"strokes): {stroke_stats}", file=sys.stderr)
            print("stroke stamps/sec/chip: "
                  f"{1000.0 / stroke_stats['mean']:.2f}", file=sys.stderr)
        except Exception as exc:  # pragma: no cover - device-specific
            stroke_stats = None
            print(f"stroke-stream path failed ({exc!r}); falling back to "
                  f"the isolated-request headline", file=sys.stderr)
            try:
                model.end_session()
            except Exception:
                pass

    # --- websocket stroke: same stroke through a real local server -------
    # The in-process number above times the session API; this one adds the
    # live wire: 22-byte session requests, fire-and-forget stamps, ack
    # frames, and the synchronizing canvas fetch, through a loopback
    # tornado server wrapping the SAME model (no second compile).
    ws_stroke_stats = None
    if args.ws and stroke_stats is not None:
        try:
            ws_stroke_stats = _ws_stroke(model, args, canvas_big, step_px,
                                         settings)
            print(f"ws-stroke per-stamp (live websocket incl. acks): "
                  f"{ws_stroke_stats}", file=sys.stderr)
        except Exception as exc:  # pragma: no cover - environment-specific
            print(f"ws-stroke path failed ({exc!r})", file=sys.stderr)

    signal.signal(signal.SIGTERM, signal.SIG_DFL)
    if stroke_stats is not None and not args.no_stroke:
        value = stroke_stats["p50"]
        metric = (
            f"p50 ms per {args.resolution}x{args.resolution} stamp, "
            f"{args.stroke}-stamp stroke stream on a device-resident "
            f"canvas ({cfg_tag}, p99={stroke_stats['p99']:.1f}ms, "
            f"{1000.0 / stroke_stats['mean']:.2f} stamps/s/chip; isolated "
            f"request/response p50={stats['p50']:.1f}ms"
            + (f"; live-websocket stroke p50={ws_stroke_stats['p50']:.1f}ms"
               if ws_stroke_stats else "") + ")")
        print(json.dumps({
            "metric": metric,
            "value": round(value, 2),
            "unit": "ms",
            "vs_baseline": round(target_ms / value, 3),
        }))
    else:
        print(isolated_json())


if __name__ == "__main__":
    main()
