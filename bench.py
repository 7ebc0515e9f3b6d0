"""Latency benchmark: p50/p99 ms per brush stamp on one TPU chip.

Headline config (BASELINE.md rebuild target): 512x512 stamp, 4-step DDIM,
CFG triple-batch, bf16, full-size SD-1.5 inpainting pipeline as ONE jitted
device program. Prints ONE JSON line to stdout; detail goes to stderr.

Measured paths, all in one process against the same params:
  - isolated request (the reference's per-stamp request/response path):
    canvas up, stamp down, synchronized every request;
  - stroke stream (BASELINE.json config "Sequential brush stroke ... with
    crop/paste continuity"): STEADY-STATE strokes on one persistent
    device-resident canvas session (pipeline/session.py) - the Kit
    painter holds a session across strokes, so the canvas upload is a
    per-painting cost (reported once as session_create_ms); each stroke
    paints overlapping stamps back-to-back and pays one synchronizing
    canvas fetch - the interactive painting workload the product serves;
  - the same stroke through a LIVE loopback websocket server (ack frames
    and wire encode/decode included);
  - DEVICE time per stamp: chained session stamps synchronized once,
    minus the measured sync round-trip - the wall numbers ride a
    tunneled transport with +-15-30 ms noise, so the device figure is
    what resolves real round-over-round kernel progress (the analog of
    the reference's CUDA-event per-stage table,
    stable_diffusion_pipeline.py:486-503);
  - the DeepCache operating point (pipeline/inpaint.py full/shallow
    UNet schedule): same programs, interval/pattern from
    --deep-cache-headline, measured stroke + device time. Its approximate
    math is labeled as such, with the measured fidelity-vs-exact summary
    (tools/check_bf16_fidelity.py --deep-cache) quoted next to it.

The ONE JSON line carries: `value` = headline stroke-stream p50 (the
DeepCache point when it wins and --headline deep-cache, else exact math),
plus machine-readable context keys: exact/deep-cache stroke + device
p50s, isolated p50, ws p50, model-ready seconds and per-point warmup
seconds (a persistent-cache hit loads in seconds; a cold compile is
minutes - so a slow driver host is attributable from the artifact).

Usage: python bench.py [--resolution 512] [--steps 4] [--iters 30]
                       [--stroke 16] [--stroke-rounds 10] [--no-stroke]
                       [--deep-cache-headline FSSF|2|off]
"""

import argparse
import json
import signal
import sys
import time


def _ws_stroke(model, args, canvas_big, step_px, settings, rounds):
    """Run the stroke workload through a loopback websocket server
    wrapping `model`, timing per-stamp wall including ack frames.
    Returns percentile stats over `rounds` strokes."""
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

        # Steady-state painting session: ONE begin_session (the canvas
        # upload is a per-painting cost, not a per-stroke cost - the Kit
        # painter holds a session across strokes), then each stroke =
        # stamps + the synchronizing canvas fetch the painter waits for.
        client.begin_session(canvas_big)
        client.fetch_canvas()  # settle the upload outside the timing

        def one_stroke():
            tic = time.perf_counter()
            for i in range(args.stroke):
                x0 = (i * step_px) % (args.resolution + 1)
                y0 = ((i * step_px) // (args.resolution + 1)
                      * (args.resolution // 2))
                client.stamp_at(x0, y0, return_pixels=False, wait=False,
                                **settings)
            client.fetch_canvas()
            dt_ms = (time.perf_counter() - tic) * 1000.0
            return dt_ms / args.stroke

        one_stroke()  # warmup (server program already compiled)
        try:
            return percentile_stats([one_stroke() for _ in range(rounds)])
        finally:
            client.end_session()
    finally:
        if "loop" in loop_holder:
            loop_holder["loop"].add_callback(loop_holder["loop"].stop)
        th.join(5)


def _stroke_stats(model, args, canvas_big, step_px, settings, rounds):
    """Per-stamp wall stats over `rounds` steady-state strokes on ONE
    persistent device-resident session (the product workload: the Kit
    painter holds a session across strokes, so the canvas upload is a
    per-painting cost; each stroke pays its stamps + the synchronizing
    canvas fetch the painter waits for). The one-time session-create
    seconds (upload + settle) are returned on the stats dict as
    'session_create_ms' for transparency."""
    from diffusiontexturepainting_tpu.utils.profiling import percentile_stats

    tic = time.perf_counter()
    model.begin_session(canvas_big)
    model.sync_session()  # settle the canvas upload outside the timing
    create_ms = (time.perf_counter() - tic) * 1000.0

    def one_stroke():
        tic = time.perf_counter()
        for i in range(args.stroke):
            x0 = (i * step_px) % (args.resolution + 1)
            y0 = ((i * step_px) // (args.resolution + 1)
                  * (args.resolution // 2))
            model.stamp_at(x0, y0, return_pixels=False, **settings)
        model.fetch_canvas()
        dt_ms = (time.perf_counter() - tic) * 1000.0
        return dt_ms / args.stroke

    # warmup stroke (compiles/loads the session programs); its wall time
    # is THE compile attribution for this operating point - these are
    # the programs the phase actually measures (the isolated stamp
    # program is a different executable)
    warm_ms = one_stroke() * args.stroke
    try:
        stats = percentile_stats([one_stroke() for _ in range(rounds)])
    finally:
        model.end_session()
    stats["session_create_ms"] = round(create_ms, 1)
    stats["warmup_stroke_s"] = round(warm_ms / 1000.0, 1)
    return stats


def _device_stroke_ms(model, args, canvas_big, step_px, settings, rounds=4):
    """DEVICE time per chained session stamp: fire args.stroke
    fire-and-forget stamps, sync ONCE (one-byte fetch), subtract the
    measured sync round-trip, divide by N. Returns (median, best) ms.
    Requires the session programs to be warm (run after _stroke_stats)."""
    import numpy as np

    model.begin_session(canvas_big)
    model.stamp_at(0, 0, return_pixels=False, **settings)
    model.sync_session()
    rtts = []
    for _ in range(5):
        tic = time.perf_counter()
        model.sync_session()
        rtts.append((time.perf_counter() - tic) * 1e3)
    rtt = float(np.median(rtts))
    model.end_session()

    per = []
    for _ in range(rounds):
        model.begin_session(canvas_big)
        model.sync_session()
        tic = time.perf_counter()
        for i in range(args.stroke):
            x0 = (i * step_px) % (args.resolution + 1)
            y0 = ((i * step_px) // (args.resolution + 1)
                  * (args.resolution // 2))
            model.stamp_at(x0, y0, return_pixels=False, **settings)
        model.sync_session()
        dt = (time.perf_counter() - tic) * 1e3
        model.end_session()
        per.append((dt - rtt) / args.stroke)
    print(f"device-chained per-stamp (sync RTT {rtt:.1f} ms): "
          f"{['%.1f' % p for p in per]}", file=sys.stderr)
    return float(np.median(per)), float(min(per))


def run_concurrent(args):
    """Batched single-chip serving throughput (--concurrent N): N
    concurrent painters' stamps vmapped into one program on ONE chip via
    the request-batching service (serving/parallel_model.py,
    --mesh data=1 --max-batch N; the reference's TRT batch-1..16 engine
    envelope, models.py:886-890). Reports batched stamps/sec/chip and
    the speedup over batch-1 dispatches of the same program."""
    import numpy as np

    from diffusiontexturepainting_tpu.serving.parallel_model import (
        make_parallel_service,
    )

    t0 = time.time()
    service = make_parallel_service(args.resolution, "data=1",
                                    tiny=args.tiny,
                                    max_batch=args.concurrent)
    rng = np.random.default_rng(0)
    res = args.resolution

    def payload(i):
        canvas = np.zeros((res, res, 4), np.uint8)
        canvas[: res // 2, :, :3] = rng.integers(
            0, 256, (res // 2, res, 3), dtype=np.uint8)
        canvas[: res // 2, :, 3] = 255
        brush = rng.random((res, res, 3)).astype(np.float32)
        cond, uncond = service.base._encode_brush(
            service.base.params["patch_encoder"], brush[None])
        return dict(canvas=canvas, brush=brush, cond=np.asarray(cond),
                    uncond=np.asarray(uncond), counter=np.uint32(i),
                    cfg_weight=np.float32(2.0), tg_weight=np.float32(1.0),
                    tg_steps=np.int32(args.steps),
                    context_pad=np.int32(150))

    payloads = [payload(i) for i in range(args.concurrent)]
    key = (res, args.steps)
    results = {}
    for B in [1, args.concurrent]:
        batch = payloads[:B]
        service._run_batch(key, batch)  # compile + warm this bucket
        print(f"[{time.time() - t0:.1f}s] batch-{B} program warm",
              file=sys.stderr, flush=True)
        samples = []
        for _ in range(args.iters):
            tic = time.perf_counter()
            service._run_batch(key, batch)
            samples.append((time.perf_counter() - tic) * 1000.0)
        med = float(np.median(samples))
        results[B] = dict(ms=med, sps=1000.0 * B / med)
        print(f"batch {B}: {med:.1f} ms/dispatch = "
              f"{results[B]['sps']:.2f} stamps/s/chip", file=sys.stderr)

    B = args.concurrent
    sps = results[B]["sps"]
    print(json.dumps({
        "metric": (f"batched stamps/sec/chip at request batch {B} "
                   f"({res}x{res}, {args.steps}-step DDIM, CFG "
                   f"triple-batch; batch-1 = {results[1]['sps']:.2f} "
                   f"stamps/s, speedup {sps / results[1]['sps']:.2f}x; "
                   f"serving surface: --mesh data=1 --max-batch {B})"),
        "value": round(sps, 2),
        "unit": "stamps/s",
        "vs_baseline": round(sps / 10.0, 3),  # 10/s = the 100 ms target
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--warmup-iters", type=int, default=5)
    ap.add_argument("--tiny", action="store_true", help="tiny model (CI smoke)")
    ap.add_argument("--deep-cache-interval", type=str, default="1",
                    help="build the model pipeline at this DeepCache spec "
                         "(int interval or 'FSSF' pattern) instead of "
                         "measuring exact + headline specs")
    ap.add_argument("--deep-cache-headline", type=str, default="2",
                    help="DeepCache spec additionally measured as the "
                         "headline operating point when the model runs "
                         "exact math ('off' disables the extra phase). "
                         "Interval 2 measured best at 512/4: PSNR 36.8 dB "
                         "vs exact, beating the FSSF pattern's 33.9 dB "
                         "(fresher caches beat a fresh final step; "
                         "tools/check_bf16_fidelity.py --deep-cache)")
    ap.add_argument("--headline", choices=["deep-cache", "exact"],
                    default="deep-cache",
                    help="which measured operating point provides the "
                         "headline `value` (the other is always reported "
                         "alongside)")
    ap.add_argument("--stroke", type=int, default=16,
                    help="stamps per stroke-stream measurement")
    ap.add_argument("--stroke-rounds", type=int, default=10,
                    help="independent strokes to sample")
    ap.add_argument("--ws-rounds", type=int, default=4,
                    help="strokes through the live websocket server")
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
    ap.add_argument("--concurrent", type=int, default=0,
                    help="measure batched serving throughput instead: "
                         "batch N concurrent painters' stamps on one chip "
                         "(--mesh data=1 --max-batch N) and report "
                         "stamps/sec/chip")
    args = ap.parse_args()

    import numpy as np

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          file=sys.stderr)

    if args.concurrent > 0:
        run_concurrent(args)
        return

    from diffusiontexturepainting_tpu.pipeline.tpu_model import TPUConditionalInpainter
    from diffusiontexturepainting_tpu.utils.profiling import percentile_stats

    def parse_spec(s):
        """int interval or validated 'FSSF' pattern - fail fast instead
        of minutes later inside the warmup thread. One shared grammar
        (pipeline/inpaint.py parse_deep_cache_spec)."""
        from diffusiontexturepainting_tpu.pipeline.inpaint import (
            parse_deep_cache_spec,
        )

        try:
            return parse_deep_cache_spec(s)
        except ValueError as e:
            raise SystemExit(str(e))

    build_spec = parse_spec(args.deep_cache_interval)
    exact_build = isinstance(build_spec, int) and build_spec <= 1
    headline_spec = (None if args.deep_cache_headline.lower() == "off"
                     or not exact_build or args.tiny
                     else parse_spec(args.deep_cache_headline))

    t0 = time.time()
    from diffusiontexturepainting_tpu.core.config import PipelineConfig

    config = (None if exact_build else
              PipelineConfig(deep_cache_interval=build_spec,
                             deep_cache_min_steps=min(8, args.steps)))
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
    model_ready_s = time.time() - t0
    print(f"model ready in {model_ready_s:.1f}s", file=sys.stderr)

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
        model.generate_u8(canvas, **settings)
        samples.append((time.perf_counter() - tic) * 1000.0)

    stats = percentile_stats(samples)
    stamps_per_sec = 1000.0 / stats["mean"]
    print(f"isolated-request stats: {stats}", file=sys.stderr)
    print(f"isolated stamps/sec/chip: {stamps_per_sec:.2f}", file=sys.stderr)

    # From here on a valid result exists. Later phases may hit a COLD
    # compile (~minutes); if an outer timeout SIGTERMs us, still emit the
    # best result so far instead of dying silently.
    target_ms = 100.0  # BASELINE.json north-star: <100 ms p50
    warmup_s = {f"{k[0]}x{k[1]}/dc={k[2]}": round(v, 1)
                for k, v in getattr(model, "warmup_timings", {}).items()}
    warmup_s.update(getattr(model, "init_timings", {}))
    base_tag = (f"{args.steps}-step DDIM"
                + (f"+DeepCache[{build_spec}]" if not exact_build else "")
                + ", CFG triple-batch")

    best = {}  # mutated as phases complete; SIGTERM emits it as-is

    def emit_json():
        extra = {k: v for k, v in best.items()
                 if k not in ("value", "metric")}
        return json.dumps({
            "metric": best["metric"],
            "value": best["value"],
            "unit": "ms",
            "vs_baseline": round(target_ms / best["value"], 3),
            "model_ready_s": round(model_ready_s, 1),
            "warmup_s": warmup_s,
            **extra,
        })

    best["value"] = round(stats["p50"], 2)
    best["isolated_p50_ms"] = round(stats["p50"], 2)
    best["metric"] = (f"p50 ms per {args.resolution}x{args.resolution} "
                      f"stamp ({base_tag}, p99={stats['p99']:.1f}ms, "
                      f"{stamps_per_sec:.2f} stamps/s/chip)")

    def _on_term(signum, frame):  # pragma: no cover - timeout path
        print("SIGTERM - emitting the best result so far", file=sys.stderr)
        print(emit_json(), flush=True)
        sys.exit(0)

    signal.signal(signal.SIGTERM, _on_term)

    # --- stroke stream: device-resident canvas session -------------------
    # Overlapping stamps march across a 2x-resolution canvas; stamps are
    # fired without per-stamp fetches (return_pixels=False) and the
    # stroke is synchronized by ONE fetch_canvas at the end, exactly as
    # the stroke-session client paths do (client/websocket_model.py).
    res = args.resolution
    canvas_big = np.zeros((2 * res, 2 * res, 4), np.uint8)
    canvas_big[:res] = np.concatenate([canvas, canvas], axis=1)
    step_px = max(1, res // 4)  # heavy overlap, like a real stroke

    stroke_stats = None
    device_ms = device_best = None
    if args.stroke > 0 and not args.no_stroke:
        # Never let the stroke path take the whole benchmark down: if the
        # session program fails on this backend, fall back to headlining
        # the isolated-request numbers already measured above.
        try:
            stroke_stats = _stroke_stats(model, args, canvas_big, step_px,
                                         settings, args.stroke_rounds)
            print(f"stroke-stream per-stamp (over {args.stroke}-stamp "
                  f"strokes): {stroke_stats}", file=sys.stderr)
            print("stroke stamps/sec/chip: "
                  f"{1000.0 / stroke_stats['mean']:.2f}", file=sys.stderr)
            device_ms, device_best = _device_stroke_ms(
                model, args, canvas_big, step_px, settings)
            print(f"device per-stamp: median {device_ms:.1f} ms "
                  f"(best {device_best:.1f})", file=sys.stderr)
        except Exception as exc:  # pragma: no cover - device-specific
            stroke_stats = None
            print(f"stroke-stream path failed ({exc!r}); falling back to "
                  f"the isolated-request headline", file=sys.stderr)
            try:
                model.end_session()
            except Exception:
                pass

    if stroke_stats is not None:
        # key the machine-readable p50 by what math actually ran: when
        # the model was BUILT at a DeepCache spec (--deep-cache-interval)
        # the stroke is approximate math, and calling it exact_p50_ms
        # would silently compare exact vs cached numbers across rounds
        p50_key = "exact_p50_ms" if exact_build else "dc_build_p50_ms"
        best.update({
            "value": round(stroke_stats["p50"], 2),
            p50_key: round(stroke_stats["p50"], 2),
            "device_ms": round(device_ms, 1),
            "session_create_ms": stroke_stats["session_create_ms"],
            "metric": (
                f"p50 ms per {res}x{res} stamp, {args.stroke}-stamp "
                f"steady-state stroke stream on a persistent "
                f"device-resident session ({base_tag}, "
                f"p99={stroke_stats['p99']:.1f}ms, device "
                f"{device_ms:.1f}ms/stamp; isolated p50={stats['p50']:.1f}ms)"),
        })

    # --- websocket stroke: same stroke through a real local server -------
    ws_stroke_stats = None
    if args.ws and stroke_stats is not None:
        try:
            ws_stroke_stats = _ws_stroke(model, args, canvas_big, step_px,
                                         settings, args.ws_rounds)
            print(f"ws-stroke per-stamp (live websocket incl. acks): "
                  f"{ws_stroke_stats}", file=sys.stderr)
            best["ws_p50_ms"] = round(ws_stroke_stats["p50"], 2)
        except Exception as exc:  # pragma: no cover - environment-specific
            print(f"ws-stroke path failed ({exc!r})", file=sys.stderr)

    # --- DeepCache operating point (same model, same session machinery) --
    dc = None
    if headline_spec is not None and stroke_stats is not None:
        try:
            model.set_deep_cache(headline_spec,
                                 min_steps=min(8, args.steps))
            # the phase measures the SESSION programs; their compile/load
            # is timed by _stroke_stats' warmup stroke (warming the
            # isolated stamp program here would burn minutes of a cold
            # cache on an executable this phase never runs)
            dc_stroke = _stroke_stats(model, args, canvas_big, step_px,
                                      settings, args.stroke_rounds)
            dc_dev, dc_dev_best = _device_stroke_ms(
                model, args, canvas_big, step_px, settings)
            print(f"deep-cache[{headline_spec}] stroke per-stamp: "
                  f"{dc_stroke}; device median {dc_dev:.1f} ms "
                  f"(warmup stroke {dc_stroke['warmup_stroke_s']:.1f}s)",
                  file=sys.stderr)
            dc = dict(spec=str(headline_spec),
                      stroke_p50_ms=round(dc_stroke["p50"], 2),
                      stroke_p99_ms=round(dc_stroke["p99"], 2),
                      device_ms=round(dc_dev, 1),
                      warmup_s=dc_stroke["warmup_stroke_s"])
            best["deep_cache"] = dc
        except Exception as exc:  # pragma: no cover - device-specific
            print(f"deep-cache phase failed ({exc!r})", file=sys.stderr)
            try:
                model.end_session()
            except Exception:
                pass
        finally:
            model.set_deep_cache(build_spec)

    if (dc is not None and args.headline == "deep-cache"
            and dc["stroke_p50_ms"] < stroke_stats["p50"]):
        # Approximate-math operating point: label it, quote the measured
        # fidelity vs the exact bf16 pipeline next to it (README
        # "DeepCache fidelity" table, tools/check_bf16_fidelity.py
        # --deep-cache SPEC), and keep the exact numbers alongside.
        best.update({
            "value": dc["stroke_p50_ms"],
            "metric": (
                f"p50 ms per {res}x{res} stamp, {args.stroke}-stamp "
                f"steady-state stroke stream on a persistent "
                f"device-resident session, DeepCache[{dc['spec']}] "
                f"full/shallow UNet schedule ({args.steps}-step DDIM, CFG "
                f"triple-batch; approximate math - fidelity vs exact "
                f"pipeline measured in README DeepCache table; device "
                f"{dc['device_ms']}ms/stamp; EXACT pipeline: stroke p50="
                f"{stroke_stats['p50']:.1f}ms device {device_ms:.1f}ms, "
                f"isolated p50={stats['p50']:.1f}ms)"),
        })

    signal.signal(signal.SIGTERM, signal.SIG_DFL)
    print(emit_json())


if __name__ == "__main__":
    main()
