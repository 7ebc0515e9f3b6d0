"""Inference server entry point.

The TPU analog of the reference server entry (trt_inference/run.py:27-55):
builds a Tornado application serving the binary websocket protocol at
/websocket/ plus a trivial HTTP health endpoint, and loads either the TPU
inpainter or the mock model.

Usage:
    python -m diffusiontexturepainting_tpu.serving.run --port 6060
    python -m diffusiontexturepainting_tpu.serving.run --mock  # no TPU needed
"""

from __future__ import annotations

import argparse
import logging

import tornado.ioloop
import tornado.web

from .handler import InpaintWebSocketHandler

logger = logging.getLogger(__name__)


class HealthHandler(tornado.web.RequestHandler):
    def get(self):
        self.write({"status": "ok", "model": self.application.settings.get("model_info", "")})


class InpaintHTTPHandler(tornado.web.RequestHandler):
    """HTTP POST fallback speaking the same binary wire format as the
    websocket (request bytes in the body, response bytes back) - the
    analog of the reference's Flask WSGI fallback container
    (trt_inference/run.py:27-43)."""

    def initialize(self, model, debug_dir=None):
        self.model = model
        self.debug_dir = debug_dir

    def post(self):
        from . import server_io
        from .handler import handle_request_bytes

        body = self.request.body
        R = server_io.RequestType
        if body and R.BEGIN_SESSION.value <= body[0] <= R.END_SESSION.value:
            # stroke sessions are CONNECTION-scoped state (resident
            # canvas owned by one websocket, enforced in
            # handler._handle_session_bytes); routing them through the
            # stateless HTTP endpoint would bypass that ownership guard
            # and silently clobber a painter's in-flight stroke
            self.set_status(400)
            self.write({"error": "stroke-session requests require the "
                                 "websocket transport (sessions are "
                                 "connection-scoped)"})
            return
        try:
            reply = handle_request_bytes(self.model, body,
                                         debug_dir=self.debug_dir)
        except Exception as e:  # noqa: BLE001 - report protocol errors
            self.set_status(400)
            self.write({"error": str(e)})
            return
        self.set_header("Content-Type", "application/octet-stream")
        self.write(bytes(reply))


def _warm_session(model, session_canvas: str, warmup_points=None):
    """AOT-compile the stroke-session programs for the declared canvas
    size (the session analog of --warmup-points): per step count, compile
    the eager K=1 stamp AND every fire-and-forget flush bucket
    (TPUConditionalInpainter._STROKE_BUCKETS), so no painter's first
    stroke at any burst length pays a mid-paint XLA compile. Step counts
    come from --warmup-points (plus the config default), because the
    session program is specialized per (resolution, steps, canvas
    shape)."""
    import numpy as np

    w, h = (int(v) for v in session_canvas.lower().split("x"))
    # warmup points may carry a third DeepCache-interval field
    # (RESxSTEPSxINTERVAL, consumed by model.warmup) - take steps by
    # index instead of 2-tuple unpacking
    steps_list = [None] + sorted({int(p[1]) for p in (warmup_points or [])})
    buckets = getattr(model, "_STROKE_BUCKETS", None)
    logger.info("warming session programs for a %dx%d canvas "
                "(step counts: %s, K buckets: %s)...", w, h,
                ["default" if s is None else s for s in steps_list],
                list(buckets) if buckets else [1])
    model.begin_session(np.zeros((h, w, 4), np.uint8))
    for s in steps_list:
        kw = {} if s is None else {"steps": s}
        # eager path (return_pixels=True -> session_stamp program)
        model.stamp_at(0, 0, return_pixels=True, **kw)
        if buckets:
            for k in buckets:
                if k == 1:
                    continue  # K=1 flush reuses the eager stamp program
                for _ in range(k):
                    model.stamp_at(0, 0, return_pixels=False, **kw)
                model.flush_session()
    model.fetch_canvas()
    model.end_session()


def _deep_cache_spec(value: str):
    """argparse type for --deep-cache-interval: int or 'FSSF' pattern
    (one shared grammar: pipeline/inpaint.py parse_deep_cache_spec)."""
    from ..pipeline.inpaint import parse_deep_cache_spec

    return parse_deep_cache_spec(value)


def create_server(model=None, resolution: int = 256, debug_dir: str | None = None,
                  mock: bool = False, warmup: bool = True,
                  checkpoint_dir: str | None = None,
                  scheduler: str | None = None,
                  deep_cache_interval=None,
                  warmup_points=None,
                  profile_dir: str | None = None,
                  mesh: str | None = None,
                  batch_window_ms: float = 3.0,
                  max_batch: int | None = None,
                  session_canvas: str | None = None,
                  f32_components=None,
                  f32_final_step: bool = False):
    """Create the Tornado application around an inpainter model.

    mesh: e.g. "data=8" - serve concurrent sessions through a
    request-parallel SPMD stamp program over N chips
    (serving/parallel_model.py); each websocket connection gets its own
    brush session, stamps micro-batch across the mesh.
    """
    def _pipeline_config_and_overrides():
        """ONE assembly of the fidelity/operating-point flags shared by
        every TPUConditionalInpainter construction path (the model=3
        branch used to rebuild this by hand and silently dropped
        --f32-components)."""
        from ..core.config import PipelineConfig

        cfg_kwargs = {}
        if scheduler:
            cfg_kwargs["scheduler"] = scheduler
        if deep_cache_interval is not None:
            cfg_kwargs["deep_cache_interval"] = deep_cache_interval
        if f32_final_step:
            # middle fidelity point: only the final denoise step's UNet
            # eval runs in f32 (core/config.py f32_final_step)
            cfg_kwargs["f32_final_step"] = True
        overrides = None
        if f32_components:
            # fidelity-critical deployments: compute the named
            # components in f32 (the bf16 tail at few-step/512px is the
            # UNet - README bf16-fidelity bisect; f32 UNet costs ~2x its
            # device time and drops off the Pallas kernels)
            import jax.numpy as jnp

            allowed = {"unet", "vae_encoder", "vae_decoder",
                       "patch_encoder"}
            bad = set(f32_components) - allowed
            if bad:
                raise ValueError(
                    f"unknown --f32-components {sorted(bad)}; "
                    f"choose from {sorted(allowed)}")
            overrides = {c: jnp.float32 for c in f32_components}
        config = PipelineConfig(**cfg_kwargs) if cfg_kwargs else None
        return config, overrides

    if mesh and mock:
        raise ValueError("--mock cannot combine with --mesh (the mesh "
                         "paths build the real TPU pipeline)")
    if max_batch and max_batch > 1 and not mesh:
        raise ValueError("--max-batch requires --mesh data=N (use "
                         "--mesh data=1 for single-chip request "
                         "batching); without a mesh it would be "
                         "silently ignored")
    if mesh and "model" in mesh:
        # CFG-branch model parallelism: ONE painter served by 3 chips
        # (one per guidance branch, parallel/cfg_shard.py). The model
        # behaves exactly like the single-chip inpainter - normal
        # handler, sessions, warmup - so fall through to the standard
        # path with the sharded model instance.
        from ..parallel.cfg_shard import make_cfg_mesh
        from ..pipeline.tpu_model import TPUConditionalInpainter

        kv = dict(part.split("=") for part in mesh.split(","))
        n = int(kv.pop("model"))
        if kv:
            raise ValueError(f"--mesh model=N cannot combine with {kv}")
        if max_batch and max_batch > 1:
            raise ValueError("--max-batch applies to --mesh data=N "
                             "request batching, not --mesh model=N")
        config, overrides = _pipeline_config_and_overrides()
        model = TPUConditionalInpainter(
            resolution, warmup=warmup, checkpoint_dir=checkpoint_dir,
            config=config, warmup_points=warmup_points,
            dtype_overrides=overrides, cfg_mesh=make_cfg_mesh(n))
        mesh = None
        model_info = (f"tpu-sd15-inpaint cfg-sharded[model={n}]"
                      + ("" if checkpoint_dir else " (random weights)"))
    else:
        model_info = None
    if mesh:
        from .parallel_model import make_parallel_service

        config, overrides = _pipeline_config_and_overrides()
        service = make_parallel_service(
            resolution, mesh, checkpoint_dir=checkpoint_dir,
            config=config, dtype_overrides=overrides,
            window_ms=batch_window_ms, max_batch=max_batch)
        if session_canvas:
            # Warm one session per chip: sessions are round-robin-pinned
            # (acquire_session_device), so N sequential warm sessions hit
            # every device. The first compile is the expensive one; the
            # rest re-specialize the cached program for their device, so
            # no painter's first stroke pays a compile.
            n_dev = service.mesh.devices.size
            for i in range(n_dev):
                logger.info("session warmup %d/%d", i + 1, n_dev)
                _warm_session(service.new_session(), session_canvas,
                              warmup_points)
        model_info = (f"tpu-sd15-inpaint mesh[{mesh}]"
                      + ("" if checkpoint_dir else " (random weights)"))
        return tornado.web.Application(
            [
                (r"/websocket/", InpaintWebSocketHandler,
                 dict(service=service, model_info_str=model_info,
                      debug_dir=debug_dir)),
                (r"/health", HealthHandler),
            ],
            model_info=model_info,
        )
    if model is None:
        if mock:
            from ..client.mock_model import MockConditionalInpainter

            model = MockConditionalInpainter(resolution)
            model_info = "mock"
        else:
            from ..pipeline.tpu_model import TPUConditionalInpainter

            config, overrides = _pipeline_config_and_overrides()
            model = TPUConditionalInpainter(
                resolution, warmup=warmup, checkpoint_dir=checkpoint_dir,
                config=config, warmup_points=warmup_points,
                dtype_overrides=overrides)
            model_info = ("tpu-sd15-inpaint"
                          + ("" if checkpoint_dir else " (random weights)"))
    else:
        model_info = model_info or type(model).__name__

    if session_canvas and hasattr(model, "begin_session"):
        _warm_session(model, session_canvas, warmup_points)

    return tornado.web.Application(
        [
            (r"/websocket/", InpaintWebSocketHandler,
             dict(model=model, model_info_str=model_info, debug_dir=debug_dir,
                  profile_dir=profile_dir)),
            (r"/inpaint", InpaintHTTPHandler,
             dict(model=model, debug_dir=debug_dir)),
            (r"/health", HealthHandler),
        ],
        model_info=model_info,
    )


def run_main(argv=None):
    parser = argparse.ArgumentParser(description="TPU texture inpainting server")
    parser.add_argument("--port", type=int, default=6060)
    parser.add_argument("--resolution", type=int, default=256)
    parser.add_argument("--mock", action="store_true", help="serve the mock model (no TPU)")
    parser.add_argument("--debug_dir", type=str, default=None)
    parser.add_argument("--no-warmup", action="store_true",
                        help="skip ahead-of-time compilation of operating points")
    parser.add_argument("--checkpoint_dir", type=str, default=None,
                        help="trained weights exported by training/train.py "
                             "(seeded random weights when omitted)")
    parser.add_argument("--scheduler", type=str, default=None,
                        choices=["DDIM", "DPM", "DPM++", "EulerA",
                                 "LMS", "LMSD", "PNDM"],
                        help="sampler (default: pipeline config, DDIM)")
    parser.add_argument("--deep-cache-interval", type=_deep_cache_spec,
                        default=None,
                        help=">1 enables DeepCache-style UNet feature reuse "
                             "for multi-step requests; an explicit 'FSSF' "
                             "full/shallow pattern pins it per step "
                             "(applies only to requests with that exact "
                             "step count)")
    parser.add_argument("--f32-final-step", action="store_true",
                        help="compute only the FINAL denoise step's UNet "
                             "eval in f32 (middle fidelity point: cheaper "
                             "than --f32-components unet, collapses most "
                             "of the bf16 pixel tail - README fidelity "
                             "table)")
    parser.add_argument("--warmup-points", type=str, default=None,
                        help="comma list of RESOLUTIONxSTEPS[xINTERVAL] "
                             "operating points to compile at startup, e.g. "
                             "'256x20,512x4' or '512x4x2' (the analog of "
                             "TRT optimization profiles; the optional third "
                             "field is a DeepCache interval)")
    parser.add_argument("--mesh", type=str, default=None,
                        help="multi-chip serving: 'data=8' micro-batches "
                             "concurrent sessions into one SPMD stamp "
                             "program over N chips; 'model=3' shards the "
                             "CFG triple-batch one guidance branch per "
                             "chip for ONE painter's latency "
                             "(parallel/cfg_shard.py)")
    parser.add_argument("--session-canvas", type=str, default=None,
                        help="AOT-compile the stroke-session program for "
                             "this canvas size at startup, e.g. 1024x1024 "
                             "(width x height)")
    parser.add_argument("--batch-window-ms", type=float, default=3.0,
                        help="micro-batch collection window for --mesh")
    parser.add_argument("--max-batch", type=int, default=None,
                        help="per-chip request batching: batch up to this "
                             "many concurrent stamps per dispatch (a "
                             "multiple of the mesh data axis; e.g. --mesh "
                             "data=1 --max-batch 4 batches 4 painters on "
                             "one chip - the reference TRT engine's "
                             "batch-16 envelope, models.py:886-890)")
    parser.add_argument("--f32-components", type=str, default=None,
                        help="comma list of components to compute in f32 "
                             "for fidelity-critical serving, e.g. 'unet' "
                             "(keys: unet, vae_encoder, vae_decoder, "
                             "patch_encoder; the bf16 512px few-step "
                             "pixel tail is the UNet - see README). "
                             "Costs ~2x that component's device time")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="diagnostic only: adds per-request latency and "
                             "disk per trace; auto-disables after 32 traces. "
                             "Writes a jax.profiler trace of every request "
                             "here (the NVTX-ranges analog; open in "
                             "TensorBoard/XProf)")
    args = parser.parse_args(argv)

    warmup_points = None
    if args.warmup_points:
        warmup_points = [tuple(int(v) for v in p.split("x"))
                         for p in args.warmup_points.split(",")]

    logging.basicConfig(level=logging.INFO)
    app = create_server(resolution=args.resolution, debug_dir=args.debug_dir,
                        mock=args.mock, warmup=not args.no_warmup,
                        checkpoint_dir=args.checkpoint_dir,
                        scheduler=args.scheduler,
                        deep_cache_interval=args.deep_cache_interval,
                        warmup_points=warmup_points,
                        profile_dir=args.profile_dir,
                        mesh=args.mesh,
                        batch_window_ms=args.batch_window_ms,
                        max_batch=args.max_batch,
                        session_canvas=args.session_canvas,
                        f32_components=(
                            [s.strip() for s in args.f32_components.split(",")
                             if s.strip()]
                            if args.f32_components else None),
                        f32_final_step=args.f32_final_step)
    app.listen(args.port)
    logger.info("Serving on ws://0.0.0.0:%d/websocket/", args.port)
    tornado.ioloop.IOLoop.current().start()


if __name__ == "__main__":
    run_main()
