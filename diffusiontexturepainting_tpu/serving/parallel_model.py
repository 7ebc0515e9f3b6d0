"""Multi-chip request-parallel serving (the product surface).

The reference serves exactly one GPU per process (trt_model.py:28
`device=0`; the Kit app's `gpu_id` setting selects which one,
extension.toml:68). A TPU pod slice serving many painting sessions can
do better: stamps from CONCURRENT websocket sessions are micro-batched,
sharded over the mesh's 'data' axis, and executed as one SPMD program
(parallel/serving.py ParallelStampEngine). One artist's latency is
unchanged - a lone request still dispatches immediately after
`window_ms` - while N artists get N-chip throughput.

Pieces:
  ParallelInpainterService  - owns params + engine + brush encoder,
                              groups requests by (resolution, steps)
  SessionModel              - per-websocket-connection view: its own
                              brush (cond/uncond), async generate
  _BatchDispatcher          - asyncio micro-batcher (collect -> pad ->
                              run in executor -> scatter results)

serving/run.py exposes this as `--mesh data=N`; handler.py routes
stamps through the async path when the model provides one.

Single-chip request batching (the reference's TRT batch-1..16 engine
envelope, models.py:886-890 / trt_model.py:44 max_batch_size=16): the
same machinery with `--mesh data=1 --max-batch 4` - concurrent painters'
stamps vmap into one batched program on ONE chip, amortizing the
per-step weight HBM reads across the batch. Partial batches pad to the
smallest bucket (data_size x powers of 2) rather than the full batch, so
a lone painter never pays 4x compute.
"""

from __future__ import annotations

import asyncio
import logging
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Tuple

import numpy as np

import jax

from ..serving.model_base import (
    crop_resize_square,
    ensure_float01,
)

logger = logging.getLogger(__name__)


class _BatchDispatcher:
    """Micro-batches submissions keyed by operating point.

    A request waits at most `window_ms` for peers; a full batch
    (mesh data size) flushes immediately. The batch is padded by
    repeating the last entry so the SPMD program always sees a
    multiple of the data axis.
    """

    def __init__(self, run_batch, batch_size: int, window_ms: float = 3.0):
        self._run_batch = run_batch  # (key, list_of_payloads) -> list results
        self.batch_size = batch_size
        self.window_ms = window_ms
        self._queues: Dict[Tuple, list] = {}
        self._timers: Dict[Tuple, object] = {}
        self._executor = ThreadPoolExecutor(max_workers=1)  # device is serial

    async def submit(self, key: Tuple, payload) -> object:
        loop = asyncio.get_event_loop()
        fut = loop.create_future()
        q = self._queues.setdefault(key, [])
        q.append((payload, fut))
        if len(q) >= self.batch_size:
            self._cancel_timer(key)
            await self._flush(key)
        elif key not in self._timers:
            self._timers[key] = loop.call_later(
                self.window_ms / 1000.0,
                lambda: asyncio.ensure_future(self._flush(key)))
        return await fut

    def _cancel_timer(self, key):
        t = self._timers.pop(key, None)
        if t is not None:
            t.cancel()

    async def _flush(self, key):
        self._timers.pop(key, None)
        q = self._queues.get(key, [])
        if not q:
            return
        batch, self._queues[key] = q[: self.batch_size], q[self.batch_size:]
        if self._queues[key]:  # immediately reschedule the remainder
            loop = asyncio.get_event_loop()
            self._timers[key] = loop.call_later(
                0.0, lambda: asyncio.ensure_future(self._flush(key)))
        payloads = [p for p, _ in batch]
        loop = asyncio.get_event_loop()
        try:
            results = await loop.run_in_executor(
                self._executor, self._run_batch, key, payloads)
            for (_, fut), res in zip(batch, results):
                if not fut.done():
                    fut.set_result(res)
        except Exception as e:  # noqa: BLE001 - propagate to every waiter
            for _, fut in batch:
                if not fut.done():
                    fut.set_exception(e)


class SessionModel:
    """One websocket connection's view of the shared service: its own
    brush embedding, the shared mesh underneath. Implements the model
    surface handler.py uses (set_brush / resolution /
    create_preview_brush_context / async generate)."""

    def __init__(self, service: "ParallelInpainterService"):
        self.service = service
        base = service.base
        self.image = base.image
        self._cond, self._uncond = base._cond, base._uncond

    def resolution(self) -> int:
        return self.service.base.resolution()

    def set_brush(self, image: np.ndarray) -> None:
        base = self.service.base
        image = ensure_float01(image)[..., :3]
        self.image = crop_resize_square(
            image, self.resolution()).astype(np.float32)
        cond, uncond = base._encode_brush(
            base.params["patch_encoder"], np.asarray(self.image)[None])
        self._cond, self._uncond = cond, uncond
        self._sess_brush = None  # re-stage onto the session device

    def create_preview_brush_context(self, brush_image):
        from .model_base import ConditionalInpainterBase

        return ConditionalInpainterBase.create_preview_brush_context(
            self, brush_image)

    async def generate_u8_async(self, canvas_u8: np.ndarray,
                                **settings) -> np.ndarray:
        return await self.service.submit(self, canvas_u8, settings)

    async def generate_async(self, canvas: np.ndarray,
                             **settings) -> np.ndarray:
        canvas_u8 = (np.clip(ensure_float01(canvas), 0, 1)
                     * 255).astype(np.uint8)
        out = await self.generate_u8_async(canvas_u8, **settings)
        return out.astype(np.float32) / 255.0

    # --- stroke sessions: one chip per painter ---------------------------
    # A stroke session is inherently sequential (each stamp depends on the
    # previous through the resident canvas), so instead of micro-batching
    # it is PINNED to one device of the mesh (round-robin): the canvas and
    # a params replica live in that chip's HBM, and N concurrent painters
    # stroke on N chips independently. jit caches one executable per
    # placement, so every session shares the same compiled programs.

    def begin_session(self, canvas_u8: np.ndarray) -> None:
        from .model_base import validate_session_canvas

        canvas_u8 = validate_session_canvas(canvas_u8, self.resolution())
        svc = self.service
        if getattr(self, "_sess_device", None) is None:
            self._sess_device = svc.acquire_session_device()
        self._sess_params = svc.params_on(self._sess_device)
        self._sess_key = jax.device_put(svc.base._base_key, self._sess_device)
        self._sess_canvas = jax.device_put(canvas_u8, self._sess_device)
        self._sess_brush = None  # (brush, cond, uncond) device cache

    def session_active(self) -> bool:
        return getattr(self, "_sess_canvas", None) is not None

    def _session_brush(self):
        if self._sess_brush is None:
            res = self.resolution()
            img = self.image
            if img.shape[0] != res:
                img = crop_resize_square(img, res).astype(np.float32)
            put = lambda a: jax.device_put(np.asarray(a), self._sess_device)
            self._sess_brush = (put(img[None]), put(self._cond),
                                put(self._uncond))
        return self._sess_brush

    def stamp_at(self, x0: int, y0: int, return_pixels: bool = True,
                 overpaint: bool = False, **settings):
        canvas = self._require_session()
        svc = self.service
        base = svc.base
        steps, cfg_w, tg_w, tg_steps, pad = base._settings_scalars(settings)
        res = self.resolution()
        margin = np.int32(max(1, round(37 / 256 * res)) if overpaint else 0)
        brush, cond, uncond = self._session_brush()
        fn = base.engine.session_stamp_fn(res, steps,
                                          base._cache_interval(steps))
        new_canvas, comp_u8 = fn(
            self._sess_params, canvas, brush, cond, uncond, self._sess_key,
            svc.next_counter(), np.int32(x0), np.int32(y0), cfg_w, tg_w,
            tg_steps, pad, margin)
        self._sess_canvas = new_canvas
        return np.asarray(comp_u8) if return_pixels else None

    def erase_at(self, x0: int, y0: int, return_pixels: bool = True):
        canvas = self._require_session()
        fn = self.service.base.engine.session_erase_fn(self.resolution())
        new_canvas, crop_u8 = fn(canvas, np.int32(x0), np.int32(y0))
        self._sess_canvas = new_canvas
        return np.asarray(crop_u8) if return_pixels else None

    def fetch_canvas(self) -> np.ndarray:
        # banded async download (pipeline/tpu_model.py _fetch_np); the
        # jitted band-split program follows the session device because
        # the canvas is committed there
        return self.service.base._fetch_np(self._require_session())

    def end_session(self) -> None:
        self._sess_canvas = None
        self._sess_brush = None

    def _require_session(self):
        canvas = getattr(self, "_sess_canvas", None)
        if canvas is None:
            raise RuntimeError("no active stroke session (BEGIN_SESSION "
                               "first)")
        return canvas


class ParallelInpainterService:
    """Shared multi-chip serving state. `base` is a regular
    TPUConditionalInpainter (params, jitted brush encoder, configs);
    stamps run through a ParallelStampEngine on `mesh` instead of the
    base's single-chip engine."""

    def __init__(self, base, mesh, window_ms: float = 3.0,
                 max_batch: int | None = None):
        from ..parallel.serving import ParallelStampEngine

        self.base = base
        self.mesh = mesh
        self.data_size = int(mesh.shape["data"])
        self.engine = ParallelStampEngine(
            base.engine.models, base.config.scheduler, mesh,
            safe_models=base.engine.safe_models,
            final_step_f32=base.config.f32_final_step,
            cache_interval_fn=base._cache_interval)
        # Stage the params onto the mesh ONCE (replicated): the batched
        # program's in_shardings replicate over the data axis, and jit
        # does not cache cross-call input reshards - passing the
        # base model's single-device tree per dispatch would re-broadcast
        # the full weights to every chip on every micro-batch.
        from jax.sharding import NamedSharding, PartitionSpec as P

        self._batch_params = jax.device_put(
            base.params, NamedSharding(mesh, P()))
        max_batch = max_batch or self.data_size
        if max_batch % self.data_size:
            raise ValueError(f"max_batch {max_batch} must be a multiple of "
                             f"the mesh data axis {self.data_size}")
        # partial batches pad to the smallest of these (the batched
        # program jit-specializes per batch size, so the bucket set keeps
        # the compiled-program count finite - same design as the stroke
        # K buckets, pipeline/tpu_model.py _STROKE_BUCKETS)
        self.pad_buckets = []
        b = self.data_size
        while b < max_batch:
            self.pad_buckets.append(b)
            b *= 2
        self.pad_buckets.append(max_batch)
        self.dispatcher = _BatchDispatcher(
            self._run_batch, max_batch, window_ms)
        self._counter = 0
        self._session_rr = 0
        self._session_params: Dict[int, object] = {}
        # Session requests run on default-executor threads (handler.py
        # keeps the IOLoop free), so the shared counters/caches below are
        # reached concurrently and need a lock.
        self._lock = threading.Lock()

    def new_session(self) -> SessionModel:
        return SessionModel(self)

    def next_counter(self) -> np.uint32:
        with self._lock:
            self._counter += 1
            return np.uint32(self._counter)

    def acquire_session_device(self):
        """Round-robin a mesh device for a new stroke session."""
        devices = list(self.mesh.devices.flatten())
        with self._lock:
            device = devices[self._session_rr % len(devices)]
            self._session_rr += 1
        return device

    def params_on(self, device):
        """A full params replica resident on `device` (one per chip,
        shared by every session pinned there). Staging is serialized so
        two painters landing on the same chip simultaneously cannot
        double-allocate the full SD-1.5 replica."""
        with self._lock:
            if device.id not in self._session_params:
                self._session_params[device.id] = jax.device_put(
                    self.base.params, device)
            return self._session_params[device.id]

    async def submit(self, session: SessionModel, canvas_u8, settings):
        canvas_u8 = np.asarray(canvas_u8)
        if canvas_u8.dtype != np.uint8:
            canvas_u8 = (np.clip(canvas_u8, 0, 1) * 255).astype(np.uint8)
        res = int(canvas_u8.shape[0])
        cfg = self.base.config
        steps = int(settings.get("steps", cfg.denoising_steps))
        payload = dict(
            canvas=canvas_u8,
            brush=self._brush_at(session, res),
            cond=session._cond, uncond=session._uncond,
            counter=self.next_counter(),
            cfg_weight=np.float32(settings.get("cfg_weight",
                                               cfg.guidance_scale)),
            tg_weight=np.float32(settings.get("tg_weight",
                                              cfg.texture_guidance_scale)),
            tg_steps=np.int32(settings.get("tg_steps",
                                           cfg.texture_guidance_steps)),
            context_pad=np.int32(settings.get("context_pad",
                                              cfg.context_pad)),
        )
        return await self.dispatcher.submit((res, steps), payload)

    def _brush_at(self, session, res):
        img = session.image
        if img.shape[0] != res:
            img = crop_resize_square(img, res).astype(np.float32)
        return img

    def _run_batch(self, key, payloads):
        res, steps = key
        n = len(payloads)
        B = next(b for b in self.pad_buckets if b >= n)
        padded = payloads + [payloads[-1]] * (B - n)
        stack = lambda f: np.stack([f(p) for p in padded])
        base_key = np.asarray(self.base._base_key)
        raw, comp = self.engine.stamp_batch(
            self._batch_params,
            stack(lambda p: p["canvas"][None]),
            stack(lambda p: p["brush"][None]),
            stack(lambda p: np.asarray(p["cond"])),
            stack(lambda p: np.asarray(p["uncond"])),
            np.broadcast_to(base_key, (B,) + base_key.shape).copy(),
            stack(lambda p: p["cfg_weight"]),
            stack(lambda p: p["tg_weight"]),
            stack(lambda p: p["tg_steps"]),
            stack(lambda p: p["context_pad"]),
            steps=steps,
            counters=stack(lambda p: p["counter"]),
        )
        comp = np.asarray(comp)
        return [comp[i] for i in range(n)]


def make_parallel_service(resolution: int, mesh_spec: str,
                          checkpoint_dir: str | None = None,
                          scheduler: str | None = None,
                          window_ms: float = 3.0,
                          tiny: bool = False,
                          max_batch: int | None = None,
                          config=None,
                          dtype_overrides=None):
    """Build the service from a CLI mesh spec like 'data=8'.

    `max_batch` > data axis enables per-chip request batching (e.g.
    'data=1' + max_batch=4 batches 4 concurrent painters on one chip).
    `config` / `dtype_overrides` carry the full operating-point flags
    (--deep-cache-interval, --f32-final-step, --f32-components) into
    both the per-chip session engine and the batched SPMD program -
    `scheduler` is the legacy single-flag form, ignored when `config`
    is given."""
    from jax.sharding import Mesh

    from ..core.config import PipelineConfig
    from ..pipeline.tpu_model import TPUConditionalInpainter

    kv = dict(part.split("=") for part in mesh_spec.split(","))
    data = int(kv.pop("data", len(jax.devices())))
    if kv:
        raise ValueError(f"unsupported mesh axes for serving: {kv}")
    devices = np.asarray(jax.devices()[:data])
    if len(devices) < data:
        raise ValueError(
            f"mesh data={data} but only {len(jax.devices())} devices")
    mesh = Mesh(devices, ("data",))
    if config is None and scheduler:
        config = PipelineConfig(scheduler=scheduler)
    base = TPUConditionalInpainter(
        resolution,
        config=config,
        checkpoint_dir=checkpoint_dir,
        tiny=tiny,
        warmup=False,  # the batched SPMD program warms on first batch
        verbose_timing=False,
        dtype_overrides=dtype_overrides,
    )
    return ParallelInpainterService(base, mesh, window_ms=window_ms,
                                    max_batch=max_batch)
