"""Tornado websocket handler dispatching binary paint requests.

The TPU analog of the reference's InpaintWebSocketHandler
(trt_inference/handler.py:63-132). Requests are decoded on the event loop
and executed synchronously (one in-flight request per connection, matching
the reference's single-IOLoop concurrency model).
"""

from __future__ import annotations

import json
import logging

import numpy as np
from tornado.websocket import WebSocketHandler

from . import server_io
from .model_base import ConditionalInpainterBase, ensure_float01, float01_to_uint8

logger = logging.getLogger(__name__)

# --profile-dir safety valve: max jax.profiler traces per process (each
# trace costs request latency + disk; the flag is for short diagnostics).
_PROFILE_TRACE_CAP = 32
_profile_trace_count = 0


def _debug_dump(debug_dir, tag, **arrays):
    """Dump request/response images for offline inspection (the reference
    reserves a --debug_dir flag, run.py:49-50, but never wires it; this
    build does)."""
    if not debug_dir:
        return
    import os
    import time as _time

    os.makedirs(debug_dir, exist_ok=True)
    stamp = f"{_time.time():.3f}"
    for name, arr in arrays.items():
        np.save(os.path.join(debug_dir, f"{stamp}_{tag}_{name}.npy"), arr)


def _brush_preview_reply(model, settings):
    """Encode a RETURN_PREVIEW for the current brush: generate into a
    canvas with the brush known in the top-left quadrant (reference
    handler.py:92-101 + preview_mask 48-52)."""
    res = model.resolution()
    brush_sq = getattr(model, "image", None)
    if brush_sq is None:
        brush_sq = np.zeros((res, res, 3), np.float32)
    context = model.create_preview_brush_context(brush_sq)
    result = model.generate(context, **settings)
    return server_io.encode_generated_response(
        server_io.RequestType.RETURN_PREVIEW, float01_to_uint8(result))


def _next_session_seq(model) -> int:
    seq = getattr(model, "_session_seq", 0) + 1
    model._session_seq = seq
    return seq


def _handle_session_request(model, raw_message: bytes, msg_type: int):
    """Dispatch the stroke-session request types (server_io.py >= 16;
    design in pipeline/session.py). Returns the encoded reply, or None if
    `msg_type` is not a session request. STAMP_AT with return_pixels=0
    replies a 5-byte RETURN_ACK immediately after the (asynchronous)
    device dispatch - a client streaming a stroke gets its acks at
    dispatch rate while the stamps chain on-device, and FETCH_CANVAS
    synchronizes."""
    R = server_io.RequestType
    if msg_type == R.BEGIN_SESSION.value:
        _, settings, offset = server_io.decode_request_metadata(raw_message)
        canvas = server_io.binary_to_image(raw_message, offset)
        model.begin_session(canvas)
        model._session_seq = 0
        return server_io.encode_ack_response(0)
    if msg_type in (R.STAMP_AT.value, R.ERASE_AT.value):
        _, settings, offset = server_io.decode_request_metadata(raw_message)
        coords = server_io.decode_coords_payload(raw_message, offset)
        if msg_type == R.STAMP_AT.value:
            crop = model.stamp_at(
                coords["x0"], coords["y0"],
                return_pixels=coords["return_pixels"],
                overpaint=coords["overpaint"], **settings)
        else:
            crop = model.erase_at(coords["x0"], coords["y0"],
                                  return_pixels=coords["return_pixels"])
        if coords["return_pixels"]:
            return server_io.encode_generated_response(
                R.RETURN_STAMP, np.asarray(crop))
        return server_io.encode_ack_response(_next_session_seq(model))
    if msg_type == R.FETCH_CANVAS.value:
        return (server_io.encode_request_type(R.RETURN_CANVAS)
                + server_io.image_to_binary(model.fetch_canvas()))
    if msg_type == R.END_SESSION.value:
        model.end_session()
        return server_io.encode_ack_response(_next_session_seq(model))
    return None


def handle_request_bytes(model, raw_message: bytes,
                         debug_dir: str | None = None,
                         profile_dir: str | None = None) -> bytes:
    """Decode one binary request, run the model, and return the encoded
    binary reply. Transport-independent: used by the websocket handler and
    the HTTP POST fallback endpoint alike.

    profile_dir: when set, each request is wrapped in a jax.profiler trace
    written there (the analog of the reference's NVTX ranges around
    pipeline stages, stable_diffusion_pipeline.py:358-366; view in
    TensorBoard/XProf or parse the perfetto json). Tracing adds
    substantial per-request overhead and ~10s of MB of disk per trace,
    so it is a short-diagnostic-session tool: after
    _PROFILE_TRACE_CAP traces the wrapper disables itself and serves
    at full speed."""
    global _profile_trace_count
    if profile_dir and _profile_trace_count < _PROFILE_TRACE_CAP:
        import contextlib

        import jax

        _profile_trace_count += 1
        if _profile_trace_count == _PROFILE_TRACE_CAP:
            logger.warning(
                "profile_dir: trace cap (%d) reached - further requests "
                "will not be traced", _PROFILE_TRACE_CAP)
        with contextlib.ExitStack() as stack:
            stack.enter_context(jax.profiler.trace(profile_dir))
            return handle_request_bytes(model, raw_message,
                                        debug_dir=debug_dir)
    # native C++ codec when built (zero-copy image view); Python struct
    # codec otherwise (native_io falls back internally).
    from . import native_io

    (msg_type,) = np.frombuffer(raw_message[:1], np.uint8)
    if msg_type == server_io.RequestType.NEW_BRUSH_PROMPT.value:
        _, settings, offset = server_io.decode_request_metadata(raw_message)
        prompt = server_io.decode_prompt_payload(raw_message, offset)
        # prompt -> brush image: NVCF txt2img when an API key is configured,
        # deterministic procedural texture otherwise (same fallback chain as
        # the client, nvcf_txt2img.py). Completes RequestType 1, which the
        # reference declares but never implements (server_io.py:19-24).
        from ..client.nvcf_txt2img import brush_from_prompt

        brush = brush_from_prompt(prompt, size=model.resolution())
        model.set_brush(ensure_float01(brush))
        _debug_dump(debug_dir, "brush_prompt", brush=brush)
        return _brush_preview_reply(model, settings)

    session_reply = _handle_session_request(model, raw_message, msg_type)
    if session_reply is not None:
        return session_reply

    meta, settings, image = native_io.decode_request(raw_message)
    if meta["type"] == server_io.RequestType.NEW_BRUSH_IMAGE.value:
        model.set_brush(ensure_float01(image[..., :3]))
        _debug_dump(debug_dir, "brush", brush=image)
        return _brush_preview_reply(model, settings)
    if meta["type"] == server_io.RequestType.NEW_STAMP.value:
        # models exposing the uint8 fast path (generate_u8) skip all
        # host-side float conversions - wire bytes go straight to device
        if hasattr(model, "generate_u8"):
            result_u8 = model.generate_u8(image, **settings)
        else:
            result_u8 = float01_to_uint8(
                model.generate(ensure_float01(image), **settings))
        _debug_dump(debug_dir, "stamp", canvas=image, result=result_u8)
        return server_io.encode_generated_response(
            server_io.RequestType.RETURN_STAMP, result_u8)
    raise NotImplementedError(f"Unknown binary request type {meta['type']}")


async def handle_request_bytes_async(model, raw_message: bytes,
                                     debug_dir: str | None = None) -> bytes:
    """Async twin of handle_request_bytes for session models that expose
    awaitable generation (serving/parallel_model.py SessionModel): stamps
    from concurrent websocket sessions micro-batch onto the device mesh
    while the IOLoop stays free."""
    from . import native_io

    (msg_type,) = np.frombuffer(raw_message[:1], np.uint8)
    if msg_type == server_io.RequestType.NEW_BRUSH_PROMPT.value:
        _, settings, offset = server_io.decode_request_metadata(raw_message)
        prompt = server_io.decode_prompt_payload(raw_message, offset)
        from ..client.nvcf_txt2img import brush_from_prompt

        brush = brush_from_prompt(prompt, size=model.resolution())
        model.set_brush(ensure_float01(brush))
        _debug_dump(debug_dir, "brush_prompt", brush=brush)
        return await _brush_preview_reply_async(model, settings)

    if (server_io.RequestType.BEGIN_SESSION.value <= msg_type
            <= server_io.RequestType.END_SESSION.value):
        # Stroke sessions in --mesh mode pin each connection to one chip
        # (parallel_model.py SessionModel): run the (possibly blocking)
        # fetch/stamp in the default executor so other painters' strokes
        # keep flowing through the IOLoop. Bounded to the session
        # REQUEST range: an unbounded >= check routed stray RETURN_*
        # frame types (>= 21) here, where _handle_session_request
        # returns None and the caller would write_message(None).
        # (The websocket path normally routes sessions through
        # _handle_session_bytes before reaching this; this branch serves
        # direct callers of the async twin.)
        if not hasattr(model, "begin_session"):
            raise NotImplementedError(
                "this serving model does not support stroke sessions")
        import asyncio

        loop = asyncio.get_event_loop()
        return await loop.run_in_executor(
            None, _handle_session_request, model, raw_message, msg_type)

    meta, settings, image = native_io.decode_request(raw_message)
    if meta["type"] == server_io.RequestType.NEW_BRUSH_IMAGE.value:
        model.set_brush(ensure_float01(image[..., :3]))
        _debug_dump(debug_dir, "brush", brush=image)
        return await _brush_preview_reply_async(model, settings)
    if meta["type"] == server_io.RequestType.NEW_STAMP.value:
        result_u8 = await model.generate_u8_async(image, **settings)
        _debug_dump(debug_dir, "stamp", canvas=image, result=result_u8)
        return server_io.encode_generated_response(
            server_io.RequestType.RETURN_STAMP, result_u8)
    raise NotImplementedError(f"Unknown binary request type {meta['type']}")


async def _brush_preview_reply_async(model, settings):
    res = model.resolution()
    brush_sq = getattr(model, "image", None)
    if brush_sq is None:
        brush_sq = np.zeros((res, res, 3), np.float32)
    context = model.create_preview_brush_context(brush_sq)
    result = await model.generate_async(context, **settings)
    return server_io.encode_generated_response(
        server_io.RequestType.RETURN_PREVIEW, float01_to_uint8(result))


class InpaintWebSocketHandler(WebSocketHandler):
    """Handles websocket communication with the painting client."""

    def initialize(self, model: ConditionalInpainterBase = None,
                   model_info_str: str = "",
                   debug_dir: str | None = None,
                   profile_dir: str | None = None,
                   service=None):
        # service: a ParallelInpainterService - each connection gets its
        # own session (brush state) over the shared device mesh
        self.service = service
        self.model = service.new_session() if service is not None else model
        self.model_info_str = model_info_str
        self.debug_dir = debug_dir
        self.profile_dir = profile_dir

    def open(self):
        logger.debug("Socket opened.")

    async def on_message(self, message):
        try:
            if isinstance(message, bytes):
                await self._handle_binary_request(message)
            else:
                self._handle_json_request(message)
        except Exception as e:  # noqa: BLE001 - protocol errors must not kill the loop
            logger.exception("Failed to handle incoming message: %s", e)

    async def _handle_binary_request(self, raw_message: bytes):
        R = server_io.RequestType
        msg_type = raw_message[0] if raw_message else -1
        if R.BEGIN_SESSION.value <= msg_type <= R.END_SESSION.value:
            reply = await self._handle_session_bytes(raw_message, msg_type)
        elif hasattr(self.model, "generate_u8_async"):
            reply = await handle_request_bytes_async(
                self.model, raw_message, debug_dir=self.debug_dir)
        else:
            reply = handle_request_bytes(self.model, raw_message,
                                         debug_dir=self.debug_dir,
                                         profile_dir=self.profile_dir)
        self.write_message(reply, binary=True)

    async def _handle_session_bytes(self, raw_message: bytes, msg_type: int):
        """Stroke-session dispatch with the guarantees a fire-and-forget
        client needs: every session request gets SOME reply (failures
        reply RETURN_ERROR instead of the legacy log-and-drop, so the
        client's ack accounting never desynchronizes), and in
        single-model serving the resident canvas belongs to ONE
        connection at a time (a second client's BEGIN_SESSION is
        rejected instead of silently clobbering the first's stroke)."""
        R = server_io.RequestType
        try:
            if not hasattr(self.model, "begin_session"):
                return server_io.encode_error_response(
                    "this serving model does not support stroke sessions")
            if self.service is None:
                # one model shared by every connection: enforce ownership
                owner = getattr(self.model, "_session_owner", None)
                if owner is not None and owner is not self \
                        and self.model.session_active():
                    return server_io.encode_error_response(
                        "stroke session held by another connection")
                if msg_type == R.BEGIN_SESSION.value:
                    self.model._session_owner = self
            if hasattr(self.model, "generate_u8_async"):
                # mesh serving: run the chip-pinned stamp off-loop so
                # other painters' strokes keep flowing
                import asyncio

                loop = asyncio.get_event_loop()
                reply = await loop.run_in_executor(
                    None, _handle_session_request, self.model, raw_message,
                    msg_type)
            else:
                reply = _handle_session_request(self.model, raw_message,
                                                msg_type)
            if msg_type == R.END_SESSION.value and self.service is None:
                self.model._session_owner = None
            # fire-and-forget stamps DEFER (pipeline/tpu_model.py): the
            # model coalesces them into one chained stroke dispatch. A
            # callback on the loop flushes once the already-received
            # frames of the burst are processed, so a painter who stops
            # mid-stroke still gets the work dispatched immediately
            # rather than at the next synchronizing request.
            if (msg_type == R.STAMP_AT.value
                    and getattr(self.model, "_pending_stamps", None)
                    and not getattr(self, "_flush_scheduled", False)):
                import tornado.ioloop

                self._flush_scheduled = True

                def _flush():
                    self._flush_scheduled = False
                    try:
                        if hasattr(self.model, "flush_session"):
                            self.model.flush_session()
                    except Exception:  # noqa: BLE001 - see FETCH error path
                        logger.exception("deferred stroke flush failed")

                tornado.ioloop.IOLoop.current().add_callback(_flush)
            return reply
        except Exception as e:  # noqa: BLE001 - reply, never silence
            logger.exception("session request failed: %s", e)
            return server_io.encode_error_response(
                f"{type(e).__name__}: {e}")

    def _handle_json_request(self, raw_message: str):
        json.loads(raw_message)
        raise NotImplementedError("Json messages not handled")

    def on_close(self):
        logger.info("Socket closed.")
        model = getattr(self, "model", None)
        if model is None:
            return
        owns = getattr(model, "_session_owner", None) is self
        if owns:
            model._session_owner = None
        # free the resident canvas this connection held (single-model
        # ownership, or the per-connection SessionModel in --mesh mode)
        if (owns or self.service is not None) \
                and hasattr(model, "session_active"):
            try:
                if model.session_active():
                    model.end_session()
            except Exception:  # noqa: BLE001 - teardown must not raise
                logger.exception("failed to end session on close")

    def check_origin(self, origin):  # allow cross-origin tools/clients
        return True
