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


class InpaintWebSocketHandler(WebSocketHandler):
    """Handles websocket communication with the painting client."""

    def initialize(self, model: ConditionalInpainterBase, model_info_str: str = "",
                   debug_dir: str | None = None):
        self.model = model
        self.model_info_str = model_info_str
        self.debug_dir = debug_dir

    def open(self):
        logger.debug("Socket opened.")

    def on_message(self, message):
        try:
            if isinstance(message, bytes):
                self._handle_binary_request(message)
            else:
                self._handle_json_request(message)
        except Exception as e:  # noqa: BLE001 - protocol errors must not kill the loop
            logger.exception("Failed to handle incoming message: %s", e)

    def _handle_binary_request(self, raw_message: bytes):
        # native C++ codec when built (zero-copy image view); Python
        # struct codec otherwise (native_io falls back internally).
        from . import native_io

        meta, settings, image = native_io.decode_request(raw_message)
        if meta["type"] == server_io.RequestType.NEW_BRUSH_IMAGE.value:
            self._handle_new_image_brush_request(settings,
                                                 {"image": image[..., :3]})
        elif meta["type"] == server_io.RequestType.NEW_STAMP.value:
            self._handle_stamp_request(settings, image)
        else:
            raise NotImplementedError(f"Unknown binary request type {meta['type']}")

    def _handle_new_image_brush_request(self, settings, request):
        """Set brush conditioning image and return a generated preview.

        The preview canvas has the brush image known in the top-left
        quadrant (reference handler.py:92-101 + preview_mask 48-52).
        """
        brush = ensure_float01(request["image"])
        self.model.set_brush(brush)
        res = self.model.resolution()
        brush_sq = getattr(self.model, "image", None)
        if brush_sq is None:
            brush_sq = np.zeros((res, res, 3), np.float32)
        context = self.model.create_preview_brush_context(brush_sq)
        result = self.model.generate(context, **settings)
        payload = server_io.encode_generated_response(
            server_io.RequestType.RETURN_PREVIEW, float01_to_uint8(result)
        )
        self.write_message(payload, binary=True)

    def _handle_stamp_request(self, settings, context_u8: np.ndarray):
        """Inpaint one brush stamp. Models exposing the uint8 fast path
        (generate_u8) skip all host-side float conversions - the wire
        bytes go straight to the device program."""
        if hasattr(self.model, "generate_u8"):
            result_u8 = self.model.generate_u8(context_u8, **settings)
        else:
            result_u8 = float01_to_uint8(
                self.model.generate(ensure_float01(context_u8), **settings))
        payload = server_io.encode_generated_response(
            server_io.RequestType.RETURN_STAMP, result_u8
        )
        self.write_message(payload, binary=True)

    def _handle_json_request(self, raw_message: str):
        json.loads(raw_message)
        raise NotImplementedError("Json messages not handled")

    def on_close(self):
        logger.info("Socket closed.")

    def check_origin(self, origin):  # allow cross-origin tools/clients
        return True
