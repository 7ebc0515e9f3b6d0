"""Inpainter model contract.

The TPU-framework analog of the reference's `ConditionalInpainterBase`
(trt_inference/model_base.py:14-58 and the Kit-client copy
kit_app/.../inference/model_base.py:15-71 -- here a single shared module).

Unlike the reference (torch BCHW tensors), the contract speaks numpy HWC
arrays, the natural layout both for the wire protocol and for TPU convs.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np


class ConditionalInpainterBase(ABC):
    """Contract every inpainter (TPU, mock, websocket) implements."""

    @abstractmethod
    def resolution(self) -> int:
        """Internal canvas resolution of the model (square)."""

    @abstractmethod
    def set_brush(self, image: np.ndarray) -> None:
        """Set the texture brush conditioning.

        Args:
            image: (H, W, 3) uint8 or float32 [0,1] reference texture image.
        """

    @abstractmethod
    def generate_raw(self, canvas: np.ndarray, **settings) -> np.ndarray:
        """Run the model on an RGBA canvas.

        Args:
            canvas: (H, W, 4) float32 [0,1]; RGB = painted content,
                A = painted mask (1 = already painted / known).

        Returns:
            (H, W, 3) float32 [0,1] new canvas content. May repaint known
            areas; callers wanting the canvas preserved use `generate`.
        """

    def generate(self, canvas: np.ndarray, **settings) -> np.ndarray:
        """generate_raw + alpha compositing so painted canvas stays intact.

        Mirrors reference model_base.py:51-58:
        out = canvas_rgb * alpha + result * (1 - alpha).
        """
        result = self.generate_raw(canvas, **settings)
        alpha = canvas[..., 3:4].astype(np.float32)
        return canvas[..., :3].astype(np.float32) * alpha + result[..., :3] * (1.0 - alpha)

    def create_preview_brush_context(self, brush_image: np.ndarray) -> np.ndarray:
        """Canvas whose top-left quadrant is the brush image (known).

        Used to render the brush preview after set_brush (reference
        kit_app inference/model_base.py:39-48, trt handler.py:48-52, 92-101).

        Args:
            brush_image: (res, res, 3) float32 [0,1].

        Returns:
            (res, res, 4) float32 [0,1] canvas with quadrant mask in alpha.
        """
        res = self.resolution()
        canvas = np.zeros((res, res, 4), dtype=np.float32)
        center = res // 2
        canvas[..., :3] = np.asarray(brush_image, dtype=np.float32)[:res, :res, :3]
        canvas[:center, :center, 3] = 1.0
        canvas[..., :3] *= canvas[..., 3:4]
        return canvas

    # --- stroke sessions (server-resident canvas) -----------------------
    #
    # Generic host-side implementation of the stroke-session contract
    # (pipeline/session.py documents the protocol): the canvas is held by
    # the model between requests, each STAMP_AT crops a res^2 window,
    # inpaints it via `generate`, and writes the composited result +
    # painted alpha back under the stamp edge mask. TPU models override
    # this with a device-resident donated-buffer implementation; this
    # fallback gives every inpainter (mock, websocket-proxied) the same
    # semantics for free.

    def begin_session(self, canvas_u8: np.ndarray) -> None:
        canvas_u8 = validate_session_canvas(canvas_u8, self.resolution())
        self._session_canvas = canvas_u8.copy()

    def session_active(self) -> bool:
        return getattr(self, "_session_canvas", None) is not None

    def stamp_at(self, x0: int, y0: int, return_pixels: bool = True,
                 overpaint: bool = False, **settings):
        """One stroke stamp into the resident canvas at top-left (x0, y0)
        (clamped to fit). Returns the composited res^2 crop as uint8 RGB
        when return_pixels, else None."""
        from ..pipeline.session import STAMP_EDGE_MARGIN

        canvas = self._require_session()
        res = self.resolution()
        y0 = int(np.clip(y0, 0, canvas.shape[0] - res))
        x0 = int(np.clip(x0, 0, canvas.shape[1] - res))
        crop = ensure_float01(canvas[y0:y0 + res, x0:x0 + res])
        if overpaint:
            margin = max(1, int(round(37 / 256 * res)))
            crop = crop.copy()
            crop[margin:res - margin, margin:res - margin, 3] = 0.0
            crop[..., :3] *= crop[..., 3:4]
        comp_u8 = float01_to_uint8(self.generate(crop, **settings))
        # In-place window write (the session owns its private canvas copy;
        # same update rule as pipeline/session.py host_stamp_update, which
        # stays pure as the test oracle): O(res^2) per stamp instead of a
        # full-canvas copy.
        m = STAMP_EDGE_MARGIN
        window = canvas[y0:y0 + res, x0:x0 + res]
        window[m:res - m, m:res - m, :3] = comp_u8[m:res - m, m:res - m]
        window[m:res - m, m:res - m, 3] = 255
        return comp_u8 if return_pixels else None

    def erase_at(self, x0: int, y0: int, return_pixels: bool = True):
        """Zero RGBA under a filled-circle stamp mask (Erase mode,
        reference manager.py:48-53, 267-270)."""
        from ..client.painter import circle_mask

        canvas = self._require_session()
        res = self.resolution()
        y0 = int(np.clip(y0, 0, canvas.shape[0] - res))
        x0 = int(np.clip(x0, 0, canvas.shape[1] - res))
        circle = circle_mask(res) > 0.0
        window = canvas[y0:y0 + res, x0:x0 + res]
        new_window = np.where(circle, np.uint8(0), window)
        window[...] = new_window  # in place: the session owns the canvas
        return new_window[..., :3] if return_pixels else None

    def fetch_canvas(self) -> np.ndarray:
        """The current resident canvas as (H, W, 4) uint8."""
        return self._require_session().copy()

    def sync_session(self) -> None:
        """Block until every queued stamp of the stroke has executed,
        WITHOUT downloading the canvas (host fallback: a no-op, stamps
        are synchronous here). Device models override with a one-byte
        fetch so tools can separate compute time from transfer time."""
        self._require_session()

    def end_session(self) -> None:
        self._session_canvas = None

    def _require_session(self) -> np.ndarray:
        canvas = getattr(self, "_session_canvas", None)
        if canvas is None:
            raise RuntimeError("no active stroke session (BEGIN_SESSION "
                               "first)")
        return canvas


def validate_session_canvas(canvas_u8: np.ndarray, res: int) -> np.ndarray:
    """Single source of the stroke-session canvas contract, shared by the
    host fallback and the device/mesh overrides: (H, W, 4) uint8 RGBA,
    at least as large as the res^2 stamp window."""
    canvas_u8 = np.asarray(canvas_u8)
    if canvas_u8.dtype != np.uint8 or canvas_u8.ndim != 3 \
            or canvas_u8.shape[2] != 4:
        raise ValueError("session canvas must be (H, W, 4) uint8 RGBA")
    if canvas_u8.shape[0] < res or canvas_u8.shape[1] < res:
        raise ValueError(
            f"session canvas {canvas_u8.shape[:2]} smaller than the "
            f"stamp window {res}x{res}")
    return canvas_u8


def ensure_float01(image: np.ndarray) -> np.ndarray:
    """uint8 [0,255] or float [0,1] -> float32 [0,1]."""
    image = np.asarray(image)
    if image.dtype == np.uint8:
        return image.astype(np.float32) / 255.0
    return image.astype(np.float32)


def float01_to_uint8(image: np.ndarray) -> np.ndarray:
    """float [0,1] -> uint8, matching the reference's `(img*255).to(uint8)`
    truncation semantics (trt_inference/handler.py:55-56)."""
    return (np.clip(np.asarray(image), 0.0, 1.0) * 255).astype(np.uint8)


def crop_resize_square(image: np.ndarray, width: int) -> np.ndarray:
    """Center-crop to square then resize to `width` (bilinear).

    Behavioral equivalent of reference handler.py:36-45 (CenterCrop +
    Resize) for HWC numpy images.
    """
    h, w = image.shape[:2]
    mindim = min(h, w)
    if width is None or width <= 0:
        width = mindim
    top = (h - mindim) // 2
    left = (w - mindim) // 2
    image = image[top : top + mindim, left : left + mindim]
    if mindim == width:
        return image
    # Bilinear resize on host via jax.image on CPU is overkill for a
    # once-per-brush op; use simple PIL-free numpy bilinear.
    return _resize_bilinear(image, width, width)


def _resize_bilinear(image: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Minimal half-pixel-centers bilinear resize for HWC numpy arrays."""
    img = ensure_float01(image)
    h, w = img.shape[:2]
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    if image.dtype == np.uint8:
        return float01_to_uint8(out)
    return out.astype(image.dtype)
