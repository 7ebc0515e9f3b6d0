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
