"""Image resize ops with torch-parity conventions, as MXU matmuls.

The reference preprocesses the brush image with
`F.interpolate(mode="bicubic", align_corners=True)` (image_encoder.py:102)
and downsamples masks with `F.interpolate` default mode="nearest"
(inpaint_pipeline.py:114-115). Neither convention matches
`jax.image.resize` (which uses half-pixel centers and no align_corners),
so we build separable interpolation as two small dense matmuls with
precomputed (static-shape) weight matrices - the TPU-friendly formulation:
out = W_h @ img @ W_w^T runs on the MXU and fuses with surrounding ops.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel (torch uses a=-0.75)."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=64)
def _resize_matrix(in_size: int, out_size: int, mode: str, align_corners: bool):
    """(out_size, in_size) float32 interpolation matrix."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5

    W = np.zeros((out_size, in_size), dtype=np.float64)
    if mode == "bilinear":
        i0 = np.floor(src).astype(np.int64)
        frac = src - i0
        for o in range(out_size):
            lo = int(np.clip(i0[o], 0, in_size - 1))
            hi = int(np.clip(i0[o] + 1, 0, in_size - 1))
            W[o, lo] += 1.0 - frac[o]
            W[o, hi] += frac[o]
    elif mode == "bicubic":
        i0 = np.floor(src).astype(np.int64)
        frac = src - i0
        for o in range(out_size):
            for tap in range(-1, 3):
                w = _cubic_kernel(np.array(tap - frac[o]))
                idx = int(np.clip(i0[o] + tap, 0, in_size - 1))
                W[o, idx] += float(w)
    elif mode == "nearest":
        # torch F.interpolate nearest: src = floor(out_idx * in/out)
        idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int64)
        idx = np.clip(idx, 0, in_size - 1)
        for o in range(out_size):
            W[o, idx[o]] = 1.0
    else:
        raise ValueError(f"unknown mode {mode}")
    return W.astype(np.float32)


def resize2d(img, out_h: int, out_w: int, mode: str = "bilinear",
             align_corners: bool = False):
    """Resize (..., H, W, C) images via separable weight matmuls.

    Matches torch F.interpolate conventions:
      - mode="nearest": floor index mapping (no align_corners concept)
      - mode="bilinear"/"bicubic" with align_corners True/False
    """
    h, w = img.shape[-3], img.shape[-2]
    if mode == "nearest":
        align_corners = False
    Wh = jnp.asarray(_resize_matrix(h, out_h, mode, align_corners), img.dtype)
    Ww = jnp.asarray(_resize_matrix(w, out_w, mode, align_corners), img.dtype)
    # (..., H, W, C): contract H then W on the MXU.
    out = jnp.einsum("oh,...hwc->...owc", Wh, img)
    out = jnp.einsum("pw,...owc->...opc", Ww, out)
    return out


def nearest_downsample(img, factor: int):
    """Exact x1/factor nearest downsample: strided slice (free on TPU)."""
    return img[..., ::factor, ::factor, :]
