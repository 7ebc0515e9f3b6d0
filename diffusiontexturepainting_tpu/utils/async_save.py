"""Thread-executor texture saves (npy/png) so painting never blocks on
disk I/O - the analog of kit_app/.../util/async_save.py:20-46."""

from __future__ import annotations

import concurrent.futures
import logging
import os

import numpy as np

logger = logging.getLogger(__name__)

_EXECUTOR = concurrent.futures.ThreadPoolExecutor(max_workers=2,
                                                  thread_name_prefix="dtp-save")


def save_npy_async(path: str, array: np.ndarray):
    arr = np.array(array, copy=True)

    def _save():
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.save(path, arr)
        return path

    return _EXECUTOR.submit(_save)


def save_png_async(path: str, image: np.ndarray):
    """image: float [0,1] or uint8, HWC (3 or 4 channels)."""
    img = np.array(image, copy=True)

    def _save():
        from PIL import Image

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        if img.dtype != np.uint8:
            u8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        else:
            u8 = img
        mode = "RGBA" if u8.shape[-1] == 4 else "RGB"
        Image.fromarray(u8, mode=mode).save(path)
        return path

    return _EXECUTOR.submit(_save)


def wait_all(futures):
    return [f.result() for f in futures]
