"""ctypes bindings for the native serving I/O runtime (native/dtpio.cpp).

Loads native/libdtpio.so when built (`make -C native`); every function
has a numpy fallback so the framework runs without the native library.
The server uses these for request decode, response encode, and image
conversions - the C++ analog of the byte-path glue the reference runs
through TensorRT/CUDA host code.
"""

from __future__ import annotations

import ctypes
import logging
import os

import numpy as np

logger = logging.getLogger(__name__)

_LIB = None


class _DtpRequest(ctypes.Structure):
    _fields_ = [
        ("type", ctypes.c_uint8),
        ("steps", ctypes.c_uint8),
        ("context_pad", ctypes.c_uint8),
        ("tg_steps", ctypes.c_uint8),
        ("width", ctypes.c_uint16),
        ("cfg_weight", ctypes.c_float),
        ("tg_weight", ctypes.c_float),
        ("img_width", ctypes.c_int32),
        ("img_height", ctypes.c_int32),
        ("img_channels", ctypes.c_int32),
        ("img_offset", ctypes.c_uint64),
        ("img_bytes", ctypes.c_uint64),
    ]


def _find_library():
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "native", "libdtpio.so")


def load_library(path: str | None = None):
    """Load (and cache) the native library; returns None if unavailable."""
    global _LIB
    if _LIB is not None:
        return _LIB
    path = path or _find_library()
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.dtp_decode_request.restype = ctypes.c_int
        lib.dtp_decode_request.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.POINTER(_DtpRequest)]
        lib.dtp_encode_response_header.argtypes = [
            ctypes.c_uint8, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_char_p]
        for name in ("dtp_u8_to_f32", "dtp_f32_to_u8"):
            getattr(lib, name).argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64]
        for name in ("dtp_composite", "dtp_composite_u8"):
            getattr(lib, name).argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_uint64]
        _LIB = lib
        logger.info("native dtpio loaded from %s", path)
        return lib
    except OSError as e:  # pragma: no cover
        logger.warning("failed to load native dtpio: %s", e)
        return None


def available() -> bool:
    return load_library() is not None


def decode_request(message: bytes):
    """Parse a full binary request; returns (meta, settings, image_view)
    where image_view is a zero-copy numpy view of the pixel payload.
    Raises ValueError on malformed input. Falls back to the Python codec
    when the native library is absent."""
    lib = load_library()
    if lib is None:
        from . import server_io

        meta, settings, offset = server_io.decode_request_metadata(message)
        img = server_io.binary_to_image(message, offset)
        return meta, settings, img

    req = _DtpRequest()
    rc = lib.dtp_decode_request(message, len(message), ctypes.byref(req))
    if rc != 0:
        raise ValueError(f"malformed request (code {rc})")
    meta = {"type": int(req.type)}
    settings = {
        "steps": int(req.steps),
        "context_pad": int(req.context_pad),
        "tg_steps": int(req.tg_steps),
        "width": int(req.width),
        "cfg_weight": float(req.cfg_weight),
        "tg_weight": float(req.tg_weight),
    }
    img = np.frombuffer(message, dtype=np.uint8, count=req.img_bytes,
                        offset=req.img_offset).reshape(
        req.img_height, req.img_width, req.img_channels)
    return meta, settings, img


def encode_response(response_type: int, img_u8: np.ndarray) -> bytes:
    lib = load_library()
    if lib is None:
        from . import server_io

        return server_io.encode_generated_response(
            server_io.RequestType(response_type), img_u8)
    h, w, c = img_u8.shape
    header = ctypes.create_string_buffer(13)
    lib.dtp_encode_response_header(response_type, w, h, c, header)
    return header.raw + np.ascontiguousarray(img_u8).tobytes()


def u8_to_f32(img_u8: np.ndarray) -> np.ndarray:
    lib = load_library()
    img_u8 = np.ascontiguousarray(img_u8)
    if lib is None:
        return img_u8.astype(np.float32) / 255.0
    out = np.empty(img_u8.shape, np.float32)
    lib.dtp_u8_to_f32(img_u8.ctypes.data, out.ctypes.data, img_u8.size)
    return out


def f32_to_u8(img: np.ndarray) -> np.ndarray:
    lib = load_library()
    img = np.ascontiguousarray(img, dtype=np.float32)
    if lib is None:
        return (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    out = np.empty(img.shape, np.uint8)
    lib.dtp_f32_to_u8(img.ctypes.data, out.ctypes.data, img.size)
    return out


def composite_u8(canvas_rgba_u8: np.ndarray, result_rgb_u8: np.ndarray):
    """Rounded uint8 alpha composite (native) or float-equivalent fallback."""
    lib = load_library()
    canvas = np.ascontiguousarray(canvas_rgba_u8)
    result = np.ascontiguousarray(result_rgb_u8)
    npix = canvas.shape[0] * canvas.shape[1]
    if lib is None:
        a = canvas[..., 3:4].astype(np.uint32)
        mixed = (canvas[..., :3].astype(np.uint32) * a
                 + result.astype(np.uint32) * (255 - a) + 127) // 255
        return mixed.astype(np.uint8)
    out = np.empty(result.shape, np.uint8)
    lib.dtp_composite_u8(canvas.ctypes.data, result.ctypes.data,
                         out.ctypes.data, npix)
    return out
