"""Binary websocket wire protocol.

Byte-identical to the reference protocol (trt_inference/server_io.py:19-165)
so the unmodified Omniverse Kit client connects to this server. Unlike the
reference, which ships two duplicated copies of this module (server and Kit
client), this is the single shared codec used by both our server and our
headless client.

Request layout (little-endian):
  [u8  type]           RequestType
  [u8  steps]          denoising steps
  [u8  context_pad]    context dilation kernel size (px)
  [u8  tg_steps]       texture-guidance steps
  [u16 width]          requested output width
  [f32 cfg_weight]     classifier-free guidance weight
  [f32 tg_weight]      texture-guidance weight
  then an image payload: [i32 width][i32 height][i32 channels][raw u8 HWC]

Response layout: [u8 type][image payload].
"""

from __future__ import annotations

import enum
import struct
from dataclasses import dataclass, asdict

import numpy as np

_SETTINGS_FMT = "<BBBHff"  # steps, context_pad, tg_steps, width, cfg, tg
_IMAGE_HEADER_FMT = "<iii"  # width, height, channels


class RequestType(enum.Enum):
    NEW_BRUSH_IMAGE = 0
    NEW_BRUSH_PROMPT = 1
    NEW_STAMP = 2
    RETURN_PREVIEW = 3
    RETURN_STAMP = 4
    # --- stroke-session extension (values >= 16 stay clear of the
    # reference enum, server_io.py:19-24; see pipeline/session.py for the
    # serving design). All session requests carry the same settings
    # header as the reference types, so decode_request_metadata is
    # uniform across the protocol.
    BEGIN_SESSION = 16   # settings + RGBA canvas payload -> RETURN_ACK
    STAMP_AT = 17        # settings + coords payload -> RETURN_STAMP | ACK
    ERASE_AT = 18        # settings + coords payload -> RETURN_STAMP | ACK
    FETCH_CANVAS = 19    # settings only -> RETURN_CANVAS
    END_SESSION = 20     # settings only -> RETURN_ACK
    RETURN_ACK = 21      # [u32 seq]
    RETURN_CANVAS = 22   # RGBA canvas payload
    RETURN_ERROR = 23    # [u32 len][utf-8 message] - session-request
    #                      failures reply with this instead of silence so
    #                      a fire-and-forget client's ack accounting
    #                      stays in sync (legacy types < 16 keep the
    #                      reference's log-and-drop behavior)


@dataclass
class InferenceSettings:
    """Per-request settings traveling in the wire header.

    Defaults mirror the reference UI defaults
    (kit_app/.../manager.py:104-110).
    """

    steps: int = 20
    context_pad: int = 150
    tg_steps: int = 20
    width: int = 256
    cfg_weight: float = 2.0
    tg_weight: float = 1.0

    def to_dict(self):
        return asdict(self)


def encode_request_type(request_type: RequestType) -> bytes:
    return struct.pack("<B", request_type.value)


def encode_inference_settings(
    steps: int = 20,
    width: int = 256,
    context_pad: int = 150,
    cfg_weight: float = 2.0,
    tg_weight: float = 0.0,
    tg_steps: int = 0,
) -> bytes:
    """Encode the settings header (reference server_io.py:125-130)."""
    return struct.pack(
        _SETTINGS_FMT,
        int(steps) & 0xFF,
        int(context_pad) & 0xFF,
        int(tg_steps) & 0xFF,
        int(width) & 0xFFFF,
        float(cfg_weight),
        float(tg_weight),
    )


def image_to_binary(img: np.ndarray) -> bytes:
    """Encode an HWC uint8 image (reference server_io.py:43-62)."""
    if img.dtype != np.uint8:
        raise RuntimeError("Image must be uint8 in range 0...255")
    if img.ndim != 3:
        raise RuntimeError(f"Image must be HWC, got shape {img.shape}")
    height, width, nchannels = img.shape
    if nchannels >= height:
        raise RuntimeError(f"Wrong shape {img.shape}")
    header = struct.pack(_IMAGE_HEADER_FMT, width, height, nchannels)
    return header + np.ascontiguousarray(img).tobytes()


def binary_to_image(bytes_msg: bytes, offset: int = 0) -> np.ndarray:
    """Decode an HWC uint8 image (reference server_io.py:65-85)."""
    width, height, channels = struct.unpack_from(_IMAGE_HEADER_FMT, bytes_msg, offset)
    start = offset + struct.calcsize(_IMAGE_HEADER_FMT)
    count = int(height) * int(width) * int(channels)
    img = np.frombuffer(bytes_msg, dtype=np.uint8, count=count, offset=start)
    return img.reshape((height, width, channels))


def decode_request_metadata(bytes_msg: bytes, offset: int = 0):
    """Decode the request header; returns (meta, settings, read_offset).

    Mirrors reference server_io.py:88-122 field-for-field.
    """
    (msg_type,) = struct.unpack_from("<B", bytes_msg, offset)
    offset += 1
    steps, context_pad, tg_steps, width, cfg_weight, tg_weight = struct.unpack_from(
        _SETTINGS_FMT, bytes_msg, offset
    )
    offset += struct.calcsize(_SETTINGS_FMT)
    meta = {"type": msg_type}
    settings = {
        "steps": steps,
        "context_pad": context_pad,
        "tg_steps": tg_steps,
        "width": width,
        "cfg_weight": cfg_weight,
        "tg_weight": tg_weight,
    }
    return meta, settings, offset


def encode_new_brush_image_request(image: np.ndarray) -> bytes:
    return image_to_binary(image)


def decode_new_brush_image_request(binstr: bytes, offset: int = 0):
    return {"image": binary_to_image(binstr, offset)[..., :3]}


def encode_generated_response(response_type: RequestType, result_img: np.ndarray) -> bytes:
    return encode_request_type(response_type) + image_to_binary(result_img)


def decode_response(bytes_msg: bytes, offset: int = 0):
    (response_type,) = struct.unpack_from("<B", bytes_msg, offset)
    if response_type == RequestType.RETURN_ERROR.value:
        raise ServerError(decode_error_response(bytes_msg, offset)["message"])
    return {"type": response_type, "image": binary_to_image(bytes_msg, offset + 1)}


def encode_stamp_request(canvas_hwc_u8: np.ndarray, **settings) -> bytes:
    """Full NEW_STAMP request (convenience used by clients)."""
    return (
        encode_request_type(RequestType.NEW_STAMP)
        + encode_inference_settings(**settings)
        + image_to_binary(canvas_hwc_u8)
    )


def encode_brush_request(brush_hwc_u8: np.ndarray, **settings) -> bytes:
    """Full NEW_BRUSH_IMAGE request (convenience used by clients)."""
    return (
        encode_request_type(RequestType.NEW_BRUSH_IMAGE)
        + encode_inference_settings(**settings)
        + image_to_binary(brush_hwc_u8)
    )


# --- NEW_BRUSH_PROMPT payload ------------------------------------------------
# The reference defines RequestType.NEW_BRUSH_PROMPT=1 in its enum
# (server_io.py:19-24) but never implements the server side; this build
# completes it. Payload after the settings header: [u32 len][utf-8 bytes].


def encode_prompt_payload(prompt: str) -> bytes:
    data = prompt.encode("utf-8")
    return struct.pack("<I", len(data)) + data


def decode_prompt_payload(bytes_msg: bytes, offset: int = 0) -> str:
    (length,) = struct.unpack_from("<I", bytes_msg, offset)
    start = offset + 4
    return bytes(bytes_msg[start:start + length]).decode("utf-8")


def encode_brush_prompt_request(prompt: str, **settings) -> bytes:
    """Full NEW_BRUSH_PROMPT request."""
    return (
        encode_request_type(RequestType.NEW_BRUSH_PROMPT)
        + encode_inference_settings(**settings)
        + encode_prompt_payload(prompt)
    )


# --- stroke-session payloads --------------------------------------------
# STAMP_AT / ERASE_AT carry [i32 x0][i32 y0][u8 flags] after the settings
# header; flags bit 0 = return pixels (RETURN_STAMP reply instead of a
# 5-byte RETURN_ACK), bit 1 = overpaint (clear the window's center alpha
# before inpainting). Coordinates are the stamp window's top-left corner
# in canvas pixels; the server clamps them so the window fits.

COORDS_FLAG_RETURN_PIXELS = 1
COORDS_FLAG_OVERPAINT = 2

_COORDS_FMT = "<iiB"


def encode_coords_payload(x0: int, y0: int, return_pixels: bool = True,
                          overpaint: bool = False) -> bytes:
    flags = (COORDS_FLAG_RETURN_PIXELS if return_pixels else 0) \
        | (COORDS_FLAG_OVERPAINT if overpaint else 0)
    return struct.pack(_COORDS_FMT, int(x0), int(y0), flags)


def decode_coords_payload(bytes_msg: bytes, offset: int = 0):
    x0, y0, flags = struct.unpack_from(_COORDS_FMT, bytes_msg, offset)
    return {
        "x0": x0,
        "y0": y0,
        "return_pixels": bool(flags & COORDS_FLAG_RETURN_PIXELS),
        "overpaint": bool(flags & COORDS_FLAG_OVERPAINT),
    }


def encode_begin_session_request(canvas_u8: "np.ndarray", **settings) -> bytes:
    return (
        encode_request_type(RequestType.BEGIN_SESSION)
        + encode_inference_settings(**settings)
        + image_to_binary(canvas_u8)
    )


def encode_stamp_at_request(x0: int, y0: int, return_pixels: bool = True,
                            overpaint: bool = False, **settings) -> bytes:
    return (
        encode_request_type(RequestType.STAMP_AT)
        + encode_inference_settings(**settings)
        + encode_coords_payload(x0, y0, return_pixels, overpaint)
    )


def encode_erase_at_request(x0: int, y0: int,
                            return_pixels: bool = True) -> bytes:
    return (
        encode_request_type(RequestType.ERASE_AT)
        + encode_inference_settings()
        + encode_coords_payload(x0, y0, return_pixels)
    )


def encode_fetch_canvas_request() -> bytes:
    return (encode_request_type(RequestType.FETCH_CANVAS)
            + encode_inference_settings())


def encode_end_session_request() -> bytes:
    return (encode_request_type(RequestType.END_SESSION)
            + encode_inference_settings())


def encode_ack_response(seq: int) -> bytes:
    return encode_request_type(RequestType.RETURN_ACK) \
        + struct.pack("<I", int(seq) & 0xFFFFFFFF)


def decode_ack_response(bytes_msg: bytes, offset: int = 0):
    (response_type,) = struct.unpack_from("<B", bytes_msg, offset)
    (seq,) = struct.unpack_from("<I", bytes_msg, offset + 1)
    return {"type": response_type, "seq": seq}


class ServerError(RuntimeError):
    """A RETURN_ERROR reply from the server (session-request failure)."""


def encode_error_response(message: str) -> bytes:
    data = str(message).encode("utf-8")[:4096]
    return (encode_request_type(RequestType.RETURN_ERROR)
            + struct.pack("<I", len(data)) + data)


def decode_error_response(bytes_msg: bytes, offset: int = 0):
    (response_type,) = struct.unpack_from("<B", bytes_msg, offset)
    (length,) = struct.unpack_from("<I", bytes_msg, offset + 1)
    start = offset + 5
    return {"type": response_type,
            "message": bytes(bytes_msg[start:start + length]).decode(
                "utf-8", "replace")}
