"""Wire protocol codec tests: round-trips and byte-layout compatibility.

The layout must stay byte-identical to the reference protocol
(/root/reference/trt_inference/server_io.py) so the stock Kit client
connects unchanged. The layout test below re-derives the reference bytes
with raw numpy (the same primitive the reference uses) and checks ours
match.
"""

import numpy as np
import pytest

from diffusiontexturepainting_tpu.serving import server_io


def _rand_img(h=64, w=48, c=4, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


def test_image_roundtrip():
    img = _rand_img()
    decoded = server_io.binary_to_image(server_io.image_to_binary(img))
    np.testing.assert_array_equal(img, decoded)


def test_image_roundtrip_with_offset():
    img = _rand_img(32, 32, 3, seed=1)
    blob = b"\x07" * 13 + server_io.image_to_binary(img)
    decoded = server_io.binary_to_image(blob, offset=13)
    np.testing.assert_array_equal(img, decoded)


def test_image_rejects_non_uint8():
    with pytest.raises(RuntimeError):
        server_io.image_to_binary(np.zeros((8, 8, 3), np.float32))


def test_image_binary_layout_matches_reference_convention():
    """Header is [i32 width][i32 height][i32 channels] little-endian."""
    img = _rand_img(16, 24, 4, seed=2)
    blob = server_io.image_to_binary(img)
    ref_header = np.array([24, 16, 4], dtype=np.int32).tobytes()
    assert blob[:12] == ref_header
    assert blob[12:] == img.tobytes()


def test_settings_roundtrip():
    encoded = (
        server_io.encode_request_type(server_io.RequestType.NEW_STAMP)
        + server_io.encode_inference_settings(
            steps=7, width=512, context_pad=150, cfg_weight=2.5,
            tg_weight=1.25, tg_steps=3,
        )
    )
    meta, settings, offset = server_io.decode_request_metadata(encoded)
    assert meta["type"] == server_io.RequestType.NEW_STAMP.value
    assert settings["steps"] == 7
    assert settings["context_pad"] == 150
    assert settings["tg_steps"] == 3
    assert settings["width"] == 512
    assert settings["cfg_weight"] == pytest.approx(2.5)
    assert settings["tg_weight"] == pytest.approx(1.25)
    assert offset == 1 + 13


def test_settings_layout_matches_reference_convention():
    """Settings header is u8 steps, u8 pad, u8 tg_steps, u16 width, 2x f32."""
    blob = server_io.encode_inference_settings(
        steps=20, width=256, context_pad=150, cfg_weight=2.0,
        tg_weight=1.0, tg_steps=20,
    )
    ref = (
        np.array([20, 150, 20], dtype=np.uint8).tobytes()
        + np.array([256], dtype=np.uint16).tobytes()
        + np.array([2.0], dtype=np.float32).tobytes()
        + np.array([1.0], dtype=np.float32).tobytes()
    )
    assert blob == ref


def test_response_roundtrip():
    img = _rand_img(20, 20, 3, seed=3)
    blob = server_io.encode_generated_response(server_io.RequestType.RETURN_STAMP, img)
    res = server_io.decode_response(blob)
    assert res["type"] == server_io.RequestType.RETURN_STAMP.value
    np.testing.assert_array_equal(res["image"], img)


def test_brush_request_roundtrip():
    img = _rand_img(30, 30, 4, seed=4)
    blob = server_io.encode_brush_request(img, steps=4)
    meta, settings, offset = server_io.decode_request_metadata(blob)
    assert meta["type"] == server_io.RequestType.NEW_BRUSH_IMAGE.value
    decoded = server_io.decode_new_brush_image_request(blob, offset)
    np.testing.assert_array_equal(decoded["image"], img[..., :3])
