"""Native I/O runtime tests: C codec vs the Python codec, conversions,
composite. Skipped (falls back) when native/libdtpio.so is not built."""

import numpy as np
import pytest

from diffusiontexturepainting_tpu.serving import native_io, server_io


def _stamp_request(h=32, w=40, c=4, seed=0, **settings):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, c), np.uint8)
    blob = server_io.encode_stamp_request(img, **settings)
    return img, blob


def test_decode_matches_python_codec():
    img, blob = _stamp_request(steps=7, width=512, context_pad=99,
                               cfg_weight=2.5, tg_weight=0.75, tg_steps=3)
    meta, settings, view = native_io.decode_request(blob)
    assert meta["type"] == server_io.RequestType.NEW_STAMP.value
    assert settings["steps"] == 7
    assert settings["context_pad"] == 99
    assert settings["tg_steps"] == 3
    assert settings["width"] == 512
    assert settings["cfg_weight"] == pytest.approx(2.5)
    assert settings["tg_weight"] == pytest.approx(0.75)
    np.testing.assert_array_equal(view, img)


def test_decode_truncated_raises():
    if not native_io.available():
        pytest.skip("native library not built")
    _, blob = _stamp_request()
    with pytest.raises(ValueError):
        native_io.decode_request(blob[:20])
    with pytest.raises(ValueError):
        native_io.decode_request(blob[:-10])


def test_decode_bad_image_dims():
    if not native_io.available():
        pytest.skip("native library not built")
    _, blob = _stamp_request()
    bad = bytearray(blob)
    # corrupt img_width (first i32 after the 14-byte settings header) to -1
    import struct

    struct.pack_into("<i", bad, 14, -1)
    with pytest.raises(ValueError):
        native_io.decode_request(bytes(bad))


def test_encode_matches_python_codec():
    img = np.random.default_rng(1).integers(0, 256, (16, 16, 3), np.uint8)
    ours = native_io.encode_response(server_io.RequestType.RETURN_STAMP.value,
                                     img)
    ref = server_io.encode_generated_response(server_io.RequestType.RETURN_STAMP,
                                              img)
    assert ours == ref


def test_u8_f32_roundtrip():
    img = np.random.default_rng(2).integers(0, 256, (8, 8, 4), np.uint8)
    f = native_io.u8_to_f32(img)
    np.testing.assert_allclose(f, img.astype(np.float32) / 255.0, atol=1e-7)
    back = native_io.f32_to_u8(f)
    np.testing.assert_array_equal(back, img)


def test_composite_u8():
    rng = np.random.default_rng(3)
    canvas = rng.integers(0, 256, (8, 8, 4), np.uint8)
    result = rng.integers(0, 256, (8, 8, 3), np.uint8)
    out = native_io.composite_u8(canvas, result)
    a = canvas[..., 3:4].astype(np.float64) / 255.0
    expected = canvas[..., :3] * a + result * (1 - a)
    assert np.abs(out.astype(np.float64) - expected).max() <= 1.0
