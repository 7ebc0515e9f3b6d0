"""Byte-for-byte wire-protocol parity against the reference codec.

Imports the reference's pure-numpy `server_io.py` read-only (skipped when
/root/reference is not mounted) and asserts our codec produces and
consumes IDENTICAL bytes — the hard guarantee behind "the stock Omniverse
Kit client connects to this server unchanged" (reference
trt_inference/server_io.py:19-165).
"""

import importlib.util
import os

import numpy as np
import pytest

from diffusiontexturepainting_tpu.serving import server_io as ours

REF_PATH = "/root/reference/trt_inference/server_io.py"


@pytest.fixture(scope="module")
def ref():
    if not os.path.exists(REF_PATH):
        pytest.skip("reference not mounted")
    spec = importlib.util.spec_from_file_location("ref_server_io", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_request_type_bytes(ref):
    for ours_t, ref_t in zip(ours.RequestType, ref.RequestType):
        assert ours_t.value == ref_t.value
        assert (ours.encode_request_type(ours_t)
                == ref.encode_request_type(ref_t))


def test_image_encoding_bytes(ref):
    img = np.random.default_rng(0).integers(
        0, 256, (48, 64, 4), dtype=np.uint8)
    assert ours.image_to_binary(img) == ref.image_to_binary(img)
    # and both decoders accept the other's bytes
    theirs = ref.image_to_binary(img)
    np.testing.assert_array_equal(ours.binary_to_image(theirs), img)
    ref_out = ref.binary_to_image(ours.image_to_binary(img))
    np.testing.assert_array_equal(np.asarray(ref_out).reshape(img.shape), img)


def test_settings_header_bytes(ref):
    kw = dict(steps=7, width=512, context_pad=90, cfg_weight=3.5,
              tg_weight=1.25, tg_steps=4)
    assert (ours.encode_inference_settings(**kw)
            == ref.encode_inference_settings(**kw))


def test_full_request_cross_decode(ref):
    img = np.random.default_rng(1).integers(
        0, 256, (32, 32, 4), dtype=np.uint8)
    msg = (ours.encode_request_type(ours.RequestType.NEW_STAMP)
           + ours.encode_inference_settings(steps=6, width=32,
                                            context_pad=10, cfg_weight=2.0,
                                            tg_weight=0.5, tg_steps=3)
           + ours.image_to_binary(img))
    meta, settings, offset = ref.decode_request_metadata(msg)
    assert meta["type"] == ref.RequestType.NEW_STAMP.value
    assert settings["steps"] == 6 and settings["width"] == 32
    assert settings["context_pad"] == 10
    assert abs(settings["cfg_weight"] - 2.0) < 1e-6
    assert abs(settings["tg_weight"] - 0.5) < 1e-6
    assert settings["tg_steps"] == 3
    decoded = ref.binary_to_image(msg, offset)
    np.testing.assert_array_equal(np.asarray(decoded).reshape(img.shape), img)


def test_response_bytes(ref):
    img = np.random.default_rng(2).integers(
        0, 256, (16, 16, 3), dtype=np.uint8)
    assert (ours.encode_generated_response(ours.RequestType.RETURN_STAMP, img)
            == ref.encode_generated_response(ref.RequestType.RETURN_STAMP, img))
    # their response decodes with our decoder
    resp = ours.decode_response(
        ref.encode_generated_response(ref.RequestType.RETURN_PREVIEW, img))
    assert resp["type"] == ours.RequestType.RETURN_PREVIEW.value
    np.testing.assert_array_equal(resp["image"], img)


def test_kit_traffic_replay_through_live_handler(ref):
    """Replay a full Kit-client session encoded ENTIRELY by the
    reference's own codec through our request handler, and decode every
    reply with the reference codec - the stock Omniverse client's byte
    stream, end to end (SURVEY.md section 7 'integration test that
    replays recorded Kit traffic')."""
    from diffusiontexturepainting_tpu.client.mock_model import (
        MockConditionalInpainter,
    )
    from diffusiontexturepainting_tpu.serving.handler import (
        handle_request_bytes,
    )

    rng = np.random.default_rng(3)
    model = MockConditionalInpainter(32)

    # 1) NEW_BRUSH_IMAGE exactly as the Kit client sends it
    brush = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    req = (ref.encode_request_type(ref.RequestType.NEW_BRUSH_IMAGE)
           + ref.encode_inference_settings(steps=2, width=32, context_pad=8,
                                           cfg_weight=2.0, tg_weight=1.0,
                                           tg_steps=2)
           + ref.encode_new_brush_image_request(brush))
    reply = handle_request_bytes(model, bytes(req))
    resp = ref.decode_response(reply)
    assert resp["type"] == ref.RequestType.RETURN_PREVIEW.value
    assert resp["image"].shape[2] == 3

    # 2) a 3-stamp stroke, each stamp a NEW_STAMP request
    canvas = np.zeros((32, 32, 4), np.uint8)
    canvas[:16, :, :3] = rng.integers(0, 256, (16, 32, 3), dtype=np.uint8)
    canvas[:16, :, 3] = 255
    for _ in range(3):
        req = (ref.encode_request_type(ref.RequestType.NEW_STAMP)
               + ref.encode_inference_settings(steps=2, width=32,
                                               context_pad=8, cfg_weight=2.0,
                                               tg_weight=1.0, tg_steps=2)
               + ref.image_to_binary(canvas))
        reply = handle_request_bytes(model, bytes(req))
        resp = ref.decode_response(reply)
        assert resp["type"] == ref.RequestType.RETURN_STAMP.value
        out = np.asarray(resp["image"]).reshape(32, 32, 3)
        # painted region preserved (the Kit client relies on this)
        np.testing.assert_array_equal(out[:16], canvas[:16, :, :3])
        # stroke continuity: feed the composited stamp back as the canvas
        canvas = np.concatenate(
            [out, np.full((32, 32, 1), 255, np.uint8)], axis=-1)
