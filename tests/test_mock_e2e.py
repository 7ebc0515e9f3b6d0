"""End-to-end protocol test: headless websocket client against a live
mock-model server (no TPU, no model weights).

The TPU analog of the reference's testing strategy (mock inpainter +
headless websocket client, SURVEY.md section 4).
"""

import threading

import numpy as np
import pytest
import tornado.ioloop

from diffusiontexturepainting_tpu.client.mock_model import MockConditionalInpainter
from diffusiontexturepainting_tpu.serving.run import create_server


@pytest.fixture(scope="module")
def mock_server():
    loop_holder = {}
    started = threading.Event()

    def run():
        import asyncio

        asyncio.set_event_loop(asyncio.new_event_loop())
        loop = tornado.ioloop.IOLoop.current()
        app = create_server(mock=True, resolution=64)
        sockets = tornado.netutil.bind_sockets(0, "127.0.0.1")
        server = tornado.httpserver.HTTPServer(app)
        server.add_sockets(sockets)
        loop_holder["loop"] = loop
        loop_holder["port"] = sockets[0].getsockname()[1]
        started.set()
        loop.start()

    import tornado.httpserver
    import tornado.netutil

    t = threading.Thread(target=run, daemon=True)
    t.start()
    started.wait(timeout=10)
    yield loop_holder["port"]
    loop_holder["loop"].add_callback(loop_holder["loop"].stop)


def test_mock_model_contract():
    model = MockConditionalInpainter(32)
    brush = np.random.default_rng(0).random((40, 50, 3)).astype(np.float32)
    model.set_brush(brush)
    canvas = np.zeros((32, 32, 4), np.float32)
    out = model.generate(canvas)
    assert out.shape == (32, 32, 3)
    # empty alpha -> output is entirely the generated (brush) content
    np.testing.assert_allclose(out, model.image, atol=1e-6)


def test_generate_preserves_painted_canvas():
    model = MockConditionalInpainter(16)
    model.set_brush(np.ones((16, 16, 3), np.float32) * 0.5)
    canvas = np.zeros((16, 16, 4), np.float32)
    canvas[:8, :, :3] = 0.9
    canvas[:8, :, 3] = 1.0
    out = model.generate(canvas)
    np.testing.assert_allclose(out[:8], canvas[:8, :, :3], atol=1e-6)
    np.testing.assert_allclose(out[8:], 0.5, atol=1e-6)


def test_websocket_stroke_roundtrip(mock_server):
    from diffusiontexturepainting_tpu.client.websocket_model import (
        WebsocketConditionalInpainter,
    )

    port = mock_server
    client = WebsocketConditionalInpainter(f"ws://127.0.0.1:{port}/websocket/",
                                           resolution=64)
    rng = np.random.default_rng(7)
    brush = rng.random((64, 64, 3)).astype(np.float32)
    client.set_brush(brush)

    # First generate sends NEW_BRUSH_IMAGE and receives the preview.
    canvas = np.zeros((64, 64, 4), np.float32)
    canvas[:10, :, 3] = 1.0  # non-empty mask to avoid the short-circuit
    preview = client.generate_raw(canvas)
    assert preview.shape == (64, 64, 3)

    # Simulate a short stroke: 4 stamps, each reusing part of the previous.
    for _ in range(4):
        out = client.generate(canvas, steps=4, width=64)
        assert out.shape == (64, 64, 3)
        canvas[..., :3] = out
        canvas[..., 3] = 1.0
        # painted canvas must be preserved exactly by generate()
        out2 = client.generate(canvas, steps=4, width=64)
        np.testing.assert_allclose(out2, canvas[..., :3], atol=1 / 255.0 + 1e-6)

    # Empty-mask short-circuit: no server round trip, returns brush image.
    empty = np.zeros((64, 64, 4), np.float32)
    fast = client.generate_raw(empty)
    np.testing.assert_allclose(fast, client.image, atol=1e-6)
    client.close()


def test_profile_dir_wraps_request(tmp_path):
    """--profile-dir traces each request (NVTX-ranges analog)."""
    import glob

    from diffusiontexturepainting_tpu.client.mock_model import (
        MockConditionalInpainter)
    from diffusiontexturepainting_tpu.serving import server_io
    from diffusiontexturepainting_tpu.serving.handler import handle_request_bytes

    model = MockConditionalInpainter(64)
    prof = str(tmp_path / "prof")
    req = (server_io.encode_request_type(server_io.RequestType.NEW_STAMP)
           + server_io.encode_inference_settings(steps=2, width=64)
           + server_io.image_to_binary(np.zeros((64, 64, 4), np.uint8)))
    reply = handle_request_bytes(model, req, profile_dir=prof)
    assert reply[0] == server_io.RequestType.RETURN_STAMP.value
    assert glob.glob(prof + "/**/*.json.gz", recursive=True) \
        or glob.glob(prof + "/**/*.xplane.pb", recursive=True)
