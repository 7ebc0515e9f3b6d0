"""HTTP POST fallback endpoint + NEW_BRUSH_PROMPT protocol handling.

Covers the serving additions beyond the reference: the Flask-analog HTTP
container (reference run.py:27-43) speaking the same binary wire format,
and the server side of RequestType.NEW_BRUSH_PROMPT=1 (declared but
unimplemented in the reference, server_io.py:19-24).
"""

import threading
import urllib.request

import numpy as np
import pytest
import tornado.httpserver
import tornado.ioloop
import tornado.netutil

from diffusiontexturepainting_tpu.serving import server_io
from diffusiontexturepainting_tpu.serving.run import create_server


@pytest.fixture(scope="module")
def mock_server():
    holder = {}
    started = threading.Event()

    def run():
        import asyncio

        asyncio.set_event_loop(asyncio.new_event_loop())
        loop = tornado.ioloop.IOLoop.current()
        app = create_server(mock=True, resolution=64)
        sockets = tornado.netutil.bind_sockets(0, "127.0.0.1")
        server = tornado.httpserver.HTTPServer(app)
        server.add_sockets(sockets)
        holder["loop"] = loop
        holder["port"] = sockets[0].getsockname()[1]
        started.set()
        loop.start()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    started.wait(timeout=30)
    yield holder["port"]
    holder["loop"].add_callback(holder["loop"].stop)


SETTINGS = dict(steps=2, width=64, context_pad=10, cfg_weight=2.0,
                tg_weight=1.0, tg_steps=2)


def _post(port, body: bytes) -> bytes:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/inpaint", data=body,
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.read()


def test_http_stamp_roundtrip(mock_server):
    rng = np.random.default_rng(0)
    brush = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    reply = _post(mock_server, server_io.encode_brush_request(brush, **SETTINGS))
    dec = server_io.decode_response(reply)
    assert dec["type"] == server_io.RequestType.RETURN_PREVIEW.value
    assert dec["image"].shape == (64, 64, 3)

    canvas = np.zeros((64, 64, 4), np.uint8)
    canvas[:16, :, 3] = 255
    reply = _post(mock_server, server_io.encode_stamp_request(canvas, **SETTINGS))
    dec = server_io.decode_response(reply)
    assert dec["type"] == server_io.RequestType.RETURN_STAMP.value
    assert dec["image"].shape == (64, 64, 3)


def test_http_bad_request_is_400_not_fatal(mock_server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{mock_server}/inpaint", data=b"\xff\x00garbage")
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        urllib.request.urlopen(req, timeout=30)
    assert exc_info.value.code == 400
    # server still alive
    test_http_stamp_roundtrip(mock_server)


def test_http_rejects_session_requests(mock_server):
    """Stroke sessions are connection-scoped (resident canvas owned by
    one websocket, enforced in handler._handle_session_bytes); the
    stateless HTTP endpoint must reject them instead of bypassing the
    ownership guard and clobbering a painter's in-flight stroke."""
    canvas = np.zeros((64, 64, 4), np.uint8)
    body = server_io.encode_begin_session_request(canvas, **SETTINGS)
    req = urllib.request.Request(
        f"http://127.0.0.1:{mock_server}/inpaint", data=bytes(body))
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        urllib.request.urlopen(req, timeout=30)
    assert exc_info.value.code == 400
    assert b"websocket" in exc_info.value.read()
    test_http_stamp_roundtrip(mock_server)  # server still alive


def test_prompt_codec_roundtrip():
    msg = server_io.encode_brush_prompt_request("mossy stone", **SETTINGS)
    meta, settings, off = server_io.decode_request_metadata(msg)
    assert meta["type"] == server_io.RequestType.NEW_BRUSH_PROMPT.value
    assert settings["steps"] == 2 and settings["width"] == 64
    assert server_io.decode_prompt_payload(msg, off) == "mossy stone"


def test_ws_prompt_brush(mock_server):
    from diffusiontexturepainting_tpu.client.websocket_model import (
        WebsocketConditionalInpainter)

    client = WebsocketConditionalInpainter(
        f"ws://127.0.0.1:{mock_server}/websocket/", resolution=64)
    preview = client.set_brush_prompt("mossy stone", **SETTINGS)
    assert preview.shape == (64, 64, 3)
    assert preview.dtype == np.float32
    # same prompt -> deterministic procedural brush -> same preview (mock
    # model echoes the brush)
    preview2 = client.set_brush_prompt("mossy stone", **SETTINGS)
    np.testing.assert_array_equal(preview, preview2)
    # a stamp after a prompt brush still round-trips
    canvas = np.zeros((64, 64, 4), np.float32)
    canvas[:16, :, 3] = 1.0
    out = client.generate(canvas, **SETTINGS)
    assert out.shape == (64, 64, 3)
    client.close()


def test_debug_dir_dumps(tmp_path):
    from diffusiontexturepainting_tpu.client.mock_model import (
        MockConditionalInpainter)
    from diffusiontexturepainting_tpu.serving.handler import handle_request_bytes

    model = MockConditionalInpainter(64)
    canvas = np.zeros((64, 64, 4), np.uint8)
    canvas[:16, :, 3] = 255
    handle_request_bytes(model, server_io.encode_stamp_request(canvas, **SETTINGS),
                         debug_dir=str(tmp_path))
    dumped = list(tmp_path.glob("*_stamp_*.npy"))
    assert {p.name.split("_")[-1] for p in dumped} == {"canvas.npy", "result.npy"}
