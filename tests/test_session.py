"""Stroke sessions: device-resident canvas serving (pipeline/session.py,
server_io.py request types >= 16).

Covers: the wire codecs, the generic host-side session fallback
(ConditionalInpainterBase), the device-resident TPU path against the
host oracle with matched RNG, clamping, overpaint, erase semantics
(reference manager.py:48-53, 243-270), the handler dispatch, and a live
websocket fire-and-forget stroke against a mock server.
"""

import threading

import numpy as np
import pytest

from diffusiontexturepainting_tpu.client.mock_model import (
    MockConditionalInpainter,
)
from diffusiontexturepainting_tpu.client.painter import circle_mask
from diffusiontexturepainting_tpu.pipeline.session import host_stamp_update
from diffusiontexturepainting_tpu.serving import server_io
from diffusiontexturepainting_tpu.serving.handler import handle_request_bytes
from diffusiontexturepainting_tpu.serving.model_base import float01_to_uint8


def make_canvas(h=96, w=128, seed=0):
    rng = np.random.default_rng(seed)
    canvas = np.zeros((h, w, 4), np.uint8)
    canvas[: h // 2, :, :3] = rng.integers(0, 256, (h // 2, w, 3),
                                           dtype=np.uint8)
    canvas[: h // 2, :, 3] = 255
    return canvas


# --- wire codecs -----------------------------------------------------------


def test_coords_payload_roundtrip():
    raw = server_io.encode_coords_payload(37, -5, return_pixels=False,
                                          overpaint=True)
    out = server_io.decode_coords_payload(raw)
    assert out == {"x0": 37, "y0": -5, "return_pixels": False,
                   "overpaint": True}


def test_ack_roundtrip():
    raw = server_io.encode_ack_response(12345)
    out = server_io.decode_ack_response(raw)
    assert out["type"] == server_io.RequestType.RETURN_ACK.value
    assert out["seq"] == 12345


def test_session_requests_share_settings_header():
    req = server_io.encode_stamp_at_request(3, 4, steps=7, cfg_weight=1.5)
    meta, settings, offset = server_io.decode_request_metadata(req)
    assert meta["type"] == server_io.RequestType.STAMP_AT.value
    assert settings["steps"] == 7
    assert settings["cfg_weight"] == pytest.approx(1.5)
    coords = server_io.decode_coords_payload(req, offset)
    assert (coords["x0"], coords["y0"]) == (3, 4)


# --- generic host-side fallback --------------------------------------------


def test_base_session_stamp_update_rule():
    model = MockConditionalInpainter(32)
    model.set_brush(np.full((32, 32, 3), 0.25, np.float32))
    canvas = make_canvas()
    model.begin_session(canvas)
    crop = canvas[10:42, 20:52]
    expected_comp = float01_to_uint8(
        model.generate(crop.astype(np.float32) / 255.0))
    out = model.stamp_at(20, 10)
    np.testing.assert_array_equal(out, expected_comp)
    fetched = model.fetch_canvas()
    np.testing.assert_array_equal(
        fetched, host_stamp_update(canvas, expected_comp, 20, 10))
    # 1px border of the window is untouched; interior alpha painted
    assert (fetched[11:41, 21:51, 3] == 255).all()
    np.testing.assert_array_equal(fetched[10, 20:52], canvas[10, 20:52])


def test_base_session_clamps_coordinates():
    model = MockConditionalInpainter(32)
    canvas = make_canvas()
    model.begin_session(canvas)
    model.stamp_at(10_000, -50, return_pixels=False)
    fetched = model.fetch_canvas()
    # window clamped to the top-right corner
    assert (fetched[1:31, 97:127, 3] == 255).all()
    np.testing.assert_array_equal(fetched[:, :96], canvas[:, :96])


def test_base_session_erase_circle():
    model = MockConditionalInpainter(32)
    canvas = make_canvas()
    model.begin_session(canvas)
    model.erase_at(8, 8)
    fetched = model.fetch_canvas()
    circle = circle_mask(32)[..., 0] > 0
    window = fetched[8:40, 8:40]
    assert (window[circle] == 0).all()
    np.testing.assert_array_equal(window[~circle], canvas[8:40, 8:40][~circle])


def test_base_session_overpaint_clears_center():
    model = MockConditionalInpainter(32)
    model.set_brush(np.full((32, 32, 3), 0.75, np.float32))
    canvas = make_canvas(h=64, w=64, seed=1)
    canvas[..., 3] = 255  # fully painted
    model.begin_session(canvas)
    out = model.stamp_at(0, 0, overpaint=True)
    margin = max(1, int(round(37 / 256 * 32)))
    # center was cleared -> regenerated with the brush; border kept
    brush_u8 = float01_to_uint8(np.full((1,), 0.75))[0]
    assert (out[margin:-margin, margin:-margin] == brush_u8).all()
    # border kept (u8 -> f01 -> u8 roundtrip may truncate by 1)
    diff = (out[:margin].astype(int)
            - canvas[:margin, :32, :3].astype(int))
    assert np.abs(diff).max() <= 1


def test_session_requires_begin():
    model = MockConditionalInpainter(16)
    with pytest.raises(RuntimeError, match="BEGIN_SESSION"):
        model.stamp_at(0, 0)
    model.begin_session(make_canvas(32, 32))
    model.end_session()
    with pytest.raises(RuntimeError, match="BEGIN_SESSION"):
        model.fetch_canvas()


def test_begin_session_validates_canvas():
    model = MockConditionalInpainter(64)
    with pytest.raises(ValueError, match="smaller"):
        model.begin_session(make_canvas(32, 32))
    with pytest.raises(ValueError, match="uint8"):
        model.begin_session(np.zeros((64, 64, 4), np.float32))


# --- device-resident TPU path ----------------------------------------------


@pytest.fixture(scope="module")
def tiny_model():
    from diffusiontexturepainting_tpu.pipeline.tpu_model import (
        TPUConditionalInpainter,
    )

    return TPUConditionalInpainter(resolution=64, tiny=True, warmup=False,
                                   seed=0, verbose_timing=False)


settings_small = dict(steps=2, cfg_weight=2.0, tg_weight=1.0, tg_steps=2,
                      context_pad=20)


@pytest.mark.slow
def test_device_session_matches_per_request_path(tiny_model):
    """stamp_at == generate_u8 on the same crop with the same RNG counter,
    written back under the host oracle's update rule."""
    model = tiny_model
    model.set_brush(np.random.default_rng(1).random((64, 64, 3))
                    .astype(np.float32))
    canvas = make_canvas(h=96, w=160, seed=2)
    model.begin_session(canvas)

    c0 = model._request_counter
    crop = canvas[16:80, 40:104]
    comp_ref = model.generate_u8(crop, **settings_small)
    model._request_counter = c0  # same fold_in -> same stamp RNG
    out = model.stamp_at(40, 16, **settings_small)
    np.testing.assert_array_equal(out, comp_ref)
    np.testing.assert_array_equal(
        model.fetch_canvas(), host_stamp_update(canvas, comp_ref, 40, 16))


@pytest.mark.slow
def test_device_session_chains_stamps(tiny_model):
    """Consecutive overlapping stamps: stamp 2 must see stamp 1's output
    (the data dependency chains through the resident canvas)."""
    model = tiny_model
    canvas = make_canvas(h=96, w=160, seed=3)
    model.begin_session(canvas)
    c0 = model._request_counter

    model.stamp_at(0, 0, return_pixels=False, **settings_small)
    model.stamp_at(32, 16, return_pixels=False, **settings_small)
    fetched = model.fetch_canvas()

    # host replay using the per-request path on explicit crops
    model._request_counter = c0
    host = canvas
    for (x0, y0) in [(0, 0), (32, 16)]:
        comp = model.generate_u8(host[y0:y0 + 64, x0:x0 + 64],
                                 **settings_small)
        host = host_stamp_update(host, comp, x0, y0)
    np.testing.assert_array_equal(fetched, host)
    model.end_session()
    assert not model.session_active()


@pytest.mark.slow
def test_sync_session_blocks_without_fetch(tiny_model):
    """sync_session completes queued stamps but leaves the canvas
    resident; a later fetch still returns the stamped result."""
    model = tiny_model
    canvas = make_canvas(h=96, w=160, seed=9)
    model.begin_session(canvas)
    model.stamp_at(0, 0, return_pixels=False, **settings_small)
    model.sync_session()
    assert model.session_active()
    assert not np.array_equal(model.fetch_canvas(), canvas)
    model.end_session()
    with pytest.raises(RuntimeError):
        model.sync_session()


@pytest.mark.slow
def test_device_session_erase(tiny_model):
    model = tiny_model
    canvas = make_canvas(h=96, w=160, seed=4)
    model.begin_session(canvas)
    crop = model.erase_at(100, 5)
    circle = circle_mask(64)[..., 0] > 0
    assert (crop[circle] == 0).all()
    fetched = model.fetch_canvas()
    window = fetched[5:69, 96:160]  # x clamped to 160-64=96
    assert (window[circle] == 0).all()
    assert (window[circle][..., :] == 0).all()
    np.testing.assert_array_equal(fetched[:5], canvas[:5])


# --- handler dispatch --------------------------------------------------------


def test_handler_session_sequence():
    model = MockConditionalInpainter(32)
    canvas = make_canvas()

    reply = handle_request_bytes(
        model, server_io.encode_begin_session_request(canvas))
    assert server_io.decode_ack_response(reply)["type"] == \
        server_io.RequestType.RETURN_ACK.value

    reply = handle_request_bytes(
        model, server_io.encode_stamp_at_request(4, 6, return_pixels=True))
    out = server_io.decode_response(reply)
    assert out["type"] == server_io.RequestType.RETURN_STAMP.value
    assert out["image"].shape == (32, 32, 3)

    reply = handle_request_bytes(
        model,
        server_io.encode_stamp_at_request(40, 6, return_pixels=False))
    assert server_io.decode_ack_response(reply)["seq"] == 1

    reply = handle_request_bytes(model,
                                 server_io.encode_erase_at_request(0, 0))
    assert server_io.decode_response(reply)["type"] == \
        server_io.RequestType.RETURN_STAMP.value

    reply = handle_request_bytes(model,
                                 server_io.encode_fetch_canvas_request())
    (rtype,) = np.frombuffer(reply[:1], np.uint8)
    assert rtype == server_io.RequestType.RETURN_CANVAS.value
    fetched = server_io.binary_to_image(reply, 1)
    assert fetched.shape == canvas.shape
    np.testing.assert_array_equal(fetched, model.fetch_canvas())

    reply = handle_request_bytes(model,
                                 server_io.encode_end_session_request())
    server_io.decode_ack_response(reply)
    assert not model.session_active()


# --- live websocket stroke ---------------------------------------------------


@pytest.fixture(scope="module")
def mock_server():
    import tornado.httpserver
    import tornado.ioloop
    import tornado.netutil

    from diffusiontexturepainting_tpu.serving.run import create_server

    loop_holder = {}
    started = threading.Event()

    def run():
        import asyncio

        asyncio.set_event_loop(asyncio.new_event_loop())
        loop = tornado.ioloop.IOLoop.current()
        app = create_server(mock=True, resolution=32)
        sockets = tornado.netutil.bind_sockets(0, "127.0.0.1")
        server = tornado.httpserver.HTTPServer(app)
        server.add_sockets(sockets)
        loop_holder["loop"] = loop
        loop_holder["port"] = sockets[0].getsockname()[1]
        started.set()
        loop.start()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    started.wait(timeout=10)
    yield loop_holder["port"]
    loop_holder["loop"].add_callback(loop_holder["loop"].stop)


def test_create_server_session_canvas_warmup():
    """--session-canvas AOT-exercises the session path at startup and
    leaves no active session behind."""
    from diffusiontexturepainting_tpu.serving.run import create_server

    model = MockConditionalInpainter(32)
    create_server(model=model, resolution=32, session_canvas="64x48")
    assert not model.session_active()


def test_canvas_stroke_painter_paints_a_band():
    from diffusiontexturepainting_tpu.client.canvas_painter import (
        CanvasStrokePainter,
    )

    model = MockConditionalInpainter(32)
    model.set_brush(np.full((32, 32, 3), 0.5, np.float32))
    p = CanvasStrokePainter(model, width=128, height=64)
    assert p.texture.sum() == 0
    n = p.begin_stroke(16, 32)
    n += p.move(112, 32)
    p.end_stroke()
    assert n >= 1 + (96 // 16)  # one stamp per radius=16px of travel
    tex = p.texture
    # the stroke band is painted with the brush gray
    band = tex[32:47, 16:96]
    assert (band[..., 3] == 255).all()
    assert (band[..., :3] == 127).all()
    # undo restores the empty canvas
    assert p.undo()
    assert p.texture.sum() == 0
    p.close()


def test_canvas_stroke_painter_erase_mode():
    from diffusiontexturepainting_tpu.client.canvas_painter import (
        CanvasStrokePainter,
    )
    from diffusiontexturepainting_tpu.client.painter import BrushMode

    model = MockConditionalInpainter(32)
    canvas = np.full((64, 64, 4), 200, np.uint8)
    p = CanvasStrokePainter(model, canvas=canvas)
    p.mode = BrushMode.ERASE
    p.begin_stroke(32, 32)
    p.end_stroke()
    tex = p.texture
    circle = circle_mask(32)[..., 0] > 0
    assert (tex[16:48, 16:48][circle] == 0).all()
    np.testing.assert_array_equal(tex[:16], canvas[:16])
    p.close()


def test_websocket_fire_and_forget_stroke(mock_server):
    from diffusiontexturepainting_tpu.client.websocket_model import (
        WebsocketConditionalInpainter,
    )

    client = WebsocketConditionalInpainter(
        f"ws://127.0.0.1:{mock_server}/websocket/", resolution=32)
    try:
        client.set_brush(np.full((32, 32, 3), 0.5, np.float32))
        canvas = make_canvas(64, 96)
        client.begin_session(canvas)
        # fire a 5-stamp stroke without waiting, then synchronize once
        for i in range(5):
            client.stamp_at(8 * i, 4 * i, return_pixels=False, wait=False)
        fetched = client.fetch_canvas()
        assert fetched.shape == canvas.shape
        # replay server-side semantics locally
        oracle = MockConditionalInpainter(32)
        oracle.set_brush(np.full((32, 32, 3), 0.5, np.float32))
        oracle.begin_session(canvas)
        for i in range(5):
            oracle.stamp_at(8 * i, 4 * i, return_pixels=False)
        np.testing.assert_array_equal(fetched, oracle.fetch_canvas())
        # pixel-returning stamp still works after the stream
        out = client.stamp_at(0, 0)
        assert out.shape == (32, 32, 3)
        client.end_session()

        # re-begin with in-flight acks from a new stroke must not desync
        client.begin_session(canvas)
        client.stamp_at(0, 0, return_pixels=False, wait=False)
        client.stamp_at(8, 0, return_pixels=False, wait=False)
        client.begin_session(canvas)  # drains the 2 outstanding acks
        out = client.stamp_at(4, 4)
        assert out.shape == (32, 32, 3)
        client.end_session()
    finally:
        client.close()


def test_error_response_codec():
    enc = server_io.encode_error_response("boom: something failed")
    assert enc[0] == server_io.RequestType.RETURN_ERROR.value
    dec = server_io.decode_error_response(enc)
    assert dec["message"] == "boom: something failed"
    with pytest.raises(server_io.ServerError, match="something failed"):
        server_io.decode_response(enc)


def test_session_error_reply_and_ownership(mock_server):
    """Session failures reply RETURN_ERROR (never silence), and in
    single-model serving the resident canvas belongs to one connection:
    a second client's session requests are rejected until the owner
    ends its session."""
    from websockets.sync.client import connect

    url = f"ws://127.0.0.1:{mock_server}/websocket/"
    R = server_io.RequestType
    ws_a = connect(url, max_size=None)
    ws_b = connect(url, max_size=None)
    try:
        # stamp without BEGIN_SESSION -> error reply, connection alive
        ws_a.send(server_io.encode_stamp_at_request(0, 0,
                                                    return_pixels=False))
        reply = ws_a.recv()
        assert reply[0] == R.RETURN_ERROR.value
        assert "session" in \
            server_io.decode_error_response(reply)["message"].lower()

        canvas = make_canvas(64, 96)
        ws_a.send(server_io.encode_begin_session_request(canvas))
        assert ws_a.recv()[0] == R.RETURN_ACK.value

        # second connection can neither begin nor stamp while A paints
        ws_b.send(server_io.encode_begin_session_request(canvas))
        assert ws_b.recv()[0] == R.RETURN_ERROR.value
        ws_b.send(server_io.encode_stamp_at_request(0, 0,
                                                    return_pixels=False))
        assert ws_b.recv()[0] == R.RETURN_ERROR.value

        # A keeps painting unharmed, then releases; B may now begin
        ws_a.send(server_io.encode_stamp_at_request(0, 0,
                                                    return_pixels=False))
        assert ws_a.recv()[0] == R.RETURN_ACK.value
        ws_a.send(server_io.encode_end_session_request())
        assert ws_a.recv()[0] == R.RETURN_ACK.value
        ws_b.send(server_io.encode_begin_session_request(canvas))
        assert ws_b.recv()[0] == R.RETURN_ACK.value
        ws_b.send(server_io.encode_end_session_request())
        assert ws_b.recv()[0] == R.RETURN_ACK.value
    finally:
        ws_a.close()
        ws_b.close()


def test_client_raises_server_error(mock_server):
    from diffusiontexturepainting_tpu.client.websocket_model import (
        WebsocketConditionalInpainter,
    )

    client = WebsocketConditionalInpainter(
        f"ws://127.0.0.1:{mock_server}/websocket/", resolution=32)
    try:
        with pytest.raises(server_io.ServerError):
            client.stamp_at(0, 0, return_pixels=False)  # no session yet
        # the error consumed the in-flight slot; the connection is usable
        client.begin_session(make_canvas(64, 96))
        client.stamp_at(0, 0, return_pixels=False)
        client.end_session()
    finally:
        client.close()


def test_canvas_painter_snapshot_reuses_synced_state():
    """begin_stroke's undo snapshot must not fetch when the cached sync
    is current (no stamps since the last fetch)."""
    from diffusiontexturepainting_tpu.client.canvas_painter import (
        CanvasStrokePainter,
    )

    model = MockConditionalInpainter(32)
    model.set_brush(np.full((32, 32, 3), 0.5, np.float32))
    p = CanvasStrokePainter(model, width=64, height=64)
    calls = {"n": 0}
    orig = model.fetch_canvas

    def counting_fetch():
        calls["n"] += 1
        return orig()

    model.fetch_canvas = counting_fetch
    p.begin_stroke(16, 16)  # snapshot from the init-time cache: no fetch
    p.end_stroke()
    assert calls["n"] == 0
    _ = p.texture           # explicit sync
    assert calls["n"] == 1
    p.begin_stroke(32, 32)  # clean cache: still no extra fetch
    p.end_stroke()
    assert calls["n"] == 1
    p.begin_stroke(40, 40)  # dirty (previous stroke stamped): one fetch
    p.end_stroke()
    assert calls["n"] == 2
    # undo three times walks back to the empty canvas
    assert p.undo() and p.undo() and p.undo()
    assert p.texture.sum() == 0
    p.close()


def test_parallel_service_counters_thread_safe():
    """next_counter / acquire_session_device are hit from executor
    threads; they must never hand out duplicates."""
    import threading as _threading
    from types import SimpleNamespace

    from diffusiontexturepainting_tpu.serving.parallel_model import (
        ParallelInpainterService,
    )

    svc = object.__new__(ParallelInpainterService)
    svc._counter = 0
    svc._session_rr = 0
    svc._session_params = {}
    svc._lock = _threading.Lock()
    svc.mesh = SimpleNamespace(
        devices=np.array([SimpleNamespace(id=i) for i in range(4)]))

    counters, devices = [], []
    lock = _threading.Lock()

    def worker():
        got_c, got_d = [], []
        for _ in range(200):
            got_c.append(int(svc.next_counter()))
            got_d.append(svc.acquire_session_device().id)
        with lock:
            counters.extend(got_c)
            devices.extend(got_d)

    threads = [_threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(set(counters)) == 8 * 200  # no duplicate RNG counters
    # round-robin stays balanced under contention
    counts = [devices.count(i) for i in range(4)]
    assert counts == [8 * 200 // 4] * 4


def test_canvas_painter_over_websocket(mock_server):
    from diffusiontexturepainting_tpu.client.canvas_painter import (
        CanvasStrokePainter,
    )
    from diffusiontexturepainting_tpu.client.websocket_model import (
        WebsocketConditionalInpainter,
    )

    client = WebsocketConditionalInpainter(
        f"ws://127.0.0.1:{mock_server}/websocket/", resolution=32)
    try:
        client.set_brush(np.full((32, 32, 3), 0.5, np.float32))
        p = CanvasStrokePainter(client, width=96, height=64)
        p.begin_stroke(16, 32)
        p.move(80, 32)  # stamps stream fire-and-forget
        p.end_stroke()
        tex = p.texture  # one synchronizing fetch
        assert (tex[32:47, 16:80, 3] == 255).all()
        assert p.undo()
        assert p.texture.sum() == 0
        p.close()
    finally:
        client.close()


@pytest.mark.slow
def test_deferred_stroke_matches_eager_stamps(tiny_model):
    """Fire-and-forget stamps coalesce into ONE chained stroke program
    (pipeline/session.py make_session_stroke_fn); the flushed result
    must be bit-identical to dispatching the same stamps eagerly
    (same counters -> same RNG stream)."""
    model = tiny_model
    canvas = make_canvas(h=96, w=160, seed=11)
    pts = [(0, 0), (24, 8), (48, 16)]

    model.begin_session(canvas)
    c0 = model._request_counter
    for (x0, y0) in pts:
        model.stamp_at(x0, y0, return_pixels=False, **settings_small)
    assert len(model._pending_stamps) == len(pts)  # deferred, not run
    deferred = model.fetch_canvas()
    model.end_session()

    model.begin_session(canvas)
    model._request_counter = c0
    for (x0, y0) in pts:
        model.stamp_at(x0, y0, return_pixels=True, **settings_small)
    eager = model.fetch_canvas()
    model.end_session()

    np.testing.assert_array_equal(deferred, eager)


@pytest.mark.slow
def test_deferred_stroke_flushes_on_brush_change(tiny_model):
    """Deferred stamps bind the brush at flush: set_brush mid-stroke
    must flush the pending stamps under the OLD brush first."""
    model = tiny_model
    canvas = make_canvas(h=96, w=160, seed=12)
    model.begin_session(canvas)
    model.stamp_at(0, 0, return_pixels=False, **settings_small)
    assert model._pending_stamps
    model.set_brush(np.random.default_rng(5).random((64, 64, 3))
                    .astype(np.float32))
    assert not model._pending_stamps
    model.fetch_canvas()
    model.end_session()
