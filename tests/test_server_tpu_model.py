"""Full-stack integration: websocket server backed by the REAL pipeline
(tiny model, CPU backend) driven by the headless client - covers handler,
native codec, uint8 fast path, brush encode, stamp program, compositing.

The analog of BASELINE config 5 ("end-to-end websocket server,
multi-stroke session") at test scale.
"""

import threading

import jax

import numpy as np
import pytest
import tornado.httpserver
import tornado.ioloop
import tornado.netutil

from diffusiontexturepainting_tpu.serving.run import create_server


# compile-heavy: full-size models / whole-pipeline jit on CPU
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tpu_server():
    from diffusiontexturepainting_tpu.pipeline.tpu_model import (
        TPUConditionalInpainter)

    model = TPUConditionalInpainter(resolution=64, tiny=True, warmup=False,
                                    verbose_timing=False)
    holder = {}
    started = threading.Event()

    def run():
        import asyncio

        asyncio.set_event_loop(asyncio.new_event_loop())
        loop = tornado.ioloop.IOLoop.current()
        app = create_server(model=model)
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


def test_multi_stroke_session(tpu_server):
    from diffusiontexturepainting_tpu.client.websocket_model import (
        WebsocketConditionalInpainter)

    client = WebsocketConditionalInpainter(
        f"ws://127.0.0.1:{tpu_server}/websocket/", resolution=64)
    rng = np.random.default_rng(0)

    settings = dict(steps=2, width=64, context_pad=10, cfg_weight=2.0,
                    tg_weight=1.0, tg_steps=2)

    # stroke 1
    client.set_brush(rng.random((80, 70, 3)).astype(np.float32))
    canvas = np.zeros((64, 64, 4), np.float32)
    canvas[:16, :, 3] = 1.0
    canvas[:16, :, :3] = 0.4
    preview = client.generate_raw(canvas, **settings)  # NEW_BRUSH round trip
    assert preview.shape == (64, 64, 3)
    for _ in range(3):
        out = client.generate(canvas, **settings)
        np.testing.assert_allclose(out[:16], 0.4, atol=2 / 255)
        canvas[..., :3] = out
        canvas[..., 3] = 1.0

    # stroke 2 with a different brush mid-session
    client.set_brush(rng.random((64, 64, 3)).astype(np.float32))
    canvas2 = np.zeros((64, 64, 4), np.float32)
    canvas2[:, :32, :3] = canvas[:, :32, :3]
    canvas2[:, :32, 3] = 1.0
    out2 = client.generate(canvas2, **settings)
    np.testing.assert_allclose(out2[:, :32], canvas2[:, :32, :3], atol=2 / 255)
    client.close()


def test_reload_params_hot_swap(tmp_path):
    """Weight hot-swap (the TRT refit analog) keeps compiled programs and
    changes outputs; params stay in the serving dtype."""
    import jax.numpy as jnp

    from diffusiontexturepainting_tpu.pipeline.tpu_model import (
        TPUConditionalInpainter)

    model = TPUConditionalInpainter(resolution=64, tiny=True, warmup=False,
                                    verbose_timing=False, seed=1)
    canvas = np.zeros((64, 64, 4), np.float32)
    canvas[:16, :, 3] = 1.0
    model._request_counter = 7
    before = model.generate_raw(canvas, steps=2)
    n_programs = len(model.engine._stamp)

    perturbed = jax.tree_util.tree_map(
        lambda a: a * 1.05 if jnp.issubdtype(a.dtype, jnp.floating) else a,
        model.params)
    model.params = model._cast_params_for_serving(perturbed)
    model.set_brush(model.image)
    model._request_counter = 7
    after = model.generate_raw(canvas, steps=2)
    assert len(model.engine._stamp) == n_programs  # no recompilation
    assert np.abs(before - after).max() > 1e-3  # weights actually swapped
    # serving dtype preserved through the cast helper
    leaf = jax.tree_util.tree_leaves(model.params)[0]
    expected = jnp.bfloat16 if model.dtype == jnp.bfloat16 else leaf.dtype
    assert leaf.dtype == expected
