"""End-to-end pipeline tests on tiny models (CPU backend).

The TPU analog of BASELINE.json configs 1-3 at test scale: single stamp,
image-conditioned stamp, and a 4-stamp stroke with canvas continuity.
"""

import numpy as np
import pytest

from diffusiontexturepainting_tpu.pipeline.tpu_model import TPUConditionalInpainter


# compile-heavy: full-size models / whole-pipeline jit on CPU
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def model():
    return TPUConditionalInpainter(resolution=64, tiny=True, warmup=False,
                                   verbose_timing=False)


def test_single_stamp(model):
    """BASELINE config 1 analog: single stamp through the full program."""
    canvas = np.zeros((64, 64, 4), np.float32)
    canvas[:16, :, :3] = 0.7
    canvas[:16, :, 3] = 1.0
    out = model.generate(canvas, steps=2)
    assert out.shape == (64, 64, 3)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0
    # painted area preserved by compositing
    np.testing.assert_allclose(out[:16], canvas[:16, :, :3], atol=1 / 255 + 1e-6)


def test_brush_conditioning_changes_output(model):
    """BASELINE config 2 analog: set_brush feeds cross-attention."""
    canvas = np.zeros((64, 64, 4), np.float32)
    canvas[:8, :, 3] = 1.0
    rng = np.random.default_rng(0)

    model.set_brush(rng.random((80, 90, 3)).astype(np.float32))
    ctr = model._request_counter
    out1 = model.generate_raw(canvas, steps=2)
    model.set_brush(rng.random((64, 64, 3)).astype(np.float32))
    model._request_counter = ctr  # same latent noise, different conditioning
    out2 = model.generate_raw(canvas, steps=2)
    assert np.abs(out1 - out2).max() > 1e-3


def test_settings_are_dynamic_no_recompile(model):
    """cfg/tg/pad changes reuse the same compiled program."""
    canvas = np.zeros((64, 64, 4), np.float32)
    canvas[:8, :, 3] = 1.0
    fn1 = model.engine.stamp_fn(64, 2)
    model.generate(canvas, steps=2, cfg_weight=1.5, tg_weight=0.0, context_pad=10)
    model.generate(canvas, steps=2, cfg_weight=4.0, tg_weight=2.0, context_pad=40)
    fn2 = model.engine.stamp_fn(64, 2)
    assert fn1 is fn2
    jitted = fn1.current() if hasattr(fn1, "current") else fn1
    assert jitted._cache_size() == 1


def test_cfg_weight_changes_output(model):
    canvas = np.zeros((64, 64, 4), np.float32)
    canvas[:8, :, 3] = 1.0
    ctr = model._request_counter
    o1 = model.generate_raw(canvas, steps=2, cfg_weight=1.0)
    model._request_counter = ctr
    o2 = model.generate_raw(canvas, steps=2, cfg_weight=6.0)
    assert np.abs(o1 - o2).max() > 1e-3


def test_determinism_with_same_counter(model):
    canvas = np.zeros((64, 64, 4), np.float32)
    canvas[:8, :, 3] = 1.0
    ctr = model._request_counter
    o1 = model.generate_raw(canvas, steps=2)
    model._request_counter = ctr
    o2 = model.generate_raw(canvas, steps=2)
    np.testing.assert_array_equal(o1, o2)


def test_stroke_continuity(model):
    """BASELINE config 3 analog: sequential overlapping stamps; painted
    content must survive every subsequent stamp exactly."""
    rng = np.random.default_rng(1)
    model.set_brush(rng.random((64, 64, 3)).astype(np.float32))
    canvas = np.zeros((64, 64, 4), np.float32)
    for i in range(4):
        out = model.generate(canvas, steps=2)
        # shift window: keep the right half as "already painted"
        prev_right = out[:, 32:].copy()
        canvas = np.zeros((64, 64, 4), np.float32)
        canvas[:, :32, :3] = prev_right
        canvas[:, :32, 3] = 1.0
        out2 = model.generate(canvas, steps=2)
        np.testing.assert_allclose(out2[:, :32], prev_right, atol=1 / 255 + 1e-6)
        canvas[:, 32:, :3] = out2[:, 32:]
        canvas[:, 32:, 3] = 1.0


def test_preview_program(model):
    """Brush preview: quadrant-known canvas built on device."""
    import jax
    import jax.numpy as jnp

    fn = model.engine.preview_fn(64, 2)
    brush = jnp.asarray(np.random.default_rng(2).random((1, 64, 64, 3)),
                        jnp.float32)
    raw, comp = fn(model.params, brush, model._cond, model._uncond,
                   jax.random.PRNGKey(0), jnp.uint32(0), jnp.float32(2.0),
                   jnp.float32(1.0), jnp.int32(2), jnp.int32(20))
    raw, comp = np.asarray(raw), np.asarray(comp)
    assert raw.shape == (64, 64, 3) and comp.shape == (64, 64, 3)
    # known quadrant must equal the brush content in the composited output
    brush_np = np.asarray(brush[0])
    np.testing.assert_allclose(comp[:32, :32] / 255.0, brush_np[:32, :32],
                               atol=2 / 255)
