"""Overlapped startup: the ctor warms stamp programs in a thread with
dummy zero params whose avals match the post-cast real params, so the
real-params calls MUST hit the already-warm jit cache entry (a silent
re-compile would erase the overlap win; pipeline/tpu_model.py
_warm_with_dummy_params)."""

import numpy as np
import pytest

import jax.numpy as jnp

from diffusiontexturepainting_tpu.pipeline.tpu_model import (
    TPUConditionalInpainter,
)


def _stamp_cache_size(model, res, steps):
    fn = model.engine.stamp_fn(res, steps, model._cache_interval(steps))
    # _guard wraps the jitted program; .current() is the live jit fn
    jitted = fn.current() if hasattr(fn, "current") else fn
    return jitted._cache_size()


def _drive(model):
    rng = np.random.default_rng(0)
    model.set_brush(rng.random((64, 64, 3)).astype(np.float32))
    canvas = np.zeros((64, 64, 4), np.uint8)
    canvas[:16, :, 3] = 255
    return model.generate_u8(canvas, steps=2, cfg_weight=2.0, tg_weight=1.0,
                             tg_steps=2, context_pad=16)


def test_async_warmup_hits_real_param_avals():
    model = TPUConditionalInpainter(resolution=64, tiny=True, warmup=True,
                                    warmup_points=[(64, 2)],
                                    verbose_timing=False)
    # the thread's compile/load seconds are the recorded attribution
    assert (64, 2, 1) in model.warmup_timings
    assert _stamp_cache_size(model, 64, 2) == 1
    out = _drive(model)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
    # the real-params call reused the dummy-warmed entry - no 2nd compile
    assert _stamp_cache_size(model, 64, 2) == 1


@pytest.mark.slow
def test_async_warmup_bf16_with_override():
    model = TPUConditionalInpainter(
        resolution=64, tiny=True, warmup=True, warmup_points=[(64, 2)],
        dtype=jnp.bfloat16, dtype_overrides={"vae_decoder": jnp.float32},
        verbose_timing=False)
    assert (64, 2, 1) in model.warmup_timings
    out = _drive(model)
    assert out.shape == (64, 64, 3)
    assert _stamp_cache_size(model, 64, 2) == 1
