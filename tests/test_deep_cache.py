"""DeepCache-style UNet feature caching tests (tiny models, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusiontexturepainting_tpu.core.config import (
    PipelineConfig,
    tiny_unet_config,
)
from diffusiontexturepainting_tpu.models.unet import UNet2DCondition
from diffusiontexturepainting_tpu.pipeline.tpu_model import TPUConditionalInpainter


# compile-heavy: full-size models / whole-pipeline jit on CPU
pytestmark = pytest.mark.slow


def test_forward_shallow_uses_cache():
    cfg = tiny_unet_config()
    unet = UNet2DCondition(cfg)
    sample = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 9))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 14, cfg.cross_attention_dim))
    params = unet.init(jax.random.PRNGKey(2), sample, 1.0, ctx)["params"]

    full_out, cache = unet.apply({"params": params}, sample, 500.0, ctx,
                                 method=UNet2DCondition.forward_full)
    assert cache.shape[:3] == (1, 16, 16)
    # __call__ must equal forward_full's primary output
    plain = unet.apply({"params": params}, sample, 500.0, ctx)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(full_out),
                               atol=1e-6)

    shallow = unet.apply({"params": params}, sample, 500.0, ctx, cache,
                         method=UNet2DCondition.forward_shallow)
    assert shallow.shape == full_out.shape
    # with the true cache at the same timestep, shallow == full exactly
    np.testing.assert_allclose(np.asarray(shallow), np.asarray(full_out),
                               atol=1e-5)
    # a different cache changes the output (the cache is actually used)
    shallow2 = unet.apply({"params": params}, sample, 500.0, ctx, cache + 1.0,
                          method=UNet2DCondition.forward_shallow)
    assert np.abs(np.asarray(shallow2) - np.asarray(shallow)).max() > 1e-3


@pytest.fixture(scope="module")
def cached_model():
    return TPUConditionalInpainter(
        resolution=64, tiny=True, warmup=False, verbose_timing=False,
        config=PipelineConfig(deep_cache_interval=2, deep_cache_min_steps=4))


def test_deep_cache_pipeline_runs(cached_model):
    canvas = np.zeros((64, 64, 4), np.float32)
    canvas[:16, :, 3] = 1.0
    out = cached_model.generate(canvas, steps=4)  # interval 2, even steps
    assert out.shape == (64, 64, 3)
    out5 = cached_model.generate(canvas, steps=5)  # odd: exercises the tail
    assert out5.shape == (64, 64, 3)


def test_deep_cache_below_min_steps_disabled(cached_model):
    canvas = np.zeros((64, 64, 4), np.float32)
    canvas[:16, :, 3] = 1.0
    cached_model.generate(canvas, steps=2)
    assert (64, 2, 1) in cached_model.engine._stamp  # interval forced to 1


def test_deep_cache_pattern_semantics(cached_model):
    """Explicit F/S patterns: all-'F' reproduces the exact pipeline, and
    'FSFS' reproduces the uniform interval-2 schedule (same full/shallow
    placement, scan-grouped vs unrolled trace)."""
    brush = np.random.default_rng(1).random((64, 64, 3)).astype(np.float32)
    cached_model.set_brush(brush)
    canvas = np.zeros((64, 64, 4), np.float32)
    canvas[:16, :, 3] = 1.0

    def run(interval, steps=4):
        cached_model.set_deep_cache(interval, min_steps=4)
        cached_model._request_counter = 7  # same RNG stream per run
        return cached_model.generate_raw(canvas, steps=steps)

    exact = run(1)
    interval2 = run(2)
    np.testing.assert_allclose(run("FFFF"), exact, atol=2e-3)
    np.testing.assert_allclose(run("FSFS"), interval2, atol=2e-3)
    assert np.abs(run("FSSF") - exact).max() > 0.0  # distinct schedule
    cached_model.set_deep_cache(2, min_steps=4)  # restore fixture state


def test_deep_cache_pattern_validation(cached_model):
    from diffusiontexturepainting_tpu.pipeline.inpaint import _cache_flags

    assert _cache_flags(1, 4) is None
    assert _cache_flags(2, 4) is None
    assert _cache_flags("FSSF", 4) == [False, True, True, False]
    with pytest.raises(ValueError, match="must start with 'F'"):
        _cache_flags("SFFF", 4)
    with pytest.raises(ValueError, match="length"):
        _cache_flags("FS", 4)
    with pytest.raises(ValueError, match="only 'F'/'S'"):
        _cache_flags("FXFX", 4)
    # a pattern only applies to its own step count: other counts run exact
    cached_model.set_deep_cache("FSSF", min_steps=4)
    assert cached_model._cache_interval(4) == "FSSF"
    assert cached_model._cache_interval(5) == 1
    cached_model.set_deep_cache(2, min_steps=4)


def test_pattern_bypasses_min_steps(cached_model):
    """A pattern is an explicit opt-in at its own iteration count: it
    must apply even under the default deep_cache_min_steps=8 gate (the
    serving CLI never lowers min_steps, so gating patterns made the
    documented `--deep-cache-interval FSSF` a silent no-op)."""
    cached_model.set_deep_cache("FSFS", min_steps=8)
    try:
        assert cached_model._cache_interval(4) == "FSFS"
        # the gate still applies to uniform intervals
        cached_model.set_deep_cache(2, min_steps=8)
        assert cached_model._cache_interval(4) == 1
    finally:
        cached_model.set_deep_cache(2, min_steps=4)


def test_pattern_matches_scheduler_iterations():
    """Pattern applicability is decided against the SCHEDULER's model-call
    count, not the wire step count: PNDM runs steps+1 iterations, so a
    4-char pattern at steps=4 must fall back to exact (it used to pass
    the length check here and then crash inside make_stamp_fn) and a
    5-char pattern is the one that applies."""
    m = TPUConditionalInpainter(
        resolution=64, tiny=True, warmup=False, verbose_timing=False,
        config=PipelineConfig(scheduler="PNDM",
                              deep_cache_interval="FSSF"))
    assert m._cache_interval(4) == 1  # len 4 != PNDM's 5 iterations
    m.set_deep_cache("FSSFS"[:5])
    assert m._cache_interval(4) == "FSSFS"


def test_f32_final_step_rejects_s_terminated_pattern_at_ctor():
    """An S-terminated pattern + f32_final_step is an invalid CONFIG: it
    must fail at model construction (startup), not per-request inside
    the handler (which swallows errors, hanging the client)."""
    with pytest.raises(ValueError, match="F'-terminated"):
        TPUConditionalInpainter(
            resolution=64, tiny=True, warmup=False, verbose_timing=False,
            config=PipelineConfig(f32_final_step=True,
                                  deep_cache_interval="FSFS"))


def test_f32_final_step_with_uniform_interval(cached_model):
    """f32_final_step composes with a UNIFORM DeepCache interval even
    when n_iters % interval == 0 (the derived pattern used to anchor
    full evals at step 0, leaving the final step shallow and raising at
    build time for e.g. interval 2 at 4 or 20 steps)."""
    m = TPUConditionalInpainter(
        resolution=64, tiny=True, warmup=False, verbose_timing=False,
        config=PipelineConfig(f32_final_step=True, deep_cache_interval=2,
                              deep_cache_min_steps=4))
    m.params = cached_model.params
    brush = np.random.default_rng(3).random((64, 64, 3)).astype(np.float32)
    m.set_brush(brush)
    canvas = np.zeros((64, 64, 4), np.float32)
    canvas[:16, :, 3] = 1.0
    out = m.generate(canvas, steps=4)  # 4 % 2 == 0: the crashing case
    assert out.shape == (64, 64, 3)


def test_f32_final_step_pipeline(cached_model):
    """f32_final_step: runs end-to-end, differs from the all-one-dtype
    pipeline only through the final step's compute dtype, and composes
    with an F-terminated DeepCache pattern (S-terminated is rejected)."""
    from diffusiontexturepainting_tpu.pipeline.inpaint import make_stamp_fn

    brush = np.random.default_rng(2).random((64, 64, 3)).astype(np.float32)
    canvas = np.zeros((64, 64, 4), np.float32)
    canvas[:16, :, 3] = 1.0

    def build(**cfg_kw):
        m = TPUConditionalInpainter(
            resolution=64, tiny=True, warmup=False, verbose_timing=False,
            config=PipelineConfig(deep_cache_min_steps=4, **cfg_kw))
        m.params = cached_model.params
        m.set_brush(brush)
        m._request_counter = 9
        return m

    plain = build().generate_raw(canvas, steps=4)
    promoted = build(f32_final_step=True).generate_raw(canvas, steps=4)
    assert promoted.shape == plain.shape
    # CPU tests run everything in f32, so the promoted path is
    # numerically identical math - outputs must agree tightly
    np.testing.assert_allclose(promoted, plain, atol=2e-3)

    combo = build(f32_final_step=True,
                  deep_cache_interval="FSSF").generate_raw(canvas, steps=4)
    assert combo.shape == plain.shape

    # rejected at CONSTRUCTION now (startup validation), not per-request
    with pytest.raises(ValueError, match="F'-terminated"):
        build(f32_final_step=True, deep_cache_interval="FFFS")

    engine = cached_model.engine
    with pytest.raises(ValueError, match="unet_final_apply"):
        make_stamp_fn(
            engine.models.__class__(**{
                **engine.models.__dict__, "unet_final_apply": None}),
            "DDIM", 4, final_step_f32=True)


def test_deep_cache_close_to_uncached(cached_model):
    """Cached trajectory should stay in the neighborhood of the exact one
    (same weights, same noise)."""
    exact = TPUConditionalInpainter(resolution=64, tiny=True, warmup=False,
                                    verbose_timing=False)
    exact.params = cached_model.params
    brush = np.random.default_rng(0).random((64, 64, 3)).astype(np.float32)
    cached_model.set_brush(brush)
    exact.set_brush(brush)
    canvas = np.zeros((64, 64, 4), np.float32)
    canvas[:16, :, 3] = 1.0
    cached_model._request_counter = 50
    exact._request_counter = 50
    a = cached_model.generate_raw(canvas, steps=8)
    b = exact.generate_raw(canvas, steps=8)
    assert np.abs(a - b).mean() < 0.12  # same neighborhood, not identical
    assert np.abs(a - b).max() > 0.0  # actually took the cached path
