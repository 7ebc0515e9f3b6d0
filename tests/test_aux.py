"""Auxiliary subsystem tests: async save, brush history, settings,
profiling table, checkerboard, txt2img offline fallback, param hot-swap."""

import pytest

import os

import numpy as np

from diffusiontexturepainting_tpu.client.history import BrushHistoryQueue
from diffusiontexturepainting_tpu.client.nvcf_txt2img import procedural_brush
from diffusiontexturepainting_tpu.utils import settings
from diffusiontexturepainting_tpu.utils.async_save import (
    save_npy_async,
    save_png_async,
    wait_all,
)
from diffusiontexturepainting_tpu.utils.profiling import StageTimer, percentile_stats
from diffusiontexturepainting_tpu.utils.textures import blank, checkerboard


# compile-heavy: full-size models / whole-pipeline jit on CPU
pytestmark = pytest.mark.slow


def test_async_saves(tmp_path):
    tex = np.random.default_rng(0).random((16, 16, 4)).astype(np.float32)
    futs = [
        save_npy_async(str(tmp_path / "t.npy"), tex),
        save_png_async(str(tmp_path / "t.png"), tex),
    ]
    paths = wait_all(futs)
    assert all(os.path.exists(p) for p in paths)
    np.testing.assert_array_equal(np.load(tmp_path / "t.npy"), tex)


def test_brush_history_dedup_and_order():
    q = BrushHistoryQueue(maxlen=3)
    a = np.zeros((4, 4, 3), np.uint8)
    b = np.ones((4, 4, 3), np.uint8)
    q.push(a)
    q.push(b)
    q.push(a)  # re-push moves to front, no duplicate
    assert len(q) == 2
    np.testing.assert_array_equal(q.items()[0], a)
    for i in range(5):
        q.push(np.full((4, 4, 3), 10 + i, np.uint8))
    assert len(q) == 3


def test_settings_resolution_order(monkeypatch):
    assert settings.get("DTP_RESOLUTION") == "256"
    settings.set_override("DTP_RESOLUTION", 512)
    assert settings.get("DTP_RESOLUTION") == "512"
    monkeypatch.setenv("DTP_RESOLUTION", "1024")
    assert settings.get("DTP_RESOLUTION") == "1024"


def test_stage_timer_table():
    t = StageTimer()
    with t.stage("unet"):
        pass
    with t.stage("unet"):
        pass
    with t.stage("vae"):
        pass
    table = t.summary()
    assert "unet" in table and "vae" in table and "p50" in table
    stats = percentile_stats([1.0, 2.0, 3.0, 4.0])
    assert stats["p50"] == 3.0 and stats["n"] == 4


def test_checkerboard():
    tex = checkerboard(32, cell=8)
    assert tex.shape == (32, 32, 4)
    assert not np.allclose(tex[0, 0, :3], tex[0, 8, :3])
    np.testing.assert_array_equal(tex[0, 0, :3], tex[0, 16, :3])
    assert blank(8).shape == (8, 8, 4)


def test_procedural_brush_deterministic():
    a = procedural_brush("moss", 64)
    b = procedural_brush("moss", 64)
    c = procedural_brush("bricks", 64)
    assert a.shape == (64, 64, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_reload_params_hot_swap(tmp_path):
    from diffusiontexturepainting_tpu.pipeline.tpu_model import (
        TPUConditionalInpainter)
    from diffusiontexturepainting_tpu.weights.loader import save_pipeline_params

    model = TPUConditionalInpainter(resolution=64, tiny=True, warmup=False,
                                    verbose_timing=False)
    # export current params, perturb nothing; reload must keep it working
    ckpt = str(tmp_path / "ckpt")
    save_pipeline_params(ckpt, model.params)
    fn_before = model.engine.stamp_fn(64, 2)
    model.reload_params(ckpt)
    assert model.engine.stamp_fn(64, 2) is fn_before  # no recompile
    canvas = np.zeros((64, 64, 4), np.float32)
    canvas[:8, :, 3] = 1.0
    out = model.generate(canvas, steps=2)
    assert out.shape == (64, 64, 3)


def test_f32_components_serving_flag(tmp_path):
    """--f32-components: unknown names rejected before model build;
    a valid override computes that component in f32 and still serves
    (the fidelity-critical deployment path, README bf16-tail bisect)."""
    import jax.numpy as jnp

    from diffusiontexturepainting_tpu.pipeline.tpu_model import (
        TPUConditionalInpainter)
    from diffusiontexturepainting_tpu.serving.run import create_server

    with pytest.raises(ValueError, match="unknown --f32-components"):
        create_server(resolution=64, warmup=False,
                      f32_components=["bogus"])

    model = TPUConditionalInpainter(resolution=64, tiny=True, warmup=False,
                                    verbose_timing=False,
                                    dtype_overrides={"unet": jnp.float32})
    assert model.unet.dtype == jnp.float32
    canvas = np.zeros((64, 64, 4), np.float32)
    canvas[:8, :, 3] = 1.0
    out = model.generate(canvas, steps=2)
    assert out.shape == (64, 64, 3)
