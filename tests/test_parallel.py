"""Mesh + sharded execution tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from diffusiontexturepainting_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_spec,
    shard_params,
)


# compile-heavy: full-size models / whole-pipeline jit on CPU
pytestmark = pytest.mark.slow


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data=16, model=1)


def test_param_spec_rules():
    assert param_spec((64, 128), 2) == P(None, "model")
    assert param_spec((3, 3, 16, 64), 2) == P(None, None, None, "model")
    assert param_spec((7,), 2) == P()  # indivisible -> replicate
    assert param_spec((2,), 2) == P()  # too small -> replicate


def test_shard_params_places_leaves():
    mesh = make_mesh(data=4, model=2)
    params = {"w": np.ones((8, 64), np.float32), "b": np.ones((7,), np.float32)}
    placed = shard_params(params, mesh)
    assert placed["w"].sharding.spec == P(None, "model")
    assert placed["b"].sharding.spec == P()


def test_parallel_stamp_engine_batch():
    """8 stamps sharded over 8 CPU devices through the vmapped program."""
    from diffusiontexturepainting_tpu.core.config import (
        tiny_unet_config, tiny_vae_config, tiny_patch_encoder_config)
    from diffusiontexturepainting_tpu.models.unet import UNet2DCondition
    from diffusiontexturepainting_tpu.models.vae import VAEDecoder, VAEEncoder
    from diffusiontexturepainting_tpu.models.patch_encoder import (
        ConditionPatchEncoder)
    from diffusiontexturepainting_tpu.parallel.serving import ParallelStampEngine
    from diffusiontexturepainting_tpu.pipeline.inpaint import StampModels
    from diffusiontexturepainting_tpu.weights.random_init import (
        init_pipeline_params)

    ucfg, vcfg, pcfg = (tiny_unet_config(), tiny_vae_config(),
                        tiny_patch_encoder_config())
    unet = UNet2DCondition(ucfg)
    venc, vdec = VAEEncoder(vcfg), VAEDecoder(vcfg)
    pe = ConditionPatchEncoder(pcfg)
    params = init_pipeline_params(unet, venc, vdec, pe, resolution=64)

    models = StampModels(
        unet_apply=lambda p, s, t, c: unet.apply({"params": p}, s, t, c),
        vae_encode_apply=lambda p, x: venc.apply({"params": p}, x),
        vae_decode_apply=lambda p, z: vdec.apply({"params": p}, z),
        params=None)
    mesh = make_mesh(data=8, model=1)
    engine = ParallelStampEngine(models, "DDIM", mesh)

    B, res = 8, 64
    rng = np.random.default_rng(0)
    canvases = rng.integers(0, 256, (B, 1, res, res, 4), np.uint8)
    brushes = rng.random((B, 1, res, res, 3)).astype(np.float32)
    ctx_dim = ucfg.cross_attention_dim
    total = pcfg.total_patches
    conds = rng.standard_normal((B, 1, total, ctx_dim)).astype(np.float32)
    unconds = rng.standard_normal((B, 1, total, ctx_dim)).astype(np.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    with mesh:
        raw, comp = engine.stamp_batch(
            {k: v for k, v in params.items() if k != "patch_encoder"},
            canvases, brushes, conds, unconds, keys,
            np.full((B,), 2.0, np.float32), np.full((B,), 1.0, np.float32),
            np.full((B,), 2, np.int32), np.full((B,), 10, np.int32), steps=2)
    raw, comp = np.asarray(raw), np.asarray(comp)
    assert raw.shape == (B, res, res, 3) and comp.shape == (B, res, res, 3)
    # per-request settings vary within one batch without recompiling
    with mesh:
        raw2, _ = engine.stamp_batch(
            {k: v for k, v in params.items() if k != "patch_encoder"},
            canvases, brushes, conds, unconds, keys,
            np.linspace(1.0, 6.0, B).astype(np.float32),
            np.zeros((B,), np.float32),
            np.zeros((B,), np.int32), np.full((B,), 30, np.int32), steps=2)
    assert len(engine._fns) == 1
    assert np.abs(np.asarray(raw2).astype(int) - raw.astype(int)).max() > 0


def test_cfg_branch_sharding_matches_single_device():
    """--mesh model=3 (parallel/cfg_shard.py): the CFG triple-batch UNet
    sharded one branch per chip produces the same stamp as the unsharded
    model - branches are independent until the guidance combine, so the
    only cross-chip traffic is the gathered eps."""
    from diffusiontexturepainting_tpu.parallel.cfg_shard import make_cfg_mesh
    from diffusiontexturepainting_tpu.pipeline.tpu_model import (
        TPUConditionalInpainter,
    )

    if len(jax.devices()) < 3:
        pytest.skip("needs >= 3 devices")

    res = 64
    rng = np.random.default_rng(0)
    brush = rng.random((res, res, 3)).astype(np.float32)
    canvas = np.zeros((res, res, 4), np.float32)
    canvas[: res // 2, :, :3] = rng.random((res // 2, res, 3))
    canvas[: res // 2, :, 3] = 1.0
    settings = dict(steps=2, cfg_weight=2.0, tg_weight=1.0, tg_steps=2,
                    context_pad=8)

    plain = TPUConditionalInpainter(res, tiny=True, warmup=False,
                                    verbose_timing=False)
    sharded = TPUConditionalInpainter(res, tiny=True, warmup=False,
                                      verbose_timing=False,
                                      cfg_mesh=make_cfg_mesh(3))
    sharded.params = plain.params
    for m in (plain, sharded):
        m.set_brush(brush)
        m._request_counter = 11
    a = plain.generate_u8((canvas * 255).astype(np.uint8), **settings)
    b = sharded.generate_u8((canvas * 255).astype(np.uint8), **settings)
    # identical math, different partitioning: allow 1 u8 LSB of
    # reassociation noise
    assert np.abs(a.astype(np.int32) - b.astype(np.int32)).max() <= 1

    # stroke-session path composes with the sharded UNet too
    big = np.zeros((res, 2 * res, 4), np.uint8)
    sharded.begin_session(big)
    sharded.stamp_at(0, 0, return_pixels=False, **settings)
    fetched = sharded.fetch_canvas()
    sharded.end_session()
    assert fetched[..., 3].sum() > 0


def test_cfg_mesh_requires_three():
    from diffusiontexturepainting_tpu.parallel.cfg_shard import (
        cfg_sharded_models, make_cfg_mesh)
    from diffusiontexturepainting_tpu.pipeline.inpaint import StampModels

    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:2]), ("model",))
    models = StampModels(unet_apply=lambda *a: None,
                         vae_encode_apply=None, vae_decode_apply=None,
                         params=None)
    with pytest.raises(ValueError, match="'model'=3"):
        cfg_sharded_models(models, mesh)
