"""Model shape/consistency tests on tiny configs (CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusiontexturepainting_tpu.core.config import (
    tiny_clip_config,
    tiny_patch_encoder_config,
    tiny_unet_config,
    tiny_vae_config,
)
from diffusiontexturepainting_tpu.models.clip_vit import CLIPVisionTower
from diffusiontexturepainting_tpu.models.patch_encoder import (
    ConditionPatchEncoder,
    build_patch_pyramid,
    build_pos_emb,
    positional_encoding_2d,
    positional_encoding_2d_flat,
)
from diffusiontexturepainting_tpu.models.unet import UNet2DCondition
from diffusiontexturepainting_tpu.models.vae import (
    VAEDecoder,
    VAEEncoder,
    latent_mode,
    sample_latents,
)


# compile-heavy: full-size models / whole-pipeline jit on CPU
pytestmark = pytest.mark.slow


def test_unet_shapes():
    cfg = tiny_unet_config()
    model = UNet2DCondition(cfg)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((3, 16, 16, 9))
    ctx = jnp.zeros((3, 14, cfg.cross_attention_dim))
    params = model.init(rng, sample, jnp.float32(1.0), ctx)["params"]
    out = model.apply({"params": params}, sample, jnp.float32(101.0), ctx)
    assert out.shape == (3, 16, 16, 4)
    assert out.dtype == jnp.float32


def test_unet_timestep_sensitivity():
    """Different timesteps must give different outputs (temb is wired)."""
    cfg = tiny_unet_config()
    model = UNet2DCondition(cfg)
    rng = jax.random.PRNGKey(1)
    sample = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 9))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 14, cfg.cross_attention_dim))
    params = model.init(rng, sample, jnp.float32(1.0), ctx)["params"]
    o1 = model.apply({"params": params}, sample, jnp.float32(1.0), ctx)
    o2 = model.apply({"params": params}, sample, jnp.float32(900.0), ctx)
    assert float(jnp.abs(o1 - o2).max()) > 1e-4


def test_unet_context_sensitivity():
    cfg = tiny_unet_config()
    model = UNet2DCondition(cfg)
    sample = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 9))
    ctx1 = jax.random.normal(jax.random.PRNGKey(3), (1, 14, cfg.cross_attention_dim))
    ctx2 = ctx1 + 1.0
    params = model.init(jax.random.PRNGKey(0), sample, 1.0, ctx1)["params"]
    o1 = model.apply({"params": params}, sample, 1.0, ctx1)
    o2 = model.apply({"params": params}, sample, 1.0, ctx2)
    assert float(jnp.abs(o1 - o2).max()) > 1e-4


def test_vae_roundtrip_shapes():
    cfg = tiny_vae_config()
    enc, dec = VAEEncoder(cfg), VAEDecoder(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    pe = enc.init(jax.random.PRNGKey(1), x)["params"]
    moments = enc.apply({"params": pe}, x)
    assert moments.shape == (2, 4, 4, 8)
    z = sample_latents(moments, jax.random.PRNGKey(2))
    assert z.shape == (2, 4, 4, 4)
    np.testing.assert_allclose(
        np.asarray(latent_mode(moments)), np.asarray(moments[..., :4]))
    pd = dec.init(jax.random.PRNGKey(3), z)["params"]
    img = dec.apply({"params": pd}, z)
    assert img.shape == (2, 32, 32, 3)


def test_clip_tower_shapes():
    cfg = tiny_clip_config()
    model = CLIPVisionTower(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (5, cfg.image_size, cfg.image_size, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (5, cfg.hidden_size)


def test_positional_encoding_reference_quirk():
    """The flat buffer must equal the raw C-order reinterpretation of the
    (C, s, s) code — the reference's `.view(1, n, C)` semantics."""
    C, n = 16, 4
    pos = positional_encoding_2d(C, 2, 2)
    flat = positional_encoding_2d_flat(C, n)
    np.testing.assert_array_equal(flat, pos.reshape(-1).reshape(n, C))
    # scale 1 is the clean case: flat == channel vector at (0,0)
    one = positional_encoding_2d_flat(C, 1)
    np.testing.assert_array_equal(one[0], positional_encoding_2d(C, 1, 1)[:, 0, 0])


def test_patch_pyramid_tiles():
    """Pyramid tiles must be the correct crops (checked for the 4-patch
    scale with a constant-per-quadrant image: no interpolation happens at
    quadrant interiors)."""
    img = np.zeros((1, 32, 32, 3), np.float32)
    img[:, :16, :16] = 1.0
    img[:, :16, 16:] = 2.0
    img[:, 16:, :16] = 3.0
    img[:, 16:, 16:] = 4.0
    pyr = np.asarray(build_patch_pyramid(jnp.asarray(img), (1, 4), out_size=32))
    assert pyr.shape == (1, 5, 32, 32, 3)
    for i, val in enumerate([1.0, 2.0, 3.0, 4.0]):
        np.testing.assert_allclose(pyr[0, 1 + i], val, atol=1e-6)


def test_patch_encoder_shapes():
    cfg = tiny_patch_encoder_config()
    model = ConditionPatchEncoder(cfg)
    patches = jax.random.normal(
        jax.random.PRNGKey(0),
        (2, cfg.total_patches, cfg.clip.image_size, cfg.clip.image_size, 3))
    params = model.init(jax.random.PRNGKey(1), patches, True)["params"]
    cond, uncond = model.apply({"params": params}, patches,
                               return_uncond_vector=True)
    assert cond.shape == (2, cfg.total_patches, cfg.cross_attention_dim)
    assert uncond.shape == (1, cfg.total_patches, cfg.cross_attention_dim)


def test_pos_emb_total_shape():
    cfg = tiny_patch_encoder_config()
    pos = build_pos_emb(cfg)
    assert pos.shape == (cfg.total_patches, cfg.hid_size)
