"""Seeded random parameter initialization.

Used when no trained checkpoint is available (benchmarks, tests, cold
dev environments) - the latency/compile behavior of the pipeline is
weight-independent. The serving loader (weights/loader.py) replaces these
with converted SD-1.5 + LoRA + image-encoder checkpoints when present.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)


def init_pipeline_params(unet, vae_encoder, vae_decoder, patch_encoder,
                         resolution: int, seed: int = 0):
    """Initialize all four modules' params with a fixed seed.

    Shapes use the smallest legal inputs; Flax params are shape-dependent
    only through channel dims, so resolution here need not match serving
    resolution.
    """
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
    latent = max(resolution // 8, 8)
    ctx_dim = unet.cfg.cross_attention_dim
    total = patch_encoder.cfg.total_patches
    clip_size = patch_encoder.cfg.clip.image_size

    # jit each init: one compiled program instead of hundreds of tiny eager
    # dispatches (critical on remote/tunneled TPU backends).
    sample = jnp.zeros((1, latent, latent, unet.cfg.in_channels))
    ctx = jnp.zeros((1, total, ctx_dim))
    unet_params = jax.jit(unet.init)(k1, sample, jnp.float32(0.0), ctx)["params"]

    img = jnp.zeros((1, resolution, resolution, 3))
    enc_params = jax.jit(vae_encoder.init)(k2, img)["params"]

    z = jnp.zeros((1, latent, latent, vae_decoder.cfg.latent_channels))
    dec_params = jax.jit(vae_decoder.init)(k3, z)["params"]

    patches = jnp.zeros((1, total, clip_size, clip_size, 3))
    pe_params = jax.jit(patch_encoder.init, static_argnums=2)(
        k4, patches, True)["params"]

    n_params = sum(x.size for x in jax.tree.leaves(unet_params))
    logger.info("random-initialized pipeline params (unet %.1fM params)",
                n_params / 1e6)
    return {
        "unet": unet_params,
        "vae_encoder": enc_params,
        "vae_decoder": dec_params,
        "patch_encoder": pe_params,
    }
