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


def _init_thunks(unet, vae_encoder, vae_decoder, patch_encoder,
                 resolution: int, seed: int = 0):
    """Per-component (init_fn, args) closures sharing the input shapes.

    Shapes use the smallest legal inputs; Flax params are shape-dependent
    only through channel dims, so resolution here need not match serving
    resolution.
    """
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
    latent = max(resolution // 8, 8)
    ctx_dim = unet.cfg.cross_attention_dim
    total = patch_encoder.cfg.total_patches
    clip_size = patch_encoder.cfg.clip.image_size

    sample = jnp.zeros((1, latent, latent, unet.cfg.in_channels))
    ctx = jnp.zeros((1, total, ctx_dim))
    img = jnp.zeros((1, resolution, resolution, 3))
    z = jnp.zeros((1, latent, latent, vae_decoder.cfg.latent_channels))
    patches = jnp.zeros((1, total, clip_size, clip_size, 3))
    return {
        "unet": (unet.init, (k1, sample, jnp.float32(0.0), ctx), {}),
        "vae_encoder": (vae_encoder.init, (k2, img), {}),
        "vae_decoder": (vae_decoder.init, (k3, z), {}),
        "patch_encoder": (
            lambda k, x: patch_encoder.init(k, x, True), (k4, patches), {}),
    }


def pipeline_param_shapes(unet, vae_encoder, vae_decoder, patch_encoder,
                          resolution: int = 64):
    """ShapeDtypeStruct trees of all four components via jax.eval_shape -
    pure host tracing, NO device compute or compile. The checkpoint
    loader validates against these instead of materializing a full
    random init it would throw away."""
    thunks = _init_thunks(unet, vae_encoder, vae_decoder, patch_encoder,
                          resolution)
    return {name: jax.eval_shape(fn, *args)["params"]
            for name, (fn, args, _) in thunks.items()}


def init_pipeline_params(unet, vae_encoder, vae_decoder, patch_encoder,
                         resolution: int, seed: int = 0, only=None):
    """Initialize modules' params with a fixed seed. `only`: optional
    iterable of component names to init (the loader fills in just the
    components missing from a checkpoint dir)."""
    thunks = _init_thunks(unet, vae_encoder, vae_decoder, patch_encoder,
                          resolution, seed)
    names = list(thunks) if only is None else [n for n in thunks if n in
                                               set(only)]
    # jit each init: one compiled program instead of hundreds of tiny eager
    # dispatches (critical on remote/tunneled TPU backends).
    params = {name: jax.jit(thunks[name][0])(*thunks[name][1])["params"]
              for name in names}
    if "unet" in params:
        n_params = sum(x.size for x in jax.tree.leaves(params["unet"]))
        logger.info("random-initialized pipeline params (unet %.1fM params)",
                    n_params / 1e6)
    return params
