"""Checkpoint loading for the serving pipeline.

Native format: one `.npz` per component (flattened '/'-joined param paths)
under a checkpoint directory:
    unet.npz  vae_encoder.npz  vae_decoder.npz  patch_encoder.npz
produced by weights/convert.py (from HF SD-1.5 + reference LoRA/encoder
torch checkpoints) or by our own training loop.

The reference's equivalents: HF hub download + LoRA fusion at engine
build (models.py:1036-1095) and `image_encoder.pth` torch load
(trt_model.py:57-61).
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np

logger = logging.getLogger(__name__)

COMPONENTS = ("unet", "vae_encoder", "vae_decoder", "patch_encoder")


def flatten_params(params, prefix=""):
    out = {}
    for k, v in params.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_params(v, path))
        elif isinstance(v, jax.ShapeDtypeStruct):
            # shape-reference trees from jax.eval_shape (loader
            # validation) - only .shape is consulted
            out[path] = v
        else:
            out[path] = np.asarray(v)
    return out


def unflatten_params(flat):
    tree = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_component(path: str, params):
    np.savez(path, **flatten_params(jax.device_get(params)))


def load_component(path: str):
    with np.load(path) as data:
        return unflatten_params({k: data[k] for k in data.files})


def save_pipeline_params(checkpoint_dir: str, params: dict):
    os.makedirs(checkpoint_dir, exist_ok=True)
    for name in COMPONENTS:
        if name in params:
            save_component(os.path.join(checkpoint_dir, f"{name}.npz"),
                           params[name])


def _validate(name, loaded, reference):
    """Check the loaded tree matches the module's expected structure."""
    ref_flat = flatten_params(reference)
    got_flat = flatten_params(loaded)
    missing = sorted(set(ref_flat) - set(got_flat))
    extra = sorted(set(got_flat) - set(ref_flat))
    if missing or extra:
        raise ValueError(
            f"checkpoint mismatch for {name}: missing={missing[:5]}... "
            f"extra={extra[:5]}... (counts {len(missing)}/{len(extra)})")
    for k, v in got_flat.items():
        if tuple(v.shape) != tuple(ref_flat[k].shape):
            raise ValueError(
                f"{name}:{k} shape {v.shape} != expected {ref_flat[k].shape}")


def load_text_encoder(checkpoint_dir: str, reference=None):
    """Optional CLIP text tower (text_encoder.npz, written by
    weights/convert.py --text-encoder). Returns the param tree or None -
    the inpaint serving path never needs it (conditioning is the image
    patch encoder, reference trt_model.py:53-61); text-conditioned
    deployments pair it with models/clip_text.py encode_prompt.

    `reference`: optional expected param tree (e.g. a random init of
    models/clip_text.py CLIPTextEncoder) - when given, the loaded tree
    gets the same structure/shape validation every other component gets
    in load_pipeline_params, so a truncated or wrong-config npz fails
    here instead of as an opaque shape error at apply time."""
    path = os.path.join(checkpoint_dir, "text_encoder.npz")
    if not os.path.exists(path):
        return None
    params = load_component(path)
    if reference is not None:
        _validate("text_encoder", params, reference)
    logger.info("loaded text_encoder from %s", path)
    return params


def load_pipeline_params(checkpoint_dir: str, unet, vae_encoder, vae_decoder,
                         patch_encoder, validate: bool = True):
    """Load all components; falls back to seeded random init for any
    component whose file is absent (logged).

    Validation references come from jax.eval_shape (pure host tracing) -
    a complete checkpoint dir loads without compiling or executing a
    single init program (the old path random-initialized the whole
    860M-param pipeline just to read its shapes)."""
    from .random_init import init_pipeline_params, pipeline_param_shapes

    shape_refs = (pipeline_param_shapes(unet, vae_encoder, vae_decoder,
                                        patch_encoder)
                  if validate else None)
    missing = [name for name in COMPONENTS if not os.path.exists(
        os.path.join(checkpoint_dir, f"{name}.npz"))]
    random_params = (init_pipeline_params(
        unet, vae_encoder, vae_decoder, patch_encoder, resolution=64,
        only=missing) if missing else {})
    params = {}
    for name in COMPONENTS:
        path = os.path.join(checkpoint_dir, f"{name}.npz")
        if name not in missing:
            loaded = load_component(path)
            if validate:
                _validate(name, loaded, shape_refs[name])
            params[name] = loaded
            logger.info("loaded %s from %s", name, path)
        else:
            params[name] = random_params[name]
            logger.warning("%s missing from %s - using random init", name, path)
    return params
