"""Torch checkpoint -> JAX param tree conversion.

Converts the three artifact families the reference serving stack consumes
(trt_model.py:48-61) into our native .npz component checkpoints:

  1. SD-1.5 inpainting weights (diffusers UNet2DConditionModel +
     AutoencoderKL state dicts, from a local HF snapshot),
  2. `pytorch_lora_weights.bin` (diffusers attn-procs format) - merged
     offline into the UNet kernels, the analog of the reference's TRT
     fusion W' = W + scale * (up @ down) (models.py:1042-1094),
  3. `image_encoder.pth` (ConditionPatchEncoder: OpenAI-CLIP visual tower
     + per-scale transformer stacks + projection + uncond vector).

Layout transforms (torch -> flax):
  Linear  W (O, I)        -> kernel (I, O)
  Conv    W (O, I, kh, kw)-> kernel (kh, kw, I, O)
  Norm    weight/bias     -> scale/bias

All functions take/return plain dicts of numpy arrays; torch is only
needed to deserialize .bin/.pth files (torch.load on CPU).
"""

from __future__ import annotations

import logging
import re
from typing import Dict

import numpy as np

logger = logging.getLogger(__name__)

Array = np.ndarray
StateDict = Dict[str, Array]


def _t(w):  # linear weight
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(w):  # conv weight
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _set(tree, path: str, value):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value, np.float32)


def _convert_module(sd: StateDict, prefix: str, out, out_prefix: str,
                    kind: str):
    """Convert one torch submodule (linear/conv/norm) given its prefix."""
    w = sd.get(f"{prefix}.weight")
    b = sd.get(f"{prefix}.bias")
    if w is None:
        raise KeyError(f"missing weight for {prefix!r} in state_dict")
    if kind == "linear":
        _set(out, f"{out_prefix}/kernel", _t(w))
        if b is not None:
            _set(out, f"{out_prefix}/bias", b)
    elif kind == "conv":
        _set(out, f"{out_prefix}/kernel", _conv(w))
        if b is not None:
            _set(out, f"{out_prefix}/bias", b)
    elif kind == "norm":
        _set(out, f"{out_prefix}/scale", w)
        _set(out, f"{out_prefix}/bias", b)
    else:
        raise ValueError(kind)


def _convert_transformer_block(sd, prefix, out, out_prefix):
    """diffusers BasicTransformerBlock -> our BasicTransformerBlock."""
    for n in ("norm1", "norm2", "norm3"):
        _convert_module(sd, f"{prefix}.{n}", out, f"{out_prefix}/{n}/norm", "norm")
    for attn in ("attn1", "attn2"):
        for proj in ("to_q", "to_k", "to_v"):
            _convert_module(sd, f"{prefix}.{attn}.{proj}", out,
                            f"{out_prefix}/{attn}/{proj}", "linear")
        _convert_module(sd, f"{prefix}.{attn}.to_out.0", out,
                        f"{out_prefix}/{attn}/to_out", "linear")
    _convert_module(sd, f"{prefix}.ff.net.0.proj", out,
                    f"{out_prefix}/ff/net_0/proj", "linear")
    _convert_module(sd, f"{prefix}.ff.net.2", out, f"{out_prefix}/ff/net_2",
                    "linear")


def _convert_resnet(sd, prefix, out, out_prefix, has_temb=True):
    _convert_module(sd, f"{prefix}.norm1", out, f"{out_prefix}/norm1/norm", "norm")
    _convert_module(sd, f"{prefix}.conv1", out, f"{out_prefix}/conv1", "conv")
    if has_temb and f"{prefix}.time_emb_proj.weight" in sd:
        _convert_module(sd, f"{prefix}.time_emb_proj", out,
                        f"{out_prefix}/time_emb_proj", "linear")
    _convert_module(sd, f"{prefix}.norm2", out, f"{out_prefix}/norm2/norm", "norm")
    _convert_module(sd, f"{prefix}.conv2", out, f"{out_prefix}/conv2", "conv")
    if f"{prefix}.conv_shortcut.weight" in sd:
        _convert_module(sd, f"{prefix}.conv_shortcut", out,
                        f"{out_prefix}/conv_shortcut", "conv")


def _convert_transformer2d(sd, prefix, out, out_prefix, depth=1):
    _convert_module(sd, f"{prefix}.norm", out, f"{out_prefix}/norm/norm", "norm")
    _convert_module(sd, f"{prefix}.proj_in", out, f"{out_prefix}/proj_in", "conv")
    for d in range(depth):
        _convert_transformer_block(sd, f"{prefix}.transformer_blocks.{d}", out,
                                   f"{out_prefix}/transformer_blocks_{d}")
    _convert_module(sd, f"{prefix}.proj_out", out, f"{out_prefix}/proj_out", "conv")


def convert_unet(sd: StateDict, layers_per_block: int = 2,
                 num_blocks: int = 4) -> dict:
    """diffusers UNet2DConditionModel state_dict -> our UNet2DCondition."""
    out: dict = {}
    _convert_module(sd, "conv_in", out, "conv_in", "conv")
    _convert_module(sd, "time_embedding.linear_1", out,
                    "time_embedding_linear_1", "linear")
    _convert_module(sd, "time_embedding.linear_2", out,
                    "time_embedding_linear_2", "linear")

    for i in range(num_blocks):
        for j in range(layers_per_block):
            _convert_resnet(sd, f"down_blocks.{i}.resnets.{j}", out,
                            f"down_{i}_resnet_{j}")
            if f"down_blocks.{i}.attentions.{j}.norm.weight" in sd:
                _convert_transformer2d(sd, f"down_blocks.{i}.attentions.{j}",
                                       out, f"down_{i}_attn_{j}")
        if f"down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            _convert_module(sd, f"down_blocks.{i}.downsamplers.0.conv", out,
                            f"down_{i}_downsample/conv", "conv")

    _convert_resnet(sd, "mid_block.resnets.0", out, "mid_resnet_0")
    _convert_transformer2d(sd, "mid_block.attentions.0", out, "mid_attn")
    _convert_resnet(sd, "mid_block.resnets.1", out, "mid_resnet_1")

    for i in range(num_blocks):
        for j in range(layers_per_block + 1):
            _convert_resnet(sd, f"up_blocks.{i}.resnets.{j}", out,
                            f"up_{i}_resnet_{j}")
            if f"up_blocks.{i}.attentions.{j}.norm.weight" in sd:
                _convert_transformer2d(sd, f"up_blocks.{i}.attentions.{j}",
                                       out, f"up_{i}_attn_{j}")
        if f"up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            _convert_module(sd, f"up_blocks.{i}.upsamplers.0.conv", out,
                            f"up_{i}_upsample/conv", "conv")

    _convert_module(sd, "conv_norm_out", out, "conv_norm_out/norm", "norm")
    _convert_module(sd, "conv_out", out, "conv_out", "conv")
    return out


def _convert_vae_attn(sd, prefix, out, out_prefix):
    """Old (query/key/value/proj_attn) or new (to_q/...) diffusers VAE
    attention naming."""
    names = (("query", "key", "value", "proj_attn")
             if f"{prefix}.query.weight" in sd
             else ("to_q", "to_k", "to_v", "to_out.0"))
    _convert_module(sd, f"{prefix}.group_norm", out,
                    f"{out_prefix}/attn_norm/norm", "norm")
    for torch_n, ours in zip(names, ("to_q", "to_k", "to_v", "to_out")):
        _convert_module(sd, f"{prefix}.{torch_n}", out,
                        f"{out_prefix}/attn/{ours}", "linear")


def convert_vae_encoder(sd: StateDict, layers_per_block: int = 2,
                        num_blocks: int = 4) -> dict:
    """AutoencoderKL state_dict (full) -> our VAEEncoder tree."""
    out: dict = {}
    _convert_module(sd, "encoder.conv_in", out, "conv_in", "conv")
    for i in range(num_blocks):
        for j in range(layers_per_block):
            _convert_resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}", out,
                            f"down_{i}_resnet_{j}", has_temb=False)
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            _convert_module(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                            out, f"down_{i}_downsample/conv", "conv")
    _convert_resnet(sd, "encoder.mid_block.resnets.0", out, "mid/resnet_0",
                    has_temb=False)
    _convert_vae_attn(sd, "encoder.mid_block.attentions.0", out, "mid")
    _convert_resnet(sd, "encoder.mid_block.resnets.1", out, "mid/resnet_1",
                    has_temb=False)
    _convert_module(sd, "encoder.conv_norm_out", out, "conv_norm_out/norm", "norm")
    _convert_module(sd, "encoder.conv_out", out, "conv_out", "conv")
    _convert_module(sd, "quant_conv", out, "quant_conv", "conv")
    return out


def convert_vae_decoder(sd: StateDict, layers_per_block: int = 2,
                        num_blocks: int = 4) -> dict:
    out: dict = {}
    _convert_module(sd, "post_quant_conv", out, "post_quant_conv", "conv")
    _convert_module(sd, "decoder.conv_in", out, "conv_in", "conv")
    _convert_resnet(sd, "decoder.mid_block.resnets.0", out, "mid/resnet_0",
                    has_temb=False)
    _convert_vae_attn(sd, "decoder.mid_block.attentions.0", out, "mid")
    _convert_resnet(sd, "decoder.mid_block.resnets.1", out, "mid/resnet_1",
                    has_temb=False)
    for i in range(num_blocks):
        for j in range(layers_per_block + 1):
            _convert_resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}", out,
                            f"up_{i}_resnet_{j}", has_temb=False)
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            _convert_module(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv",
                            out, f"up_{i}_upsample/conv", "conv")
    _convert_module(sd, "decoder.conv_norm_out", out, "conv_norm_out/norm", "norm")
    _convert_module(sd, "decoder.conv_out", out, "conv_out", "conv")
    return out


def convert_clip_hf(sd: StateDict, prefix: str = "vision_model",
                    num_layers: int = 12) -> dict:
    """HF CLIPVisionModel -> our CLIPVisionTower tree."""
    out: dict = {}
    _set(out, "class_embedding", sd[f"{prefix}.embeddings.class_embedding"])
    _set(out, "patch_embedding/kernel",
         _conv(sd[f"{prefix}.embeddings.patch_embedding.weight"]))
    _set(out, "position_embedding",
         sd[f"{prefix}.embeddings.position_embedding.weight"])
    # HF has a historical typo: "pre_layrnorm"
    pre = (f"{prefix}.pre_layrnorm" if f"{prefix}.pre_layrnorm.weight" in sd
           else f"{prefix}.pre_layernorm")
    _convert_module(sd, pre, out, "pre_layernorm", "norm")
    for i in range(num_layers):
        lp = f"{prefix}.encoder.layers.{i}"
        op = f"layer_{i}"
        _convert_module(sd, f"{lp}.layer_norm1", out, f"{op}/layer_norm1", "norm")
        _convert_module(sd, f"{lp}.layer_norm2", out, f"{op}/layer_norm2", "norm")
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _convert_module(sd, f"{lp}.self_attn.{p}", out, f"{op}/{p}", "linear")
        _convert_module(sd, f"{lp}.mlp.fc1", out, f"{op}/fc1", "linear")
        _convert_module(sd, f"{lp}.mlp.fc2", out, f"{op}/fc2", "linear")
    _convert_module(sd, f"{prefix}.post_layernorm", out, "post_layernorm", "norm")
    return out


def convert_clip_text(sd: StateDict, prefix: str = "text_model",
                      num_layers: int = 12) -> dict:
    """HF CLIPTextModel (SD's `text_encoder` subfolder, reference
    models.py:944-947) -> our CLIPTextEncoder tree."""
    out: dict = {}
    _set(out, "token_embedding",
         sd[f"{prefix}.embeddings.token_embedding.weight"])
    _set(out, "position_embedding",
         sd[f"{prefix}.embeddings.position_embedding.weight"])
    for i in range(num_layers):
        lp = f"{prefix}.encoder.layers.{i}"
        op = f"layer_{i}"
        _convert_module(sd, f"{lp}.layer_norm1", out, f"{op}/layer_norm1", "norm")
        _convert_module(sd, f"{lp}.layer_norm2", out, f"{op}/layer_norm2", "norm")
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _convert_module(sd, f"{lp}.self_attn.{p}", out, f"{op}/{p}", "linear")
        _convert_module(sd, f"{lp}.mlp.fc1", out, f"{op}/fc1", "linear")
        _convert_module(sd, f"{lp}.mlp.fc2", out, f"{op}/fc2", "linear")
    _convert_module(sd, f"{prefix}.final_layer_norm", out,
                    "final_layer_norm", "norm")
    return out


def convert_clip_openai(sd: StateDict, prefix: str = "clip.visual",
                        num_layers: int = 12) -> dict:
    """OpenAI clip visual tower (as stored inside image_encoder.pth) ->
    our CLIPVisionTower tree."""
    out: dict = {}
    _set(out, "class_embedding", sd[f"{prefix}.class_embedding"])
    _set(out, "patch_embedding/kernel", _conv(sd[f"{prefix}.conv1.weight"]))
    _set(out, "position_embedding", sd[f"{prefix}.positional_embedding"])
    _convert_module(sd, f"{prefix}.ln_pre", out, "pre_layernorm", "norm")
    for i in range(num_layers):
        lp = f"{prefix}.transformer.resblocks.{i}"
        op = f"layer_{i}"
        _convert_module(sd, f"{lp}.ln_1", out, f"{op}/layer_norm1", "norm")
        _convert_module(sd, f"{lp}.ln_2", out, f"{op}/layer_norm2", "norm")
        in_w = np.asarray(sd[f"{lp}.attn.in_proj_weight"])
        in_b = np.asarray(sd[f"{lp}.attn.in_proj_bias"])
        d = in_w.shape[0] // 3
        for k, p in enumerate(("q_proj", "k_proj", "v_proj")):
            _set(out, f"{op}/{p}/kernel", _t(in_w[k * d:(k + 1) * d]))
            _set(out, f"{op}/{p}/bias", in_b[k * d:(k + 1) * d])
        _convert_module(sd, f"{lp}.attn.out_proj", out, f"{op}/out_proj", "linear")
        _convert_module(sd, f"{lp}.mlp.c_fc", out, f"{op}/fc1", "linear")
        _convert_module(sd, f"{lp}.mlp.c_proj", out, f"{op}/fc2", "linear")
    _convert_module(sd, f"{prefix}.ln_post", out, "post_layernorm", "norm")
    return out


def convert_patch_encoder(sd: StateDict, num_layers: int = 4,
                          clip_layers: int = 12) -> dict:
    """image_encoder.pth -> our ConditionPatchEncoder tree (including the
    embedded CLIP tower if present in either naming)."""
    out: dict = {}
    for stack in ("l", "m", "s"):
        for i in range(num_layers):
            _convert_transformer_block(sd, f"{stack}_patch_encoder_layers.{i}",
                                       out, f"{stack}_block_{i}")
    _convert_module(sd, "final_layer_norm", out, "final_layer_norm", "norm")
    _convert_module(sd, "proj_out", out, "proj_out", "linear")
    _set(out, "uncond_vector", sd["uncond_vector"])
    if "clip.visual.class_embedding" in sd:
        out["clip"] = convert_clip_openai(sd, "clip.visual", clip_layers)
    elif "clip.vision_model.embeddings.class_embedding" in sd:
        out["clip"] = convert_clip_hf(sd, "clip.vision_model", clip_layers)
    return out


_LORA_KEY_RE = re.compile(
    r"^(?P<block>.*)\.processor\.(?P<target>to_[qkv]|to_out)_lora\."
    r"(?P<factor>down|up)\.weight$")


def merge_lora_state_dict(unet_params: dict, lora_sd: StateDict,
                          scale: float = 1.0) -> dict:
    """Fold a diffusers attn-procs LoRA state_dict into converted UNet
    params: kernel += scale * (up @ down)^T. The offline analog of the
    reference's TRT refit fusion (models.py:1042-1094)."""
    pairs: dict = {}
    for key, val in lora_sd.items():
        m = _LORA_KEY_RE.match(key)
        if not m:
            logger.warning("unrecognized LoRA key %s", key)
            continue
        name = f"{m.group('block')}.{m.group('target')}"
        pairs.setdefault(name, {})[m.group("factor")] = np.asarray(val)

    for name, factors in pairs.items():
        path = _torch_attn_path_to_ours(name)
        node = unet_params
        for p in path.split("/")[:-1]:
            node = node[p]
        leaf = node[path.split("/")[-1]]
        delta = (factors["up"] @ factors["down"]).T  # (in, out)
        leaf["kernel"] = leaf["kernel"] + scale * delta.astype(np.float32)
    logger.info("merged %d LoRA projections", len(pairs))
    return unet_params


def _torch_attn_path_to_ours(name: str) -> str:
    """'down_blocks.0.attentions.1.transformer_blocks.0.attn1.to_q' ->
    'down_0_attn_1/transformer_blocks_0/attn1/to_q'."""
    m = re.match(
        r"(down|up)_blocks\.(\d+)\.attentions\.(\d+)\."
        r"transformer_blocks\.(\d+)\.(attn[12])\.(to_\w+)$", name)
    if m:
        side, i, j, d, attn, proj = m.groups()
        return f"{side}_{i}_attn_{j}/transformer_blocks_{d}/{attn}/{proj}"
    m = re.match(
        r"mid_block\.attentions\.0\.transformer_blocks\.(\d+)\."
        r"(attn[12])\.(to_\w+)$", name)
    if m:
        d, attn, proj = m.groups()
        return f"mid_attn/transformer_blocks_{d}/{attn}/{proj}"
    raise KeyError(f"cannot map LoRA target {name}")


def _torch_load(path: str) -> StateDict:
    # weights_only=True refuses to unpickle module objects, so the result
    # is always a plain state_dict (the reference saves image_encoder.pth
    # that way, train_texture_inpaint_lora.py); a full-module pickle
    # fails AT torch.load with an UnpicklingError telling the operator to
    # re-save as a state_dict - deliberately not retried with
    # weights_only=False (arbitrary code execution from the checkpoint).
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in obj.items()}


def _load_safetensors(path: str) -> StateDict:
    from safetensors.numpy import load_file

    return load_file(path)


def load_state_dict(path: str) -> StateDict:
    if path.endswith(".safetensors"):
        return _load_safetensors(path)
    return _torch_load(path)


def main(argv=None):
    import argparse
    import os

    ap = argparse.ArgumentParser(
        description="Convert SD-1.5 + LoRA + image-encoder torch "
                    "checkpoints to native .npz component files")
    ap.add_argument("--unet", help="diffusers UNet state_dict file")
    ap.add_argument("--vae", help="diffusers AutoencoderKL state_dict file")
    ap.add_argument("--lora", help="pytorch_lora_weights.bin")
    ap.add_argument("--image-encoder", help="image_encoder.pth")
    ap.add_argument("--text-encoder",
                    help="HF CLIPTextModel state_dict file (SD's "
                         "text_encoder subfolder; optional - unused by "
                         "the inpaint serving path, reference "
                         "trt_model.py:53-61)")
    ap.add_argument("--lora-scale", type=float, default=1.0)
    ap.add_argument("--out", required=True, help="output checkpoint dir")
    args = ap.parse_args(argv)

    from .loader import save_component

    os.makedirs(args.out, exist_ok=True)
    if args.unet:
        unet = convert_unet(load_state_dict(args.unet))
        if args.lora:
            unet = merge_lora_state_dict(unet, load_state_dict(args.lora),
                                         args.lora_scale)
        save_component(os.path.join(args.out, "unet.npz"), unet)
    if args.vae:
        vae_sd = load_state_dict(args.vae)
        save_component(os.path.join(args.out, "vae_encoder.npz"),
                       convert_vae_encoder(vae_sd))
        save_component(os.path.join(args.out, "vae_decoder.npz"),
                       convert_vae_decoder(vae_sd))
    if args.image_encoder:
        save_component(os.path.join(args.out, "patch_encoder.npz"),
                       convert_patch_encoder(load_state_dict(args.image_encoder)))
    if args.text_encoder:
        save_component(os.path.join(args.out, "text_encoder.npz"),
                       convert_clip_text(load_state_dict(args.text_encoder)))
    print(f"wrote checkpoint components to {args.out}")


if __name__ == "__main__":
    main()
