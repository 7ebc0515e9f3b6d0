"""Weight conversion tests.

Strategy (no diffusers in the environment): (1) structural round-trip -
generate a torch-style state_dict *from* our randomly initialized params
by inverse mapping, convert it, and require exact equality with the
original tree; (2) semantic parity of each layout transform against torch
CPU primitives (Linear, Conv2d, MultiheadAttention in_proj split);
(3) LoRA merge places the delta on the right kernel.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusiontexturepainting_tpu.core.config import (
    tiny_clip_config,
    tiny_unet_config,
    tiny_vae_config,
)
from diffusiontexturepainting_tpu.models.clip_vit import CLIPVisionTower
from diffusiontexturepainting_tpu.models.unet import UNet2DCondition
from diffusiontexturepainting_tpu.models.vae import VAEDecoder, VAEEncoder
from diffusiontexturepainting_tpu.weights import convert
from diffusiontexturepainting_tpu.weights.loader import flatten_params


# compile-heavy: full-size models / whole-pipeline jit on CPU
pytestmark = pytest.mark.slow


def _inverse_unet_state_dict(params):
    """Build the diffusers-style state_dict that would convert to exactly
    `params` (inverse of convert_unet's transforms)."""
    sd = {}
    flat = flatten_params(params)

    def torch_name(path):
        # our path -> diffusers name
        import re

        p = path
        p = re.sub(r"^down_(\d+)_resnet_(\d+)/", r"down_blocks.\1.resnets.\2.", p)
        p = re.sub(r"^down_(\d+)_attn_(\d+)/", r"down_blocks.\1.attentions.\2.", p)
        p = re.sub(r"^down_(\d+)_downsample/conv/", r"down_blocks.\1.downsamplers.0.conv.", p)
        p = re.sub(r"^up_(\d+)_resnet_(\d+)/", r"up_blocks.\1.resnets.\2.", p)
        p = re.sub(r"^up_(\d+)_attn_(\d+)/", r"up_blocks.\1.attentions.\2.", p)
        p = re.sub(r"^up_(\d+)_upsample/conv/", r"up_blocks.\1.upsamplers.0.conv.", p)
        p = re.sub(r"^mid_resnet_(\d+)/", r"mid_block.resnets.\1.", p)
        p = re.sub(r"^mid_attn/", r"mid_block.attentions.0.", p)
        p = re.sub(r"^time_embedding_linear_(\d+)/", r"time_embedding.linear_\1.", p)
        p = re.sub(r"transformer_blocks_(\d+)/", r"transformer_blocks.\1.", p)
        p = p.replace("attn1/to_out/", "attn1.to_out.0.")
        p = p.replace("attn2/to_out/", "attn2.to_out.0.")
        p = p.replace("ff/net_0/proj/", "ff.net.0.proj.")
        p = p.replace("ff/net_2/", "ff.net.2.")
        p = p.replace("/norm/", ".")  # GroupNorm32/LayerNorm32 wrapper level
        p = p.replace("/", ".")
        p = p.replace(".kernel", ".weight").replace(".scale", ".weight")
        return p

    for path, val in flat.items():
        name = torch_name(path)
        if path.endswith("kernel"):
            if val.ndim == 4:
                sd[name] = val.transpose(3, 2, 0, 1)  # HWIO -> OIHW
            else:
                sd[name] = val.T
        else:
            sd[name] = val
    return sd


def test_unet_conversion_roundtrip():
    cfg = tiny_unet_config()
    unet = UNet2DCondition(cfg)
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 9)),
                       jnp.float32(0.0),
                       jnp.zeros((1, 14, cfg.cross_attention_dim)))["params"]
    params = jax.device_get(params)
    sd = _inverse_unet_state_dict(params)
    converted = convert.convert_unet(sd, layers_per_block=cfg.layers_per_block,
                                     num_blocks=len(cfg.block_out_channels))
    a, b = flatten_params(params), flatten_params(converted)
    assert set(a) == set(b), (sorted(set(a) - set(b))[:5], sorted(set(b) - set(a))[:5])
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_linear_transform_semantics():
    """Converted Linear must compute the same function as torch."""
    import torch

    lin = torch.nn.Linear(6, 3)
    x = torch.randn(2, 6)
    ref = lin(x).detach().numpy()
    kernel = convert._t(lin.weight.detach().numpy())
    ours = x.numpy() @ kernel + lin.bias.detach().numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_conv_transform_semantics():
    import torch
    import torch.nn.functional as F
    from flax import linen as nn

    w = torch.randn(4, 3, 3, 3)
    b = torch.randn(4)
    x = torch.randn(1, 3, 8, 8)
    ref = F.conv2d(x, w, b, padding=1).permute(0, 2, 3, 1).numpy()

    conv = nn.Conv(4, (3, 3), padding=1)
    variables = {"params": {"kernel": jnp.asarray(convert._conv(w.numpy())),
                            "bias": jnp.asarray(b.numpy())}}
    ours = conv.apply(variables, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_openai_clip_inproj_split():
    """OpenAI in_proj_weight (3D, D) split must equal torch MHA."""
    import torch

    d, heads = 16, 4
    mha = torch.nn.MultiheadAttention(d, heads, batch_first=True)
    x = torch.randn(1, 5, d)
    ref, _ = mha(x, x, x, need_weights=False)
    ref = ref.detach().numpy()

    sd = {
        "p.attn.in_proj_weight": mha.in_proj_weight.detach().numpy(),
        "p.attn.in_proj_bias": mha.in_proj_bias.detach().numpy(),
        "p.attn.out_proj.weight": mha.out_proj.weight.detach().numpy(),
        "p.attn.out_proj.bias": mha.out_proj.bias.detach().numpy(),
    }
    out = {}
    in_w = sd["p.attn.in_proj_weight"]
    in_b = sd["p.attn.in_proj_bias"]
    for k, p in enumerate(("q_proj", "k_proj", "v_proj")):
        convert._set(out, f"{p}/kernel", convert._t(in_w[k * d:(k + 1) * d]))
        convert._set(out, f"{p}/bias", in_b[k * d:(k + 1) * d])
    convert._convert_module(sd, "p.attn.out_proj", out, "out_proj", "linear")

    from diffusiontexturepainting_tpu.ops.attention import xla_attention

    xj = jnp.asarray(x.numpy())
    q = xj @ out["q_proj"]["kernel"] + out["q_proj"]["bias"]
    k_ = xj @ out["k_proj"]["kernel"] + out["k_proj"]["bias"]
    v = xj @ out["v_proj"]["kernel"] + out["v_proj"]["bias"]
    a = xla_attention(q, k_, v, heads)
    ours = a @ out["out_proj"]["kernel"] + out["out_proj"]["bias"]
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_lora_merge_places_delta():
    cfg = tiny_unet_config()
    unet = UNet2DCondition(cfg)
    params = jax.device_get(
        unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 9)),
                  jnp.float32(0.0),
                  jnp.zeros((1, 14, cfg.cross_attention_dim)))["params"])
    before = np.array(
        params["down_0_attn_0"]["transformer_blocks_0"]["attn1"]["to_q"]["kernel"])
    out_dim, in_dim = before.shape[1], before.shape[0]
    rng = np.random.default_rng(0)
    down = rng.standard_normal((4, in_dim)).astype(np.float32)
    up = rng.standard_normal((out_dim, 4)).astype(np.float32)
    lora_sd = {
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1"
        ".processor.to_q_lora.down.weight": down,
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1"
        ".processor.to_q_lora.up.weight": up,
    }
    merged = convert.merge_lora_state_dict(params, lora_sd, scale=0.5)
    after = merged["down_0_attn_0"]["transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    np.testing.assert_allclose(after - before, 0.5 * (up @ down).T, atol=1e-5)


def test_runtime_lora_merge_matches_offline():
    """models.lora.merge_lora (train-time) must equal the offline
    state-dict merge for the same factors."""
    from diffusiontexturepainting_tpu.models.lora import (
        init_lora_params, merge_lora)

    cfg = tiny_unet_config()
    unet = UNet2DCondition(cfg)
    params = jax.device_get(
        unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 9)),
                  jnp.float32(0.0),
                  jnp.zeros((1, 14, cfg.cross_attention_dim)))["params"])
    lora = init_lora_params(params, rank=2, seed=1)
    # give `up` nonzero values so the merge actually changes weights
    lora = jax.tree_util.tree_map(lambda x: x + 0.01, lora)
    merged_rt = merge_lora(params, lora, scale=1.0)

    lora_sd = {}
    for name, fac in lora.items():
        parts = name.split("/")  # e.g. down_0_attn_0/transformer_blocks_0/attn1/to_q
        import re

        m = re.match(r"(down|up)_(\d+)_attn_(\d+)", parts[0])
        if m:
            side, i, j = m.groups()
            tb = parts[1].replace("transformer_blocks_", "transformer_blocks.")
            prefix = f"{side}_blocks.{i}.attentions.{j}.{tb}.{parts[2]}"
        else:
            tb = parts[1].replace("transformer_blocks_", "transformer_blocks.")
            prefix = f"mid_block.attentions.0.{tb}.{parts[2]}"
        lora_sd[f"{prefix}.processor.{parts[3]}_lora.down.weight"] = np.array(fac["down"])
        lora_sd[f"{prefix}.processor.{parts[3]}_lora.up.weight"] = np.array(fac["up"])

    import copy

    merged_off = convert.merge_lora_state_dict(copy.deepcopy(params), lora_sd, 1.0)
    a = flatten_params(jax.device_get(merged_rt))
    b = flatten_params(merged_off)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=1e-5, err_msg=k)
