"""ASSEMBLED-graph numerical parity vs hand-torch diffusers oracles.

test_torch_parity.py pins the building blocks (ResnetBlock2D,
Transformer2D, VAE attention, GN/LN eps, timestep embedding); these
tests pin the WIRING of the full graphs the reference serves
(/root/reference/trt_inference/models.py:1017-1228 UNet2DConditionModel,
1237-1420 AutoencoderKL): skip-connection ordering across the down/up
path, the mid-block sequence, the 9-channel input concat order, the
downsample/upsample placement, and the final norm/act head. A
tiny-config full-graph forward goes through the SAME torch->JAX weight
converters the real checkpoints use (weights/convert.py), so any wiring
or naming drift fails here.

Torch oracles transcribe diffusers 0.17 module ordering:
  - UNet2DConditionModel.forward: conv_in -> down blocks (resnet [->
    attn], skip appended per resnet, downsample appended as its own
    skip) -> mid (resnet, attn, resnet) -> up blocks (skip popped
    last-first, channel-concat BEFORE each resnet, upsample at block
    end) -> GN -> silu -> conv_out.
  - AutoencoderKL encoder/decoder with the encoder's asymmetric (0,1)
    downsample padding and nearest-2x upsamples.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from diffusiontexturepainting_tpu.core.config import (  # noqa: E402
    tiny_unet_config,
    tiny_vae_config,
)
from diffusiontexturepainting_tpu.weights.convert import (  # noqa: E402
    convert_unet,
    convert_vae_decoder,
    convert_vae_encoder,
)
from tests.test_torch_parity import (  # noqa: E402
    TorchResnetBlock,
    TorchTransformer2D,
    _torch_t2d_state_dict,
    sd,
    t32,
)

# compile-heavy full graphs on CPU
pytestmark = pytest.mark.slow


def _rename(prefix, mod_sd):
    return {f"{prefix}.{k}": v for k, v in mod_sd.items()}


def _timestep_embedding_np(timesteps, dim):
    """diffusers get_timestep_embedding, SD flags (flip_sin_to_cos=True,
    downscale_freq_shift=0)."""
    half = dim // 2
    exponent = -np.log(10000.0) * np.arange(half, dtype=np.float64) / half
    emb = np.asarray(timesteps, np.float64)[:, None] * np.exp(exponent)[None]
    return np.concatenate([np.cos(emb), np.sin(emb)], -1).astype(np.float32)


class TorchTinyUNet(torch.nn.Module):
    """Hand-assembled UNet2DConditionModel wiring at tiny_unet_config
    (channels (32,64,64,64), 1 layer/block, heads 2, kv 32, groups 8,
    attention at the first three levels)."""

    def __init__(self):
        super().__init__()
        self.ch = (32, 64, 64, 64)
        self.attn_down = (True, True, True, False)
        self.groups, self.heads, self.kv = 8, 2, 32
        self.tdim = self.ch[0] * 4
        self.time_linear_1 = torch.nn.Linear(self.ch[0], self.tdim)
        self.time_linear_2 = torch.nn.Linear(self.tdim, self.tdim)
        self.conv_in = torch.nn.Conv2d(9, self.ch[0], 3, padding=1)
        self.downs = torch.nn.ModuleList()
        self.down_attns = torch.nn.ModuleList()
        self.downsamples = torch.nn.ModuleList()
        cin = self.ch[0]
        for i, ch in enumerate(self.ch):
            self.downs.append(TorchResnetBlock(cin, ch, self.tdim,
                                               groups=self.groups))
            self.down_attns.append(
                TorchTransformer2D(ch, self.heads, self.kv, self.groups)
                if self.attn_down[i] else torch.nn.Identity())
            if i < len(self.ch) - 1:
                self.downsamples.append(
                    torch.nn.Conv2d(ch, ch, 3, stride=2, padding=1))
            cin = ch
        mid = self.ch[-1]
        self.mid_r0 = TorchResnetBlock(mid, mid, self.tdim, groups=self.groups)
        self.mid_attn = TorchTransformer2D(mid, self.heads, self.kv,
                                           self.groups)
        self.mid_r1 = TorchResnetBlock(mid, mid, self.tdim, groups=self.groups)
        rev = tuple(reversed(self.ch))
        rev_attn = tuple(reversed(self.attn_down))
        self.ups = torch.nn.ModuleList()
        self.up_attns = torch.nn.ModuleList()
        self.upsamples = torch.nn.ModuleList()
        # skip channels, deepest first: for layers_per_block=1 each up
        # block consumes 2 skips (the level's resnet output + the tensor
        # entering the level)
        skip_ch = [self.ch[0]]  # conv_in
        for i, ch in enumerate(self.ch):
            skip_ch.append(ch)          # resnet output
            if i < len(self.ch) - 1:
                skip_ch.append(ch)      # downsample output
        prev = rev[0]
        for i, ch in enumerate(rev):
            for j in range(2):  # layers_per_block + 1
                s = skip_ch.pop()
                self.ups.append(TorchResnetBlock(prev + s, ch, self.tdim,
                                                 groups=self.groups))
                self.up_attns.append(
                    TorchTransformer2D(ch, self.heads, self.kv, self.groups)
                    if rev_attn[i] else torch.nn.Identity())
                prev = ch
            if i < len(rev) - 1:
                self.upsamples.append(
                    torch.nn.Conv2d(ch, ch, 3, padding=1))
        self.conv_norm_out = torch.nn.GroupNorm(self.groups, self.ch[0])
        self.conv_out = torch.nn.Conv2d(self.ch[0], 4, 3, padding=1)

    def forward(self, x, timesteps, ctx):
        temb = torch.from_numpy(
            _timestep_embedding_np(timesteps.numpy(), self.ch[0]))
        temb = self.time_linear_2(
            torch.nn.functional.silu(self.time_linear_1(temb)))
        h = self.conv_in(x)
        skips = [h]
        for i in range(len(self.ch)):
            h = self.downs[i](h, temb)
            if self.attn_down[i]:
                h = self.down_attns[i](h, ctx)
            skips.append(h)
            if i < len(self.ch) - 1:
                h = self.downsamples[i](h)
                skips.append(h)
        h = self.mid_r0(h, temb)
        h = self.mid_attn(h, ctx)
        h = self.mid_r1(h, temb)
        rev_attn = tuple(reversed(self.attn_down))
        k = 0
        for i in range(len(self.ch)):
            for j in range(2):
                h = torch.cat([h, skips.pop()], dim=1)
                h = self.ups[k](h, temb)
                if rev_attn[i]:
                    h = self.up_attns[k](h, ctx)
                k += 1
            if i < len(self.ch) - 1:
                h = torch.nn.functional.interpolate(h, scale_factor=2,
                                                    mode="nearest")
                h = self.upsamples[i](h)
        h = torch.nn.functional.silu(self.conv_norm_out(h))
        return self.conv_out(h)

    def diffusers_state_dict(self):
        out = {}
        out.update(_rename("conv_in", sd(self.conv_in)))
        out.update(_rename("time_embedding.linear_1", sd(self.time_linear_1)))
        out.update(_rename("time_embedding.linear_2", sd(self.time_linear_2)))
        for i in range(len(self.ch)):
            out.update(_rename(f"down_blocks.{i}.resnets.0",
                               sd(self.downs[i])))
            if self.attn_down[i]:
                out.update(_rename(
                    f"down_blocks.{i}.attentions.0",
                    _torch_t2d_state_dict(self.down_attns[i])))
            if i < len(self.ch) - 1:
                out.update(_rename(f"down_blocks.{i}.downsamplers.0.conv",
                                   sd(self.downsamples[i])))
        out.update(_rename("mid_block.resnets.0", sd(self.mid_r0)))
        out.update(_rename("mid_block.attentions.0",
                           _torch_t2d_state_dict(self.mid_attn)))
        out.update(_rename("mid_block.resnets.1", sd(self.mid_r1)))
        rev_attn = tuple(reversed(self.attn_down))
        k = 0
        for i in range(len(self.ch)):
            for j in range(2):
                out.update(_rename(f"up_blocks.{i}.resnets.{j}",
                                   sd(self.ups[k])))
                if rev_attn[i]:
                    out.update(_rename(
                        f"up_blocks.{i}.attentions.{j}",
                        _torch_t2d_state_dict(self.up_attns[k])))
                k += 1
            if i < len(self.ch) - 1:
                out.update(_rename(f"up_blocks.{i}.upsamplers.0.conv",
                                   sd(self.upsamples[i])))
        out.update(_rename("conv_norm_out", sd(self.conv_norm_out)))
        out.update(_rename("conv_out", sd(self.conv_out)))
        return out


def test_assembled_unet_matches_torch():
    """Full tiny UNet graph: 9-ch input, skip ordering, mid sequence,
    up-path concat order, output head - vs the torch oracle through the
    real converter (reference models.py:1017-1228)."""
    from diffusiontexturepainting_tpu.models.unet import UNet2DCondition

    torch.manual_seed(0)
    oracle = TorchTinyUNet().eval()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, 9)).astype(np.float32)
    ctx = rng.standard_normal((2, 14, 32)).astype(np.float32)
    t = np.array([3.0, 511.0], np.float32)
    with torch.no_grad():
        ref = oracle(t32(x).permute(0, 3, 1, 2), t32(t), t32(ctx))
        ref = ref.permute(0, 2, 3, 1).numpy()

    params = convert_unet(oracle.diffusers_state_dict(), layers_per_block=1,
                          num_blocks=4)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    model = UNet2DCondition(tiny_unet_config())
    out = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                      jnp.asarray(ctx))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


class TorchVAEAttention(torch.nn.Module):
    """diffusers AttentionBlock: GN(1e-6) -> single-head qkv (bias) ->
    softmax(c^-0.5) -> proj -> residual."""

    def __init__(self, c, groups):
        super().__init__()
        self.c = c
        self.group_norm = torch.nn.GroupNorm(groups, c, eps=1e-6)
        self.to_q = torch.nn.Linear(c, c)
        self.to_k = torch.nn.Linear(c, c)
        self.to_v = torch.nn.Linear(c, c)
        self.to_out = torch.nn.Linear(c, c)

    def forward(self, x):
        b, c, hh, ww = x.shape
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        scores = torch.matmul(q, k.transpose(-1, -2)) * c**-0.5
        o = self.to_out(torch.matmul(torch.softmax(scores, -1), v))
        return x + o.reshape(b, hh, ww, c).permute(0, 3, 1, 2)

    def renamed(self):
        out = {}
        for name in ("group_norm", "to_q", "to_k", "to_v"):
            out.update(_rename(name, sd(getattr(self, name))))
        out.update(_rename("to_out.0", sd(self.to_out)))
        return out


class TorchTinyVAE(torch.nn.Module):
    """Hand-assembled AutoencoderKL at tiny_vae_config (channels
    (16,16,32,32), 1 layer/block, groups 8, eps 1e-6, latent 4)."""

    def __init__(self):
        super().__init__()
        ch = self.ch = (16, 16, 32, 32)
        g = self.groups = 8
        rb = lambda cin, cout: TorchResnetBlock(cin, cout, None, eps=1e-6,
                                                groups=g)
        # encoder
        self.e_conv_in = torch.nn.Conv2d(3, ch[0], 3, padding=1)
        self.e_res = torch.nn.ModuleList()
        self.e_down = torch.nn.ModuleList()
        cin = ch[0]
        for i, c in enumerate(ch):
            self.e_res.append(rb(cin, c))
            if i < len(ch) - 1:
                self.e_down.append(torch.nn.Conv2d(c, c, 3, stride=2))
            cin = c
        self.e_mid_r0 = rb(ch[-1], ch[-1])
        self.e_mid_attn = TorchVAEAttention(ch[-1], g)
        self.e_mid_r1 = rb(ch[-1], ch[-1])
        self.e_norm_out = torch.nn.GroupNorm(g, ch[-1], eps=1e-6)
        self.e_conv_out = torch.nn.Conv2d(ch[-1], 8, 3, padding=1)
        self.quant_conv = torch.nn.Conv2d(8, 8, 1)
        # decoder
        rev = tuple(reversed(ch))
        self.post_quant_conv = torch.nn.Conv2d(4, 4, 1)
        self.d_conv_in = torch.nn.Conv2d(4, rev[0], 3, padding=1)
        self.d_mid_r0 = rb(rev[0], rev[0])
        self.d_mid_attn = TorchVAEAttention(rev[0], g)
        self.d_mid_r1 = rb(rev[0], rev[0])
        self.d_res = torch.nn.ModuleList()
        self.d_up = torch.nn.ModuleList()
        prev = rev[0]
        for i, c in enumerate(rev):
            for j in range(2):  # layers_per_block + 1
                self.d_res.append(rb(prev, c))
                prev = c
            if i < len(rev) - 1:
                self.d_up.append(torch.nn.Conv2d(c, c, 3, padding=1))
        self.d_norm_out = torch.nn.GroupNorm(g, rev[-1], eps=1e-6)
        self.d_conv_out = torch.nn.Conv2d(rev[-1], 3, 3, padding=1)

    def encode(self, x):
        h = self.e_conv_in(x)
        for i in range(len(self.ch)):
            h = self.e_res[i](h)
            if i < len(self.ch) - 1:
                # diffusers Downsample2D asymmetric pad (0,1,0,1)
                h = self.e_down[i](torch.nn.functional.pad(h, (0, 1, 0, 1)))
        h = self.e_mid_r0(h)
        h = self.e_mid_attn(h)
        h = self.e_mid_r1(h)
        h = torch.nn.functional.silu(self.e_norm_out(h))
        return self.quant_conv(self.e_conv_out(h))

    def decode(self, z):
        h = self.d_conv_in(self.post_quant_conv(z))
        h = self.d_mid_r0(h)
        h = self.d_mid_attn(h)
        h = self.d_mid_r1(h)
        k = 0
        rev = tuple(reversed(self.ch))
        for i in range(len(rev)):
            for j in range(2):
                h = self.d_res[k](h)
                k += 1
            if i < len(rev) - 1:
                h = torch.nn.functional.interpolate(h, scale_factor=2,
                                                    mode="nearest")
                h = self.d_up[i](h)
        h = torch.nn.functional.silu(self.d_norm_out(h))
        return self.d_conv_out(h)

    def diffusers_state_dict(self):
        out = {}
        out.update(_rename("encoder.conv_in", sd(self.e_conv_in)))
        for i in range(len(self.ch)):
            out.update(_rename(f"encoder.down_blocks.{i}.resnets.0",
                               sd(self.e_res[i])))
            if i < len(self.ch) - 1:
                out.update(_rename(
                    f"encoder.down_blocks.{i}.downsamplers.0.conv",
                    sd(self.e_down[i])))
        out.update(_rename("encoder.mid_block.resnets.0", sd(self.e_mid_r0)))
        out.update(_rename("encoder.mid_block.attentions.0",
                           self.e_mid_attn.renamed()))
        out.update(_rename("encoder.mid_block.resnets.1", sd(self.e_mid_r1)))
        out.update(_rename("encoder.conv_norm_out", sd(self.e_norm_out)))
        out.update(_rename("encoder.conv_out", sd(self.e_conv_out)))
        out.update(_rename("quant_conv", sd(self.quant_conv)))
        out.update(_rename("post_quant_conv", sd(self.post_quant_conv)))
        out.update(_rename("decoder.conv_in", sd(self.d_conv_in)))
        out.update(_rename("decoder.mid_block.resnets.0", sd(self.d_mid_r0)))
        out.update(_rename("decoder.mid_block.attentions.0",
                           self.d_mid_attn.renamed()))
        out.update(_rename("decoder.mid_block.resnets.1", sd(self.d_mid_r1)))
        k = 0
        for i in range(len(self.ch)):
            for j in range(2):
                out.update(_rename(f"decoder.up_blocks.{i}.resnets.{j}",
                                   sd(self.d_res[k])))
                k += 1
            if i < len(self.ch) - 1:
                out.update(_rename(f"decoder.up_blocks.{i}.upsamplers.0.conv",
                                   sd(self.d_up[i])))
        out.update(_rename("decoder.conv_norm_out", sd(self.d_norm_out)))
        out.update(_rename("decoder.conv_out", sd(self.d_conv_out)))
        return out


@pytest.fixture(scope="module")
def vae_oracle():
    torch.manual_seed(1)
    return TorchTinyVAE().eval()


def test_assembled_vae_encoder_matches_torch(vae_oracle):
    """Full tiny VAE encoder: resnet chain, asymmetric downsample pads,
    mid sequence, moments head + quant_conv (ref models.py:1328-1420)."""
    from diffusiontexturepainting_tpu.models.vae import VAEEncoder

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = vae_oracle.encode(t32(x).permute(0, 3, 1, 2))
        ref = ref.permute(0, 2, 3, 1).numpy()
    params = convert_vae_encoder(vae_oracle.diffusers_state_dict(),
                                 layers_per_block=1, num_blocks=4)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    out = VAEEncoder(tiny_vae_config()).apply({"params": params},
                                              jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_assembled_vae_decoder_matches_torch(vae_oracle):
    """Full tiny VAE decoder: post_quant_conv, mid sequence, up-path
    resnets + nearest-2x upsamples, output head (ref models.py:1237-1320)."""
    from diffusiontexturepainting_tpu.models.vae import VAEDecoder

    rng = np.random.default_rng(2)
    z = rng.standard_normal((2, 4, 4, 4)).astype(np.float32)
    with torch.no_grad():
        ref = vae_oracle.decode(t32(z).permute(0, 3, 1, 2))
        ref = ref.permute(0, 2, 3, 1).numpy()
    params = convert_vae_decoder(vae_oracle.diffusers_state_dict(),
                                 layers_per_block=1, num_blocks=4)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    out = VAEDecoder(tiny_vae_config()).apply({"params": params},
                                              jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)
