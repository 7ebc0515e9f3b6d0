"""Configuration dataclasses for every model / pipeline / server knob.

The TPU analog of the reference's scattered config surface: TRT build
parameters (models.py:864-940), pipeline defaults (trt_model.py:35-53),
wire/UI settings (manager.py:104-110), and training argparse
(train_texture_inpaint_lora.py:89-334). Everything here is static,
hashable, and safe to close over in jitted programs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple


@dataclass(frozen=True)
class UNetConfig:
    """SD-1.5 inpainting UNet (reference models.py make_UNet:1231-1234,
    unet_dim=9; HF runwayml/stable-diffusion-inpainting)."""

    in_channels: int = 9
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    # SD-1.x quirk: "attention_head_dim=8" historically means 8 *heads*;
    # head dim is channels/8 per resolution.
    num_attention_heads: int = 8
    norm_num_groups: int = 32
    # Which down/up positions carry cross-attention transformers
    # (True for the first three resolutions, False for the innermost).
    attn_down: Tuple[bool, ...] = (True, True, True, False)
    time_embed_dim_mult: int = 4
    freq_shift: int = 0
    flip_sin_to_cos: bool = True
    # Serving-only: execute resnet GroupNorm+SiLU+conv chains as fused
    # resident kernels (see models/layers.py ResnetBlock.fused). No VJP;
    # keep False for training.
    fused_resnet: bool = False
    # Serving-only: run transformer FeedForwards as one token-blocked
    # GEGLU pallas kernel (ops/ff_geglu.py). No VJP.
    fused_ff: bool = False
    # Serving-only: fold each Transformer2D's GroupNorm into its 1x1
    # proj_in, fed by the preceding fused resnet's stats epilogue. No VJP.
    fused_norm: bool = False
    # Serving-only: head-slotted self-attention (models/layers.py
    # Attention.slotted): the q/k/v projections emit the fused kernel's
    # (B, L, heads*128) layout directly. No VJP.
    fused_attn: bool = False

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * self.time_embed_dim_mult


@dataclass(frozen=True)
class VAEConfig:
    """SD-1.5 AutoencoderKL (reference models.py make_VAE/make_VAEEncoder)."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2  # encoder resnets per block; decoder uses +1
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215


@dataclass(frozen=True)
class CLIPVisionConfig:
    """CLIP ViT-B/32 vision tower.

    Serves both reference flavors, which are mathematically identical at
    the output we need: OpenAI clip.encode_image with visual.proj=None
    (trt_inference/image_encoder.py:49-50, 81) and HF
    CLIPVisionModel.pooler_output (training/image_encoder.py:39, 68) both
    compute post_layernorm(CLS token).
    """

    image_size: int = 224
    patch_size: int = 32
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    layer_norm_eps: float = 1e-5


@dataclass(frozen=True)
class CLIPTextConfig:
    """CLIP ViT-L/14 text tower (SD-1.5's text encoder).

    The reference builds a TRT engine for it (models.py:943-1009) and
    exposes encode_prompt (stable_diffusion_pipeline.py:369-405), but its
    own inpaint serving path never calls either - conditioning comes from
    the image patch encoder instead (trt_model.py:53-61). Provided for
    full component parity; see models/clip_text.py.
    """

    vocab_size: int = 49408
    max_length: int = 77
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    layer_norm_eps: float = 1e-5
    # openai/clip-vit-large-patch14 token ids (SD-1.5 tokenizer):
    bos_token_id: int = 49406
    eos_token_id: int = 49407


@dataclass(frozen=True)
class PatchEncoderConfig:
    """ConditionPatchEncoder (reference image_encoder.py:43-115)."""

    cross_attention_dim: int = 768
    num_layers: int = 4
    hid_size: int = 768
    num_heads: int = 4
    num_patches: Tuple[int, ...] = (1, 4, 9)
    clip: CLIPVisionConfig = field(default_factory=CLIPVisionConfig)

    @property
    def total_patches(self) -> int:
        return sum(self.num_patches)


@dataclass(frozen=True)
class PipelineConfig:
    """Serving pipeline defaults (reference trt_model.py:35-45 and
    manager.py:104-110)."""

    scheduler: str = "DDIM"
    denoising_steps: int = 20
    guidance_scale: float = 2.0
    texture_guidance_scale: float = 1.0
    texture_guidance_steps: int = 20
    context_pad: int = 150
    vae_scaling: float = 0.18215
    seed: int = 42
    # DeepCache-style UNet feature caching: run the full UNet every
    # `deep_cache_interval` steps and only the outermost level in between.
    # 1 = off (exact parity). Uniform intervals apply only when the
    # requested step count is >= deep_cache_min_steps. An explicit
    # 'FSSF'-style str pins the full/shallow placement per step instead:
    # it applies at exactly the step count whose SCHEDULER ITERATION
    # count matches the pattern length (PNDM runs steps+1 model calls)
    # and BYPASSES the min-steps gate (an explicit opt-in; see
    # pipeline/tpu_model.py _cache_interval).
    deep_cache_interval: int | str = 1
    deep_cache_min_steps: int = 8
    # Step-granular f32 promotion (the middle fidelity point between
    # all-bf16 and --f32-components unet): compute ONLY the final denoise
    # step's UNet eval in f32 (XLA path, bf16-stored weights upcast in
    # registers). The final eps enters the x0 estimate at full weight, so
    # this is where bf16 rounding hurts most; earlier steps' rounding
    # perturbs the trajectory only at the measured ~1-LSB-control level.
    # Cost: one f32 UNet step instead of a bf16 one (~+45 ms at 512px).
    f32_final_step: bool = False
    # Fused VAE execution: run encoder/decoder as chained
    # GroupNorm-prologue/stats-epilogue streaming conv kernels
    # (ops/gn_conv_stream.py) instead of the Flax modules. Identical
    # parameters; numerics match the module path's bf16 epilogue
    # ordering. Gated per module from on-device measurements at 512px
    # (v5e). Round 3: with the cout-innermost grid (window DMA + GN
    # prologue once per row window) the decoder fused path finally
    # WINS: 17.3 vs 18.45 ms device (it lost 2.1x in round 1 when the
    # prologue re-ran per cout tile); encoder 19.3 vs ~25 ms module.
    fused_vae_encoder: bool = True
    fused_vae_decoder: bool = True
    # Fused UNet resnet execution (chained-GN resident conv kernels,
    # models/layers.py ResnetBlock.fused): 11% faster per resnet chain at
    # the 512px L0 shape on v5e; shapes outside the resident-VMEM budget
    # fall back per-conv.
    fused_unet_resnet: bool = True
    # Fused transformer FeedForward (token-blocked GEGLU pallas kernel,
    # ops/ff_geglu.py): the (tokens, 4C) FF intermediate stays in VMEM.
    fused_unet_ff: bool = True
    # Folded Transformer2D GroupNorm (chained from the resnet stats
    # epilogue; the affine rides the proj_in matmul).
    fused_unet_norm: bool = True
    # Head-slotted self-attention (negative result, kept measurable):
    # the q/k/v projections write the fused kernel's (B, L, heads*128)
    # layout directly, eliminating the split/pad/transpose passes - but
    # measured 25.1 vs 23.8 ms/UNet-step on v5e: the kernel's K/V panel
    # blocks become strided-lane reads of a 3072-wide array (256-byte
    # row segments), and the zero-padded projections cost 3x their MXU
    # time. The microbench win that motivated it (0.69 vs 1.16 ms,
    # tools/bench_attn_variants.py) came from bf16-exp2 softmax + a
    # CONTIGUOUS per-head layout; the plain path now gets the bf16-exp2
    # half via ops/attention.py _EXP2_BF16.
    fused_unet_attn: bool = False


# CLIP image normalization constants (reference image_encoder.py:75-76).
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def tiny_unet_config() -> UNetConfig:
    """Small UNet for CPU tests: same topology, narrow channels."""
    return UNetConfig(
        block_out_channels=(32, 64, 64, 64),
        layers_per_block=1,
        cross_attention_dim=32,
        num_attention_heads=2,
        norm_num_groups=8,
    )


def tiny_vae_config() -> VAEConfig:
    return VAEConfig(block_out_channels=(16, 16, 32, 32), layers_per_block=1,
                     norm_num_groups=8)


def tiny_clip_config() -> CLIPVisionConfig:
    return CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=32,
                            intermediate_size=64, num_layers=2, num_heads=2)


def tiny_patch_encoder_config() -> PatchEncoderConfig:
    return PatchEncoderConfig(cross_attention_dim=32, num_layers=1, hid_size=32,
                              num_heads=2, clip=tiny_clip_config())
