"""Data-parallel LoRA + image-encoder finetuning: the jitted train step.

The TPU re-design of the reference trainer
(training/train_texture_inpaint_lora.py:337-817): HF Accelerate + NCCL DDP
becomes a single pjit-compiled SPMD program over a jax.sharding.Mesh -
batch sharded over the 'data' axis, frozen tower weights optionally
sharded over the 'model' axis (FSDP-style), gradient reduction emitted by
XLA as ICI psums instead of NCCL all-reduce.

Faithful training semantics (train...py:640-715):
  - frozen: SD UNet base, VAE, CLIP; trainable: LoRA factors (rank 4 on
    every attention projection) + the patch-encoder head
  - DDPM scaled-linear 1000-step noising; epsilon or v-prediction target
  - optional noise offset; optional min-SNR-gamma loss weighting
  - per-sample conditioning dropout blending the learned uncond vector
  - AdamW + global-norm grad clip 1.0
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.lora import init_lora_params, merge_lora
from ..models.vae import sample_latents
from ..ops.resize import nearest_downsample
from ..schedulers.base import alphas_cumprod_from_betas, scaled_linear_betas


@dataclass(frozen=True)
class TrainConfig:
    resolution: int = 256
    lora_rank: int = 4
    learning_rate: float = 1e-4
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    snr_gamma: Optional[float] = None
    prediction_type: str = "epsilon"  # or "v_prediction"
    noise_offset: float = 0.0
    num_train_timesteps: int = 1000
    vae_scaling: float = 0.18215
    gradient_accumulation_steps: int = 1
    lr_warmup_steps: int = 0
    max_train_steps: int = 15000
    seed: int = 0


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    trainable: Dict[str, Any]  # {'lora': ..., 'patch_encoder': ...}
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.trainable)
        return self.replace(step=self.step + 1,
                            trainable=optax.apply_updates(self.trainable, updates),
                            opt_state=new_opt)


def split_patch_encoder_params(pe_params):
    """(head, clip): the reference freezes CLIP inside the encoder
    (training/image_encoder.py:40-41) and trains everything else."""
    head = {k: v for k, v in pe_params.items() if k != "clip"}
    return head, pe_params["clip"]


def make_optimizer(cfg: TrainConfig):
    if cfg.lr_warmup_steps > 0:
        schedule = optax.linear_schedule(0.0, cfg.learning_rate,
                                         cfg.lr_warmup_steps)
    else:
        schedule = cfg.learning_rate
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(schedule, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                    eps=cfg.adam_epsilon, weight_decay=cfg.adam_weight_decay),
    )
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx


def create_train_state(cfg: TrainConfig, unet_params, pe_params,
                       lora_seed: int = 0) -> TrainState:
    lora = init_lora_params(unet_params, rank=cfg.lora_rank, seed=lora_seed)
    head, _ = split_patch_encoder_params(pe_params)
    trainable = {"lora": lora, "patch_encoder": head}
    tx = make_optimizer(cfg)
    return TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                      opt_state=tx.init(trainable), tx=tx)


def make_loss_fn(cfg: TrainConfig, unet, vae_encoder, patch_encoder):
    """Pure loss over (trainable, frozen, batch, rng).

    batch:
      image:        (B, H, W, 3) in [-1, 1]
      mask:         (B, H, W, 1), 1 = GENERATE here (pre-inverted, matching
                    the reference collate_fn, train...py:519-527)
      masked_image: (B, H, W, 3) = image * (1 - mask)
      cond_patches: (B, P, 224, 224, 3) CLIP-normalized pyramid
      drop_cond:    (B,) 0/1 conditioning dropout flags
    """
    ac = jnp.asarray(alphas_cumprod_from_betas(
        scaled_linear_betas(cfg.num_train_timesteps)), jnp.float32)

    def loss_fn(trainable, frozen, batch, rng):
        r_lat, r_noise, r_off, r_t, r_mask = jax.random.split(rng, 5)
        unet_params = merge_lora(frozen["unet"], trainable["lora"])
        pe_params = {**trainable["patch_encoder"], "clip": frozen["clip"]}

        moments = vae_encoder.apply({"params": frozen["vae_encoder"]},
                                    batch["image"])
        latents = sample_latents(moments, r_lat) * cfg.vae_scaling

        noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
        if cfg.noise_offset:
            b, _, _, c = latents.shape
            noise = noise + cfg.noise_offset * jax.random.normal(
                r_off, (b, 1, 1, c), jnp.float32)

        b = latents.shape[0]
        t = jax.random.randint(r_t, (b,), 0, cfg.num_train_timesteps)
        a = ac[t][:, None, None, None]
        noisy = jnp.sqrt(a) * latents + jnp.sqrt(1.0 - a) * noise

        m_moments = vae_encoder.apply({"params": frozen["vae_encoder"]},
                                      batch["masked_image"])
        masked_latents = sample_latents(m_moments, r_mask) * cfg.vae_scaling
        mask_lat = nearest_downsample(batch["mask"], 8)

        unet_in = jnp.concatenate([noisy, mask_lat, masked_latents], axis=-1)

        cond, uncond = patch_encoder.apply({"params": pe_params},
                                           batch["cond_patches"],
                                           return_uncond_vector=True)
        drop = batch["drop_cond"].reshape(b, 1, 1).astype(jnp.float32)
        ehs = (1.0 - drop) * cond + drop * jnp.broadcast_to(uncond, cond.shape)

        pred = unet.apply({"params": unet_params}, unet_in,
                          t.astype(jnp.float32), ehs)

        if cfg.prediction_type == "epsilon":
            target = noise
        elif cfg.prediction_type == "v_prediction":
            target = jnp.sqrt(a) * noise - jnp.sqrt(1.0 - a) * latents
        else:
            raise ValueError(cfg.prediction_type)

        se = jnp.square(pred.astype(jnp.float32) - target)
        per_sample = se.mean(axis=(1, 2, 3))
        if cfg.snr_gamma is not None:
            snr = a[:, 0, 0, 0] / (1.0 - a[:, 0, 0, 0])
            weights = jnp.minimum(snr, cfg.snr_gamma) / snr
            per_sample = per_sample * weights
        return per_sample.mean()

    return loss_fn


def make_train_step(cfg: TrainConfig, unet, vae_encoder, patch_encoder):
    # Training differentiates the towers: route all convs to XLA's native
    # conv (and its native AD). The serving pallas kernels' custom_vjp
    # re-derivation measured ~60x slower per step (ops/conv3x3.py
    # _FORCE_IMPL), and XLA's conv is strong at training batch sizes.
    # The override is consulted at trace time, so it is scoped to the
    # step body: serving programs traced later in the same process keep
    # their pallas kernels.
    from ..ops.conv3x3 import conv_impl

    loss_fn = make_loss_fn(cfg, unet, vae_encoder, patch_encoder)

    def train_step(state: TrainState, frozen, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        with conv_impl("xla"):
            loss, grads = jax.value_and_grad(loss_fn)(state.trainable,
                                                      frozen, batch, rng)
        new_state = state.apply_gradients(grads)
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return train_step
