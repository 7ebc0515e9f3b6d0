"""Training entry point: LoRA + image-encoder finetune on texture folders.

The TPU analog of the reference's accelerate-launched trainer
(training/train_texture_inpaint_lora.py:337-817): SPMD data-parallel
train step over a jax mesh, orbax checkpoint/resume (explicit step or
"latest" discovery, bounded retention), tensorboard metrics + per-epoch
validation image grids, and a final export of serving-ready artifacts
(LoRA-merged unet.npz + patch_encoder.npz - the counterpart of
pytorch_lora_weights.bin + image_encoder.pth).

Usage:
    python -m diffusiontexturepainting_tpu.training.train \
        --images_path /data/dtd --output_dir runs/tex1 \
        --train_batch_size 32 --max_train_steps 15000
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def _prefetch(it, depth: int = 2):
    """Background-thread batch prefetch (bounded queue): the next
    batch's host-side prep runs while the device executes the current
    step. Worker exceptions are re-raised at the consuming site."""
    import queue
    import threading

    q = queue.Queue(maxsize=depth)
    _end = object()

    def worker():
        try:
            for item in it:
                q.put(item)
            q.put(_end)
        except BaseException as e:  # noqa: BLE001 - surface in main thread
            q.put(e)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is _end:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images_path", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--pretrained_dir", default=None,
                   help="dir with unet/vae/patch-encoder .npz (frozen towers)")
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--train_batch_size", type=int, default=32)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--max_train_steps", type=int, default=15000)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--lr_warmup_steps", type=int, default=0)
    p.add_argument("--lora_rank", type=int, default=4)
    p.add_argument("--snr_gamma", type=float, default=None)
    p.add_argument("--prediction_type", default="epsilon",
                   choices=["epsilon", "v_prediction"])
    p.add_argument("--noise_offset", type=float, default=0.0)
    p.add_argument("--cond_drop_prob", type=float, default=0.1)
    p.add_argument("--prob_no_mask", type=float, default=0.1)
    p.add_argument("--prob_empty_mask", type=float, default=0.2)
    p.add_argument("--num_images", type=int, default=-1)
    p.add_argument("--single_image", default=None)
    p.add_argument("--augment_data", action="store_true")
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--checkpoints_total_limit", type=int, default=None)
    p.add_argument("--resume_from_checkpoint", default=None,
                   help="'latest' or an explicit step number")
    p.add_argument("--validation_steps", type=int, default=0,
                   help="run a validation grid every N steps (0 = use "
                        "--validation_epochs)")
    p.add_argument("--validation_epochs", type=int, default=1,
                   help="run a validation grid every N epochs (reference "
                        "default: every epoch, train...py:749-782); "
                        "0 disables epoch-based validation")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh_data", type=int, default=None)
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--tiny", action="store_true", help="tiny model (tests)")
    p.add_argument("--mixed_precision", choices=["bf16", "fp32"], default=None,
                   help="compute dtype (params stay f32); default bf16 on "
                        "TPU, fp32 elsewhere")
    p.add_argument("--log_every", type=int, default=10)
    # multi-host (DCN) bring-up - the analog of `accelerate launch`'s
    # process-group init (reference train...py:343-349 / --local_rank)
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port for multi-host "
                        "training (jax.distributed over DCN)")
    p.add_argument("--num_processes", type=int, default=None,
                   help="total number of training processes (multi-host)")
    p.add_argument("--process_id", type=int, default=None,
                   help="this process's index (multi-host)")
    p.add_argument("--wandb", action="store_true",
                   help="also log metrics to Weights & Biases (reference "
                        "train...py:286-294; tensorboard stays on)")
    p.add_argument("--wandb_project", default="dtp-tpu")
    return p


def build_models(tiny: bool, dtype=None):
    """dtype = compute dtype (mixed precision): params always live in f32
    (flax param_dtype), activations/matmuls run in `dtype` - the analog of
    the reference's accelerate fp16/bf16 training (train...py:395-399)."""
    import jax
    import jax.numpy as jnp

    from ..core.config import (PatchEncoderConfig, UNetConfig, VAEConfig,
                               tiny_patch_encoder_config, tiny_unet_config,
                               tiny_vae_config)
    from ..models.patch_encoder import ConditionPatchEncoder
    from ..models.unet import UNet2DCondition
    from ..models.vae import VAEDecoder, VAEEncoder

    if dtype is None:
        dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                 else jnp.float32)
    if tiny:
        ucfg, vcfg, pcfg = (tiny_unet_config(), tiny_vae_config(),
                            tiny_patch_encoder_config())
    else:
        ucfg, vcfg, pcfg = UNetConfig(), VAEConfig(), PatchEncoderConfig()
    return (UNet2DCondition(ucfg, dtype=dtype), VAEEncoder(vcfg, dtype=dtype),
            VAEDecoder(vcfg, dtype=dtype),
            ConditionPatchEncoder(pcfg, dtype=dtype))


def main(argv=None):
    args = build_argparser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import orbax.checkpoint as ocp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models.lora import merge_lora
    from ..parallel.mesh import make_mesh, shard_params
    from ..weights.loader import (load_pipeline_params, save_component)
    from ..weights.random_init import init_pipeline_params
    from .dataset import AugmentedTextures
    from .trainer import (TrainConfig, create_train_state, make_train_step,
                          split_patch_encoder_params)

    import jax.numpy as jnp

    # multi-host bring-up must precede any device use (reference analog:
    # `accelerate launch` initializes the NCCL process group before model
    # placement, train...py:343-349); single-process runs no-op here.
    from ..parallel.mesh import init_distributed

    init_distributed(args.coordinator, args.num_processes, args.process_id)

    mp_dtype = {None: None, "bf16": jnp.bfloat16,
                "fp32": jnp.float32}[args.mixed_precision]
    unet, vae_enc, vae_dec, patch_enc = build_models(args.tiny, dtype=mp_dtype)
    cfg = TrainConfig(
        resolution=args.resolution, lora_rank=args.lora_rank,
        learning_rate=args.learning_rate, snr_gamma=args.snr_gamma,
        prediction_type=args.prediction_type, noise_offset=args.noise_offset,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        lr_warmup_steps=args.lr_warmup_steps,
        max_train_steps=args.max_train_steps, seed=args.seed,
        max_grad_norm=args.max_grad_norm)

    if args.pretrained_dir:
        all_params = load_pipeline_params(args.pretrained_dir, unet, vae_enc,
                                          vae_dec, patch_enc)
    else:
        logger.warning("no --pretrained_dir: frozen towers are random "
                       "(smoke-training only)")
        all_params = init_pipeline_params(unet, vae_enc, vae_dec, patch_enc,
                                          resolution=min(args.resolution, 64))

    mesh = make_mesh(data=args.mesh_data, model=args.mesh_model)
    logger.info("mesh: %s", dict(mesh.shape))
    head, clip = split_patch_encoder_params(all_params["patch_encoder"])
    frozen = {
        "unet": shard_params(all_params["unet"], mesh),
        "vae_encoder": shard_params(all_params["vae_encoder"], mesh),
        "clip": shard_params(clip, mesh),
    }
    state = create_train_state(cfg, all_params["unet"],
                               all_params["patch_encoder"],
                               lora_seed=args.seed)
    replicated = NamedSharding(mesh, P())
    state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated) if hasattr(x, "shape") else x,
        state)

    # --- checkpointing (reference train...py:296-314, 610-632, 737-741) ---
    ckpt_dir = os.path.abspath(os.path.join(args.output_dir, "checkpoints"))
    os.makedirs(ckpt_dir, exist_ok=True)
    mngr = ocp.CheckpointManager(
        ckpt_dir,
        options=ocp.CheckpointManagerOptions(
            max_to_keep=args.checkpoints_total_limit, create=True),
    )
    start_step = 0
    if args.resume_from_checkpoint:
        step = (mngr.latest_step() if args.resume_from_checkpoint == "latest"
                else int(args.resume_from_checkpoint))
        if step is not None:
            target = {"trainable": state.trainable,
                      "opt_state": state.opt_state}
            restored = mngr.restore(
                step, args=ocp.args.StandardRestore(target))
            state = state.replace(step=jnp.asarray(step, jnp.int32),
                                  trainable=restored["trainable"],
                                  opt_state=restored["opt_state"])
            start_step = step
            logger.info("resumed from checkpoint step %d", step)
        else:
            logger.warning("no checkpoint found; starting fresh")

    # --- data ---
    dataset = AugmentedTextures(
        args.images_path, size=args.resolution,
        cond_size=patch_enc.cfg.clip.image_size,
        cond_drop_prob=args.cond_drop_prob, prob_no_mask=args.prob_no_mask,
        prob_empty_mask=args.prob_empty_mask, num_images=args.num_images,
        single_image=args.single_image, augment=args.augment_data,
        num_patches=patch_enc.cfg.num_patches, seed=args.seed)
    logger.info("dataset: %d images", len(dataset))
    data_sharding = NamedSharding(mesh, P("data"))

    # --- trackers: tensorboard (default) + optional wandb (reference
    # train...py:286-294 offers the same two via accelerate) ---
    try:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(os.path.join(args.output_dir, "logs"))
    except Exception:  # pragma: no cover
        writer = None
    wandb_run = None
    if args.wandb:
        try:
            import wandb

            wandb_run = wandb.init(project=args.wandb_project,
                                   config=vars(args))
        except Exception as e:  # pragma: no cover - wandb not installed
            logger.warning("--wandb requested but unavailable: %s", e)

    train_step = jax.jit(make_train_step(cfg, unet, vae_enc, patch_enc))
    rng = jax.random.PRNGKey(args.seed)

    # start= replays the exact batch sequence from the resume point
    # (reference train...py:643-646 skips dataloader steps; here the data
    # stream is a pure function of (seed, batch index) so this is O(1)).
    # _prefetch overlaps host-side sample prep (PIL decode, augmentation,
    # 14 patch resizes, mask rasterization per sample) with the device
    # step - the reference gets the same overlap from DataLoader
    # num_workers; without it the accelerator idles for the whole batch
    # prep between steps. Determinism/resume are unaffected: the stream
    # stays a pure function of (seed, batch index).
    it = _prefetch(dataset.batches(args.train_batch_size, start=start_step))
    # validation cadence: explicit --validation_steps wins; otherwise
    # every --validation_epochs epochs (the reference validates per
    # epoch, train...py:749-782).
    steps_per_epoch = max(1, len(dataset) // args.train_batch_size)
    val_every = args.validation_steps or (
        args.validation_epochs * steps_per_epoch
        if args.validation_epochs > 0 else 0)
    t_last = time.time()
    with mesh:
        for step in range(start_step, args.max_train_steps):
            batch = next(it)
            batch = {k: jax.device_put(v, data_sharding if np.ndim(v) > 1
                                       else replicated)
                     for k, v in batch.items()}
            state, metrics = train_step(state, frozen, batch, rng)

            if (step + 1) % args.log_every == 0:
                loss = float(metrics["loss"])
                gnorm = float(metrics["grad_norm"])
                dt = (time.time() - t_last) / args.log_every
                t_last = time.time()
                logger.info("step %d loss %.4f grad_norm %.3f %.2fs/step",
                            step + 1, loss, gnorm, dt)
                if writer:
                    writer.add_scalar("train/loss", loss, step + 1)
                    writer.add_scalar("train/grad_norm", gnorm, step + 1)
                    writer.add_scalar("train/steps_per_sec", 1.0 / max(dt, 1e-9),
                                      step + 1)
                if wandb_run:
                    wandb_run.log({"train/loss": loss,
                                   "train/grad_norm": gnorm,
                                   "train/steps_per_sec": 1.0 / max(dt, 1e-9)},
                                  step=step + 1)

            if (step + 1) % args.checkpointing_steps == 0:
                mngr.save(step + 1, args=ocp.args.StandardSave(
                    {"trainable": jax.device_get(state.trainable),
                     "opt_state": jax.device_get(state.opt_state)}))
                mngr.wait_until_finished()
                logger.info("saved checkpoint at step %d", step + 1)

            if val_every and (step + 1) % val_every == 0:
                _validation_grid(args, writer, step + 1, unet, vae_enc, vae_dec,
                                 patch_enc, all_params, frozen, state, dataset)

    # --- final export: serving-ready artifacts ---
    merged = merge_lora(jax.device_get(all_params["unet"]),
                        jax.device_get(state.trainable["lora"]))
    export_dir = os.path.join(args.output_dir, "export")
    os.makedirs(export_dir, exist_ok=True)
    save_component(os.path.join(export_dir, "unet.npz"), merged)
    pe_full = {**jax.device_get(state.trainable["patch_encoder"]),
               "clip": jax.device_get(clip)}
    save_component(os.path.join(export_dir, "patch_encoder.npz"), pe_full)
    save_component(os.path.join(export_dir, "vae_encoder.npz"),
                   jax.device_get(all_params["vae_encoder"]))
    save_component(os.path.join(export_dir, "vae_decoder.npz"),
                   jax.device_get(all_params["vae_decoder"]))
    logger.info("exported serving checkpoint to %s", export_dir)
    if wandb_run:
        wandb_run.finish()
    if writer:
        writer.close()
    return export_dir


def _validation_grid(args, writer, step, unet, vae_enc, vae_dec, patch_enc,
                     all_params, frozen, state, dataset):
    """Inpaint a validation sample with the current weights and log a
    [masked source | mask | conditioning image | result] grid matching
    the reference's panel set (train...py:66-86, 749-782)."""
    try:
        from ..models.lora import merge_lora
        from ..pipeline.inpaint import StampModels, make_stamp_fn

        merged_unet = merge_lora(all_params["unet"],
                                 jax.device_get(state.trainable["lora"]))
        pe = {**jax.device_get(state.trainable["patch_encoder"]),
              "clip": jax.device_get(frozen["clip"])}
        models = StampModels(
            unet_apply=lambda p, s, t, c: unet.apply({"params": p}, s, t, c),
            vae_encode_apply=lambda p, x: vae_enc.apply({"params": p}, x),
            vae_decode_apply=lambda p, z: vae_dec.apply({"params": p}, z),
            params=None)
        stamp = jax.jit(make_stamp_fn(models, "DDIM", 20))

        sample = dataset[0]
        canvas = np.concatenate(
            [(sample["masked_image"] + 1.0) / 2.0, 1.0 - sample["mask"]],
            axis=-1)
        canvas_u8 = (np.clip(canvas, 0, 1) * 255).astype(np.uint8)[None]
        cond, uncond = patch_enc.apply({"params": pe},
                                       sample["cond_patches"][None],
                                       return_uncond_vector=True)
        params = {"unet": merged_unet,
                  "vae_encoder": jax.device_get(frozen["vae_encoder"]),
                  "vae_decoder": jax.device_get(all_params["vae_decoder"])}
        brush = jnp.zeros((1,) + canvas.shape[:2] + (3,), jnp.float32)
        _, comp = stamp(params, canvas_u8, brush, cond, uncond,
                        jax.random.PRNGKey(step), jnp.uint32(0),
                        jnp.float32(2.0), jnp.float32(0.0), jnp.int32(0),
                        jnp.int32(150))
        if writer:
            cond_u8 = (np.clip(sample["cond_image"], 0, 1)
                       * 255).astype(np.uint8)
            grid = np.concatenate(
                [canvas_u8[0, ..., :3],
                 np.repeat((255 * (1 - sample["mask"])).astype(np.uint8), 3, -1),
                 cond_u8,
                 np.asarray(comp)], axis=1)
            writer.add_image("val/grid", grid, step, dataformats="HWC")
    except Exception as e:  # pragma: no cover - validation is best-effort
        logger.warning("validation grid failed: %s", e)


if __name__ == "__main__":
    main()
