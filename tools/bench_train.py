"""Training-step throughput benchmark (steps/s, samples/s/chip).

Times the full-size jitted train step (frozen SD UNet + VAE + CLIP, LoRA
+ patch-encoder head trainable) at the reference's operating point
(256px; reference training/README.md:30-44 uses batch 32/GPU). The chain
threads the train state through N steps inside ONE jitted loop, so
tunnel/dispatch overhead is amortized out (see memory: chained-loop
methodology).

Usage: PYTHONPATH=. python tools/bench_train.py [--batch 8] [--res 256]
       [--steps 8] [--fp32]
"""

import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--lora_rank", type=int, default=4)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    from diffusiontexturepainting_tpu.core.config import PatchEncoderConfig
    from diffusiontexturepainting_tpu.training.train import build_models
    from diffusiontexturepainting_tpu.training.trainer import (
        TrainConfig, create_train_state, make_train_step,
        split_patch_encoder_params)
    from diffusiontexturepainting_tpu.weights.random_init import (
        init_pipeline_params)

    dtype = jnp.float32 if args.fp32 else None
    unet, vae_enc, vae_dec, pe = build_models(args.tiny, dtype=dtype)
    pcfg = PatchEncoderConfig()

    t0 = time.time()
    all_params = init_pipeline_params(unet, vae_enc, vae_dec, pe,
                                      resolution=min(args.res, 64))
    head, clip = split_patch_encoder_params(all_params["patch_encoder"])
    frozen = {"unet": all_params["unet"],
              "vae_encoder": all_params["vae_encoder"], "clip": clip}
    cfg = TrainConfig(resolution=args.res, lora_rank=args.lora_rank)
    state = create_train_state(cfg, all_params["unet"],
                               all_params["patch_encoder"])
    print(f"init in {time.time()-t0:.1f}s", file=sys.stderr)

    B, res, cs = args.batch, args.res, 224
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.standard_normal((B, res, res, 3)).astype(np.float32) * 0.1,
        "mask": (rng.random((B, res, res, 1)) > 0.5).astype(np.float32),
        "cond_patches": rng.standard_normal(
            (B, pcfg.total_patches, cs, cs, 3)).astype(np.float32),
        "drop_cond": (rng.random((B,)) < 0.1).astype(np.float32),
    }
    batch["masked_image"] = batch["image"] * (1.0 - batch["mask"])
    batch = {k: jax.device_put(v) for k, v in batch.items()}
    frozen = jax.device_put(frozen)
    state = jax.device_put(state)

    step = make_train_step(cfg, unet, vae_enc, pe)
    N = args.steps

    def chained(st, fz, bt, key):
        def body(i, carry):
            st, _ = carry
            return step(st, fz, bt, key)
        return jax.lax.fori_loop(0, N, body, (st, {"loss": jnp.float32(0),
                                                   "grad_norm": jnp.float32(0)}))

    fn = jax.jit(chained, donate_argnums=(0,))
    t0 = time.time()
    out_state, metrics = fn(state, frozen, batch, jax.random.PRNGKey(0))
    np.asarray(metrics["loss"])  # sync (block_until_ready unreliable on axon)
    print(f"compile+first in {time.time()-t0:.1f}s", file=sys.stderr)

    best = 1e9
    for _ in range(3):
        # feed the (fresh) output state back in - round-tripping the
        # ~260 MB optimizer state through the tunneled host dominates
        # the measurement otherwise
        tic = time.perf_counter()
        out_state, metrics = fn(out_state, frozen, batch, jax.random.PRNGKey(1))
        loss = float(np.asarray(metrics["loss"]))
        best = min(best, (time.perf_counter() - tic))
    per_step = best / N
    print(f"loss={loss:.4f}", file=sys.stderr)
    print(f"train step: {per_step*1e3:.1f} ms  "
          f"({1.0/per_step:.2f} steps/s, "
          f"{args.batch/per_step:.1f} samples/s/chip, batch={args.batch}, "
          f"res={args.res})")


if __name__ == "__main__":
    main()
