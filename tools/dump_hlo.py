"""Compile a pipeline component for the current backend and dump its
optimized HLO (with backend_config estimated_cycles) to a text file, for
tools/hlo_cost_table.py attribution.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/dump_hlo.py \
      --component unet --out /tmp/unet_hlo.txt \
      [--fused-resnet --fused-ff --fused-norm]
"""

import argparse

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--component", default="unet",
                    choices=["unet", "vae_dec", "vae_enc"])
    ap.add_argument("--out", default="/tmp/hlo.txt")
    ap.add_argument("--fused-resnet", action="store_true")
    ap.add_argument("--fused-ff", action="store_true")
    ap.add_argument("--fused-norm", action="store_true")
    ap.add_argument("--fused-attn", action="store_true")
    args = ap.parse_args()

    from diffusiontexturepainting_tpu.core.config import UNetConfig, VAEConfig

    res = args.resolution
    lat = res // 8
    key = jax.random.PRNGKey(0)

    if args.component == "unet":
        from diffusiontexturepainting_tpu.models.unet import UNet2DCondition

        model = UNet2DCondition(
            UNetConfig(fused_resnet=args.fused_resnet,
                       fused_ff=args.fused_ff,
                       fused_norm=args.fused_norm,
                       fused_attn=args.fused_attn), dtype=jnp.bfloat16)
        sample = jax.random.normal(key, (3, lat, lat, 9), jnp.float32)
        ctx = jax.random.normal(key, (3, 14, 768), jnp.float32)
        t = jnp.full((3,), 500.0, jnp.float32)
        params = jax.eval_shape(model.init, key, sample, t, ctx)["params"]
        params = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, jnp.bfloat16), params)
        fn = lambda p, s: model.apply({"params": p}, s, t, ctx)
        lowered = jax.jit(fn).lower(params, sample)
    elif args.component == "vae_dec":
        from diffusiontexturepainting_tpu.models.vae import fused_decode

        vcfg = VAEConfig()
        from diffusiontexturepainting_tpu.models.vae import VAEDecoder

        model = VAEDecoder(vcfg, dtype=jnp.bfloat16)
        z = jax.random.normal(key, (1, lat, lat, 4), jnp.float32)
        params = jax.eval_shape(model.init, key, z)["params"]
        params = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, jnp.bfloat16), params)
        lowered = jax.jit(
            lambda p, s: fused_decode(p, s, vcfg)).lower(params, z)
    else:
        from diffusiontexturepainting_tpu.models.vae import (
            VAEEncoder,
            fused_encode,
        )

        vcfg = VAEConfig()
        model = VAEEncoder(vcfg, dtype=jnp.bfloat16)
        img = jax.random.normal(key, (2, res, res, 3), jnp.float32)
        params = jax.eval_shape(model.init, key, img)["params"]
        params = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, jnp.bfloat16), params)
        lowered = jax.jit(
            lambda p, s: fused_encode(p, s, vcfg, jnp.bfloat16)).lower(
                params, img)

    compiled = lowered.compile()
    text = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(text)
    print(f"wrote {len(text)} bytes to {args.out}")


if __name__ == "__main__":
    main()
