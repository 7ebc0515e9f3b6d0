"""Device cost of the DeepCache split: forward_full vs forward_shallow.

The round-2 design assumed the shallow pass (conv_in + down level 0 +
up level 3 + head, models/unet.py forward_shallow) is ~1/3 of the full
UNet's FLOPs. At 512px (latent 64x64) the OUTERMOST level carries the
4096-token self-attentions - the one op family measured at ~31% MXU
(r3/r4 floor analysis) - so its share of device TIME can be far larger
than its FLOP share. This tool measures, with chained fori_loop timing
(carry feeds each iteration's input from the previous eps, so XLA
cannot overlap or elide iterations):

    full     = forward_full          (everything, returns eps + cache)
    shallow  = forward_shallow       (outer level against a fixed cache)
    level0   = conv_in + down level 0 only (the shared prefix)

full - shallow ~= what DeepCache actually saves per cached step;
shallow - level0 ~= the last-up-level cost; these decide whether any
full/shallow schedule can reach the <100 ms stamp target on one chip.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/bench_deepcache_split.py [--resolution 512] [--n 40]
"""

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--n", type=int, default=40)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from diffusiontexturepainting_tpu.core.config import (
        PipelineConfig, UNetConfig, tiny_unet_config)
    from diffusiontexturepainting_tpu.models.unet import UNet2DCondition

    pcfg = PipelineConfig()
    ucfg = tiny_unet_config() if args.tiny else UNetConfig()
    import dataclasses
    ucfg = dataclasses.replace(
        ucfg, fused_resnet=pcfg.fused_unet_resnet,
        fused_ff=pcfg.fused_unet_ff, fused_norm=pcfg.fused_unet_norm,
        fused_attn=pcfg.fused_unet_attn)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    unet = UNet2DCondition(ucfg, dtype=dtype)

    h = args.resolution // 8
    sample = jnp.zeros((3, h, h, 9), jnp.float32)
    t = jnp.full((3,), 500.0, jnp.float32)
    ctx = jnp.zeros((3, 14, ucfg.cross_attention_dim), jnp.float32)
    params = jax.jit(unet.init)(jax.random.PRNGKey(0), sample, t, ctx)["params"]
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if dtype == jnp.bfloat16 and jnp.issubdtype(a.dtype, jnp.floating)
        else a, params)

    _, cache0 = jax.jit(lambda p, s: unet.apply(
        {"params": p}, s, t, ctx, method=UNet2DCondition.forward_full))(
            params, sample)
    cache0 = jax.block_until_ready(cache0)
    print(f"cache feature: {cache0.shape} {cache0.dtype}", file=sys.stderr)

    def chain(step_fn):
        """N chained evals: the carry rebuilds the 9-ch input from the
        previous eps (real data dependency; nothing constant-folds)."""
        def body(_, x):
            eps = step_fn(x)
            return jnp.concatenate(
                [eps, eps, eps[..., :1]], axis=-1).astype(x.dtype)

        return jax.jit(lambda x: jax.lax.fori_loop(0, args.n, body, x))

    variants = {
        "full": chain(lambda x: unet.apply(
            {"params": params}, x, t, ctx,
            method=UNet2DCondition.forward_full)[0]),
        "shallow": chain(lambda x: unet.apply(
            {"params": params}, x, t, ctx, cache0,
            method=UNet2DCondition.forward_shallow)),
        "level0": chain(lambda x: unet.apply(
            {"params": params}, x, t, ctx,
            method=lambda m, s, tt, cc: m._level0(
                s, m._temb(tt, s.shape[0]), cc.astype(m.dtype))[0]
            )[..., :4].astype(jnp.float32)),
    }

    results = {}
    for name, fn in variants.items():
        tic = time.time()
        out = jax.block_until_ready(fn(sample))
        print(f"{name}: compiled+first in {time.time() - tic:.1f}s",
              file=sys.stderr)
        best = 1e9
        for _ in range(3):
            tic = time.perf_counter()
            jax.block_until_ready(fn(sample))
            best = min(best, (time.perf_counter() - tic) * 1e3 / args.n)
        results[name] = best
        print(f"{name}: {best:.2f} ms/eval (batch 3, {args.resolution}px)",
              flush=True)

    f, s, l0 = (results[k] for k in ("full", "shallow", "level0"))
    print(f"shallow/full = {s / f:.2f}; level0 share of full = {l0 / f:.2f}; "
          f"last-up-level ~= {s - l0:.2f} ms; "
          f"DeepCache saves {f - s:.2f} ms per cached step")


if __name__ == "__main__":
    main()
