"""Profile one UNet denoise step (CFG batch 3) on the TPU and print an
aggregated per-op device-time table.

Uses jax.profiler.trace -> perfetto json parsing (the reliable recipe on
the tunneled axon backend: device pid has process_name '/device:TPU:0';
skip jit_ parent spans; strip .N suffixes to aggregate).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_unet_step.py \
      [--resolution 512] [--top 40] [--component unet|vae_dec|vae_enc]
"""

import argparse
import glob
import gzip
import json
import os
import re
import time

import numpy as np

import jax
import jax.numpy as jnp


def parse_trace(trace_dir, top=40):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert files, f"no trace files under {trace_dir}"
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    device_pids = {e["pid"] for e in events
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and "TPU" in str(e.get("args", {}).get("name", ""))}
    agg = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_") or name.startswith("Steal"):
            continue
        base = re.sub(r"\.\d+$", "", name)
        dur = e.get("dur", 0) / 1000.0  # us -> ms
        agg[base] = agg.get(base, 0.0) + dur
        total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    print(f"total device time in trace: {total:.2f} ms")
    for name, ms in rows:
        print(f"  {ms:8.3f} ms  {100 * ms / total:5.1f}%  {name[:110]}")
    return agg, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--component", default="unet",
                    choices=["unet", "vae_dec", "vae_dec_fused", "vae_enc"])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--fused-resnet", action="store_true")
    ap.add_argument("--fused-ff", action="store_true")
    ap.add_argument("--fused-norm", action="store_true")
    ap.add_argument("--fused-attn", action="store_true")
    ap.add_argument("--ln", default=None, choices=["f32", "apply16"],
                    help="override models.layers._LN_IMPL for the A/B")
    ap.add_argument("--trace-dir", default="/tmp/unet_trace")
    args = ap.parse_args()

    if args.ln:
        from diffusiontexturepainting_tpu.models import layers as _layers

        _layers._LN_IMPL = args.ln

    from diffusiontexturepainting_tpu.core.config import (
        UNetConfig,
        VAEConfig,
    )
    from diffusiontexturepainting_tpu.core.engine import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
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
        # init must be jitted: eager init dispatches each pallas conv as a
        # standalone program, which trips the remote compiler's 16 MB
        # scoped-VMEM limit (fine when embedded in a larger jit)
        params = jax.jit(model.init)(key, sample, t, ctx)["params"]
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), params)
        fn = jax.jit(lambda p, s: model.apply({"params": p}, s, t, ctx))
        arg = sample
    elif args.component in ("vae_dec", "vae_dec_fused"):
        from diffusiontexturepainting_tpu.models.vae import (
            VAEDecoder,
            fused_decode,
        )

        vcfg = VAEConfig()
        model = VAEDecoder(vcfg, dtype=jnp.bfloat16)
        z = jax.random.normal(key, (1, lat, lat, 4), jnp.float32)
        params = jax.jit(model.init)(key, z)["params"]
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), params)
        if args.component == "vae_dec_fused":
            fn = jax.jit(lambda p, s: fused_decode(p, s, vcfg))
        else:
            fn = jax.jit(lambda p, s: model.apply({"params": p}, s))
        arg = z
    else:
        from diffusiontexturepainting_tpu.models.vae import fused_encode

        cfg = VAEConfig()
        from diffusiontexturepainting_tpu.models.vae import VAEEncoder

        model = VAEEncoder(cfg, dtype=jnp.bfloat16)
        img = jax.random.normal(key, (2, res, res, 3), jnp.float32)
        params = jax.jit(model.init)(key, img)["params"]
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), params)
        fn = jax.jit(lambda p, s: fused_encode(p, s, cfg, jnp.bfloat16))
        arg = img

    sync = lambda o: np.asarray(o.ravel()[:1])
    out = fn(params, arg)
    sync(out)
    tic = time.perf_counter()
    for _ in range(args.iters):
        out = fn(params, arg)
    sync(out)
    wall = (time.perf_counter() - tic) * 1e3 / args.iters
    print(f"{args.component} {res}px: ~{wall:.2f} ms/iter "
          f"(repeated-dispatch, incl. tail RTT)")

    os.makedirs(args.trace_dir, exist_ok=True)
    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.iters):
        out = fn(params, arg)
    sync(out)
    jax.profiler.stop_trace()
    agg, total = parse_trace(args.trace_dir, args.top)
    print(f"per-iter device: {total / args.iters:.2f} ms")


if __name__ == "__main__":
    main()
