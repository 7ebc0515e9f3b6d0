"""Full-size bf16-vs-f32 fidelity of the serving pipeline on TPU.

Runs the SAME stamp (same weights, same RNG stream, same canvas) through
the full-size pipeline compiled in bf16 and in f32, at the 256 and 512 px
operating points, and reports per-pixel deviation + PSNR of the uint8
outputs. The TPU analog of the reference's fp16-engine fidelity question
(reference models.py:1232 builds fp16 TRT engines against fp32 torch).

Modes (VERDICT r3 next #3 - chase the 512px/4-step tail):
  (default)   bf16 vs f32 at (256,20) and (512,4)
  --bisect    per-stage guilt: bf16 everywhere EXCEPT one component
              promoted to f32 (unet / vae_encoder / vae_decoder), at
              (512,4). Whichever promotion collapses the tail is the
              guilty stage.
  --control   conditioning control: f32 vs f32 with the canvas perturbed
              by 1 u8 LSB in one pixel. If this "exact" pipeline shows a
              comparable frac>1e-2 tail, the tail measures the sampler's
              chaotic conditioning (any rounding difference -> O(1)
              changes in a fraction of pixels), not precision loss.
  --quick     (256,4) only

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/check_bf16_fidelity.py
"""

import sys

import numpy as np


def _inputs(resolution, steps):
    rng = np.random.default_rng(0)
    brush = rng.random((resolution, resolution, 3)).astype(np.float32)
    canvas = np.zeros((resolution, resolution, 4), np.float32)
    canvas[: resolution // 2, :, :3] = rng.random(
        (resolution // 2, resolution, 3))
    canvas[: resolution // 2, :, 3] = 1.0
    canvas_u8 = (canvas * 255).astype(np.uint8)
    settings = dict(steps=steps, cfg_weight=2.0, tg_weight=1.0,
                    tg_steps=steps, context_pad=150)
    return brush, canvas_u8, settings


def _stats(tag, a, b):
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    diff = np.abs(a - b) / 255.0
    mse = np.mean(((a - b) / 255.0) ** 2)
    psnr = 10 * np.log10(1.0 / mse) if mse > 0 else float("inf")
    print(f"{tag}: max|diff| {diff.max():.4f}  mean {diff.mean():.5f}  "
          f"PSNR {psnr:.1f} dB  (frac>1e-2: {(diff > 1e-2).mean():.3f})",
          flush=True)
    return diff


def _run(resolution, settings, brush, canvas_u8, dtype, overrides=None):
    from diffusiontexturepainting_tpu.pipeline.tpu_model import (
        TPUConditionalInpainter,
    )

    model = TPUConditionalInpainter(
        resolution, dtype=dtype, warmup=False, seed=0, verbose_timing=False,
        dtype_overrides=overrides)
    model.set_brush(brush)
    out = model.generate_u8(canvas_u8, **settings)
    del model
    return out


def run_point(resolution: int, steps: int):
    import jax.numpy as jnp

    brush, canvas_u8, settings = _inputs(resolution, steps)
    outs = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        outs[dtype.__name__] = _run(resolution, settings, brush, canvas_u8,
                                    dtype)
    return _stats(f"{resolution}px/{steps}-step",
                  outs["float32"], outs["bfloat16"])


def run_bisect(resolution: int = 512, steps: int = 4):
    import jax.numpy as jnp

    brush, canvas_u8, settings = _inputs(resolution, steps)
    ref = _run(resolution, settings, brush, canvas_u8, jnp.float32)
    base = _run(resolution, settings, brush, canvas_u8, jnp.bfloat16)
    _stats(f"{resolution}px/{steps}-step all-bf16", ref, base)
    for comp in ("unet", "vae_encoder", "vae_decoder"):
        out = _run(resolution, settings, brush, canvas_u8, jnp.bfloat16,
                   overrides={comp: jnp.float32})
        _stats(f"{resolution}px/{steps}-step bf16 except {comp}=f32",
               ref, out)


def run_control(resolution: int = 512, steps: int = 4):
    import jax.numpy as jnp

    brush, canvas_u8, settings = _inputs(resolution, steps)
    a = _run(resolution, settings, brush, canvas_u8, jnp.float32)
    pert = canvas_u8.copy()
    # 1-LSB change in one painted pixel: the smallest representable
    # input difference the wire format can carry
    pert[0, 0, 0] = pert[0, 0, 0] ^ 1
    b = _run(resolution, settings, brush, pert, jnp.float32)
    _stats(f"{resolution}px/{steps}-step f32 vs f32+1LSB-canvas", a, b)


def main():
    if "--bisect" in sys.argv:
        run_bisect()
        return
    if "--control" in sys.argv:
        run_control()
        return
    points = [(256, 20), (512, 4)]
    if "--quick" in sys.argv:
        points = [(256, 4)]
    for res, steps in points:
        run_point(res, steps)


if __name__ == "__main__":
    main()
