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
  --deep-cache SPEC[,SPEC...]  (VERDICT r4 next #1): fidelity of the
              DeepCache operating point(s) - e.g. 2, 4, FSFS, FSSF -
              vs the EXACT pipeline at the SAME dtype (bf16), at the
              point given by --resolution/--steps (default 512, 4; the
              README table also records a (256, 20) run). This isolates
              the schedule change; the bf16-vs-f32 question is the
              default mode. Same weights, same RNG stream.
  --final-step  (VERDICT r4 next #3, step-granular f32): bf16 pipeline
              with ONLY the final denoise step's UNet eval in f32,
              vs the all-f32 reference at (512,4). The final eps enters
              x0 at full weight, so this is the cheapest possible f32
              promotion; compare its tail to the all-bf16 (18.5%) and
              f32-UNet (0.8%) brackets from --bisect.

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


def _run(resolution, settings, brush, canvas_u8, dtype, overrides=None,
         deep_cache=1, f32_final_step=False):
    from diffusiontexturepainting_tpu.core.config import PipelineConfig
    from diffusiontexturepainting_tpu.pipeline.tpu_model import (
        TPUConditionalInpainter,
    )

    config = PipelineConfig(deep_cache_interval=deep_cache,
                            deep_cache_min_steps=2,
                            f32_final_step=f32_final_step)
    model = TPUConditionalInpainter(
        resolution, dtype=dtype, warmup=False, seed=0, verbose_timing=False,
        dtype_overrides=overrides, config=config)
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


def run_deep_cache(specs, resolution: int = 512, steps: int = 4):
    import jax.numpy as jnp

    brush, canvas_u8, settings = _inputs(resolution, steps)
    exact = _run(resolution, settings, brush, canvas_u8, jnp.bfloat16)
    for spec in specs:
        out = _run(resolution, settings, brush, canvas_u8, jnp.bfloat16,
                   deep_cache=spec)
        _stats(f"{resolution}px/{steps}-step DeepCache[{spec}] vs exact "
               f"(both bf16)", exact, out)


def run_final_step(resolution: int = 512, steps: int = 4):
    import jax.numpy as jnp

    brush, canvas_u8, settings = _inputs(resolution, steps)
    ref = _run(resolution, settings, brush, canvas_u8, jnp.float32)
    out = _run(resolution, settings, brush, canvas_u8, jnp.bfloat16,
               f32_final_step=True)
    _stats(f"{resolution}px/{steps}-step bf16 + f32-final-step vs all-f32",
           ref, out)


def main():
    if "--deep-cache" in sys.argv:
        raw = sys.argv[sys.argv.index("--deep-cache") + 1]
        specs = [int(s) if s.isdigit() else s.upper()
                 for s in raw.split(",") if s]
        steps = (int(sys.argv[sys.argv.index("--steps") + 1])
                 if "--steps" in sys.argv else 4)
        res = (int(sys.argv[sys.argv.index("--resolution") + 1])
               if "--resolution" in sys.argv else 512)
        run_deep_cache(specs, res, steps)
        return
    if "--final-step" in sys.argv:
        steps = (int(sys.argv[sys.argv.index("--steps") + 1])
                 if "--steps" in sys.argv else 4)
        res = (int(sys.argv[sys.argv.index("--resolution") + 1])
               if "--resolution" in sys.argv else 512)
        run_final_step(res, steps)
        return
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
