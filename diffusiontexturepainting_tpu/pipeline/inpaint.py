"""The inpainting stamp program: one brush stamp = one device program.

This is the TPU re-design of the reference's serving pipeline
(trt_inference/inpaint_pipeline.py:52-153 + stable_diffusion_pipeline.py
denoise_latent:407-462): where the reference chains five separate TRT
engine invocations per stamp (VAE-enc x2, N x UNet, VAE-dec) with eager
torch glue between them, here the ENTIRE stamp - uint8 canvas in, uint8
stamp out - is a single jitted XLA program:

    canvas u8 -> normalize/split -> context dilation (prefix sums)
    -> batched VAE encode (both branches in one batch-2 call)
    -> lax.scan over denoise steps (CFG triple-batch UNet + DDIM update)
    -> VAE decode -> [0,1] -> alpha-composite -> u8

Consequences: zero host<->device round-trips inside a stamp, XLA fuses
all inter-stage elementwise glue, and the transfer cost is exactly
256 KB in / 192 KB out of uint8.

All per-request wire settings (cfg_weight, tg_weight, tg_steps,
context_pad) are *traced* scalars - changing them never recompiles. Only
(resolution, steps, scheduler) are static, mirroring the reference's TRT
optimization profiles (models.py:886-890).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp


from ..ops.morphology import add_extra_context
from ..ops.resize import nearest_downsample
from ..schedulers import make_scheduler
from ..models.vae import latent_mode, sample_latents


@dataclass
class StampModels:
    """Pure apply-fns + params for the three pipeline stages."""

    unet_apply: Callable  # (params, sample(B,h,w,9), t(B,), ctx(B,L,D)) -> (B,h,w,4)
    vae_encode_apply: Callable  # (params, images(B,H,W,3)) -> moments(B,h,w,8)
    vae_decode_apply: Callable  # (params, latents(B,h,w,4)) -> images(B,H,W,3)
    params: Dict[str, Any]  # {'unet':..., 'vae_encoder':..., 'vae_decoder':...}
    vae_scaling: float = 0.18215
    # Deep-cache forwards (models/unet.py): full returns (eps, cache);
    # shallow consumes the cache. Optional - when absent,
    # deep_cache_interval > 1 is rejected.
    unet_full_apply: Optional[Callable] = None
    unet_shallow_apply: Optional[Callable] = None
    # f32-compute UNet forward over the same (bf16-stored) params, for
    # the f32_final_step operating point. Optional.
    unet_final_apply: Optional[Callable] = None


def parse_deep_cache_spec(value):
    """Parse/validate a DeepCache spec from CLI text: an int interval or
    an 'F'/'S' pattern starting with 'F'. The single grammar authority
    for every front-end (serving --deep-cache-interval, bench.py) -
    length-vs-iterations validation stays in _cache_flags because it
    needs the scheduler. Raises ValueError on bad input."""
    if isinstance(value, int):
        return value
    try:
        return int(value)
    except ValueError:
        pass
    pattern = str(value).upper()
    if not pattern or set(pattern) - {"F", "S"} or pattern[0] != "F":
        raise ValueError(
            f"DeepCache spec {value!r}: expected an int interval or an "
            "'F'/'S' pattern starting with 'F'")
    return pattern


def _cache_flags(deep_cache_interval, n_iters: int):
    """Normalize the DeepCache spec into per-iteration use-cache flags.

    `deep_cache_interval` is either an int (uniform: every interval-th
    step full, the rest shallow - handled by the scan-grouped path, so
    return None here) or an explicit pattern string like 'FSSF' (F = full
    UNet, S = shallow-against-cache). A pattern must start with 'F' (the
    first shallow step needs a cache to consume) and match the
    scheduler's iteration count. Returns a list of bools (True = shallow)
    for the pattern case, None for ints.
    """
    if isinstance(deep_cache_interval, int):
        return None
    pattern = str(deep_cache_interval).upper()
    if set(pattern) - {"F", "S"}:
        raise ValueError(f"deep-cache pattern {pattern!r}: only 'F'/'S'")
    if len(pattern) != n_iters:
        raise ValueError(f"deep-cache pattern {pattern!r} length "
                         f"{len(pattern)} != scheduler iterations {n_iters}")
    if pattern[0] != "F":
        raise ValueError(f"deep-cache pattern {pattern!r} must start with "
                         "'F' (a shallow step consumes the latest cache)")
    return [c == "S" for c in pattern]


def make_stamp_fn(models: StampModels, scheduler_name: str, num_steps: int,
                  deterministic_vae: bool = False,
                  deep_cache_interval=1,
                  final_step_f32: bool = False):
    """Build the pure stamp function for a fixed (scheduler, steps).

    `deep_cache_interval > 1` enables DeepCache-style denoising: every
    interval-th step runs the full UNet and caches its deep feature; the
    steps in between run only the outermost level against the cache
    (~3x fewer UNet FLOPs on cached steps). The full/shallow pattern is
    statically interleaved - the scan body covers one cache period - so
    no dynamic control flow enters the program. A string
    `deep_cache_interval` (e.g. 'FSSF') is an explicit per-step pattern
    instead - same cost as the uniform interval with the same F count,
    but the placement of full evals is free (a trailing 'F' buys back
    final-step fidelity, since the last eps enters x0 at full weight).

    Returns fn(params, canvas_u8(1,H,W,4), brush(1,H,W,3)[0..1],
               cond(1,L,D), uncond(1,L,D), rng, counter,
               cfg_weight, tg_weight, tg_steps, context_pad)
        -> (raw_u8(H,W,3), composited_u8(H,W,3))

    `counter` is the per-request index folded into `rng` INSIDE the
    program: the caller passes the same resident base key every time plus
    a numpy scalar that rides along with the dispatch, instead of an
    eager fold_in + scalar upload per request (a measurable per-request
    cost on tunneled/remote backends).
    """
    cache_on = (not isinstance(deep_cache_interval, int)
                or deep_cache_interval > 1)
    if cache_on and (
            models.unet_full_apply is None or models.unet_shallow_apply is None):
        raise ValueError("deep_cache_interval > 1 requires unet_full_apply "
                         "and unet_shallow_apply")
    scheduler = make_scheduler(scheduler_name).set_timesteps(num_steps)
    pattern_flags = _cache_flags(deep_cache_interval,
                                 scheduler.num_iterations())
    if final_step_f32:
        if models.unet_final_apply is None:
            raise ValueError("final_step_f32 requires unet_final_apply")
        if pattern_flags is not None and pattern_flags[-1]:
            raise ValueError("final_step_f32 requires the final step to be "
                             "a full ('F') eval, not a shallow one")
        # uniform intervals are handled in the grouped-scan branch below:
        # the final step is kept OUT of the scan (groups over the first
        # n-1 iterations) and forced to a full f32 eval - converting to a
        # fully-unrolled pattern here would explode the program at
        # multi-step points (20 unrolled UNet triples at 256/20, x16 in
        # the chained stroke program).
    rows = {k: jnp.asarray(v) for k, v in scheduler.scan_rows().items()}
    scale = models.vae_scaling

    def stamp(params, canvas_u8, brush, cond, uncond, rng, counter,
              cfg_weight, tg_weight, tg_steps, context_pad):
        rng = jax.random.fold_in(rng, counter)
        canvas = canvas_u8.astype(jnp.float32) / 255.0
        images = canvas[..., :3] * 2.0 - 1.0
        mask = canvas[..., 3:4]
        masked_images = images * mask

        # Texture-guidance context branch (reference trt_model.py:103-109).
        ctx_masked, ctx_mask = add_extra_context(
            brush * 2.0 - 1.0, masked_images, mask, context_pad)
        # Invert: UNet convention is 1 = generate here.
        inv_mask = 1.0 - mask
        inv_ctx_mask = 1.0 - ctx_mask

        # Latent-resolution masks, CFG triple-batch [m, m, ctx]
        # (reference inpaint_pipeline.py:114-116).
        m_lat = nearest_downsample(inv_mask, 8)
        cm_lat = nearest_downsample(inv_ctx_mask, 8)
        mask_lat = jnp.concatenate([m_lat, m_lat, cm_lat], axis=0)

        # One batch-2 VAE encode covers both branches (the reference runs
        # two separate engine calls, inpaint_pipeline.py:125-126).
        rng, enc_rng, lat_rng, step_rng = jax.random.split(rng, 4)
        moments = models.vae_encode_apply(
            params["vae_encoder"],
            jnp.concatenate([masked_images, ctx_masked], axis=0))
        if deterministic_vae:
            lat = latent_mode(moments) * scale
        else:
            lat = sample_latents(moments, enc_rng) * scale
        masked_latents = jnp.concatenate([lat[:1], lat[:1], lat[1:]], axis=0)

        embeddings = jnp.concatenate([uncond, cond, cond], axis=0)

        h = canvas.shape[1] // 8
        w = canvas.shape[2] // 8
        latents = jax.random.normal(lat_rng, (1, h, w, 4), jnp.float32)
        latents = latents * scheduler.init_noise_sigma

        # Per-step texture-guidance scale: active for the first tg_steps
        # steps, 0 after (reference denoise_latent:413-420). Length follows
        # the scheduler's iteration count (PNDM runs steps+1 model calls).
        n_iters = scheduler.num_iterations()
        tg_scales = jnp.where(
            jnp.arange(n_iters) < tg_steps, tg_weight, 0.0
        ).astype(jnp.float32)
        step_keys = jax.random.split(step_rng, n_iters)
        sched_state = scheduler.init_state(latents.shape)

        def one_step(lat_t, st, row, tg_scale, key, cache, use_cache: bool,
                     final: bool = False):
            lat_in = jnp.concatenate([lat_t] * 3, axis=0)
            lat_in = scheduler.scale_model_input(lat_in, row)
            unet_in = jnp.concatenate([lat_in, mask_lat, masked_latents], axis=-1)
            t = jnp.broadcast_to(row["timestep"], (3,))
            if final and final_step_f32:
                # f32-compute eval over the same (bf16-stored) weights -
                # the final eps enters x0 at full weight
                noise_pred = models.unet_final_apply(
                    params["unet"], unet_in, t, embeddings)
                new_cache = cache
            elif use_cache:
                noise_pred = models.unet_shallow_apply(
                    params["unet"], unet_in, t, embeddings, cache)
                new_cache = cache
            elif cache_on:
                noise_pred, new_cache = models.unet_full_apply(
                    params["unet"], unet_in, t, embeddings)
            else:
                noise_pred = models.unet_apply(params["unet"], unet_in, t,
                                               embeddings)
                new_cache = cache
            eps_u, eps_c, eps_tg = jnp.split(noise_pred, 3, axis=0)
            # Dual guidance combine (reference denoise_latent:449-451).
            eps = (eps_u + cfg_weight * (eps_c - eps_u)
                   + tg_scale * (eps_tg - eps_c))
            noise = (jax.random.normal(key, lat_t.shape, jnp.float32)
                     if scheduler.stochastic else None)
            lat_t, st = scheduler.step(eps, lat_t, row, st, noise)
            return lat_t, st, new_cache

        if not cache_on and not final_step_f32:
            def body(carry, xs):
                lat_t, st = carry
                row, tg_scale, key = xs
                lat_t, st, _ = one_step(lat_t, st, row, tg_scale, key, None,
                                        False)
                return (lat_t, st), None

            (latents, _), _ = jax.lax.scan(
                body, (latents, sched_state), (rows, tg_scales, step_keys))
        elif not cache_on:
            # exact math, f32 final step: scan the first n-1 bf16 steps,
            # then one f32-compute eval outside the scan
            def body(carry, xs):
                lat_t, st = carry
                row, tg_scale, key = xs
                lat_t, st, _ = one_step(lat_t, st, row, tg_scale, key, None,
                                        False)
                return (lat_t, st), None

            take = lambda tree, sl: jax.tree_util.tree_map(
                lambda a: a[sl], tree)
            head = slice(0, n_iters - 1)
            (latents, sched_state), _ = jax.lax.scan(
                body, (latents, sched_state),
                (take(rows, head), tg_scales[head], step_keys[head]))
            latents, sched_state, _ = one_step(
                latents, sched_state, take(rows, n_iters - 1),
                tg_scales[n_iters - 1], step_keys[n_iters - 1], None,
                False, final=True)
        elif pattern_flags is not None:
            # explicit F/S pattern: fully unrolled (patterns are used at
            # few-step operating points, so the unroll stays small)
            take = lambda tree, sl: jax.tree_util.tree_map(
                lambda a: a[sl], tree)
            cache = None
            for s, shallow in enumerate(pattern_flags):
                latents, sched_state, cache = one_step(
                    latents, sched_state, take(rows, s), tg_scales[s],
                    step_keys[s], cache, use_cache=shallow,
                    final=(s == len(pattern_flags) - 1))
        else:
            period = deep_cache_interval
            # with final_step_f32 the final iteration stays OUT of the
            # scan (forced full f32 eval); scan only complete periods of
            # the first n-1 steps, so the unrolled tail stays <= period
            # steps instead of the whole schedule
            head_n = n_iters - 1 if final_step_f32 else n_iters
            groups = head_n // period
            take = lambda tree, sl: jax.tree_util.tree_map(
                lambda a: a[sl], tree)
            head_rows = take(rows, slice(0, groups * period))
            head_rows = jax.tree_util.tree_map(
                lambda a: a.reshape((groups, period) + a.shape[1:]), head_rows)
            head_tg = tg_scales[: groups * period].reshape(groups, period)
            head_keys = step_keys[: groups * period].reshape(
                (groups, period) + step_keys.shape[1:])

            def body(carry, xs):
                lat_t, st = carry
                rows_blk, tg_blk, keys_blk = xs
                cache = None
                for u in range(period):  # unrolled: full then shallow
                    row_u = take(rows_blk, u)
                    lat_t, st, cache = one_step(
                        lat_t, st, row_u, tg_blk[u], keys_blk[u], cache,
                        use_cache=(u > 0))
                return (lat_t, st), None

            (latents, sched_state), _ = jax.lax.scan(
                body, (latents, sched_state), (head_rows, head_tg, head_keys))
            # tail steps continue the same pattern, unrolled; the final
            # step is forced FULL when final_step_f32 (costs at most one
            # extra full eval when it would naturally be shallow)
            cache = None
            for s in range(groups * period, n_iters):
                row_s = take(rows, s)
                final = final_step_f32 and s == n_iters - 1
                latents, sched_state, cache = one_step(
                    latents, sched_state, row_s, tg_scales[s], step_keys[s],
                    cache, use_cache=(s % period != 0) and not final,
                    final=final)

        decoded = models.vae_decode_apply(params["vae_decoder"], latents / scale)
        result = jnp.clip(decoded / 2.0 + 0.5, 0.0, 1.0)

        composited = canvas[..., :3] * mask + result * (1.0 - mask)
        to_u8 = lambda x: (jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        return to_u8(result[0]), to_u8(composited[0])

    return stamp


def make_preview_fn(models: StampModels, scheduler_name: str, num_steps: int):
    """Brush-preview program: quadrant-known canvas built on device from
    the brush image (reference handler.py:48-52, 92-101)."""
    stamp = make_stamp_fn(models, scheduler_name, num_steps)

    def preview(params, brush, cond, uncond, rng, counter, cfg_weight,
                tg_weight, tg_steps, context_pad):
        res = brush.shape[1]
        center = res // 2
        yy = jnp.arange(res)[:, None] < center
        xx = jnp.arange(res)[None, :] < center
        mask = (yy & xx).astype(jnp.float32)[None, :, :, None]
        canvas = jnp.concatenate([brush * mask, mask], axis=-1)
        canvas_u8 = (jnp.clip(canvas, 0, 1) * 255).astype(jnp.uint8)
        return stamp(params, canvas_u8, brush, cond, uncond, rng, counter,
                     cfg_weight, tg_weight, tg_steps, context_pad)

    return preview
