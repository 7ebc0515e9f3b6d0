"""TPUConditionalInpainter: the serving model.

The analog of the reference's TRTConditionalInpainter
(trt_inference/trt_model.py:23-121), with the TRT engines replaced by
jitted XLA programs (core/engine.py) and the eager-PyTorch image encoder
replaced by a jitted brush-encoding program (resolving the reference's
"TODO: switch to TRT inference", trt_model.py:56).
"""

from __future__ import annotations

import dataclasses
import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import (
    PipelineConfig,
    PatchEncoderConfig,
    UNetConfig,
    VAEConfig,
    tiny_patch_encoder_config,
    tiny_unet_config,
    tiny_vae_config,
)
from ..core.engine import Engine
from ..models.patch_encoder import ConditionPatchEncoder, encode_brush_image
from ..models.unet import UNet2DCondition
from ..models.vae import VAEDecoder, VAEEncoder
from ..serving.model_base import (
    ConditionalInpainterBase,
    crop_resize_square,
    ensure_float01,
)
from ..utils.profiling import StageTimer
from .inpaint import StampModels

logger = logging.getLogger(__name__)


class TPUConditionalInpainter(ConditionalInpainterBase):
    def __init__(
        self,
        resolution: int = 256,
        config: PipelineConfig | None = None,
        checkpoint_dir: str | None = None,
        dtype=None,
        tiny: bool = False,
        warmup: bool = True,
        warmup_points=None,
        seed: int | None = None,
        verbose_timing: bool = True,
        dtype_overrides: dict | None = None,
        cfg_mesh=None,
    ):
        """`dtype_overrides`: per-component compute-dtype override, e.g.
        {"unet": jnp.float32} - the fidelity-bisect hook
        (tools/check_bf16_fidelity.py --bisect). Keys: unet, vae_encoder,
        vae_decoder, patch_encoder. Overridden components also keep their
        params in that dtype. Serving uses a uniform dtype (None)."""
        self._resolution = int(resolution)
        self.config = config or PipelineConfig()
        self._validate_deep_cache(self.config)
        if dtype is None:
            dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        self.dtype = dtype
        self._dtype_overrides = dict(dtype_overrides or {})
        cdt = lambda name: self._dtype_overrides.get(name, dtype)

        if tiny:
            ucfg, vcfg, pcfg = (tiny_unet_config(), tiny_vae_config(),
                                tiny_patch_encoder_config())
        else:
            ucfg, vcfg, pcfg = UNetConfig(), VAEConfig(), PatchEncoderConfig()
        if self.config.fused_unet_resnet:
            ucfg = dataclasses.replace(ucfg, fused_resnet=True)
        if self.config.fused_unet_ff:
            ucfg = dataclasses.replace(ucfg, fused_ff=True)
        if self.config.fused_unet_norm:
            ucfg = dataclasses.replace(ucfg, fused_norm=True)
        if self.config.fused_unet_attn:
            ucfg = dataclasses.replace(ucfg, fused_attn=True)
        self.unet = UNet2DCondition(ucfg, dtype=cdt("unet"))
        self.vae_encoder = VAEEncoder(vcfg, dtype=cdt("vae_encoder"))
        self.vae_decoder = VAEDecoder(vcfg, dtype=cdt("vae_decoder"))
        self.patch_encoder = ConditionPatchEncoder(
            pcfg, dtype=cdt("patch_encoder"))

        from ..models.unet import UNet2DCondition as _U

        from ..models.vae import fused_decode, fused_encode

        if self.config.fused_vae_encoder:
            vae_enc = lambda p, x: fused_encode(p, x, vcfg,
                                                cdt("vae_encoder"))
        else:
            vae_enc = lambda p, x: self.vae_encoder.apply({"params": p}, x)
        if self.config.fused_vae_decoder:
            vae_dec = lambda p, z: fused_decode(p, z, vcfg,
                                                cdt("vae_decoder"))
        else:
            vae_dec = lambda p, z: self.vae_decoder.apply({"params": p}, z)

        # Safe twin config (also the f32-final-step eval config): every
        # fused pallas path off - module legs only.
        safe_ucfg = dataclasses.replace(
            ucfg, fused_resnet=False, fused_ff=False, fused_norm=False,
            fused_attn=False)
        unet_final_apply = None
        if self.config.f32_final_step:
            # f32-COMPUTE eval over the same (bf16-stored) param tree:
            # flax promotes params to the module dtype in-register, so no
            # second weight copy lives in HBM. XLA path (the pallas
            # kernels are bf16-specialized).
            from ..ops.conv3x3 import conv_impl

            f32_unet = UNet2DCondition(safe_ucfg, dtype=jnp.float32)

            def unet_final_apply(p, s, t, c):
                with conv_impl("xla"):
                    return f32_unet.apply({"params": p}, s, t, c)

        models = StampModels(
            unet_apply=lambda p, s, t, c: self.unet.apply({"params": p}, s, t, c),
            vae_encode_apply=vae_enc,
            vae_decode_apply=vae_dec,
            params=None,  # params are passed per-call
            vae_scaling=vcfg.scaling_factor,
            unet_full_apply=lambda p, s, t, c: self.unet.apply(
                {"params": p}, s, t, c, method=_U.forward_full),
            unet_shallow_apply=lambda p, s, t, c, cache: self.unet.apply(
                {"params": p}, s, t, c, cache, method=_U.forward_shallow),
            unet_final_apply=unet_final_apply,
        )
        # Safe twin for the engine's scoped-VMEM compile fallback: same
        # param tree, every fused pallas path off (module legs only; the
        # engine additionally traces it under conv_impl("xla")). Keeps a
        # novel operating point serving correctly when its pallas plans
        # overflow scoped VMEM embedded in the full stamp program.
        safe_unet = UNet2DCondition(safe_ucfg, dtype=cdt("unet"))
        safe_models = StampModels(
            unet_apply=lambda p, s, t, c: safe_unet.apply(
                {"params": p}, s, t, c),
            vae_encode_apply=lambda p, x: self.vae_encoder.apply(
                {"params": p}, x),
            vae_decode_apply=lambda p, z: self.vae_decoder.apply(
                {"params": p}, z),
            params=None,
            vae_scaling=vcfg.scaling_factor,
            unet_full_apply=lambda p, s, t, c: safe_unet.apply(
                {"params": p}, s, t, c, method=_U.forward_full),
            unet_shallow_apply=lambda p, s, t, c, cache: safe_unet.apply(
                {"params": p}, s, t, c, cache, method=_U.forward_shallow),
            unet_final_apply=unet_final_apply,
        )
        if cfg_mesh is not None:
            # CFG-branch model parallelism (--mesh model=3): one chip per
            # guidance branch, everything else unchanged
            # (parallel/cfg_shard.py).
            from ..parallel.cfg_shard import cfg_sharded_models

            models = cfg_sharded_models(models, cfg_mesh)
            safe_models = cfg_sharded_models(safe_models, cfg_mesh)
        self.cfg_mesh = cfg_mesh
        self.engine = Engine(models, self.config.scheduler,
                             safe_models=safe_models,
                             final_step_f32=self.config.f32_final_step)
        self._encode_brush = jax.jit(
            lambda p, img: encode_brush_image(self.patch_encoder, p, img))

        # --- overlapped startup -----------------------------------------
        # The two expensive, INDEPENDENT startup phases are (measured on
        # the tunneled backend, 2026-08-20): loading+running the param
        # init programs (~135 s for random weights) and loading the
        # stamp-program executables for the warmup points (~170 s per
        # point on a persistent-cache hit; minutes cold). Concurrent jit
        # loads overlap near-perfectly on this backend (31.2 s for a
        # 31 s + 8 s pair), so warm the stamp programs in a THREAD with
        # dummy zero params built from jax.eval_shape - jit keys on
        # avals, so the later real-params calls hit the warm cache.
        # cfg_mesh serving is excluded: its real params carry mesh
        # shardings a plain zeros tree would not match.
        import threading
        import time as _time

        self.init_timings = {}
        self.warmup_timings = {}
        warm_points = warmup_points or [(self._resolution,
                                         self.config.denoising_steps)]
        warm_state = {}
        warm_thread = None
        if warmup and cfg_mesh is None:
            warm_thread = threading.Thread(
                target=self._warm_with_dummy_params,
                args=(warm_points, ucfg, pcfg, warm_state), daemon=True)
            warm_thread.start()

        tic = _time.time()
        self.params = self._load_params(checkpoint_dir)
        self.init_timings["params_s"] = round(_time.time() - tic, 1)
        tic = _time.time()
        self.params = self._cast_params_for_serving(self.params)
        self.init_timings["cast_s"] = round(_time.time() - tic, 1)

        self._base_key = jax.random.PRNGKey(
            self.config.seed if seed is None else seed)
        self._request_counter = 0
        self.timer = StageTimer(enabled=verbose_timing)

        # Neutral defaults so the server survives a stamp before set_brush.
        self.image = np.full((self._resolution, self._resolution, 3), 0.5,
                             np.float32)
        self._brush_dev = jnp.asarray(self.image[None])
        with self.timer.stage("brush-encode"):
            cond, uncond = self._encode_brush(
                self.params["patch_encoder"], self._brush_dev)
            jax.block_until_ready(cond)
        self._cond, self._uncond = cond, uncond

        if warm_thread is not None:
            warm_thread.join()
        if warm_state.get("timings"):
            # programs are warm; record the thread's compile/load seconds
            # as the authoritative per-point attribution
            self.warmup_timings.update(warm_state["timings"])
        elif warmup:
            if warm_thread is not None:  # pragma: no cover - fallback
                logger.warning("async warmup failed (%s); warming inline",
                               warm_state.get("error"))
            self.warmup(warm_points)

    def _warm_with_dummy_params(self, points, ucfg, pcfg, out: dict):
        """Thread body: AOT-warm the stamp programs for `points` using a
        zero-filled param tree with the exact serving avals (shapes +
        post-cast dtypes), so the jit cache entries match the later
        real-params calls. Runs concurrently with the real param init."""
        try:
            latent = 8
            k = jax.random.PRNGKey(0)
            sample = jnp.zeros((1, latent, latent, ucfg.in_channels))
            ctx = jnp.zeros((1, pcfg.total_patches, ucfg.cross_attention_dim))
            img = jnp.zeros((1, 64, 64, 3))
            z = jnp.zeros((1, latent, latent,
                           self.vae_decoder.cfg.latent_channels))
            patches = jnp.zeros((1, pcfg.total_patches, pcfg.clip.image_size,
                                 pcfg.clip.image_size, 3))
            structs = {
                "unet": jax.eval_shape(
                    self.unet.init, k, sample, jnp.float32(0.0), ctx),
                "vae_encoder": jax.eval_shape(self.vae_encoder.init, k, img),
                "vae_decoder": jax.eval_shape(self.vae_decoder.init, k, z),
                "patch_encoder": jax.eval_shape(
                    lambda kk, x: self.patch_encoder.init(kk, x, True),
                    k, patches),
            }
            def serving_dtype(name, sd):
                # mirror _cast_params_for_serving EXACTLY: the cast runs
                # only when the model dtype is bf16, and skips components
                # overridden to f32. (Checking the per-component dtype
                # alone diverged when dtype=f32 with a bf16 override -
                # real params stay f32 but the dummy went bf16, silently
                # wasting the async warmup.)
                if (self.dtype == jnp.bfloat16
                        and self._dtype_overrides.get(name) != jnp.float32
                        and jnp.issubdtype(sd.dtype, jnp.floating)):
                    return jnp.bfloat16
                return sd.dtype

            dummy = {
                name: jax.jit(lambda s=s, n=name: jax.tree_util.tree_map(
                    lambda sd: jnp.zeros(sd.shape, serving_dtype(n, sd)),
                    s))()["params"]
                for name, s in structs.items()
            }
            out["timings"] = self.engine.warmup(
                dummy, (pcfg.total_patches, pcfg.cross_attention_dim),
                [(p[0], p[1],
                  p[2] if len(p) > 2 else self._cache_interval(p[1]))
                 for p in points],
                self._resolution,
                # the uncond vector is a patch-encoder PARAM: bf16 after
                # the serving cast (cond stays f32 - the encoder's output
                # head computes in f32)
                uncond_dtype=serving_dtype(
                    "patch_encoder", jax.ShapeDtypeStruct((), jnp.float32)))
        except Exception as e:  # pragma: no cover - fallback to inline
            out["error"] = repr(e)

    def _load_params(self, checkpoint_dir):
        if checkpoint_dir:
            from ..weights.loader import load_pipeline_params

            return load_pipeline_params(
                checkpoint_dir, self.unet, self.vae_encoder, self.vae_decoder,
                self.patch_encoder)
        from ..weights.random_init import init_pipeline_params

        logger.warning("No checkpoint_dir given - using seeded random weights "
                       "(latency-correct, visually meaningless).")
        return init_pipeline_params(
            self.unet, self.vae_encoder, self.vae_decoder, self.patch_encoder,
            resolution=min(self._resolution, 64))

    def _cast_params_for_serving(self, params):
        """Store serving params in bf16 once at load. Keeping them f32
        makes every stamp re-cast 860M params (f32->bf16 convert ops
        profiled at ~6 ms/stamp) and doubles weight HBM reads (~3.4 GB per
        UNet step instead of 1.7 GB). The reference's analog is building
        fp16 TRT engines (models.py fp16=True)."""
        if self.dtype != jnp.bfloat16:
            return params
        # ONE jitted cast program per component (donated input, so the
        # f32 copy is freed as the bf16 one materializes): the eager
        # per-leaf alternative is ~700 dispatches, each a round trip on
        # tunneled backends - measured tens of seconds of model-ready
        # time and the variance the round-4 driver artifact could not
        # attribute.
        cast = jax.jit(
            lambda tree: jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                tree),
            donate_argnums=0)
        # dtype-overridden components (fidelity bisect) keep f32 params
        return {k: (v if self._dtype_overrides.get(k) == jnp.float32
                    else cast(v))
                for k, v in params.items()}

    def reload_params(self, checkpoint_dir: str) -> None:
        """Hot-swap weights without recompiling (params are program
        arguments, so compiled stamp programs are reused) - the analog of
        the reference's TRT engine refit path (utilities.py:88-189)."""
        if getattr(self, "_pending_stamps", None):
            self.flush_session()  # deferred stamps bind params at flush
        self.params = self._cast_params_for_serving(
            self._load_params(checkpoint_dir))
        # re-encode the current brush under the new encoder weights
        self.set_brush(self.image)

    # --- ConditionalInpainterBase contract ---

    def resolution(self) -> int:
        return self._resolution

    def set_brush(self, image: np.ndarray) -> None:
        """Crop/resize the brush to model resolution and encode it into
        (cond, uncond) cross-attention tokens (reference trt_model.py:79-88)
        as one jitted program."""
        # deferred stroke stamps bind the brush at FLUSH time: flush the
        # old brush's stamps before swapping it
        if getattr(self, "_pending_stamps", None):
            self.flush_session()
        image = ensure_float01(image)[..., :3]
        self.image = crop_resize_square(image, self._resolution).astype(np.float32)
        self._brush_dev = jnp.asarray(self.image[None])
        with self.timer.stage("brush-encode"):
            cond, uncond = self._encode_brush(
                self.params["patch_encoder"], self._brush_dev)
            jax.block_until_ready(cond)
        self._cond, self._uncond = cond, uncond

    def _next_counter(self):
        """Per-request RNG = fold_in(base_key, counter) INSIDE the stamp
        program: the base key stays resident on device and the counter is
        a numpy scalar riding with the dispatch, so no eager fold_in op /
        scalar upload happens per request (tunneled backends charge tens
        of ms for each)."""
        self._request_counter += 1
        return np.uint32(self._request_counter)

    def _settings_scalars(self, settings):
        """Per-request wire settings as numpy scalars, NOT jnp: eager jnp
        scalar creation is a synchronous host->device transfer (~70 ms
        each on tunneled backends); numpy args ride along with the
        program dispatch instead."""
        steps = int(settings.get("steps", self.config.denoising_steps))
        cfg_w = np.float32(settings.get("cfg_weight", self.config.guidance_scale))
        tg_w = np.float32(
            settings.get("tg_weight", self.config.texture_guidance_scale))
        tg_steps = np.int32(
            settings.get("tg_steps", self.config.texture_guidance_steps))
        pad = np.int32(settings.get("context_pad", self.config.context_pad))
        return steps, cfg_w, tg_w, tg_steps, pad

    def _run_stamp(self, canvas: np.ndarray, **settings):
        """Dispatch the stamp program; returns DEVICE arrays (raw, comp).

        The canvas travels as uint8 (wire format) and only the requested
        output is fetched by the caller - on tunneled/remote backends each
        host<->device transfer costs tens of ms, so transfer exactly one
        1-byte-per-channel image each way.
        """
        if canvas.dtype == np.uint8:
            canvas_u8 = canvas
        else:
            canvas_u8 = (np.clip(canvas, 0.0, 1.0) * 255).astype(np.uint8)
        res = int(canvas_u8.shape[0])
        steps, cfg_w, tg_w, tg_steps, pad = self._settings_scalars(settings)

        brush = self._brush_dev
        if brush.shape[1] != res:
            brush = jnp.asarray(
                crop_resize_square(self.image, res).astype(np.float32)[None])

        interval = self._cache_interval(steps)
        fn = self.engine.stamp_fn(res, steps, interval)
        return fn(self.params, self._put_banded(canvas_u8, batch=True),
                  brush, self._cond, self._uncond, self._base_key,
                  self._next_counter(), cfg_w, tg_w, tg_steps, pad)

    def _cache_interval(self, steps: int):
        """DeepCache spec for a request's step count: 1 (off), a uniform
        int interval, or an explicit 'FSSF'-style pattern.

        A pattern is an explicit per-step opt-in: it applies at exactly
        the step count whose SCHEDULER ITERATIONS match its length
        (PNDM runs steps+1 model calls) and bypasses the
        deep_cache_min_steps gate - the gate exists so a uniform
        interval does not degrade few-step requests, but a 4-char
        pattern can only ever mean the 4-iteration point, so gating it
        behind min_steps=8 silently disabled the documented
        `--deep-cache-interval FSSF` serving flag. Other step counts run
        exact."""
        dci = self.config.deep_cache_interval
        if isinstance(dci, str):
            return dci if len(dci) == self._scheduler_iterations(steps) else 1
        if steps < self.config.deep_cache_min_steps:
            return 1
        return dci if dci > 1 else 1

    def _scheduler_iterations(self, steps: int) -> int:
        """Model-call count of the configured scheduler at `steps`
        (cached; PNDM's PLMS warm-start runs steps+1)."""
        cache = getattr(self, "_sched_iters", None)
        if cache is None:
            cache = self._sched_iters = {}
        if steps not in cache:
            from ..schedulers import make_scheduler

            cache[steps] = (make_scheduler(self.config.scheduler)
                            .set_timesteps(steps).num_iterations())
        return cache[steps]

    @staticmethod
    def _validate_deep_cache(config) -> None:
        """Reject configs whose every matching request would fail inside
        the request path (the handler swallows errors, leaving the
        client waiting forever): f32_final_step requires the pattern's
        final step to be a full eval. Checked at construction AND at
        set_deep_cache (the runtime switch must not reintroduce the
        per-request failure the startup check exists to prevent)."""
        if (config.f32_final_step
                and isinstance(config.deep_cache_interval, str)
                and config.deep_cache_interval.upper().endswith("S")):
            raise ValueError(
                f"--f32-final-step requires an 'F'-terminated DeepCache "
                f"pattern (the final eval must be full to promote it); "
                f"got {config.deep_cache_interval!r}")

    def set_deep_cache(self, interval, min_steps: int | None = None) -> None:
        """Switch the DeepCache operating point at runtime. Compiled
        programs are keyed per interval/pattern, so switching never
        invalidates existing ones - bench.py uses this to measure the
        exact and cached operating points against the SAME params/session
        machinery in one process."""
        kw = dict(deep_cache_interval=interval)
        if min_steps is not None:
            kw["deep_cache_min_steps"] = min_steps
        new_config = dataclasses.replace(self.config, **kw)
        self._validate_deep_cache(new_config)
        self.config = new_config

    def warmup(self, points) -> dict:
        """AOT-compile (or cache-load) the given (resolution, steps[,
        interval]) operating points; returns {point: seconds} so callers
        can tell a cache hit (seconds) from a cold compile (minutes)."""
        points = [(p[0], p[1],
                   p[2] if len(p) > 2 else self._cache_interval(p[1]))
                  for p in points]
        timings = self.engine.warmup(self.params, self._cond.shape[1:],
                                     points, self._resolution,
                                     uncond_dtype=self._uncond.dtype)
        # accumulate across calls so bench.py can report per-point
        # cache-hit/cold-compile seconds for the whole process
        self.warmup_timings = {**getattr(self, "warmup_timings", {}),
                               **timings}
        return timings

    def generate_raw(self, canvas: np.ndarray, **settings) -> np.ndarray:
        steps = int(settings.get("steps", self.config.denoising_steps))
        with self.timer.stage(f"stamp raw x{steps}"):
            raw_u8, _ = self._run_stamp(canvas, **settings)
            raw_u8 = self._fetch_np(raw_u8)
        return raw_u8.astype(np.float32) / 255.0

    def generate(self, canvas: np.ndarray, **settings) -> np.ndarray:
        """Composited result straight from the device program (exact same
        math as the base-class host composite, fused on device; only the
        composited image is fetched)."""
        steps = int(settings.get("steps", self.config.denoising_steps))
        with self.timer.stage(f"stamp x{steps}"):
            _, comp_u8 = self._run_stamp(canvas, **settings)
            comp_u8 = self._fetch_np(comp_u8)
        return comp_u8.astype(np.float32) / 255.0

    def generate_u8(self, canvas_u8: np.ndarray, **settings) -> np.ndarray:
        """uint8-in/uint8-out fast path for the websocket server: no float
        conversions on the host at all."""
        steps = int(settings.get("steps", self.config.denoising_steps))
        with self.timer.stage(f"stamp u8 x{steps}"):
            _, comp_u8 = self._run_stamp(canvas_u8, **settings)
            return self._fetch_np(comp_u8)

    # --- stroke sessions: device-resident canvas -------------------------
    # Overrides the host-side fallback in ConditionalInpainterBase with
    # the donated-buffer design (pipeline/session.py): the painting canvas
    # lives in device HBM between requests; each stamp uploads two int32
    # coordinates + the settings scalars, and downloads nothing unless
    # asked. Consecutive stamps chain on-device, so a client can fire a
    # whole stroke without waiting and fetch once at the end.

    # Fire-and-forget stamps coalesce into K-chained stroke programs:
    # each dispatch through a tunneled/remote backend costs one full
    # round trip (measured 12-30 ms) during which the device sits idle,
    # so a 16-stamp stroke dispatched stamp-by-stamp pays 16 RTTs on top
    # of ~16x125 ms device time. Deferring return_pixels=False stamps
    # and flushing them as ONE lax.scan program (engine.session_stroke_fn)
    # pays ~1 RTT per stroke segment instead. Results are bit-identical
    # to eager stamps: each deferred stamp carries the counter it was
    # enqueued with, so the RNG stream is unchanged.
    #
    # Flushes dispatch in FIXED K buckets (greedy largest-first over
    # _STROKE_BUCKETS): the stroke program jit-specializes per K, and a
    # burst length depends on nondeterministic network timing - bucketed
    # Ks keep the set of compiled programs finite (5 per operating
    # point, all precompiled at session warmup) so no painter's stroke
    # ever pays a mid-paint XLA compile for a novel K.
    _STROKE_FLUSH_CAP = 16
    _STROKE_BUCKETS = (16, 8, 4, 2, 1)

    def begin_session(self, canvas_u8: np.ndarray) -> None:
        from ..serving.model_base import validate_session_canvas

        canvas_u8 = validate_session_canvas(canvas_u8, self._resolution)
        self._session_canvas = self._put_banded(canvas_u8)
        self._pending_stamps = []

    def session_active(self) -> bool:
        return getattr(self, "_session_canvas", None) is not None

    def _enqueue_stamp(self, x0, y0, steps, cfg_w, tg_w, tg_steps, pad,
                       margin):
        # one flush bucket = one (steps, interval) program; a settings
        # change that alters the static step count splits the stroke
        if self._pending_stamps and self._pending_stamps[0]["steps"] != steps:
            self.flush_session()
        # re-read after a potential flush: flush_session rebinds the
        # attribute to a fresh list, so a local alias taken before the
        # flush would append to the already-dispatched list (silently
        # dropping the stamp that triggered the flush)
        pending = self._pending_stamps
        pending.append(dict(steps=steps, counter=self._next_counter(),
                            x0=np.int32(x0), y0=np.int32(y0), cfg_w=cfg_w,
                            tg_w=tg_w, tg_steps=tg_steps, pad=pad,
                            margin=margin))
        if len(pending) >= self._STROKE_FLUSH_CAP:
            self.flush_session()

    def _dispatch_stroke_bucket(self, canvas, bucket):
        """Dispatch one K-bucket of deferred stamps; returns the new
        resident canvas (device array, not yet synced)."""
        steps = bucket[0]["steps"]
        if len(bucket) == 1:
            p = bucket[0]
            fn = self.engine.session_stamp_fn(
                self._resolution, steps, self._cache_interval(steps))
            with self.timer.stage(f"session stamp x{steps}"):
                new_canvas, _ = fn(
                    self.params, canvas, self._brush_dev, self._cond,
                    self._uncond, self._base_key, p["counter"], p["x0"],
                    p["y0"], p["cfg_w"], p["tg_w"], p["tg_steps"],
                    p["pad"], p["margin"])
            return new_canvas
        fn = self.engine.session_stroke_fn(
            self._resolution, steps, self._cache_interval(steps))
        stack = lambda k: np.stack([p[k] for p in bucket])
        with self.timer.stage(
                f"session stroke x{steps} k={len(bucket)}"):
            return fn(
                self.params, canvas, self._brush_dev, self._cond,
                self._uncond, self._base_key, stack("counter"),
                stack("x0"), stack("y0"), stack("cfg_w"),
                stack("tg_w"), stack("tg_steps"), stack("pad"),
                stack("margin"))

    def flush_session(self) -> None:
        """Dispatch every deferred fire-and-forget stamp as chained
        stroke programs (no-op when nothing is pending). Dispatches in
        greedy _STROKE_BUCKETS sizes so only those K values ever
        jit-specialize - all precompiled at session warmup, so no
        painter's stroke pays a mid-paint XLA compile for a novel burst
        length. If a dispatch raises, undispatched stamps are restored
        to the queue so acked work is not silently dropped."""
        pending = getattr(self, "_pending_stamps", None)
        if not pending:
            return
        self._pending_stamps = []
        canvas = self._require_session()
        i = 0
        try:
            while i < len(pending):
                k = next(b for b in self._STROKE_BUCKETS
                         if b <= len(pending) - i)
                canvas = self._dispatch_stroke_bucket(
                    canvas, pending[i:i + k])
                self._session_canvas = canvas
                i += k
        except Exception:
            # restore the failed bucket + everything after it (each
            # stamp keeps its enqueue-time counter, so a retry replays
            # the identical RNG stream); the error propagates to the
            # caller, whose next synchronizing request reports it
            self._pending_stamps = pending[i:] + self._pending_stamps
            raise

    def stamp_at(self, x0: int, y0: int, return_pixels: bool = True,
                 overpaint: bool = False, **settings):
        self._require_session()
        steps, cfg_w, tg_w, tg_steps, pad = self._settings_scalars(settings)
        margin = np.int32(max(1, round(37 / 256 * self._resolution))
                          if overpaint else 0)
        if not return_pixels:
            self._enqueue_stamp(x0, y0, steps, cfg_w, tg_w, tg_steps, pad,
                                margin)
            return None
        self.flush_session()
        canvas = self._require_session()
        fn = self.engine.session_stamp_fn(
            self._resolution, steps, self._cache_interval(steps))
        with self.timer.stage(f"session stamp x{steps}"):
            new_canvas, comp_u8 = fn(
                self.params, canvas, self._brush_dev, self._cond,
                self._uncond, self._base_key, self._next_counter(),
                np.int32(x0), np.int32(y0), cfg_w, tg_w, tg_steps, pad,
                margin)
            self._session_canvas = new_canvas
            return self._fetch_np(comp_u8)

    def erase_at(self, x0: int, y0: int, return_pixels: bool = True):
        self.flush_session()
        canvas = self._require_session()
        fn = self.engine.session_erase_fn(self._resolution)
        new_canvas, crop_u8 = fn(canvas, np.int32(x0), np.int32(y0))
        self._session_canvas = new_canvas
        return np.asarray(crop_u8) if return_pixels else None

    # Bands for the pipelined canvas download (fetch_canvas). The
    # tunneled transport moves ~22 MB/s on a single blocking transfer
    # but overlaps round trips across CONCURRENT transfers: fetching the
    # 4 MB stroke canvas as 8 async band copies measured 140-190 ms vs
    # 194-245 ms whole (tools/bench_fetch_pipeline.py). The split is ONE
    # jitted program returning all bands (n separate eager slices would
    # each pay a ~70 s remote-compile at first fetch).
    _FETCH_BANDS = 8

    def _put_banded(self, canvas_u8: np.ndarray, batch: bool = False):
        """Host->device upload of an (H, W, C) canvas as ONE transfer.

        Banding the UPLOAD into N concurrent jax.device_put calls + an
        on-device concat - the mirror of the banded downloads that won in
        _fetch_np - was measured a clear LOSS on the tunneled backend
        (512px canvas, put+consume+sync-fetch, 2026-08-20): single put
        104.8 ms vs 147.4 / 152.2 / 116.2 ms for 2 / 4 / 8 bands.
        Separate device_puts pay per-transfer setup without overlapping,
        while one contiguous put streams at full tunnel bandwidth - the
        asymmetry with downloads is that _fetch_np's bands come from ONE
        device array via copy_to_host_async (overlapping round trips),
        whereas upload bands are N independent host arrays each opening
        its own transfer. `batch` adds the stamp program's leading batch
        dim (a metadata-only expand on an async device array)."""
        arr = jnp.asarray(canvas_u8)
        return arr[None] if batch else arr

    def _fetch_np(self, arr) -> np.ndarray:
        """Device->host download as _FETCH_BANDS overlapping async band
        transfers (falls back to one blocking transfer when the leading
        dim does not split)."""
        n = self._FETCH_BANDS
        if arr.shape[0] % n:
            return np.asarray(arr)
        fn = getattr(self, "_fetch_bands_fn", None)
        if fn is None:
            # a.shape is static under jit, so one cache entry
            # re-specializes per array shape
            fn = jax.jit(lambda a: tuple(
                jax.lax.slice_in_dim(a, i * (a.shape[0] // n),
                                     (i + 1) * (a.shape[0] // n), axis=0)
                for i in range(n)))
            self._fetch_bands_fn = fn
        bands = fn(arr)
        for b in bands:
            b.copy_to_host_async()
        return np.concatenate([np.asarray(b) for b in bands], axis=0)

    def fetch_canvas(self) -> np.ndarray:
        """Synchronizes the stroke: flushes deferred stamps, blocks until
        every queued stamp has executed, then downloads the canvas as
        overlapping async band transfers (one blocking transfer leaves
        the tunnel's round trips serialized; see _FETCH_BANDS)."""
        self.flush_session()
        return self._fetch_np(self._require_session())

    def sync_session(self) -> None:
        """Flush + block until every queued stamp has executed,
        downloading one byte instead of the whole canvas
        (block_until_ready does not guarantee completion on tunneled
        backends; fetching data does)."""
        self.flush_session()
        np.asarray(self._require_session().ravel()[:1])

    def end_session(self) -> None:
        self._session_canvas = None
        self._pending_stamps = []

    def _require_session(self):
        canvas = getattr(self, "_session_canvas", None)
        if canvas is None:
            raise RuntimeError("no active stroke session (BEGIN_SESSION "
                               "first)")
        return canvas
