"""Request-level parallel serving over a device mesh.

The reference serves one GPU per process (trt_model.py:28, `device=0`).
On TPU a pod slice can serve many concurrent painting sessions from one
process: a batch of stamps (one per session/request) is sharded over the
mesh's 'data' axis and executed as a single SPMD program - same compiled
stamp math, vmapped over the batch, with per-request settings as batched
arrays (so mixed cfg/tg/pad values in one batch never recompile).
"""

from __future__ import annotations


import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipeline.inpaint import StampModels, make_stamp_fn


class ParallelStampEngine:
    """Batched multi-chip stamp execution.

    `safe_models` (the engine's no-pallas twin) is REQUIRED for real-TPU
    batching when provided: vmapping the stamp adds a leading batch dim
    that the streaming Pallas kernels cannot lower (gn_conv_stream's
    memory-space-ANY blocks fail with "supports ... only blocks having
    the same block shape as the array shape" at batch 4, measured
    2026-08-20), so the batched program is traced from the module-leg
    models under conv_impl("xla"). A UNet-only-fused variant (Pallas
    kernels in the UNet, XLA VAE) was probed and is NOT viable on this
    toolchain: the vmapped fused UNet's compile crashed the remote
    compile service after ~25 min (broken pipe). Measured throughput
    (bench.py --concurrent 4): 1.24x stamps/s/chip at the reference's
    256/20 envelope point (32^2-latent matmuls leave MXU headroom the
    batch fills); 1.00x at 512/4, where the stamp is COMPUTE-bound at
    82-85% UNet MFU and batching adds FLOPs linearly. The safe twin is required for EVERY data=N
    program, not just per-chip batching: SPMD partitioning keeps the
    vmapped batch rank (each chip's local block is (1, ...), the
    leading dim is not dropped), so the Pallas lowering failure applies
    at local batch 1 too. Per-painter stroke SESSIONS are unaffected -
    they pin to one chip and run the single-chip fused programs."""

    def __init__(self, models: StampModels, scheduler_name: str, mesh: Mesh,
                 safe_models: StampModels | None = None,
                 final_step_f32: bool = False,
                 cache_interval_fn=None):
        self.models = models
        self.safe_models = safe_models
        self.scheduler_name = scheduler_name
        self.mesh = mesh
        # operating-point flags of the owning model: the batched program
        # must honor the SAME --deep-cache-interval / --f32-final-step
        # the single-chip engine serves (they used to be silently
        # dropped on the --mesh data=N path)
        self.final_step_f32 = final_step_f32
        self.cache_interval_fn = cache_interval_fn or (lambda steps: 1)
        self._fns = {}
        import threading

        self._build_lock = threading.Lock()

    def _build(self, resolution: int, steps: int):
        models = self.safe_models or self.models
        stamp = make_stamp_fn(
            models, self.scheduler_name, steps,
            deep_cache_interval=self.cache_interval_fn(steps),
            final_step_f32=self.final_step_f32)
        vstamp = jax.vmap(
            stamp,
            in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
        )
        if self.safe_models is not None:
            from ..ops.conv3x3 import conv_impl

            inner = vstamp

            def vstamp(*args):
                with conv_impl("xla"):  # context active during trace
                    return inner(*args)

        data = NamedSharding(self.mesh, P("data"))
        repl = NamedSharding(self.mesh, P())

        fn = jax.jit(
            vstamp,
            in_shardings=(repl, data, data, data, data, data, data, data,
                          data, data, data),
            out_shardings=(data, data),
        )
        return fn

    def stamp_fn(self, resolution: int, steps: int):
        # locked check-then-insert: batches dispatch from tornado's
        # multi-thread executor, and an unlocked race here would build
        # two jit objects and pay the batched program's full XLA compile
        # twice (same fix as Engine._cached, core/engine.py)
        key = (int(resolution), int(steps))
        if key not in self._fns:
            with self._build_lock:
                if key not in self._fns:
                    self._fns[key] = self._build(*key)
        return self._fns[key]

    def stamp_batch(self, params, canvases_u8, brushes, conds, unconds, keys,
                    cfg_weights, tg_weights, tg_steps, context_pads,
                    steps: int, counters=None):
        """Run a batch of B stamps across the mesh.

        Args (leading dim B, which must be a multiple of the data axis):
            canvases_u8: (B, 1, H, W, 4) uint8
            brushes: (B, 1, H, W, 3) float32
            conds/unconds: (B, 1, L, D)
            keys: (B,) PRNG keys
            cfg_weights/tg_weights: (B,) float32
            tg_steps/context_pads: (B,) int32
            counters: (B,) uint32 per-request fold-in counters (default 0..B-1)
        Returns (raw_u8, composited_u8), each (B, H, W, 3).
        """
        import numpy as np

        res = int(canvases_u8.shape[-3])
        B = canvases_u8.shape[0]
        if counters is None:
            counters = np.arange(B, dtype=np.uint32)
        fn = self.stamp_fn(res, steps)
        return fn(params, canvases_u8, brushes, conds, unconds, keys, counters,
                  cfg_weights, tg_weights, tg_steps, context_pads)
