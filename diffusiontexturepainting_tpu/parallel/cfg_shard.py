"""CFG-branch model parallelism: the 3-branch UNet batch over 3 chips.

Every denoise step runs the UNet on a CFG triple-batch - [uncond, cond,
texture-guided] (reference stable_diffusion_pipeline.py:423,
inpaint_pipeline.py:116). The three branches are INDEPENDENT until the
guidance combine (denoise_latent:449-451), which makes the batch axis a
perfect model-parallel axis: `shard_map` the UNet apply over a 3-chip
'model' mesh so each chip computes one branch with the regular
(pallas-fused) single-branch kernels, and let the tiny (3, h, w, 4)
noise prediction gather for the combine - 98 KB of bf16 over ICI per
step, microseconds, against ~15 ms of saved UNet compute per step.

Everything else in the stamp program (VAE encode/decode, scheduler step,
composites) stays replicated: the VAE batch of 2 does not divide 3, and
replicating its ~37 ms keeps the program collective-free outside the
per-step gather. Estimated exact-math device time at 512px/4-step:
4 x ~7.5 ms (UNet/3) + ~37.6 ms VAE ~= 68 ms vs 126 ms single-chip -
the one exact-math path under the <100 ms target. (Only the gathered
eps crosses chips; parameters are replicated, so no weight collectives
ever run - the reference's analog would be splitting the 3 branches
across 3 TRT engines/GPUs, which it never implements: trt_model.py:28
serves exactly one GPU.)

Serving surface: `--mesh model=3` (serving/run.py) builds the standard
TPUConditionalInpainter with these wrapped models - sessions, engine
warmup, deep-cache and the wire protocol all work unchanged. Proven by
the CPU-mesh test (tests/test_parallel.py) and dryrun_multichip; a
real-TPU number needs 3 chips (this environment exposes one).
"""

from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh, PartitionSpec as P
try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..pipeline.inpaint import StampModels


def _shard3(mesh: Mesh, axis: str, apply_fn, has_cache_in: bool = False,
            has_cache_out: bool = False):
    """Wrap a batch-3 UNet apply so each mesh device computes its local
    branch slice with the ordinary single-chip kernels."""
    b = P(axis)  # batch-leading tensors split one branch per chip
    in_specs = (P(), b, b, b) + ((b,) if has_cache_in else ())
    out_specs = (b, b) if has_cache_out else b

    # params are replicated but flax trees confuse the replication
    # checker; correctness is by construction (branches never
    # communicate). jax>=0.8's jax.shard_map dropped the check_rep
    # kwarg (its successor is check_vma); pass whichever exists.
    import inspect

    _kw = {}
    try:
        sig_params = inspect.signature(shard_map).parameters
        if "check_rep" in sig_params:
            _kw["check_rep"] = False
        elif "check_vma" in sig_params:
            _kw["check_vma"] = False
    except (TypeError, ValueError):  # pragma: no cover - exotic wrappers
        pass

    def wrapped(params, sample, t, ctx, *cache):
        return shard_map(
            apply_fn, mesh=mesh,
            in_specs=in_specs, out_specs=out_specs, **_kw,
        )(params, sample, t, ctx, *cache)

    return wrapped


def cfg_sharded_models(models: StampModels, mesh: Mesh,
                       axis: str = "model") -> StampModels:
    """A StampModels twin whose UNet applies are sharded one CFG branch
    per device of `mesh` (axis size must be 3, the CFG batch)."""
    if int(mesh.shape[axis]) != 3:
        raise ValueError(
            f"CFG-branch sharding needs mesh axis '{axis}'=3 (one chip "
            f"per guidance branch), got {dict(mesh.shape)}")
    return dataclasses.replace(
        models,
        unet_apply=_shard3(mesh, axis, models.unet_apply),
        unet_full_apply=(
            _shard3(mesh, axis, models.unet_full_apply, has_cache_out=True)
            if models.unet_full_apply else None),
        unet_shallow_apply=(
            _shard3(mesh, axis, models.unet_shallow_apply, has_cache_in=True)
            if models.unet_shallow_apply else None),
        unet_final_apply=(
            _shard3(mesh, axis, models.unet_final_apply)
            if models.unet_final_apply else None),
    )


def make_cfg_mesh(n: int = 3, devices=None) -> Mesh:
    """A ('model',)-axis mesh over the first `n` devices."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())[:n]
    if len(devices) < n:
        raise ValueError(f"mesh model={n} but only {len(devices)} devices")
    return Mesh(np.asarray(devices), ("model",))
