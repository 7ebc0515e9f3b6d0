"""Device mesh construction and sharding rules.

The reference's distributed layer is HF Accelerate over NCCL
(train_texture_inpaint_lora.py:343-349, 580-582): pure data parallelism
with all-reduce gradient sync. Here parallelism is laid out SPMD-style:

  mesh axes: ('data', 'model')
    data  - batch sharding (DP); gradient psums ride ICI
    model - weight sharding of the large frozen towers (FSDP/TP-style:
            output-channel dim sharded, XLA all-gathers on use) and of
            attention heads where beneficial

Multi-host: `jax.distributed.initialize()` + the same mesh spanning all
processes (DCN between hosts, ICI within) - `init_distributed()` below.
Serving uses request-level parallelism over 'data' (parallel/serving.py).
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host bring-up over DCN (no-op for single-process)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults: all devices on 'data'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs more than {n} devices")
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_spec(path_leaf_shape, model_size: int) -> P:
    """FSDP-style spec for one weight leaf: shard the trailing
    (output-channel) dim over 'model' when divisible, else replicate."""
    shape = path_leaf_shape
    if len(shape) >= 1 and shape[-1] % model_size == 0 and shape[-1] >= 2 * model_size:
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def shard_params(params, mesh: Mesh):
    """Place a param pytree on the mesh with per-leaf FSDP specs."""
    model_size = mesh.shape["model"]

    def place(leaf):
        spec = param_spec(np.shape(leaf), model_size) if model_size > 1 else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params)


def params_shardings(params, mesh: Mesh):
    """Matching shardings pytree (for jit in_shardings)."""
    model_size = mesh.shape["model"]

    def spec_of(leaf):
        spec = param_spec(np.shape(leaf), model_size) if model_size > 1 else P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map(spec_of, params)
