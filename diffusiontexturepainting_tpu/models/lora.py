"""LoRA adapters for the UNet's attention projections.

Design: LoRA factors live in their OWN pytree, separate from the frozen
base params. At *train* time the merge  W_eff = W + scale * (up @ down)
happens inside the jitted train step (tiny rank-r matmuls, fused by XLA),
so gradients flow to the factors while the base stays frozen - the JAX
analog of diffusers' LoRAAttnProcessor injection (reference
train_texture_inpaint_lora.py:419-433). At *serving* time the same merge
runs once at load (weights/convert.py), matching the reference's offline
TRT fusion (models.py:1042-1094: W' = W + scale * up @ down over all 32
attention processors).

Flax kernels are stored (in, out) = W^T, so the merge here is
kernel' = kernel + scale * down^T @ up^T.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

LORA_TARGETS = ("to_q", "to_k", "to_v", "to_out")


def _iter_attention_paths(unet_params) -> list:
    """Paths ['down_0_attn_0', 'transformer_blocks_0', 'attn1'] etc. for
    every attention projection in the UNet param tree."""
    paths = []

    def walk(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                if k in ("attn1", "attn2"):
                    for t in LORA_TARGETS:
                        if t in v:
                            paths.append(prefix + [k, t])
                else:
                    walk(v, prefix + [k])

    walk(unet_params, [])
    return paths


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def init_lora_params(unet_params, rank: int = 4, seed: int = 0):
    """One (down, up) pair per attention projection.

    down ~ N(0, 1/rank), up = 0 (so the adapter starts as identity),
    matching diffusers LoRALinearLayer init.
    """
    key = jax.random.PRNGKey(seed)
    lora = {}
    for path in _iter_attention_paths(unet_params):
        kernel = _get(unet_params, path)["kernel"]
        in_dim, out_dim = kernel.shape
        key, sub = jax.random.split(key)
        name = "/".join(path)
        lora[name] = {
            "down": jax.random.normal(sub, (rank, in_dim), jnp.float32) / rank,
            "up": jnp.zeros((out_dim, rank), jnp.float32),
        }
    return lora


def merge_lora(unet_params, lora_params, scale: float = 1.0):
    """Return a new UNet param tree with LoRA deltas folded in.

    Differentiable w.r.t. lora_params; base params pass through
    unchanged (frozen under stop_gradient at the call site if desired).
    """
    flat = {"/".join(p): p for p in _iter_attention_paths(unet_params)}

    def apply_delta(tree, path, down, up):
        node = tree
        for p in path[:-1]:
            node = node[p]
        leaf = dict(node[path[-1]])
        delta = (down.T @ up.T).astype(leaf["kernel"].dtype)
        leaf["kernel"] = leaf["kernel"] + scale * delta
        node[path[-1]] = leaf

    # rebuild the dict spine so apply_delta's in-place writes never
    # mutate the caller's tree (leaves are shared by reference)
    merged = _deep_copy_dicts(unet_params)
    for name, factors in lora_params.items():
        path = flat.get(name)
        if path is None:
            raise KeyError(f"LoRA target {name} not found in UNet params")
        apply_delta(merged, path, factors["down"], factors["up"])
    return merged


def _deep_copy_dicts(tree):
    # Mapping (not just dict) so flax FrozenDict trees become mutable
    # plain dicts instead of opaque leaves apply_delta cannot write into
    from collections.abc import Mapping

    if isinstance(tree, Mapping):
        return {k: _deep_copy_dicts(v) for k, v in tree.items()}
    return tree


def num_lora_params(lora_params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(lora_params))
