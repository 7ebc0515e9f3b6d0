"""Cross-attention (kv=14) layout A/B: head-split transposes vs
block-diagonal merged-layout attention.

The UNet's cross-attention runs on the XLA path (ops/attention.py
xla_attention): FLOPs are trivial (14 kv tokens) but the head
split/merge transposes are full HBM passes over the (B, L, C) query
tensor - at the 512px L0 shape that is 4 passes x 7.9 MB x 16
cross-attn calls per UNet step.

The block-diagonal formulation never changes the query layout:

    S_full = q @ blockdiag(k_h^T)          (B, L, h*Lk)
    P = softmax per head block             (reshape to (B, L, h, Lk))
    out = P_full @ blockdiag(v_h)          (B, L, C), merged layout

blockdiag weights are built from the SMALL k/v tensors (B, 14, C), so
the big tensor never transposes. The MXU does h x more MACs against the
zero off-blocks, but h*Lk = 112-128 lanes is one tile anyway.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_cross_attn.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from diffusiontexturepainting_tpu.ops.attention import xla_attention

sync = lambda o: np.asarray(o.ravel()[:1])


def blockdiag_cross_attention(q, k, v, num_heads: int,
                              scale: float | None = None):
    """(B, Lq, C) x (B, Lk, C) -> (B, Lq, C) without transposing q.

    Exact same math as xla_attention for any Lk (intended for small Lk:
    the block-diagonal matmuls do num_heads x the true MACs).
    """
    B, Lq, C = q.shape
    Lk = k.shape[1]
    h = num_heads
    hd = C // h
    if scale is None:
        scale = hd**-0.5
    f32 = jnp.float32

    # (B, Lk, C) -> (B, C, h*Lk) block-diagonal: head g's K^T block at
    # rows [g*hd:(g+1)*hd), cols [g*Lk:(g+1)*Lk)
    kt = k.reshape(B, Lk, h, hd)
    eye = jnp.eye(h, dtype=k.dtype)  # (h, h) selector
    # bd_k[b, (g2, d), (g, l)] = k[b, l, g, d] * eye[g2, g]
    bd_k = jnp.einsum("blgd,Gg->bGdgl", kt, eye).reshape(B, C, h * Lk)
    scores = jnp.einsum("blc,bcm->blm", q, bd_k,
                        preferred_element_type=f32)  # (B, Lq, h*Lk)
    probs = jax.nn.softmax(
        scores.reshape(B, Lq, h, Lk).astype(f32) * scale, axis=-1)
    probs = probs.reshape(B, Lq, h * Lk).astype(q.dtype)
    # (B, Lk, C) -> (B, h*Lk, C) block-diagonal V
    vt = v.reshape(B, Lk, h, hd)
    bd_v = jnp.einsum("blgd,Gg->bGlgd", vt, eye).reshape(B, h * Lk, C)
    # bd_v[b, (g, l), (g2, d)] = v[b, l, g, d] * eye[g, g2]
    return jnp.einsum("blm,bmc->blc", probs, bd_v,
                      preferred_element_type=f32).astype(q.dtype)


def bench(fn, *args, iters=50):
    f = jax.jit(fn)
    out = f(*args)
    sync(out)
    best = 1e9
    for _ in range(3):
        tic = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        sync(out)
        best = min(best, (time.perf_counter() - tic) / iters * 1e3)
    return best


def main():
    rng = np.random.default_rng(0)
    for (B, L, C, h, tag) in [(3, 4096, 320, 8, "L0"),
                              (3, 1024, 640, 8, "L1"),
                              (3, 256, 1280, 8, "L2")]:
        q = jnp.asarray(rng.standard_normal((B, L, C)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, 14, C)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, 14, C)), jnp.bfloat16)
        ref = np.asarray(xla_attention(q, k, v, h), np.float32)
        new = np.asarray(blockdiag_cross_attention(q, k, v, h), np.float32)
        err = np.abs(ref - new).max()
        t_ref = bench(lambda q, k, v: xla_attention(q, k, v, h), q, k, v)
        t_new = bench(
            lambda q, k, v: blockdiag_cross_attention(q, k, v, h), q, k, v)
        print(f"{tag} (B{B} L{L} C{C} h{h} kv14): xla={t_ref:.3f} ms  "
              f"blockdiag={t_new:.3f} ms  maxdiff={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
