"""A/B one UNet ResnetBlock body at the L0 serving shape (3,64,64,320):

  A. unfused module path: GroupNorm32 -> silu -> pallas Conv3x3 (x2)
     with temb add and residual (what the UNet uses today)
  B. chained resident kernels: input stats assumed available (from the
     previous conv's epilogue) -> affine fold -> gn_conv_resident conv1
     (stats epilogue) -> temb folded into the next affine -> conv2 with
     residual + stats epilogue

B's promise: no standalone GN reduce and no GN-apply/silu HBM round
trips. Measured as a chain of 4 sequential resnet bodies so the stats
hand-off is on the measured path.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_resnet_chain.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


B, H, W, C = 3, 64, 64, 320
GROUPS = 32
N_CHAIN = 4


def make_params(key):
    ks = jax.random.split(key, 12)
    mk = lambda k, shape, s=0.05: (jax.random.normal(k, shape, jnp.float32) * s)
    p = []
    for i in range(N_CHAIN):
        p.append(dict(
            s1=1.0 + mk(ks[0], (C,), 0.1), b1=mk(ks[1], (C,), 0.1),
            w1=mk(ks[2], (3, 3, C, C)).astype(jnp.bfloat16),
            c1=mk(ks[3], (C,)).astype(jnp.bfloat16),
            temb=mk(ks[4], (B, C), 0.2),
            s2=1.0 + mk(ks[5], (C,), 0.1), b2=mk(ks[6], (C,), 0.1),
            w2=mk(ks[7], (3, 3, C, C)).astype(jnp.bfloat16),
            c2=mk(ks[8], (C,)).astype(jnp.bfloat16),
        ))
    return p


def unfused_chain(params, x):
    from diffusiontexturepainting_tpu.ops.conv3x3 import conv3x3

    def gn(x, scale, bias, eps=1e-5):
        # same formulation as models/layers.py GroupNorm32
        g = GROUPS
        c = x.shape[-1]
        gm = jnp.asarray(np.kron(np.eye(g), np.ones((c // g, 1))), jnp.float32)
        n = (c // g) * (x.shape[1] * x.shape[2])
        xf = x.astype(jnp.float32)
        s1 = jnp.sum(xf, axis=(1, 2)) @ gm
        s2 = jnp.sum(jnp.square(xf), axis=(1, 2)) @ gm
        mean_g = s1 / n
        var_g = s2 / n - jnp.square(mean_g)
        inv_g = jax.lax.rsqrt(var_g + eps)
        mean_c = (mean_g @ gm.T).astype(x.dtype)
        inv_c = (inv_g @ gm.T).astype(x.dtype)
        y = (x - mean_c[:, None, None]) * inv_c[:, None, None]
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)

    for p in params:
        h = gn(x, p["s1"], p["b1"])
        h = jax.nn.silu(h)
        h = conv3x3(h.astype(jnp.bfloat16), p["w1"], p["c1"])
        h = h + p["temb"].astype(h.dtype)[:, None, None, :]
        h2 = gn(h, p["s2"], p["b2"])
        h2 = jax.nn.silu(h2)
        h2 = conv3x3(h2.astype(jnp.bfloat16), p["w2"], p["c2"])
        x = x + h2
    return x


def chained_chain(params, x, stats):
    from diffusiontexturepainting_tpu.ops.conv3x3 import gn_conv_resident
    from diffusiontexturepainting_tpu.ops.gn_conv_stream import (
        gn_affine_from_stats,
        shift_stats_for_temb,
    )

    n_sp = H * W
    for p in params:
        a1, c1 = gn_affine_from_stats(stats, p["s1"], p["b1"], GROUPS, n_sp)
        h, s_mid = gn_conv_resident(x.astype(jnp.bfloat16), a1, c1,
                                    p["w1"], p["c1"], None, True, True)
        # temb folded: stats shift + c' = c + t*a on the next affine
        s_mid = shift_stats_for_temb(s_mid, p["temb"], n_sp)
        a2, c2 = gn_affine_from_stats(s_mid, p["s2"], p["b2"], GROUPS, n_sp)
        c2 = c2 + p["temb"].astype(jnp.float32) * a2
        x, stats = gn_conv_resident(h, a2, c2, p["w2"], p["c2"],
                                    x.astype(jnp.bfloat16), True, True)
    return x, stats


def bench(fn, args, label):
    sync = lambda o: np.asarray(
        (o[0] if isinstance(o, tuple) else o).ravel()[:1])
    f = jax.jit(fn)
    out = f(*args)
    sync(out)
    best = 1e9
    for _ in range(4):
        tic = time.perf_counter()
        for _ in range(10):
            out = f(*args)
        sync(out)
        best = min(best, (time.perf_counter() - tic) * 1e3 / 10)
    print(f"{label:28s} {best:7.3f} ms / {N_CHAIN}-resnet chain")
    return best, out


def main():
    from diffusiontexturepainting_tpu.core.engine import (
        enable_persistent_cache,
    )
    from diffusiontexturepainting_tpu.ops.gn_conv_stream import stats_of

    enable_persistent_cache()
    key = jax.random.PRNGKey(0)
    params = make_params(key)
    x = jax.random.normal(key, (B, H, W, C), jnp.float32) * 2 + 0.3
    x16 = x.astype(jnp.bfloat16)
    st = stats_of(x16)

    t_a, out_a = bench(unfused_chain, (params, x16), "A unfused GN+conv")
    t_b, out_b = bench(chained_chain, (params, x16, st), "B chained resident")
    oa = np.asarray(out_a, np.float32)
    ob = np.asarray(out_b[0], np.float32)
    print(f"max |A-B| = {np.abs(oa - ob).max():.4f} "
          f"(rel {np.abs(oa - ob).max() / (np.abs(oa).max() + 1e-9):.5f})")
    print("winner:", "B (chained)" if t_b < t_a else "A (unfused)")


if __name__ == "__main__":
    main()
