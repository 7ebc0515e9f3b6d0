"""Per-shape (H_T, N_T) tile sweep for the streaming GN-conv kernel.

stream_fused_plan picks one tile per shape from a VMEM model; this
measures every feasible tile on the real chip at the VAE's hot shapes
so the plan can be gated on measurement instead of the model.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/sweep_stream_tiles.py
"""

import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

sync = lambda o: np.asarray(o.ravel()[:1])


def bench(fn, *args, iters=20):
    f = jax.jit(fn)
    out = f(*args)
    sync(out[0] if isinstance(out, tuple) else out)
    best = 1e9
    for _ in range(3):
        tic = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        sync(out[0] if isinstance(out, tuple) else out)
        best = min(best, (time.perf_counter() - tic) / iters * 1e3)
    return best


# (B, H, W, Cin, Cout, has_res) - decode levels use B=1, encode B=2
SHAPES = [
    (1, 128, 128, 512, 512, True),    # decode up_1
    (1, 256, 256, 256, 256, True),    # decode up_2
    (1, 512, 512, 128, 128, True),    # decode up_3
    (2, 512, 512, 128, 128, True),    # encode L0
    (2, 256, 256, 256, 256, True),    # encode L1
    (2, 128, 128, 512, 512, True),    # encode L2
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from diffusiontexturepainting_tpu.ops import gn_conv_stream as g

    for (B, H, W, Cin, Cout, has_res) in SHAPES:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, H, W, Cin)), jnp.bfloat16)
        a = jnp.asarray(rng.standard_normal((B, Cin)), jnp.float32) * 0.1 + 1
        c = jnp.asarray(rng.standard_normal((B, Cin)), jnp.float32) * 0.1
        w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.04,
                        jnp.bfloat16)
        bb = jnp.asarray(rng.standard_normal((Cout,)), jnp.bfloat16)
        res = (jnp.asarray(rng.standard_normal((B, H, W, Cout)),
                           jnp.bfloat16) if has_res else None)
        default = g.stream_fused_plan(x.shape, w.shape, 2)
        flops = 2 * B * H * W * Cin * Cout * 9
        rows = []
        for ht in (64, 32, 16, 8):
            if H % ht:
                continue
            for nt in (512, 384, 256, 128):
                if Cout % nt:
                    continue
                try:
                    t = bench(functools.partial(
                        g._stream_fused_pallas, want_stats=True,
                        apply_gn=True, plan=(ht, nt)),
                        x, a, c, w, bb, res, iters=args.iters)
                    rows.append((t, ht, nt))
                except Exception as e:
                    rows.append((float("inf"), ht, nt))
        rows.sort()
        t0, ht0, nt0 = rows[0]
        line = f"({B},{H},{W},{Cin})->{Cout} default={default}: "
        line += "  ".join(
            f"[{ht}x{nt}]={t:.2f}ms" if t != float("inf")
            else f"[{ht}x{nt}]=FAIL" for t, ht, nt in rows[:6])
        line += f"  | best {flops/t0/1e9:.0f} GF/s"
        print(line, flush=True)


if __name__ == "__main__":
    main()
