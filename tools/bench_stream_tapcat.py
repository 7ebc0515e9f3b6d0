"""A/B the streaming GN-conv tap arrangements on hardware.

Modes (ops/gn_conv_stream.py _kernel):
  plain - 9 K=Cin tap dots, dj column slices are sublane-offset reads
          (Mosaic relayout before each matmul)
  reps  - 2 column-shifted window replicas built once per row window;
          tap reads tile-aligned; 9 dots + 8 f32 accumulator adds
  cat   - channel-concatenated shifted window (H_T+2, W, 3*Cin) built
          once per row window; 3 K=3*Cin dots per step - 6 of the 8
          accumulator adds move into the MXU's internal accumulation

Also decomposes the per-step cost at each shape: full kernel vs
apply_gn=False (no prologue) vs want_stats=False (no stats epilogue) vs
no residual, so the VPU-vs-MXU split is measurable rather than guessed.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_stream_tapcat.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from diffusiontexturepainting_tpu.ops.gn_conv_stream import (
    _stream_fused_pallas,
    stream_fused_plan,
)

# the enc/dec hot shapes (B, H, W, Cin, Cout) - MFU from the round-4
# component traces: 52% at Cin 128, 65% at 256, 74% at 512
SHAPES = [
    ("enc down_0 512^2x128 (B2)", 2, 512, 512, 128, 128),
    ("dec up_3   512^2x128 (B1)", 1, 512, 512, 128, 128),
    ("enc down_1 256^2x256 (B2)", 2, 256, 256, 256, 256),
    ("dec up_2   256^2x256 (B1)", 1, 256, 256, 256, 256),
    ("enc down_2 128^2x512 (B2)", 2, 128, 128, 512, 512),
]

N = 30
sync = lambda o: np.asarray(o.ravel()[:1])


def chain_time(fn, x, *rest):
    def chained(x0, *aa):
        def body(i, xx):
            out = fn(xx, *aa)
            return out.astype(xx.dtype)
        return jax.lax.fori_loop(0, N, body, x0)

    f = jax.jit(chained)
    out = f(x, *rest)
    sync(out)
    best = 1e9
    for _ in range(4):
        tic = time.perf_counter()
        out = f(x, *rest)
        sync(out)
        best = min(best, (time.perf_counter() - tic) * 1e3)
    return best / N


def main():
    key = jax.random.PRNGKey(0)
    for label, b, hh, ww, cin, cout in SHAPES:
        ks = jax.random.split(key, 6)
        x = jax.random.normal(ks[0], (b, hh, ww, cin), jnp.bfloat16)
        a = (jax.random.normal(ks[1], (b, cin), jnp.float32) * 0.2 + 1.0)
        c = jax.random.normal(ks[2], (b, cin), jnp.float32) * 0.2
        w = jax.random.normal(ks[3], (3, 3, cin, cout), jnp.bfloat16) * 0.05
        bias = jax.random.normal(ks[4], (cout,), jnp.bfloat16)
        res = jax.random.normal(ks[5], (b, hh, ww, cout), jnp.bfloat16)
        plan = stream_fused_plan(x.shape, w.shape, 2)
        if plan is None:
            print(f"{label}: no plan")
            continue
        flops = 2 * b * hh * ww * cin * cout * 9
        row = [f"{label} plan={plan}"]
        for mode in ("plain", "reps", "cat"):
            try:
                t = chain_time(
                    lambda xx, rr: _stream_fused_pallas(
                        xx, a, c, w, bias, rr, True, True, plan,
                        tap_mode=mode)[0], x, res)
                row.append(f"{mode} {t:6.3f} ms ({flops / t / 1e9:5.1f} TF/s)")
            except Exception as e:
                row.append(f"{mode} n/a ({type(e).__name__})")
        print(" | ".join(row), flush=True)
        # decomposition at the winning default (cat if available)
        for tag, gn, stats, rr in (("no-gn", False, True, res),
                                   ("no-stats", True, False, res),
                                   ("no-res", True, True, None)):
            try:
                t = chain_time(
                    lambda xx, rr=rr: _stream_fused_pallas(
                        xx, a, c, w, bias, rr, stats, gn, plan,
                        tap_mode="cat")[0], x)
                print(f"    cat {tag}: {t:6.3f} ms", flush=True)
            except Exception as e:
                print(f"    cat {tag}: n/a ({type(e).__name__})", flush=True)
        # prologue split: affine-only (silu monkeypatched to identity) -
        # TIMING ONLY (wrong numerics) - isolates the exp2+div cost from
        # the affine+VMEM-rewrite cost of the prologue
        import diffusiontexturepainting_tpu.ops.gn_conv_stream as _m
        real_silu = _m._silu_same_dtype
        try:
            _m._silu_same_dtype = lambda v: v
            t = chain_time(
                lambda xx: _stream_fused_pallas(
                    xx, a, c, w, bias, res, True, True, plan,
                    tap_mode="cat")[0], x)
            print(f"    cat no-silu (timing-only): {t:6.3f} ms", flush=True)
        except Exception as e:
            print(f"    cat no-silu: n/a ({type(e).__name__})", flush=True)
        finally:
            _m._silu_same_dtype = real_silu


if __name__ == "__main__":
    main()
