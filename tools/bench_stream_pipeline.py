"""Software-pipelined GN-conv stream kernel prototype.

Hypothesis (from the measured efficiency ladder of gn_conv_stream at
equal-byte shapes: 52% MFU at (512^2, 128ch), 66% at (256^2, 256),
75% at (128^2, 512)): each grid step pays a ~5-6 us FIXED VPU tax
(GN+SiLU prologue + the two column-shift replicas) that fully
SERIALIZES with the 9 MXU taps, because the prologue feeds the taps in
the same step. At Cout=N_T shapes (one cout tile per window) nothing
amortizes it.

This prototype decouples them: at step h the kernel normalizes+reps
window h+1 (VPU, into the other slot) while the MXU runs the taps of
window h from the slot normalized at step h-1. With no data dependency
between the two, Mosaic's scheduler can co-issue VPU and MXU.

Measures the shipped kernel vs the pipelined prototype at the VAE's
Cout-128/256 shapes (stats/residual off for both - isolating the
prologue/tap overlap question).

RESULT (v5e, 2026-08-20): **negative** - with correct triple-buffered
slots the pipelined kernel times IDENTICALLY to the shipped one
(2.793 vs 2.797 ms at (2,512,512,128)->128): Mosaic serializes the
next-window VPU normalize with this window's MXU taps regardless of
the absent data dependency, so cross-step software pipelining buys
nothing on this toolchain. The ~5-6 us/step fixed VPU tax stands; the
52-75% MFU ladder is the kernel's real ceiling here. Kept runnable for
re-evaluation on future Mosaic releases.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_stream_pipeline.py
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffusiontexturepainting_tpu.ops import gn_conv_stream as g

sync = lambda o: np.asarray(o.ravel()[:1])


def _pipe_kernel(x_hbm, a_ref, c_ref, w_ref, b_ref, out_ref,
                 win, rep, sem, *, H_T, W, Wp, Cin, N_T, num_h):
    """Grid (B, num_h). win: (3, H_T+2, Wp, Cin) windows (slot h%3 is
    tapped, (h+1)%3 is being normalized, (h+2)%3 is the DMA landing pad
    - triple-buffered so the prefetch never overwrites a live window);
    rep: (2, 2, H_T+2, Wp, Cin) column-shift replicas (2 live slots)."""
    bb = pl.program_id(0)
    hi = pl.program_id(1)
    a = a_ref[0, 0].astype(jnp.float32)
    c = c_ref[0, 0].astype(jnp.float32)

    def dma(h, s):
        # row window [h*H_T - 1, h*H_T + H_T + 1) clamped; top/bottom
        # zero rows handled by the prologue writer
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(pl.multiple_of(h * H_T, H_T), H_T + 2)],
            win.at[s], sem.at[s])

    def normalize(s, r):
        x = win[s]
        xf = x.astype(jnp.float32) * a[None, None] + c[None, None]
        y = (xf * jax.nn.sigmoid(xf)).astype(x.dtype)
        win[s] = y
        rep[r, 0, :, : Wp - 1, :] = y[:, 1:, :]
        rep[r, 1, :, : Wp - 2, :] = y[:, 2:, :]

    @pl.when(hi == 0)
    def _first():
        d0 = dma(0, 0)
        d0.start()
        d0.wait()
        normalize(0, 0)
        dma(1, 1).start()

    slot = hi % 3
    nxt = (hi + 1) % 3
    land = (hi + 2) % 3

    @pl.when(hi + 2 < num_h)
    def _prefetch():
        dma(hi + 2, land).start()

    # normalize NEXT window (VPU) - no dependency on this step's taps
    @pl.when((hi + 1 < num_h))
    def _pipeline():
        dma(hi + 1, nxt).wait()
        normalize(nxt, (hi + 1) % 2)

    acc = None
    for k in range(9):
        di, dj = divmod(k, 3)
        if dj:
            slab = rep[hi % 2, dj - 1, pl.ds(di, H_T), pl.ds(0, W), :]
        else:
            slab = win[slot, pl.ds(di, H_T), pl.ds(0, W), :]
        d = jnp.dot(slab.reshape(H_T * W, Cin), w_ref[k],
                    preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    y = acc + b_ref[0].astype(jnp.float32)[None]
    out_ref[0] = y.astype(out_ref.dtype).reshape(H_T, W, N_T)


def pipelined(x, a, c, w, b, plan=None):
    """Interior-only prototype (no edge-row zero handling: benchmark
    semantics, not production)."""
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    H_T, N_T = plan
    assert Cout == N_T, "prototype: single cout tile"
    wpad = (-(W + 2)) % 8
    Wp = W + 2 + wpad
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + wpad), (0, 0)))
    w9 = w.reshape(9, Cin, Cout)
    b2 = b.reshape(1, Cout)
    a2 = a.astype(jnp.float32).reshape(B, 1, Cin)
    c2 = c.astype(jnp.float32).reshape(B, 1, Cin)
    num_h = H // H_T
    kernel = functools.partial(_pipe_kernel, H_T=H_T, W=W, Wp=Wp, Cin=Cin,
                               N_T=N_T, num_h=num_h)
    return pl.pallas_call(
        kernel,
        grid=(B, num_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM
            pl.BlockSpec((1, 1, Cin), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Cin), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, Cin, N_T), lambda b, h: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_T), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H_T, W, N_T), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, H_T + 2, Wp, Cin), x.dtype),
            pltpu.VMEM((2, 2, H_T + 2, Wp, Cin), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * Cin * Cout * 9,
            bytes_accessed=(x.size + w.size + B * H * W * Cout) * 2,
            transcendentals=B * H * W * Cin,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
    )(xp, a2, c2, w9, b2)


def bench(fn, *args, iters=30):
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


def main():
    for (B, H, W, Cin, Cout) in [(2, 512, 512, 128, 128),
                                 (1, 512, 512, 128, 128),
                                 (1, 256, 256, 256, 256)]:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, H, W, Cin)), jnp.bfloat16)
        a = jnp.asarray(rng.standard_normal((B, Cin)) * 0.1 + 1, jnp.float32)
        c = jnp.asarray(rng.standard_normal((B, Cin)) * 0.1, jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.04,
                        jnp.bfloat16)
        bb = jnp.asarray(rng.standard_normal((Cout,)), jnp.bfloat16)
        plan = g.stream_fused_plan(x.shape, w.shape, 2)
        pplan = (plan[0], Cout)  # prototype: one cout tile per window
        flops = 2 * B * H * W * Cin * Cout * 9

        ship_full = functools.partial(g._stream_fused_pallas,
                                      want_stats=False, apply_gn=True,
                                      plan=plan)
        ship = lambda *args: ship_full(*args)[0]
        t0 = bench(ship, x, a, c, w, bb, None)
        try:
            ref = np.asarray(ship(x, a, c, w, bb, None), np.float32)
            out = np.asarray(pipelined(x, a, c, w, bb, pplan), np.float32)
            # interior only: the prototype skips edge-row zeroing
            err = np.abs(ref[:, 8:-8] - out[:, 8:-8]).max()
            t1 = bench(functools.partial(pipelined, plan=pplan),
                       x, a, c, w, bb)
            print(f"({B},{H},{W},{Cin})->{Cout} plan={plan}: "
                  f"ship={t0:.3f}ms ({flops / t0 / 1e9:.0f} GF/ms->TF/s) "
                  f"piped={t1:.3f}ms ({flops / t1 / 1e9:.0f}) "
                  f"interior maxdiff={err:.2e}", flush=True)
        except Exception as e:
            print(f"({B},{H},{W},{Cin})->{Cout}: piped FAIL "
                  f"{type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
