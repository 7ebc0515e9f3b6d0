"""Does transposing the PV product lift the head-dim lane-padding tax?

In the fused attention kernel the PV matmul is e(bq, Lk) @ v(Lk, hd)
with hd in {40, 80}: the MXU output lanes are hd/128 occupied, so the
pass runs at <= 31% (hd 40) / 62% (hd 80) of peak. The transposed
formulation v^T(hd, Lk) @ e^T(Lk, bq) makes hd the STREAMING dim (m)
and bq the lane dim (full 128s), so the systolic array is fully
occupied; the extra cost is transposing e (VPU) or producing it
transposed, plus transposing o back (hd x bq, small).

This measures both formulations as standalone pallas kernels at the
UNet L0/L1 shapes (CFG batch 3, 8 heads), with everything VMEM-resident
and the dot repeated via fori_loop so dispatch overhead amortizes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_pv_transpose.py
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _iters(bq, lk, hd):
    # target ~300 GF of dot work per call so the ~1 ms dispatch RTT of a
    # tunneled backend is <5% of the measurement
    return max(64, int(300e9 / (2 * bq * lk * hd)))


def _pv_kernel(e_ref, v_ref, o_ref, *, transposed: bool, iters: int):
    e = e_ref[0]
    v = v_ref[0]

    def body(i, acc):
        # data-dependence on i via the SMALL operand so the dot cannot be
        # hoisted out of the loop (the perturbation pass is ~Lk*hd VPU
        # ops, <<1% of the dot)
        vv = v * (1.0 + i.astype(jnp.float32) * 1e-9).astype(v.dtype)
        if transposed:
            ot = jax.lax.dot_general(
                vv, e, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (hd, bq)
            o = ot.T
        else:
            o = jnp.dot(e, vv, preferred_element_type=jnp.float32)
        return acc + o

    acc = jax.lax.fori_loop(
        0, iters, body,
        jnp.zeros((e.shape[0], v.shape[1]), jnp.float32))
    o_ref[0] = acc.astype(o_ref.dtype)


def bench_shape(bq, lk, hd, transposed, reps=30):
    bh = 1  # one grid row; the grid just repeats the same work
    iters = _iters(bq, lk, hd)
    kern = functools.partial(_pv_kernel, transposed=transposed, iters=iters)
    e = jnp.asarray(
        np.random.default_rng(0).random((bh, bq, lk)), jnp.bfloat16)
    v = jnp.asarray(
        np.random.default_rng(1).random((bh, lk, hd)), jnp.bfloat16)
    fn = jax.jit(lambda e, v: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bh, bq, hd), jnp.bfloat16),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, bq, lk), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, hd), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, hd), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )(e, v))
    out = fn(e, v)
    np.asarray(out.ravel()[:1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(e, v)
        np.asarray(out.ravel()[:1])
        best = min(best, (time.perf_counter() - t0) / reps)
    flops = 2 * bq * lk * hd * iters
    return best * 1e3, flops / best / 1e12, iters


def main():
    for (bq, lk, hd, tag) in [(512, 4096, 40, "L0"),
                              (512, 1024, 80, "L1"),
                              (256, 256, 160, "L2")]:
        for transposed in (False, True):
            ms, tf, iters = bench_shape(bq, lk, hd, transposed)
            label = "v^T@e^T" if transposed else "e@v   "
            print(f"{tag} (bq={bq}, Lk={lk}, hd={hd}) {label}: "
                  f"{ms:8.3f} ms/call ({iters} dots)  {tf:6.1f} TF/s")


if __name__ == "__main__":
    main()
