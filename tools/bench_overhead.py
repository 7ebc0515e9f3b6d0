"""Decompose per-request dispatch/transfer overhead on the tunneled TPU.

The round-1 bench showed ~90-125 ms of per-request wall overhead on top
of ~137 ms device compute for a 512px stamp. This experiment measures,
with a trivial device program (so device time ~ 0):

  A. dispatch+fetch with NO host inputs (resident args) -> base RTT
  B. + 1 MB uint8 canvas upload                          -> upload cost
  C. + the real stamp arg signature (5 numpy scalars)    -> per-arg cost
  D. C but scalars packed into ONE (8,) f32 array        -> packing win
  E. donated-output variant                               -> alloc effect
  F. two outputs fetched vs one                           -> fetch count

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_overhead.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(label, fn, iters=30):
    # warmup
    for _ in range(3):
        fn()
    samples = []
    for _ in range(iters):
        tic = time.perf_counter()
        fn()
        samples.append((time.perf_counter() - tic) * 1000)
    samples.sort()
    p50 = samples[len(samples) // 2]
    print(f"{label:55s} p50={p50:7.2f} ms  min={samples[0]:7.2f}")
    return p50


def main():
    print("devices:", jax.devices())
    res = 512
    canvas = np.zeros((1, res, res, 4), np.uint8)
    canvas_dev = jax.device_put(canvas)

    @jax.jit
    def trivial_resident(c):
        return (c[0, :, :, :3] + 1).astype(jnp.uint8)

    @jax.jit
    def trivial_scalars(c, counter, cfg, tg, tg_steps, pad):
        out = (c[0, :, :, :3].astype(jnp.float32) + cfg + tg
               + tg_steps + pad + counter)
        return out.astype(jnp.uint8)

    @jax.jit
    def trivial_packed(c, packed):
        out = c[0, :, :, :3].astype(jnp.float32) + jnp.sum(packed)
        return out.astype(jnp.uint8)

    @jax.jit
    def trivial_two_outputs(c):
        a = (c[0, :, :, :3] + 1).astype(jnp.uint8)
        return a, a + 1

    def fetch(x):
        return np.asarray(x)

    # A: resident input, one u8 output fetch
    timeit("A resident input -> fetch 768KB u8",
           lambda: fetch(trivial_resident(canvas_dev)))

    # B: 1MB u8 host input each call
    timeit("B host 1MB u8 input -> fetch 768KB",
           lambda: fetch(trivial_resident(canvas)))

    # C: + 5 numpy scalars (the current stamp signature)
    timeit("C host input + 5 numpy scalars",
           lambda: fetch(trivial_scalars(
               canvas, np.uint32(3), np.float32(2.0), np.float32(1.0),
               np.int32(4), np.int32(150))))

    # D: scalars packed into one array
    packed = np.zeros((8,), np.float32)
    timeit("D host input + 1 packed (8,) f32 array",
           lambda: fetch(trivial_packed(canvas, packed)))

    # E: fetch only 1 byte (sync cost without payload download)
    timeit("E host input, fetch 1 byte",
           lambda: fetch(trivial_resident(canvas)[:1, :1, :1]))

    # F: two outputs, fetch one vs both
    timeit("F two outputs, fetch one",
           lambda: fetch(trivial_two_outputs(canvas)[1]))
    def both():
        a, b = trivial_two_outputs(canvas)
        fetch(a); fetch(b)
    timeit("F two outputs, fetch both",
           both)

    # G: no-op jit scalar program (pure RTT floor)
    @jax.jit
    def nop(x):
        return x + 1
    one = jax.device_put(np.float32(1.0))
    timeit("G scalar program, resident arg",
           lambda: fetch(nop(one)))


if __name__ == "__main__":
    main()
