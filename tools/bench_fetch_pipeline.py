"""Device->host transfer pipelining A/B on the tunneled backend.

fetch_canvas downloads the full stroke canvas (4 MB RGBA u8 at a
1024x1024 session) as ONE blocking np.asarray; at the measured ~50 ms/MB
tunnel rate that is ~200 ms per stroke sync. If the tunnel's cost is
per-transfer round trips (serialization windows) rather than pure
bandwidth, issuing N band slices as CONCURRENT async copies can overlap
the round trips.

Measures: single np.asarray vs N-way banded copy_to_host_async for
N in {2, 4, 8}, plus the upload direction (device_put whole vs banded).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_fetch_pipeline.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    host = rng.integers(0, 256, (args.size, args.size, 4), np.uint8)
    mb = host.nbytes / 1e6

    # jax Arrays cache their host copy after the first np.asarray - a
    # repeated fetch of the same Array times a memcpy, not the wire. Use
    # a fresh device array per iteration (pre-staged before timing).
    def fresh_pool():
        pool = [jax.device_put(np.bitwise_xor(host, np.uint8(i)))
                for i in range(args.iters + 1)]
        jax.block_until_ready(pool)
        return pool

    def timeit_pool(fn):
        pool = fresh_pool()
        fn(pool[0])  # warm
        best = 1e9
        for i in range(args.iters):
            tic = time.perf_counter()
            fn(pool[i + 1])
            best = min(best, time.perf_counter() - tic)
        return best * 1e3

    t_whole = timeit_pool(lambda d: np.asarray(d))
    print(f"fetch whole ({mb:.1f} MB): {t_whole:.1f} ms "
          f"({mb / t_whole * 1e3:.1f} MB/s)")

    for n in (2, 4, 8):
        def banded(d, n=n):
            bands = [d[i * args.size // n:(i + 1) * args.size // n]
                     for i in range(n)]
            for b in bands:
                b.copy_to_host_async()
            return np.concatenate([np.asarray(b) for b in bands], axis=0)

        t = timeit_pool(banded)
        print(f"fetch {n}-banded async: {t:.1f} ms ({mb / t * 1e3:.1f} MB/s)")

    t_up = timeit(lambda: jax.block_until_ready(jax.device_put(host)))
    print(f"upload whole: {t_up:.1f} ms ({mb / t_up * 1e3:.1f} MB/s)")
    for n in (2, 4):
        hbands = np.split(host, n, axis=0)

        def up_banded():
            futs = [jax.device_put(h) for h in hbands]
            jax.block_until_ready(futs)

        t = timeit(up_banded)
        print(f"upload {n}-banded: {t:.1f} ms ({mb / t * 1e3:.1f} MB/s)")


if __name__ == "__main__":
    main()
