"""Isolate the 9-tap shifted-slab read tax in the streaming GN-conv
kernel.

The kernel's inner loop reads xwin[slot, ds(di, H_T), ds(dj, W), :] for
the 9 taps - di/dj in {0,1,2} - so six of nine tap reads are
sublane-offset slices of the resident window, which Mosaic must
materialize (relayout) before the matmul. This measures three variants
of the SAME 9-dot compute on a VMEM-resident window to attribute time:

  shifted    - exactly the kernel's reads (baseline)
  unshifted  - all 9 taps read the di=0, dj=0 slab (no relayout; the
               conv result is wrong, the MXU work is identical)
  rowflat    - window stored flattened ((H_T+2)*Wp, Cin); taps read
               ds(di*Wp + dj, H_T*W) rows - ONE sublane-offset slice per
               tap but no 2D subwindow extraction; tests whether the 2D
               slice is worse than a flat row slice
  jointw     - width taps folded into the contraction: one
               ds(di*Wp, H_T*W + 2) read per di (3 slices instead of 9)
               and a (Cin*3, N_T) weight panel per di built by stacking
               the dj taps with a row offset - the "overlapped matmul"
               trick: y[r] = sum_dj x[r+dj] @ w[dj] == (rows r..r+2 as
               one (3*Cin)-wide row) @ stacked w. Requires reading
               H_T*W+2 rows and discarding nothing: cols beyond W wrap
               into the next row's halo, which the width-padded layout
               makes zero, so the wrap rows contribute w-weighted zeros.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_conv_shift_cost.py
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xwin_ref, w_ref, o_ref, *, H_T, W, Wp, Cin, N_T, variant,
            reps):
    def one_pass(_):
        acc = None
        if variant == "jointw":
            # w_ref here is (3, 3*Cin, N_T): per di, the dj taps stacked
            # along the contraction with a one-row offset
            flat = xwin_ref[...].reshape((H_T + 2) * Wp, Cin)
            for di in range(3):
                rows = jax.lax.dynamic_slice(
                    flat, (di * Wp, 0), (H_T * Wp + 2, Cin))
                # windows of 3 consecutive rows as one (3*Cin) row:
                # rows[r], rows[r+1], rows[r+2] concat == reshape of a
                # (H_T*Wp, 3, Cin) strided view; emulate with 3 slices
                cat = jnp.concatenate(
                    [jax.lax.dynamic_slice(rows, (k, 0),
                                           (H_T * Wp, Cin))
                     for k in range(3)], axis=-1)
                d = jnp.dot(cat, w_ref[di],
                            preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
            return acc
        for k in range(9):
            di, dj = divmod(k, 3)
            if variant == "unshifted":
                slab = xwin_ref[pl.ds(0, H_T), pl.ds(0, W), :]
            elif variant == "rowflat":
                flat = xwin_ref[...].reshape((H_T + 2) * Wp, Cin)
                slab = jax.lax.dynamic_slice(
                    flat, (di * Wp + dj, 0), (H_T * W, Cin))
                d = jnp.dot(slab, w_ref[k],
                            preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
                continue
            else:
                slab = xwin_ref[pl.ds(di, H_T), pl.ds(dj, W), :]
            d = jnp.dot(slab.reshape(H_T * W, Cin), w_ref[k],
                        preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        return acc

    acc = one_pass(0)
    # repeat to amortize dispatch; perturb nothing (loop body re-reads
    # the refs, Mosaic does not hoist ref reads across fori_loop)
    def body(i, carry):
        return carry + one_pass(i)[:1, :1]

    extra = jax.lax.fori_loop(0, reps - 1, body,
                              jnp.zeros((1, 1), jnp.float32))
    out_rows = acc.shape[0]
    o_ref[...] = (acc + extra[0, 0]).reshape(out_rows // W
                                             if variant != "jointw"
                                             else out_rows // Wp,
                                             -1, N_T)[:H_T, :W].astype(
        o_ref.dtype) if variant == "jointw" else (
        acc + extra[0, 0]).reshape(H_T, W, N_T).astype(o_ref.dtype)


def bench(H_T, W, Cin, N_T, variant, reps=24, outer=20):
    wpad = (-(W + 2)) % 8
    Wp = W + 2 + wpad
    rng = np.random.default_rng(0)
    xwin = jnp.asarray(rng.random((H_T + 2, Wp, Cin)), jnp.bfloat16)
    if variant == "jointw":
        w = jnp.asarray(rng.random((3, 3 * Cin, N_T)), jnp.bfloat16)
    else:
        w = jnp.asarray(rng.random((9, Cin, N_T)), jnp.bfloat16)
    kern = functools.partial(_kernel, H_T=H_T, W=W, Wp=Wp, Cin=Cin,
                             N_T=N_T, variant=variant, reps=reps)
    fn = jax.jit(lambda x, w: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((H_T, W, N_T), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, w))
    out = fn(xwin, w)
    np.asarray(out.ravel()[:1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(outer):
            out = fn(xwin, w)
        np.asarray(out.ravel()[:1])
        best = min(best, (time.perf_counter() - t0) / outer)
    flops = 2 * H_T * W * Cin * N_T * 9 * reps
    return best / reps * 1e3, flops / best / 1e12


def main():
    shapes = [
        (16, 128, 512, 128, "dec 128^2x512"),
        (8, 256, 256, 256, "dec 256^2x256"),
        (8, 512, 128, 128, "dec 512^2x128"),
    ]
    for (ht, w_, cin, nt, tag) in shapes:
        for variant in ("shifted", "unshifted", "rowflat"):
            try:
                ms, tf = bench(ht, w_, cin, nt, variant)
                print(f"{tag} H_T={ht} W={w_} Cin={cin} N_T={nt} "
                      f"{variant:9s}: {ms:7.4f} ms/pass  {tf:6.1f} TF/s")
            except Exception as e:  # noqa: BLE001
                print(f"{tag} {variant}: FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
