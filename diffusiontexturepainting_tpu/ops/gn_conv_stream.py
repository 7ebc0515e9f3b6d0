"""Streaming fused GroupNorm-affine -> SiLU -> 3x3 conv with a
GroupNorm-statistics epilogue (the VAE/ResNet hot path).

Why this kernel exists. The SD VAE at stamp resolutions spends its time
in stride-1 3x3 convs over activations far too large for VMEM
(512x512x128 bf16 = 64 MB), where XLA's conv runs at 11-44 TFLOP/s
depending on shape (measured on v5e; roofline ~130). The reference
solves the same problem with TensorRT conv kernels + a GroupNorm plugin
fused into the surrounding elementwise chain (reference models.py:
250-302 GroupNorm plugin; the engine fuses conv+bias+silu). The earlier
attempts in ops/conv3x3.py showed each half of the TPU answer working in
isolation but regressing end-to-end:

  - `_conv3x3_stream` (windowed-DMA conv) beat XLA ~2x per kernel, but
    moving the conv out of XLA turned the *next* layer's GroupNorm
    statistics pass into a standalone transposed f32 materialization
    (XLA had been co-computing it inside the conv fusion).
  - `gn_silu_conv3x3` (VMEM-resident fused GN+conv) lost because the
    statistics for its own input still came from a separate XLA pass.

This kernel closes the loop: each conv *emits* the (sum, sum-of-squares)
per (batch, out-channel) of its own output as a second result, so the
next layer's GroupNorm affine is derived from the previous kernel's
epilogue with a tiny (B,C)@(C,G) matmul - no full pass over the tensor
ever happens outside the convs. One ResnetBlock body becomes exactly two
kernel invocations:

    h1, s1 = gn_conv_stream(x,  affine(s_x),  conv1_w)          # GN1+SiLU+conv1
    y,  sy = gn_conv_stream(h1, affine(s1),   conv2_w, res=x')  # GN2+SiLU+conv2+skip

The time-embedding add of the UNet variant folds into the next affine
exactly: stats shift by (N*t, 2*t*sum + N*t^2) and the normalization of
(h + t) is silu(h*a + (c + t*a)) - see `shift_stats_for_temb`.

Memory behavior per grid step (grid = batch x cout-tiles x row-tiles,
rows innermost): DMA the (H_T+2)-row halo window HBM->VMEM, apply the
folded affine + SiLU in f32 row-chunks into a bf16 scratch (the padded
border is masked to zero so SAME-padding taps see zeros), run the 9
kernel-tap MXU matmuls with an f32 accumulator, add bias/residual,
reduce the f32 tile into the resident stats block, write the bf16 tile.
Activations cross HBM exactly once per layer in each direction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_STATS_ROWS = 8  # f32 tile sublane minimum; rows 0/1 = sum/sumsq, rest zero

# Tap-arrangement experiment - measured NEUTRAL, kept measurable
# (tools/bench_stream_tapcat.py, v5e 2026-08-20): "cat" collapses the 9
# K=Cin tap dots into 3 K=3*Cin dots against a channel-concatenated
# shifted window (6 of 8 f32 accumulator adds move into the MXU's
# internal accumulation, tap reads tile-aligned). A/B at the 5 hot
# enc/dec shapes: cat 57.0/46.4/73.4/54.8/80.4 TF/s vs reps
# 56.1/47.0/75.1/51.4/79.9 - within +/-2% everywhere, so the per-tap
# relayouts and accumulator adds were ALREADY hidden under the MXU taps.
# The same run decomposed the kernel: the GN/SiLU prologue is 15-18% of
# kernel time at Cin 128 and the rest of the gap to the MXU floor is the
# serialized window DMA + epilogue around a ~6 us MXU burst per window
# (see the tool's no-gn/no-stats/no-res rows).
_TAP_CAT_DEFAULT = False

_LOG2E = 1.4426950408889634


# SiLU formulation switch for the prologue: "exp2" =
# x / (1 + exp2(-x*log2e)), "tanh" = 0.5*x*(1 + tanh(x/2)) - the same
# function, trading the VPU divide for a multiply-add around the
# transcendental. Measured NEUTRAL-to-slightly-worse on v5e
# (down_0 2.744 vs 2.755 ms, up_3 1.660 vs 1.675, down_1 2.092 vs
# 2.116; 2026-08-20), so exp2 ships. The prologue decomposition that
# motivated the A/B (tools/bench_stream_tapcat.py): of the ~3.9 us
# per-window prologue at Cin=128/W=512, ~2.4 us is the SiLU
# transcendental+divide and ~1.5 us the affine + in-place VMEM rewrite.
_SILU_IMPL = "exp2"


def _silu_same_dtype(x):
    """x * sigmoid(x) computed entirely in x.dtype with explicit dtype
    constants: jax.nn.sigmoid on a bf16 vector makes Mosaic broadcast an
    f32 scalar into a bf16 vector, which fails MLIR verification. exp2
    with a folded log2(e) constant also runs at the packed-bf16 VPU rate
    (one transcendental, no separate exp lowering)."""
    if _SILU_IMPL == "tanh":
        half = jnp.asarray(0.5, x.dtype)
        return half * x * (jnp.asarray(1, x.dtype)
                           + jnp.tanh(x * half))
    e = jnp.exp2(x * jnp.asarray(-_LOG2E, x.dtype))
    return x / (jnp.asarray(1, x.dtype) + e)


def group_matrix(channels: int, num_groups: int) -> np.ndarray:
    """(C, G) one-hot channel->group matrix (f32)."""
    return np.kron(np.eye(num_groups), np.ones((channels // num_groups, 1))
                   ).astype(np.float32)


def gn_affine_from_stats(stats, scale, bias, num_groups: int,
                         n_spatial: int, eps: float = 1e-5):
    """Fold chained GroupNorm statistics + affine params into per-(B, C)
    a, c with  GN(x)*scale + bias == x*a + c.

    stats: (B, STATS_ROWS, C) f32 from a previous kernel's epilogue (or
    `stats_of` below); rows 0/1 hold sum / sum-of-squares over spatial.
    n_spatial: number of spatial elements the stats were reduced over.
    """
    c = stats.shape[-1]
    gmat = jnp.asarray(group_matrix(c, num_groups))
    n = n_spatial * (c // num_groups)
    s1 = stats[:, 0, :] @ gmat  # (B, G)
    s2 = stats[:, 1, :] @ gmat
    mean_g = s1 / n
    var_g = s2 / n - jnp.square(mean_g)
    inv_g = lax.rsqrt(var_g + eps)
    mean_c = mean_g @ gmat.T  # (B, C)
    inv_c = inv_g @ gmat.T
    a = inv_c * scale.astype(jnp.float32)[None]
    cc = bias.astype(jnp.float32)[None] - mean_c * a
    return a, cc


def stats_of(x) -> jnp.ndarray:
    """(B, STATS_ROWS, C) sum/sumsq stats of a tensor via one XLA pass -
    for layer inputs that did not come from a kernel epilogue."""
    axes = tuple(range(1, x.ndim - 1))
    xf = x.astype(jnp.float32)
    # two jnp.sums: XLA fuses them into one multi-output reduce that reads
    # x once (a variadic lax.reduce measured 1.7x slower; see
    # models/layers.py _moment_sums)
    s1 = jnp.sum(xf, axis=axes)
    s2 = jnp.sum(jnp.square(xf), axis=axes)
    zeros = jnp.zeros((x.shape[0], _STATS_ROWS - 2, x.shape[-1]), jnp.float32)
    return jnp.concatenate([s1[:, None], s2[:, None], zeros], axis=1)


def shift_stats_for_temb(stats, temb, n_spatial: int):
    """Stats of (h + t[:, None, None, :]) given stats of h: the UNet adds
    the time embedding between conv1 and GN2; folding it here (and into
    the next affine via `a*t + c`) avoids materializing h + t."""
    t = temb.astype(jnp.float32)
    s1 = stats[:, 0, :] + n_spatial * t
    s2 = stats[:, 1, :] + 2.0 * t * stats[:, 0, :] + n_spatial * t * t
    return jnp.concatenate(
        [s1[:, None], s2[:, None], stats[:, 2:]], axis=1)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _prologue_rows(Wp: int, Cin: int, itemsize: int = 2,
                   budget: int = 2 * 1024 * 1024) -> int:
    """Row-chunk size for the prologue temporaries. Rows are the MAJOR
    dim of the (rows, Wp, Cin) chunk - shrinking it costs no vector-lane
    efficiency, it just bounds the scratch at wide shapes (W 256/512 at
    Cin 256-512 made the fixed 8-row chunk alone exceed the VMEM budget,
    forcing the whole kernel off to XLA). The prologue runs in the
    activation dtype (bf16 on TPU: ~3 temporaries of 2 bytes)."""
    per_row = Wp * Cin * 3 * itemsize  # affine chunk + silu temp + store
    return max(1, min(8, budget // max(per_row, 1)))


def _kernel(x_hbm, a_ref, c_ref, w_ref, b_ref, *rest,
            H, W, H_T, Wp, Cin, N_T, has_res, want_stats, apply_gn,
            in_wpad=False, out_wpad=False, res_wpad=False,
            tap_mode="plain"):
    shift_reps = tap_mode == "reps"
    tap_cat = tap_mode == "cat"
    rest = list(rest)
    res_ref = rest.pop(0) if has_res else None
    out_ref = rest.pop(0)
    st_ref = rest.pop(0) if want_stats else None
    xwin = rest.pop(0)
    sem = rest.pop(0)
    st_acc = rest.pop(0) if want_stats else None
    xrep = rest.pop(0) if shift_reps else None
    xcat = rest.pop(0) if tap_cat else None
    assert not rest, "unconsumed kernel operands"

    bb = pl.program_id(0)
    # Grid order (B, H tiles, Cout tiles) with the COUT sweep innermost:
    # the DMA'd + normalized window stays resident in its scratch slot
    # across all Cout tiles, so the window DMA and the GN/SiLU prologue
    # run ONCE per row window instead of once per (row, cout) step.
    # (The old (B, Cout, H) order re-fetched and re-normalized the whole
    # image Cout/N_T times - measured as the reason small N_T tiles lost
    # the round-3 tile sweep at Cin 512 despite better MXU shapes.)
    hi = pl.program_id(1)
    ni = pl.program_id(2)
    num_h = pl.num_programs(1)
    first_n = ni == 0

    # Double-buffered window DMA: prefetch the next row window while this
    # grid step computes (guide "Patterns: Double Buffering").
    slot = jax.lax.rem(hi, 2)

    if in_wpad:
        # x is WIDTH-padded only, (B, H, Wp, C) with content cols
        # [1, W+1): the row halo is synthesized here with edge-clamped
        # DMAs (first/last row tile copies one fewer row and zeroes the
        # out-of-image window row), so no XLA row-pad pass exists.
        def run_dma(s, h, do_wait):
            go = (lambda d: d.wait()) if do_wait else (lambda d: d.start())
            h = jnp.int32(h)  # traced even for the literal h=0 call, so
            # every branch predicate is a traced bool and the disabled
            # branches' dynamic offsets are never evaluated in python
            first, last = h == 0, h + 1 >= num_h

            # num_h is static: only emit branches whose (static) slice
            # sizes are feasible - a dead branch would still trace.
            if num_h >= 3:
                @pl.when(~first & ~last)
                def _mid():
                    go(pltpu.make_async_copy(
                        x_hbm.at[bb, pl.ds(h * H_T - 1, H_T + 2)],
                        xwin.at[s], sem.at[s]))

            if num_h >= 2:
                @pl.when(first & ~last)
                def _first_blk():
                    go(pltpu.make_async_copy(
                        x_hbm.at[bb, pl.ds(0, H_T + 1)],
                        xwin.at[s, pl.ds(1, H_T + 1)], sem.at[s]))

                @pl.when(last & ~first)
                def _last_blk():
                    go(pltpu.make_async_copy(
                        x_hbm.at[bb, pl.ds(h * H_T - 1, H_T + 1)],
                        xwin.at[s, pl.ds(0, H_T + 1)], sem.at[s]))
            else:
                @pl.when(first & last)
                def _only_blk():
                    go(pltpu.make_async_copy(
                        x_hbm.at[bb, pl.ds(0, H_T)],
                        xwin.at[s, pl.ds(1, H_T)], sem.at[s]))
    else:
        def run_dma(s, h, do_wait):
            d = pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(pl.multiple_of(h * H_T, H_T), H_T + 2)],
                xwin.at[s], sem.at[s])
            d.wait() if do_wait else d.start()

    @pl.when(first_n & (hi == 0))
    def _first():
        run_dma(0, 0, False)

    @pl.when(first_n & (hi + 1 < num_h))
    def _prefetch():
        run_dma(1 - slot, hi + 1, False)

    @pl.when(first_n)
    def _wait_window():
        run_dma(slot, hi, True)

    if in_wpad:
        # zero the window rows the clamped DMA never filled (the
        # prologue's interior mask multiplies them anyway; this guards
        # against stale inf/NaN scratch making 0*x = NaN).
        zrow = jnp.zeros((1, Wp, Cin), xwin.dtype)

        @pl.when(first_n & (hi == 0))
        def _ztop():
            xwin[slot, 0:1] = zrow

        @pl.when(first_n & (hi + 1 >= num_h))
        def _zbot():
            xwin[slot, H_T + 1:H_T + 2] = zrow

    # Prologue: affine -> SiLU in the ACTIVATION dtype (bf16 on TPU:
    # packed 2x VPU rate, and no f32 temporaries). Round-2 profiling
    # showed the old f32 prologue + full iota interior masks at ~15 VPU
    # ops/element - about half the kernel's time at the VAE's wide
    # shapes; the border handling is now 4 cheap zero STORES after the
    # fact (only the rows/cols the 9 taps actually read: padded cols 0
    # and W+1, and the global top/bottom rows on the first/last tiles).
    # Numerics: the affine applies in bf16, exactly like the module
    # path's GroupNorm32 (stats stay f32 upstream; only the per-element
    # scale/shift rounds) - _reference below matches. Runs ONCE per row
    # window (first cout step); later cout steps reuse the normalized
    # resident window.
    if apply_gn:
        @pl.when(first_n)
        def _prologue():
            a = a_ref[0, 0, :].astype(xwin.dtype)
            c0 = c_ref[0, 0, :].astype(xwin.dtype)
            chunk_rows = _prologue_rows(Wp, Cin, xwin.dtype.itemsize)
            for h0 in range(0, H_T + 2, chunk_rows):
                rows = min(chunk_rows, H_T + 2 - h0)
                chunk = xwin[slot, h0:h0 + rows, :, :]
                chunk = chunk * a[None, None, :] + c0[None, None, :]
                xwin[slot, h0:h0 + rows, :, :] = _silu_same_dtype(chunk)
            zcol = jnp.zeros((H_T + 2, 1, Cin), xwin.dtype)
            xwin[slot, :, 0:1, :] = zcol
            xwin[slot, :, W + 1:W + 2, :] = zcol
            zrow = jnp.zeros((1, Wp, Cin), xwin.dtype)

            @pl.when(hi == 0)
            def _zero_top():
                xwin[slot, 0:1] = zrow

            @pl.when(hi + 1 >= num_h)
            def _zero_bot():
                xwin[slot, H_T + 1:H_T + 2] = zrow

    if shift_reps:
        # Column-shifted replicas of the normalized window, built ONCE
        # per row window: the tap loop's dj in {1, 2} column slices are
        # sublane-OFFSET reads that Mosaic must relayout before each
        # matmul - measured as 35-42% of per-step time at the VAE decode
        # shapes (tools/bench_conv_shift_cost.py) and re-paid by every
        # cout step because the extraction sits inside the grid step.
        # Replica r holds window cols shifted left by r, so every tap
        # read below is tile-aligned (the di row slice indexes the
        # leading, non-tiled dim - free); the two shifted copies here
        # amortize over all Cout//N_T grid steps of the window.
        @pl.when(first_n)
        def _build_reps():
            xrep[0, :, :Wp - 1, :] = xwin[slot, :, 1:, :]
            xrep[1, :, :Wp - 2, :] = xwin[slot, :, 2:, :]

    if tap_cat:
        # Channel-concatenated shifted window, built ONCE per row window:
        # xcat[r, j, s*Cin:(s+1)*Cin] = normalized window[r, j+s, :].
        # The three dj tap columns of one row group then sit contiguous
        # on the LANE axis, so the 9 K=Cin tap dots collapse to 3 K=3*Cin
        # dots (w_ref comes in as (3, 3*Cin, N_T): w.reshape(3, 3Cin, N)
        # puts tap (di, dj) at w_cat[di, dj*Cin:(dj+1)*Cin]) - 6 of the 8
        # f32 accumulator adds move INTO the MXU's internal accumulation
        # and the per-tap sublane-offset relayouts disappear (the row
        # slice xcat[di:di+H_T] indexes the untiled leading dim - free).
        @pl.when(first_n)
        def _build_cat():
            for s in range(3):
                xcat[:, :, s * Cin:(s + 1) * Cin] = \
                    xwin[slot, :, s:s + W, :]

        acc = None
        for di in range(3):
            slab = xcat[pl.ds(di, H_T), :, :]
            d = jnp.dot(slab.reshape(H_T * W, 3 * Cin), w_ref[di],
                        preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
    else:
        acc = None
        for k in range(9):
            di, dj = divmod(k, 3)
            if shift_reps and dj:
                slab = xrep[dj - 1, pl.ds(di, H_T), pl.ds(0, W), :]
            else:
                slab = xwin[slot, pl.ds(di, H_T), pl.ds(dj, W), :]
            d = jnp.dot(slab.reshape(H_T * W, Cin), w_ref[k],
                        preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
    y = acc + b_ref[0].astype(jnp.float32)[None]
    # Epilogue in the ACTIVATION dtype, exactly like the module path:
    # the conv output rounds to bf16 FIRST (= the module conv's bf16
    # result), the residual adds in bf16 (= module `x_short + h`), and
    # the GroupNorm stats are f32 converting-reduces over the bf16
    # tensor (= GroupNorm32's astype(f32) + reduce, which sums the
    # SAME rounded values). Round-3 profiling: the old f32 residual
    # add + f32 stats reads were ~40% of the epilogue VPU time at the
    # W=512/C=128 shapes.
    yb = y.astype(out_ref.dtype)
    if res_ref is not None:
        if res_wpad:
            r = res_ref[0, :, pl.ds(1, W), :]  # interior of a wpadded res
        else:
            r = res_ref[0]
        yb = yb + r.reshape(H_T * W, N_T)

    if st_ref is not None:
        # Stats accumulate in a persistent VMEM scratch (one (8, N_T)
        # row-block per cout tile) and emit to the output block only on
        # the LAST row window: with the cout sweep innermost the st
        # output block's index revisits non-consecutively, so in-place
        # accumulation through the block itself would depend on pallas
        # revisit copy-in semantics; the scratch does not.
        @pl.when(hi == 0)
        def _zero():
            st_acc[ni] = jnp.zeros_like(st_acc[ni])

        s1 = jnp.sum(yb, axis=0, dtype=jnp.float32)  # (N_T,)
        s2 = jnp.sum(yb.astype(jnp.float32) * yb.astype(jnp.float32),
                     axis=0)
        st_acc[ni, 0:1, :] += s1[None]
        st_acc[ni, 1:2, :] += s2[None]

        @pl.when(hi + 1 >= num_h)
        def _emit_stats():
            st_ref[0] = st_acc[ni]

    y3 = yb.reshape(H_T, W, N_T)
    if out_wpad:
        # emit the width-padded layout directly: content at cols
        # [1, W+1), zero borders - the consumer then needs no XLA pad.
        # One full-tile store (VPU concat) pipelines better than three
        # partial stores.
        z = lambda n: jnp.zeros((H_T, n, N_T), out_ref.dtype)
        out_ref[0] = jnp.concatenate([z(1), y3, z(Wp - W - 1)], axis=1)
    else:
        out_ref[0] = y3


_VMEM_BUDGET = 13 * 1024 * 1024


def _plan_vmem_bytes(ht, nt, Wp, W, Cin, itemsize):
    """The plan's VMEM accounting (original tuning baseline: the window
    counted once - the second DMA slot rides the headroom above the
    13 MB line)."""
    win = (ht + 2) * Wp * Cin * itemsize   # DMA window / in-place scratch
    # f32 chunk temporaries: the row-chunk adapts to wide shapes
    tmp = _prologue_rows(Wp, Cin, itemsize) * Wp * Cin * 3 * itemsize
    accb = ht * W * nt * 4                  # f32 tap accumulator
    # out/res tiles budgeted at the width-padded Wp so the same
    # plan stays valid for the chained (wpadded) layouts
    outb = ht * Wp * nt * itemsize * 2      # double-buffered out
    resb = ht * Wp * nt * itemsize * 2
    wb = 9 * Cin * nt * itemsize * 2
    return win + tmp + accb + outb + resb + wb


def stream_fused_plan(x_shape, w_shape, itemsize: int = 2):
    """(H_T, N_T) if the streaming fused kernel supports this conv.

    Prefers the tallest row tile whose budget ALSO fits the two
    column-shifted tap replicas (see _kernel shift_reps): aligned tap
    reads beat taller halo amortization at every measured shape
    (tools/bench_conv_shift_cost.py). Falls back to the replica-less
    search when nothing fits with them."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return None
    B, H, W, Cin = x_shape
    kh, kw, wcin, Cout = w_shape
    if (kh, kw) != (3, 3) or wcin != Cin:
        return None
    if H < 8 or W < 8 or Cin < 16 or Cout < 128:
        return None
    # Lane-aligned output tiles only: non-multiple-of-128 N_T (e.g. 320)
    # has crashed the TPU compiler and pads poorly anyway.
    nts = [nt for nt in (512, 384, 256, 128)
           if Cout % nt == 0 and 9 * Cin * nt * itemsize <= 5 * 1024 * 1024]
    if not nts:
        return None
    wpad = (-(W + 2)) % 8
    Wp = W + 2 + wpad
    # Joint search, taller row tiles first (halo amortization beats wider
    # output tiles: the (ht+2)/ht read amplification is the kernel's main
    # overhead at large W).
    for with_reps in (True, False):
        for ht in (64, 32, 16, 8):
            if H % ht:
                continue
            reps = 2 * (ht + 2) * Wp * Cin * itemsize if with_reps else 0
            for nt in nts:
                used = _plan_vmem_bytes(ht, nt, Wp, W, Cin, itemsize)
                if used + reps <= _VMEM_BUDGET:
                    return ht, nt
    return None


def _stream_fused_pallas(x, a, c, w, b, residual, want_stats, apply_gn,
                         plan, interpret=False, in_w=0, out_wpad=False,
                         res_wpad=False, tap_mode=None):
    if in_w:
        B, H, Wp_in, Cin = x.shape
        W = in_w
    else:
        B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    H_T, N_T = plan
    wpad = (-(W + 2)) % 8
    Wp = W + 2 + wpad
    if in_w:
        assert Wp_in == Wp, (Wp_in, Wp)
        xp = x  # already width-padded; the kernel clamps the row halo
    else:
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + wpad), (0, 0)))
    b2 = (b if b is not None else jnp.zeros((Cout,), x.dtype)).reshape(1, Cout)
    a2 = (a.astype(jnp.float32) if a is not None else
          jnp.zeros((B, Cin), jnp.float32)).reshape(B, 1, Cin)
    c2 = (c.astype(jnp.float32) if c is not None else
          jnp.zeros((B, Cin), jnp.float32)).reshape(B, 1, Cin)

    if tap_mode is None:
        # auto: prefer the channel-concatenated shifted window (3 wide
        # K=3*Cin tap dots, MXU-internal accumulation), then the two
        # column-shifted replicas, then plain offset reads - first whose
        # extra buffers keep the total inside the plan's VMEM budget
        # (same accounting as stream_fused_plan).
        it = x.dtype.itemsize
        win = (H_T + 2) * Wp * Cin * it
        used = _plan_vmem_bytes(H_T, N_T, Wp, W, Cin, it)
        cat = (H_T + 2) * W * 3 * Cin * it
        if used + cat <= _VMEM_BUDGET and _TAP_CAT_DEFAULT:
            tap_mode = "cat"
        elif used + 2 * win <= _VMEM_BUDGET:
            tap_mode = "reps"
        else:
            tap_mode = "plain"

    kernel = functools.partial(
        _kernel, H=H, W=W, H_T=H_T, Wp=Wp, Cin=Cin, N_T=N_T,
        has_res=residual is not None, want_stats=want_stats,
        apply_gn=apply_gn, in_wpad=bool(in_w), out_wpad=out_wpad,
        res_wpad=res_wpad, tap_mode=tap_mode)

    if tap_mode == "cat":
        # (kh, kw, Cin, Cout) -> (3, 3*Cin, Cout): row group di's three
        # dj taps contiguous on the contraction axis (matches xcat).
        wk = w.reshape(3, 3 * Cin, Cout)
        wspec = pl.BlockSpec((3, 3 * Cin, N_T), lambda bb, h, n: (0, 0, n),
                             memory_space=pltpu.VMEM)
    else:
        wk = w.reshape(9, Cin, Cout)
        wspec = pl.BlockSpec((9, Cin, N_T), lambda bb, h, n: (0, 0, n),
                             memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
        pl.BlockSpec((1, 1, Cin), lambda bb, h, n: (bb, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Cin), lambda bb, h, n: (bb, 0, 0),
                     memory_space=pltpu.VMEM),
        wspec,
        pl.BlockSpec((1, N_T), lambda bb, h, n: (0, n),
                     memory_space=pltpu.VMEM),
    ]
    args = [xp, a2, c2, wk, b2]
    if residual is not None:
        rw = Wp if res_wpad else W
        in_specs.append(pl.BlockSpec((1, H_T, rw, N_T),
                                     lambda bb, h, n: (bb, h, 0, n),
                                     memory_space=pltpu.VMEM))
        args.append(residual)

    ow = Wp if out_wpad else W
    out_shapes = [jax.ShapeDtypeStruct((B, H, ow, Cout), x.dtype)]
    out_specs = [pl.BlockSpec((1, H_T, ow, N_T), lambda bb, h, n: (bb, h, 0, n),
                              memory_space=pltpu.VMEM)]
    if want_stats:
        out_shapes.append(
            jax.ShapeDtypeStruct((B, _STATS_ROWS, Cout), jnp.float32))
        out_specs.append(pl.BlockSpec((1, _STATS_ROWS, N_T),
                                      lambda bb, h, n: (bb, 0, n),
                                      memory_space=pltpu.VMEM))

    scratch = [
        pltpu.VMEM((2, H_T + 2, Wp, Cin), x.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if want_stats:
        scratch.append(
            pltpu.VMEM((Cout // N_T, _STATS_ROWS, N_T), jnp.float32))
    if tap_mode == "reps":
        scratch.append(pltpu.VMEM((2, H_T + 2, Wp, Cin), x.dtype))
    elif tap_mode == "cat":
        scratch.append(pltpu.VMEM((H_T + 2, W, 3 * Cin), x.dtype))

    flops = 2 * B * H * W * Cin * Cout * 9
    out = pl.pallas_call(
        kernel,
        # Cout sweep INNERMOST: the DMA'd+normalized row window stays
        # resident across all cout tiles (see _kernel).
        grid=(B, H // H_T, Cout // N_T),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(xp.size + wk.size + 2 * B * H * W * Cout)
            * x.dtype.itemsize,
            transcendentals=B * (H + 2) * Wp * Cin,
        ),
        interpret=interpret,
    )(*args)
    return out if want_stats else (out[0], None)


def _reference(x, a, c, w, b, residual, want_stats, apply_gn, in_w=0,
               out_wpad=False, res_wpad=False):
    """XLA path, numerically matching the kernel (prologue applied in
    the ACTIVATION dtype like the module path's GroupNorm32 - stats stay
    f32 upstream - then bf16 taps, f32 accumulate, stats on the pre-cast
    f32 output)."""
    if in_w:
        x = x[:, :, 1:in_w + 1, :]
    if res_wpad and residual is not None:
        residual = residual[:, :, 1:x.shape[2] + 1, :]
    if apply_gn:
        v = (x * a[:, None, None, :].astype(x.dtype)
             + c[:, None, None, :].astype(x.dtype))
        v = v * jax.nn.sigmoid(v)
    else:
        v = x
    y = lax.conv_general_dilated(
        v, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    # Module-path epilogue ordering (matches the kernel): the conv
    # result rounds to the activation dtype FIRST, the residual adds in
    # that dtype (= ResnetBlock's `x_short + h`), and the stats are f32
    # reduces over the rounded tensor (= GroupNorm32's astype(f32)).
    y = y.astype(x.dtype)
    if residual is not None:
        y = y + residual.astype(x.dtype)
    stats = None
    if want_stats:
        yf = y.astype(jnp.float32)
        s1 = jnp.sum(yf, axis=(1, 2))
        s2 = jnp.sum(jnp.square(yf), axis=(1, 2))
        zeros = jnp.zeros((x.shape[0], _STATS_ROWS - 2, y.shape[-1]),
                          jnp.float32)
        stats = jnp.concatenate([s1[:, None], s2[:, None], zeros], axis=1)
    if out_wpad:
        W = y.shape[2]
        y = jnp.pad(y, ((0, 0), (0, 0), (1, 1 + (-(W + 2)) % 8), (0, 0)))
    return y, stats


def _gn_conv_stream_dispatch(x, a, c, w, b, residual, want_stats, apply_gn,
                             force, in_w=0, out_wpad=False, res_wpad=False):
    if force == "xla":
        return _reference(x, a, c, w, b, residual, want_stats, apply_gn,
                          in_w, out_wpad, res_wpad)
    shape4plan = ((x.shape[0], x.shape[1], in_w, x.shape[3]) if in_w
                  else x.shape)
    plan = stream_fused_plan(shape4plan, w.shape, x.dtype.itemsize)
    backend = jax.default_backend()
    if force == "pallas":
        if plan is None:
            raise ValueError(
                f"gn_conv_stream unsupported for {x.shape} x {w.shape}")
        return _stream_fused_pallas(x, a, c, w, b, residual, want_stats,
                                    apply_gn, plan,
                                    interpret=(backend != "tpu"),
                                    in_w=in_w, out_wpad=out_wpad,
                                    res_wpad=res_wpad)
    if plan is not None and backend == "tpu":
        return _stream_fused_pallas(x, a, c, w, b, residual, want_stats,
                                    apply_gn, plan, in_w=in_w,
                                    out_wpad=out_wpad, res_wpad=res_wpad)
    return _reference(x, a, c, w, b, residual, want_stats, apply_gn,
                      in_w, out_wpad, res_wpad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def gn_conv_stream(x, a, c, w, b, residual, want_stats=True,
                   apply_gn=True, force="auto", in_w=0, out_wpad=False,
                   res_wpad=False):
    """silu(x*a + c) -> 3x3 SAME conv(w, b) [+ residual], returning
    (out, stats) where stats are the (sum, sumsq) GroupNorm inputs of the
    NEXT layer ((B, 8, Cout) f32; rows 0/1 used) or None.

    a, c: (B, Cin) f32 folded GroupNorm affine (gn_affine_from_stats).
    apply_gn=False skips the prologue entirely (plain conv + epilogue).

    Width-padded chaining: in_w > 0 declares x as (B, H, Wp, Cin) with
    interior width in_w at cols [1, in_w+1) and zero borders (the row
    halo is synthesized by edge-clamped window DMA); out_wpad emits the
    same layout; res_wpad declares the residual wpadded. Chained convs
    (VAE encoder resnets) then exchange tensors with ZERO XLA pad passes.
    Serving-only forward on the pallas path; the VJP differentiates the
    XLA reference (training uses the Flax modules, not this op).
    """
    return _gn_conv_stream_dispatch(x, a, c, w, b, residual, want_stats,
                                    apply_gn, force, in_w, out_wpad,
                                    res_wpad)


def _fwd(x, a, c, w, b, residual, want_stats, apply_gn, force, in_w,
         out_wpad, res_wpad):
    out = _gn_conv_stream_dispatch(x, a, c, w, b, residual, want_stats,
                                   apply_gn, force, in_w, out_wpad,
                                   res_wpad)
    return out, (x, a, c, w, b, residual)


def _bwd(want_stats, apply_gn, force, in_w, out_wpad, res_wpad, res, g):
    # Backward runs entirely in f32, mirroring conv3x3._conv3x3_bwd: the
    # transpose rule of a preferred_element_type=f32 conv over bf16
    # operands mixes dtypes (lax.conv requires them equal), so under
    # mixed precision the re-derivation must not see bf16 primals.
    # Grads are cast back to each primal's dtype. Only the ARRAY primals
    # are differentiated - optional args (b, residual, the GN affine)
    # may be None, which jax.vjp cannot take as a positional input.
    args = res  # (x, a, c, w, b, residual)
    arr_idx = [i for i, v in enumerate(args) if v is not None]
    f32 = [args[i].astype(jnp.float32)
           if jnp.issubdtype(args[i].dtype, jnp.floating) else args[i]
           for i in arr_idx]

    def fn(*aa):
        full = list(args)
        for i, v in zip(arr_idx, aa):
            full[i] = v
        return _reference(*full, want_stats, apply_gn, in_w, out_wpad,
                          res_wpad)

    _, vjp = jax.vjp(fn, *f32)
    g32 = jax.tree_util.tree_map(lambda t: t.astype(jnp.float32), g)
    arr_grads = vjp(g32)
    grads = [None] * len(args)
    for i, gr in zip(arr_idx, arr_grads):
        grads[i] = gr.astype(args[i].dtype)
    return tuple(grads)


gn_conv_stream.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Streaming subpixel nearest-2x-upsample + 3x3 conv with stats epilogue.
#
# The decoder's two large upsamples (128^2 x 512 -> 256^2, 256^2 x 256 ->
# 512^2) exceed every VMEM-resident plan, so fused_decode used to fall
# back to XLA conv over a 4x materialized upsample - the dominant cost of
# the fused path (profiled ~31 ms/iter of XLA "fusion" in a 49 ms
# decode). This kernel streams (H_T+2)-row windows of the SOURCE image
# and computes the four parity planes with folded 2x2 taps (see
# ops/conv3x3.py _fold_upsample_weights: conv3x3(nearest2x(x)) == four
# 2x2-tap convs, 2.25x fewer FLOPs, no upsampled materialization),
# emitting the (sum, sumsq) of its own output so the next layer's
# GroupNorm needs no extra pass.
# ---------------------------------------------------------------------------


def _upconv_stream_kernel(x_hbm, w_ref, b_ref, out_ref, st_ref, xwin, sem,
                          *, H_T, W, Cin, N_T, want_stats, in_wpad,
                          out_wpad, Wp, Wp_out):
    bb = pl.program_id(0)
    hi = pl.program_id(2)
    num_h = pl.num_programs(2)
    slot = jax.lax.rem(hi, 2)

    if in_wpad:
        def run_dma(s, h, do_wait):
            go = (lambda d: d.wait()) if do_wait else (lambda d: d.start())
            h = jnp.int32(h)
            first, last = h == 0, h + 1 >= num_h
            if num_h >= 3:
                @pl.when(~first & ~last)
                def _mid():
                    go(pltpu.make_async_copy(
                        x_hbm.at[bb, pl.ds(h * H_T - 1, H_T + 2)],
                        xwin.at[s], sem.at[s]))
            if num_h >= 2:
                @pl.when(first & ~last)
                def _first_blk():
                    go(pltpu.make_async_copy(
                        x_hbm.at[bb, pl.ds(0, H_T + 1)],
                        xwin.at[s, pl.ds(1, H_T + 1)], sem.at[s]))

                @pl.when(last & ~first)
                def _last_blk():
                    go(pltpu.make_async_copy(
                        x_hbm.at[bb, pl.ds(h * H_T - 1, H_T + 1)],
                        xwin.at[s, pl.ds(0, H_T + 1)], sem.at[s]))
            else:
                @pl.when(first & last)
                def _only_blk():
                    go(pltpu.make_async_copy(
                        x_hbm.at[bb, pl.ds(0, H_T)],
                        xwin.at[s, pl.ds(1, H_T)], sem.at[s]))
    else:
        def run_dma(s, h, do_wait):
            d = pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(pl.multiple_of(h * H_T, H_T), H_T + 2)],
                xwin.at[s], sem.at[s])
            d.wait() if do_wait else d.start()

    @pl.when(hi == 0)
    def _first():
        run_dma(0, 0, False)

    @pl.when(hi + 1 < num_h)
    def _prefetch():
        run_dma(1 - slot, hi + 1, False)

    run_dma(slot, hi, True)

    if in_wpad:
        zrow = jnp.zeros((1, Wp, Cin), xwin.dtype)

        @pl.when(hi == 0)
        def _ztop():
            xwin[slot, 0:1] = zrow

        @pl.when(hi + 1 >= num_h)
        def _zbot():
            xwin[slot, H_T + 1:H_T + 2] = zrow

    if want_stats:
        @pl.when(hi == 0)
        def _zero():
            st_ref[...] = jnp.zeros_like(st_ref)

    bias = b_ref[0].astype(jnp.float32)[None]
    s1 = jnp.zeros((1, N_T), jnp.float32)
    s2 = jnp.zeros((1, N_T), jnp.float32)
    rows = []
    for ry in (0, 1):
        cols = []
        for rx in (0, 1):
            acc = None
            for ai in (0, 1):
                for bi in (0, 1):
                    k = ((ry * 2 + rx) * 2 + ai) * 2 + bi
                    slab = xwin[slot, pl.ds(ry + ai, H_T), pl.ds(rx + bi, W), :]
                    d = jnp.dot(slab.reshape(H_T * W, Cin), w_ref[k],
                                preferred_element_type=jnp.float32)
                    acc = d if acc is None else acc + d
            y = acc + bias
            if want_stats:
                s1 = s1 + jnp.sum(y, axis=0)[None]
                s2 = s2 + jnp.sum(y * y, axis=0)[None]
            cols.append(y.reshape(H_T, W, 1, N_T).astype(out_ref.dtype))
        # subpixel interleave IN VMEM: (H_T, W, 2, N) -> (H_T, 2W, N)
        # merges the adjacent col-parity planes; the XLA transpose pass
        # over the 4-plane HBM layout (1.6 ms/iter in fused_decode)
        # disappears.
        rows.append(jnp.concatenate(cols, axis=2)
                    .reshape(H_T, 1, 2 * W, N_T))
    tile = jnp.concatenate(rows, axis=1).reshape(2 * H_T, 2 * W, N_T)
    if out_wpad:
        z = lambda n: jnp.zeros((2 * H_T, n, N_T), out_ref.dtype)
        tile = jnp.concatenate([z(1), tile, z(Wp_out - 2 * W - 1)], axis=1)
    out_ref[0] = tile
    if want_stats:
        st_ref[0, 0:1, :] += s1
        st_ref[0, 1:2, :] += s2


def upconv_stream_plan(x_shape, w_shape, itemsize: int = 2):
    if len(x_shape) != 4 or len(w_shape) != 4:
        return None
    B, H, W, Cin = x_shape
    kh, kw, wcin, Cout = w_shape
    if (kh, kw) != (3, 3) or wcin != Cin:
        return None
    if H < 8 or W < 8 or Cin < 16 or Cout < 128:
        return None
    nts = [nt for nt in (512, 256, 128)
           if Cout % nt == 0 and 16 * Cin * nt * itemsize * 2
           <= 6 * 1024 * 1024]
    if not nts:
        return None
    wpad = (-(W + 2)) % 8
    Wp = W + 2 + wpad
    Wp_out = 2 * W + 2 + (-(2 * W + 2)) % 8
    for ht in (32, 16, 8, 4):
        if H % ht:
            continue
        win = 2 * (ht + 2) * Wp * Cin * itemsize  # double-buffered window
        for nt in nts:
            wb = 16 * Cin * nt * itemsize * 2
            accb = ht * W * nt * 4
            # Mosaic's stack for the interleaved (2*ht, Wp_out, nt) out
            # tile: the tile itself (double-buffered) plus the in-VMEM
            # interleave temporaries (col/row copies, concat-zero planes,
            # parity accumulators). Calibrated against 8 hardware
            # compiles at the decoder shapes (v5e, 16 MB scoped limit):
            # real usage tracks ~8.4 tiles of (2*ht, Wp_out, nt); 9 with
            # the 15 MB budget separates every observed pass/fail (e.g.
            # (1,128,128,512) ht=8 allocates 16.6 MB -> reject, ht=4
            # compiles and runs 1.9 vs 3.4 ms XLA).
            outb = 9 * 2 * ht * Wp_out * nt * itemsize
            if win + wb + accb + outb <= 15 * 1024 * 1024:
                return ht, nt
    return None


def _upconv_stream_pallas(x, w, b, want_stats, plan, interpret=False,
                          in_w=0, out_wpad=False):
    from .conv3x3 import _fold_upsample_weights

    B, H = x.shape[0], x.shape[1]
    W = in_w if in_w else x.shape[2]
    Cin = x.shape[-1]
    Cout = w.shape[-1]
    H_T, N_T = plan
    wpad = (-(W + 2)) % 8
    Wp = W + 2 + wpad
    if in_w:
        assert x.shape[2] == Wp, (x.shape, Wp)
        xp = x
    else:
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + wpad), (0, 0)))
    Wout = 2 * W
    Wp_out = Wout + 2 + (-(Wout + 2)) % 8
    ow = Wp_out if out_wpad else Wout
    w16 = _fold_upsample_weights(w)
    b2 = (b if b is not None else jnp.zeros((Cout,), x.dtype)).reshape(1, Cout)
    kernel = functools.partial(_upconv_stream_kernel, H_T=H_T, W=W, Cin=Cin,
                               N_T=N_T, want_stats=want_stats,
                               in_wpad=bool(in_w), out_wpad=out_wpad,
                               Wp=Wp, Wp_out=Wp_out)
    out, stats = pl.pallas_call(
        kernel,
        grid=(B, Cout // N_T, H // H_T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((16, Cin, N_T), lambda bb, n, h: (0, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_T), lambda bb, n, h: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 2 * H_T, ow, N_T),
                         lambda bb, n, h: (bb, h, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _STATS_ROWS, N_T), lambda bb, n, h: (bb, 0, n),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 2 * H, ow, Cout), x.dtype),
            jax.ShapeDtypeStruct((B, _STATS_ROWS, Cout), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, H_T + 2, Wp, Cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * Cin * Cout * 16,
            bytes_accessed=(xp.size + w16.size + 4 * B * H * W * Cout)
            * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xp, w16, b2)
    return out, (stats if want_stats else None)


def _upconv_stream_reference(x, w, b, want_stats, in_w=0, out_wpad=False):
    if in_w:
        x = x[:, :, 1:in_w + 1, :]
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    y = lax.conv_general_dilated(
        up, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    stats = None
    if want_stats:
        s1 = jnp.sum(y, axis=(1, 2))
        s2 = jnp.sum(jnp.square(y), axis=(1, 2))
        zeros = jnp.zeros((x.shape[0], _STATS_ROWS - 2, y.shape[-1]),
                          jnp.float32)
        stats = jnp.concatenate([s1[:, None], s2[:, None], zeros], axis=1)
    y = y.astype(x.dtype)
    if out_wpad:
        Wout = y.shape[2]
        y = jnp.pad(y, ((0, 0), (0, 0), (1, 1 + (-(Wout + 2)) % 8), (0, 0)))
    return y, stats


def upconv_stream(x, w, b, want_stats=True, force="auto", in_w=0,
                  out_wpad=False):
    """nearest-2x upsample + 3x3 SAME conv, streamed, returning
    (out (B,2H,2W[,wpadded],Cout), stats-or-None); the subpixel planes
    interleave inside the kernel (no XLA transpose pass). in_w/out_wpad
    chain the width-padded layout (see gn_conv_stream). Serving-only
    (no VJP - the fused decode path never differentiates)."""
    int_shape = (x.shape[0], x.shape[1], in_w if in_w else x.shape[2],
                 x.shape[-1])
    if force != "xla":
        plan = upconv_stream_plan(int_shape, w.shape, x.dtype.itemsize)
        backend = jax.default_backend()
        if force == "pallas":
            if plan is None:
                raise ValueError(
                    f"upconv_stream unsupported for {x.shape} x {w.shape}")
            return _upconv_stream_pallas(x, w, b, want_stats, plan,
                                         interpret=(backend != "tpu"),
                                         in_w=in_w, out_wpad=out_wpad)
        if plan is not None and backend == "tpu":
            return _upconv_stream_pallas(x, w, b, want_stats, plan,
                                         in_w=in_w, out_wpad=out_wpad)
    return _upconv_stream_reference(x, w, b, want_stats, in_w, out_wpad)


# ---------------------------------------------------------------------------
# Streaming stride-2 3x3 downsample conv with stats epilogue.
#
# The encoder's three level-transition convs (Downsample2D with the
# (0,1),(0,1) asymmetric pad, reference vae blocks) ran as XLA strided
# convs at 23-50% MFU - the strided window access defeats XLA's tiling.
# This kernel streams (2*H_T+1)-row input windows, splits them into the
# four row/column parity planes with in-VMEM reshapes, and computes each
# of the 9 taps as a DENSE (H_T*Wout, Cin) @ (Cin, N_T) matmul over the
# matching parity plane - the MXU never sees a stride. Consumes and
# emits the width-padded chained layout, and emits (sum, sumsq) so the
# next level's GroupNorm needs no extra pass.
# ---------------------------------------------------------------------------


def _downconv_kernel(x_hbm, w_ref, b_ref, *rest, H, Wout, W, Wp, Cin, N_T,
                     H_T, want_stats, in_wpad, out_wpad, Wp_out):
    if want_stats:
        out_ref, st_ref, xwin, sem = rest
    else:
        (out_ref, xwin, sem), st_ref = rest, None

    bb = pl.program_id(0)
    hi = pl.program_id(2)
    num_h = pl.num_programs(2)
    slot = jax.lax.rem(hi, 2)
    win_r = 2 * H_T + 2  # rows used: 2*H_T+1 (+1 spare to keep it even)

    def run_dma(s, h, do_wait):
        go = (lambda d: d.wait()) if do_wait else (lambda d: d.start())
        h = jnp.int32(h)
        last = h + 1 >= num_h
        src = lambda rows: x_hbm.at[bb, rows]
        if in_wpad:
            dst = lambda rows: xwin.at[s, rows]
        else:
            dst = lambda rows: xwin.at[s, rows, pl.ds(1, W)]

        if num_h > 1:  # static: a dead branch would still trace its slice
            @pl.when(~last)
            def _mid():
                go(pltpu.make_async_copy(
                    src(pl.ds(h * 2 * H_T, 2 * H_T + 1)),
                    dst(pl.ds(0, 2 * H_T + 1)), sem.at[s]))

        @pl.when(last)
        def _last():
            # bottom tile: input row H is the (0,1) pad row - absent from
            # x; copy one fewer row, zero the window row instead.
            go(pltpu.make_async_copy(src(pl.ds(h * 2 * H_T, 2 * H_T)),
                                     dst(pl.ds(0, 2 * H_T)), sem.at[s]))

    @pl.when(hi == 0)
    def _first():
        run_dma(0, 0, False)

    @pl.when(hi + 1 < num_h)
    def _prefetch():
        run_dma(1 - slot, hi + 1, False)

    run_dma(slot, hi, True)

    @pl.when(hi + 1 >= num_h)
    def _zbot():
        xwin[slot, 2 * H_T:2 * H_T + 1] = jnp.zeros((1, Wp, Cin), xwin.dtype)

    if not in_wpad:
        # plain input was DMA'd into cols [1, W+1); the only border col a
        # tap reads is W+1 (the (0,1) right pad)
        xwin[slot, :, W + 1:W + 2] = jnp.zeros((win_r, 1, Cin), xwin.dtype)

    if want_stats:
        @pl.when(hi == 0)
        def _zero():
            st_ref[...] = jnp.zeros_like(st_ref)

    # Each tap reads its stride-2 lattice directly (Mosaic strided
    # loads): out(i,j) taps window (2i+di, 2j+dj+1). No parity-plane
    # materialization - the earlier reshape-based extraction put ~34
    # bytes/element of temporaries on the scoped-vmem stack and OOMed.
    acc = None
    for k in range(9):
        di, dj = divmod(k, 3)
        slab = xwin[slot, pl.Slice(di, H_T, 2), pl.Slice(dj + 1, Wout, 2), :]
        d = jnp.dot(slab.reshape(H_T * Wout, Cin), w_ref[k],
                    preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    y = acc + b_ref[0].astype(jnp.float32)[None]

    if st_ref is not None:
        st_ref[0, 0:1, :] += jnp.sum(y, axis=0)[None]
        st_ref[0, 1:2, :] += jnp.sum(y * y, axis=0)[None]

    y3 = y.reshape(H_T, Wout, N_T).astype(out_ref.dtype)
    if out_wpad:
        z = lambda n: jnp.zeros((H_T, n, N_T), out_ref.dtype)
        out_ref[0] = jnp.concatenate([z(1), y3, z(Wp_out - Wout - 1)],
                                     axis=1)
    else:
        out_ref[0] = y3


def downconv_stream_plan(x_shape, w_shape, itemsize: int = 2):
    """(H_T, N_T) or None; x_shape is the INTERIOR shape (B, H, W, Cin)."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return None
    B, H, W, Cin = x_shape
    kh, kw, wcin, Cout = w_shape
    if (kh, kw) != (3, 3) or wcin != Cin:
        return None
    if H < 16 or W < 16 or H % 2 or W % 2 or Cin < 16 or Cout < 128:
        return None
    wpad = (-(W + 2)) % 8
    Wp = W + 2 + wpad
    nts = [nt for nt in (512, 256, 128)
           if Cout % nt == 0 and 9 * Cin * nt * itemsize * 2
           <= 5 * 1024 * 1024]
    if not nts:
        return None
    Hout, Wout = H // 2, W // 2
    wpo = (-(Wout + 2)) % 8
    Wp_out = Wout + 2 + wpo
    for ht in (32, 16, 8, 4):
        if Hout % ht:
            continue
        win = 2 * (2 * ht + 2) * Wp * Cin * itemsize
        # strided-load slab temporaries (a few live at once) + f32 casts
        tmp = 3 * ht * Wout * Cin * itemsize + ht * Wout * Cin * 4
        for nt in nts:
            wb = 9 * Cin * nt * itemsize * 2
            accb = ht * Wout * nt * 4
            outb = 2 * ht * Wp_out * nt * itemsize * 2
            if win + tmp + accb + outb + wb <= 12 * 1024 * 1024:
                return ht, nt
    return None


def _downconv_stream_pallas(x, w, b, want_stats, plan, interpret=False,
                            in_w=0, out_wpad=False):
    B = x.shape[0]
    H = x.shape[1]
    W = in_w if in_w else x.shape[2]
    Cin = x.shape[-1]
    Cout = w.shape[-1]
    H_T, N_T = plan
    wpad = (-(W + 2)) % 8
    Wp = W + 2 + wpad
    if in_w:
        assert x.shape[2] == Wp, (x.shape, Wp)
    Hout, Wout = H // 2, W // 2
    Wp_out = Wout + 2 + (-(Wout + 2)) % 8
    w9 = w.reshape(9, Cin, Cout)
    b2 = (b if b is not None else jnp.zeros((Cout,), x.dtype)).reshape(1, Cout)
    kernel = functools.partial(
        _downconv_kernel, H=H, Wout=Wout, W=W, Wp=Wp, Cin=Cin, N_T=N_T,
        H_T=H_T, want_stats=want_stats, in_wpad=bool(in_w),
        out_wpad=out_wpad, Wp_out=Wp_out)
    ow = Wp_out if out_wpad else Wout
    out_specs = [pl.BlockSpec((1, H_T, ow, N_T), lambda bb, n, h: (bb, h, 0, n),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((B, Hout, ow, Cout), x.dtype)]
    if want_stats:
        out_specs.append(pl.BlockSpec((1, _STATS_ROWS, N_T),
                                      lambda bb, n, h: (bb, 0, n),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(
            jax.ShapeDtypeStruct((B, _STATS_ROWS, Cout), jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=(B, Cout // N_T, Hout // H_T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, Cin, N_T), lambda bb, n, h: (0, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_T), lambda bb, n, h: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * H_T + 2, Wp, Cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Hout * Wout * Cin * Cout * 9,
            bytes_accessed=(x.size + w9.size + B * Hout * Wout * Cout)
            * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, w9, b2)
    if want_stats:
        return out[0], out[1]
    return (out if not isinstance(out, (tuple, list)) else out[0]), None


def _downconv_reference(x, w, b, want_stats, in_w=0, out_wpad=False):
    if in_w:
        x = x[:, :, 1:in_w + 1, :]
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    y = lax.conv_general_dilated(
        xp, w, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    stats = None
    if want_stats:
        s1 = jnp.sum(y, axis=(1, 2))
        s2 = jnp.sum(jnp.square(y), axis=(1, 2))
        zeros = jnp.zeros((x.shape[0], _STATS_ROWS - 2, y.shape[-1]),
                          jnp.float32)
        stats = jnp.concatenate([s1[:, None], s2[:, None], zeros], axis=1)
    y = y.astype(x.dtype)
    if out_wpad:
        Wout = y.shape[2]
        y = jnp.pad(y, ((0, 0), (0, 0), (1, 1 + (-(Wout + 2)) % 8), (0, 0)))
    return y, stats


def downconv_stream(x, w, b, want_stats=True, force="auto", in_w=0,
                    out_wpad=False):
    """Stride-2 3x3 conv with the encoder's (0,1),(0,1) asymmetric pad
    (diffusers Downsample2D), streamed; returns
    (out (B,H/2,W/2[,wpadded],Cout), stats-or-None). in_w/out_wpad use
    the width-padded chained layout (see gn_conv_stream). Serving-only
    (no VJP - training uses the Flax modules).

    EXPERIMENTAL: the pallas path is interpret-validated but NOT
    selected on TPU - its stride-2 tap reads hit Mosaic's "strided load
    with non 32-bit data" limitation for bf16 windows (strided refs and
    strided DMA slices are both unimplemented as of jax 0.9); the
    encoder keeps the XLA strided conv until Mosaic grows 16-bit
    strided loads."""
    int_shape = (x.shape[0], x.shape[1], in_w if in_w else x.shape[2],
                 x.shape[-1])
    if force == "pallas":
        plan = downconv_stream_plan(int_shape, w.shape, x.dtype.itemsize)
        if plan is None:
            raise ValueError(
                f"downconv_stream unsupported for {x.shape} x {w.shape}")
        return _downconv_stream_pallas(
            x, w, b, want_stats, plan,
            interpret=(jax.default_backend() != "tpu"),
            in_w=in_w, out_wpad=out_wpad)
    return _downconv_reference(x, w, b, want_stats, in_w, out_wpad)
