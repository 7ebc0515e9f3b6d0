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


def _prologue_rows(Wp: int, Cin: int, budget: int = 2 * 1024 * 1024) -> int:
    """Row-chunk size for the f32 prologue temporaries. Rows are the
    MAJOR dim of the (rows, Wp, Cin) chunk - shrinking it costs no
    vector-lane efficiency, it just bounds the f32 scratch at wide
    shapes (W 256/512 at Cin 256-512 made the fixed 8-row chunk alone
    exceed the VMEM budget, forcing the whole kernel off to XLA)."""
    per_row = Wp * Cin * (4 + 4 + 2)  # f32 chunk + silu temp + bf16 store
    return max(1, min(8, budget // max(per_row, 1)))


def _kernel(x_hbm, a_ref, c_ref, w_ref, b_ref, *rest,
            H, W, H_T, Wp, Cin, N_T, has_res, want_stats, apply_gn):
    if has_res and want_stats:
        res_ref, out_ref, st_ref, xwin, sem = rest
    elif has_res:
        res_ref, out_ref, xwin, sem = rest
        st_ref = None
    elif want_stats:
        out_ref, st_ref, xwin, sem = rest
        res_ref = None
    else:
        out_ref, xwin, sem = rest
        res_ref = st_ref = None

    bb = pl.program_id(0)
    hi = pl.program_id(2)
    num_h = pl.num_programs(2)
    row0 = pl.multiple_of(hi * H_T, H_T)

    # Double-buffered window DMA: prefetch the next row window while this
    # grid step computes (guide "Patterns: Double Buffering").
    slot = jax.lax.rem(hi, 2)

    def get_dma(s, h):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(pl.multiple_of(h * H_T, H_T), H_T + 2)],
            xwin.at[s], sem.at[s])

    @pl.when(hi == 0)
    def _first():
        get_dma(0, 0).start()

    @pl.when(hi + 1 < num_h)
    def _prefetch():
        get_dma(1 - slot, hi + 1).start()

    get_dma(slot, hi).wait()

    # Prologue in f32 row-chunks: affine -> SiLU -> zero the SAME border.
    if apply_gn:
        a = a_ref[0, 0, :].astype(jnp.float32)
        c0 = c_ref[0, 0, :].astype(jnp.float32)
    chunk_rows = _prologue_rows(Wp, Cin)
    for h0 in range(0, H_T + 2, chunk_rows):
        rows = min(chunk_rows, H_T + 2 - h0)
        chunk = xwin[slot, h0:h0 + rows, :, :].astype(jnp.float32)
        if apply_gn:
            chunk = chunk * a[None, None, :] + c0[None, None, :]
            chunk = chunk * jax.nn.sigmoid(chunk)
        # interior mask in padded coords: rows 1..H, cols 1..W
        gr = row0 + h0 + jax.lax.broadcasted_iota(jnp.int32, (rows, Wp), 0)
        gc = jax.lax.broadcasted_iota(jnp.int32, (rows, Wp), 1)
        keep = (gr >= 1) & (gr <= H) & (gc >= 1) & (gc <= W)
        chunk = chunk * keep.astype(jnp.float32)[..., None]
        xwin[slot, h0:h0 + rows, :, :] = chunk.astype(xwin.dtype)

    acc = None
    for k in range(9):
        di, dj = divmod(k, 3)
        slab = xwin[slot, pl.ds(di, H_T), pl.ds(dj, W), :]
        d = jnp.dot(slab.reshape(H_T * W, Cin), w_ref[k],
                    preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    y = acc + b_ref[0].astype(jnp.float32)[None]
    if res_ref is not None:
        y = y + res_ref[0].reshape(H_T * W, N_T).astype(jnp.float32)

    if st_ref is not None:
        @pl.when(hi == 0)
        def _zero():
            st_ref[...] = jnp.zeros_like(st_ref)

        s1 = jnp.sum(y, axis=0)[None]  # (1, N_T)
        s2 = jnp.sum(y * y, axis=0)[None]
        st_ref[0, 0:1, :] += s1
        st_ref[0, 1:2, :] += s2

    out_ref[0] = y.reshape(H_T, W, N_T).astype(out_ref.dtype)


def stream_fused_plan(x_shape, w_shape, itemsize: int = 2):
    """(H_T, N_T) if the streaming fused kernel supports this conv."""
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
    for ht in (64, 32, 16, 8):
        if H % ht:
            continue
        win = (ht + 2) * Wp * Cin * itemsize   # DMA window / in-place scratch
        # f32 chunk temporaries: the row-chunk adapts to wide shapes
        tmp = _prologue_rows(Wp, Cin) * Wp * Cin * (4 + 4 + itemsize)
        for nt in nts:
            accb = ht * W * nt * 4                  # f32 tap accumulator
            outb = ht * W * nt * itemsize * 2       # double-buffered out
            resb = ht * W * nt * itemsize * 2
            wb = 9 * Cin * nt * itemsize * 2
            if win + accb + outb + resb + wb + tmp <= 13 * 1024 * 1024:
                return ht, nt
    return None


def _stream_fused_pallas(x, a, c, w, b, residual, want_stats, apply_gn,
                         plan, interpret=False):
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    H_T, N_T = plan
    wpad = (-(W + 2)) % 8
    Wp = W + 2 + wpad
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + wpad), (0, 0)))
    w9 = w.reshape(9, Cin, Cout)
    b2 = (b if b is not None else jnp.zeros((Cout,), x.dtype)).reshape(1, Cout)
    a2 = (a.astype(jnp.float32) if a is not None else
          jnp.zeros((B, Cin), jnp.float32)).reshape(B, 1, Cin)
    c2 = (c.astype(jnp.float32) if c is not None else
          jnp.zeros((B, Cin), jnp.float32)).reshape(B, 1, Cin)

    kernel = functools.partial(
        _kernel, H=H, W=W, H_T=H_T, Wp=Wp, Cin=Cin, N_T=N_T,
        has_res=residual is not None, want_stats=want_stats,
        apply_gn=apply_gn)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
        pl.BlockSpec((1, 1, Cin), lambda bb, n, h: (bb, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Cin), lambda bb, n, h: (bb, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, Cin, N_T), lambda bb, n, h: (0, 0, n),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N_T), lambda bb, n, h: (0, n),
                     memory_space=pltpu.VMEM),
    ]
    args = [xp, a2, c2, w9, b2]
    if residual is not None:
        in_specs.append(pl.BlockSpec((1, H_T, W, N_T),
                                     lambda bb, n, h: (bb, h, 0, n),
                                     memory_space=pltpu.VMEM))
        args.append(residual)

    out_shapes = [jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype)]
    out_specs = [pl.BlockSpec((1, H_T, W, N_T), lambda bb, n, h: (bb, h, 0, n),
                              memory_space=pltpu.VMEM)]
    if want_stats:
        out_shapes.append(
            jax.ShapeDtypeStruct((B, _STATS_ROWS, Cout), jnp.float32))
        out_specs.append(pl.BlockSpec((1, _STATS_ROWS, N_T),
                                      lambda bb, n, h: (bb, 0, n),
                                      memory_space=pltpu.VMEM))

    flops = 2 * B * H * W * Cin * Cout * 9
    out = pl.pallas_call(
        kernel,
        grid=(B, Cout // N_T, H // H_T),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=[
            pltpu.VMEM((2, H_T + 2, Wp, Cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(xp.size + w9.size + 2 * B * H * W * Cout)
            * x.dtype.itemsize,
            transcendentals=B * (H + 2) * Wp * Cin,
        ),
        interpret=interpret,
    )(*args)
    return out if want_stats else (out[0], None)


def _reference(x, a, c, w, b, residual, want_stats, apply_gn):
    """XLA path, numerically matching the kernel (f32 prologue, bf16
    taps, f32 accumulate, stats on the pre-cast f32 output)."""
    if apply_gn:
        v = x.astype(jnp.float32) * a[:, None, None, :] + c[:, None, None, :]
        v = (v * jax.nn.sigmoid(v)).astype(x.dtype)
    else:
        v = x
    y = lax.conv_general_dilated(
        v, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    stats = None
    if want_stats:
        s1 = jnp.sum(y, axis=(1, 2))
        s2 = jnp.sum(jnp.square(y), axis=(1, 2))
        zeros = jnp.zeros((x.shape[0], _STATS_ROWS - 2, y.shape[-1]),
                          jnp.float32)
        stats = jnp.concatenate([s1[:, None], s2[:, None], zeros], axis=1)
    return y.astype(x.dtype), stats


def _gn_conv_stream_dispatch(x, a, c, w, b, residual, want_stats, apply_gn,
                             force):
    if force == "xla":
        return _reference(x, a, c, w, b, residual, want_stats, apply_gn)
    plan = stream_fused_plan(x.shape, w.shape, x.dtype.itemsize)
    backend = jax.default_backend()
    if force == "pallas":
        if plan is None:
            raise ValueError(
                f"gn_conv_stream unsupported for {x.shape} x {w.shape}")
        return _stream_fused_pallas(x, a, c, w, b, residual, want_stats,
                                    apply_gn, plan,
                                    interpret=(backend != "tpu"))
    if plan is not None and backend == "tpu":
        return _stream_fused_pallas(x, a, c, w, b, residual, want_stats,
                                    apply_gn, plan)
    return _reference(x, a, c, w, b, residual, want_stats, apply_gn)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def gn_conv_stream(x, a, c, w, b, residual, want_stats=True,
                   apply_gn=True, force="auto"):
    """silu(x*a + c) -> 3x3 SAME conv(w, b) [+ residual], returning
    (out, stats) where stats are the (sum, sumsq) GroupNorm inputs of the
    NEXT layer ((B, 8, Cout) f32; rows 0/1 used) or None.

    a, c: (B, Cin) f32 folded GroupNorm affine (gn_affine_from_stats).
    apply_gn=False skips the prologue entirely (plain conv + epilogue).
    Serving-only forward on the pallas path; the VJP differentiates the
    XLA reference (training uses the Flax modules, not this op).
    """
    return _gn_conv_stream_dispatch(x, a, c, w, b, residual, want_stats,
                                    apply_gn, force)


def _fwd(x, a, c, w, b, residual, want_stats, apply_gn, force):
    out = _gn_conv_stream_dispatch(x, a, c, w, b, residual, want_stats,
                                   apply_gn, force)
    return out, (x, a, c, w, b, residual)


def _bwd(want_stats, apply_gn, force, res, g):
    x, a, c, w, b, residual = res
    args = (x, a, c, w, b, residual)
    _, vjp = jax.vjp(
        lambda *aa: _reference(*aa, want_stats, apply_gn), *args)
    return vjp(g)


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
                          *, H_T, W, Cin, N_T, want_stats):
    bb = pl.program_id(0)
    hi = pl.program_id(2)
    num_h = pl.num_programs(2)
    slot = jax.lax.rem(hi, 2)

    def get_dma(s, h):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(pl.multiple_of(h * H_T, H_T), H_T + 2)],
            xwin.at[s], sem.at[s])

    @pl.when(hi == 0)
    def _first():
        get_dma(0, 0).start()

    @pl.when(hi + 1 < num_h)
    def _prefetch():
        get_dma(1 - slot, hi + 1).start()

    get_dma(slot, hi).wait()

    if want_stats:
        @pl.when(hi == 0)
        def _zero():
            st_ref[...] = jnp.zeros_like(st_ref)

    bias = b_ref[0].astype(jnp.float32)[None]
    s1 = jnp.zeros((1, N_T), jnp.float32)
    s2 = jnp.zeros((1, N_T), jnp.float32)
    for ry in (0, 1):
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
            out_ref[0, ry, rx] = y.reshape(H_T, W, N_T).astype(out_ref.dtype)
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
    for ht in (32, 16, 8):
        if H % ht:
            continue
        win = 2 * (ht + 2) * Wp * Cin * itemsize  # double-buffered window
        for nt in nts:
            wb = 16 * Cin * nt * itemsize * 2
            accb = ht * W * nt * 4
            outb = 4 * ht * W * nt * itemsize * 2
            if win + wb + accb + outb <= 13 * 1024 * 1024:
                return ht, nt
    return None


def _upconv_stream_pallas(x, w, b, want_stats, plan, interpret=False):
    from .conv3x3 import _fold_upsample_weights

    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    H_T, N_T = plan
    wpad = (-(W + 2)) % 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + wpad), (0, 0)))
    Wp = W + 2 + wpad
    w16 = _fold_upsample_weights(w)
    b2 = (b if b is not None else jnp.zeros((Cout,), x.dtype)).reshape(1, Cout)
    kernel = functools.partial(_upconv_stream_kernel, H_T=H_T, W=W, Cin=Cin,
                               N_T=N_T, want_stats=want_stats)
    planes, stats = pl.pallas_call(
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
            pl.BlockSpec((1, 2, 2, H_T, W, N_T),
                         lambda bb, n, h: (bb, 0, 0, h, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _STATS_ROWS, N_T), lambda bb, n, h: (bb, 0, n),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 2, 2, H, W, Cout), x.dtype),
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
    out = jnp.transpose(planes, (0, 3, 1, 4, 2, 5)).reshape(
        B, 2 * H, 2 * W, Cout)
    return out, (stats if want_stats else None)


def _upconv_stream_reference(x, w, b, want_stats):
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
    return y.astype(x.dtype), stats


def upconv_stream(x, w, b, want_stats=True, force="auto"):
    """nearest-2x upsample + 3x3 SAME conv, streamed, returning
    (out (B,2H,2W,Cout), stats-or-None). Serving-only (no VJP - the
    fused decode path never differentiates)."""
    if force != "xla":
        plan = upconv_stream_plan(x.shape, w.shape, x.dtype.itemsize)
        backend = jax.default_backend()
        if force == "pallas":
            if plan is None:
                raise ValueError(
                    f"upconv_stream unsupported for {x.shape} x {w.shape}")
            return _upconv_stream_pallas(x, w, b, want_stats, plan,
                                         interpret=(backend != "tpu"))
        if plan is not None and backend == "tpu":
            return _upconv_stream_pallas(x, w, b, want_stats, plan)
    return _upconv_stream_reference(x, w, b, want_stats)
