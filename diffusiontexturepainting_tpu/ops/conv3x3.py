"""Pallas implicit-GEMM 3x3 convolution (NHWC, stride 1, SAME).

Why: XLA's native conv on TPU runs the UNet's latent-resolution convs at
~15-30% of the MXU matmul rate for the CFG triple-batch (batch=3 gets
padded to the 8-sublane tile; measured on v5e: 3x64x64x320 conv at
0.92 ms vs a 0.23 ms pure-matmul FLOP ceiling). The reference solves the
same problem with TensorRT's conv kernels (SURVEY: models.py graph
surgery + TRT engine build); the TPU-native answer is an implicit-GEMM
kernel: keep the whole (padded) activation in VMEM, run the 9 kernel-tap
matmuls back-to-back on the MXU with a float32 accumulator that never
touches HBM, and fold batch x spatial into the GEMM M dimension so small
CFG batches waste nothing.

Scope: stride-1 SAME 3x3 convs on feature maps small enough to hold one
padded image in VMEM (everything in the SD UNet at stamp resolutions,
and the deep VAE levels). Large-spatial VAE convs and stride-2 convs
stay on XLA's conv, which is efficient there.

Backward pass: jax.custom_vjp whose reverse mode re-derives gradients
through the equivalent XLA conv (training cares about throughput over a
large batch, where XLA's conv is fine; serving never differentiates).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gn_conv_stream import _silu_same_dtype



def _lax_conv3x3(x, w, b):
    # Output in the activation dtype: the MXU accumulates f32 internally
    # either way, but asking XLA for an f32 RESULT makes it materialize
    # a transposed f32 tensor + a separate convert pass (profiled
    # ~2.2 ms/VAE-decode of add_convert fusions at the 512px levels).
    # The bias add runs in f32 fused into the conv epilogue.
    out = lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    if b is not None:
        out = (out.astype(jnp.float32)
               + b.astype(jnp.float32)).astype(x.dtype)
    return out


def _lax_conv3x3_nat(x, w, b):
    """Natively-differentiable XLA conv (training path): no
    preferred_element_type - its transpose rule mixes operand dtypes
    under bf16 and fails. The MXU still accumulates f32 internally; the
    only difference from _lax_conv3x3 is one output rounding."""
    out = lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _vmem_estimate(H, W, Cin, nt, ht, fused) -> int:
    """Conservative VMEM bytes for one grid step: Mosaic double-buffers the
    streamed blocks (x, w, out, residual); the fused variant additionally
    holds an f32 normalized row-band and the mask temporaries."""
    xb = (H + 2) * (W + 2) * Cin * 2 * 2
    wb = 9 * Cin * nt * 2 * 2
    ob = ht * W * nt * 2 * 2
    res = ht * W * nt * 2 * 2  # residual epilogue block (fused path)
    acc = ht * W * nt * 4
    if fused:
        tmp = (ht + 2) * (W + 2) * Cin * (4 + 2)  # f32 band + bf16 cast
    else:
        tmp = ht * W * Cin * 2 * 2  # tap slab copies
    return xb + wb + ob + acc + tmp + (res if fused else 0)


_VMEM_LIMIT = int(13.5 * 1024 * 1024)


def pallas_plan(x_shape, w_shape, fused: bool = False):
    """Return (H_T, N_T) if the pallas kernel supports this conv, else None.

    Walks (N_T, H_T) tile candidates largest-first and returns the first
    combination whose working set fits VMEM (incl. double buffering).
    """
    if len(x_shape) != 4 or len(w_shape) != 4:
        return None
    B, H, W, Cin = x_shape
    kh, kw, wcin, Cout = w_shape
    if (kh, kw) != (3, 3) or wcin != Cin:
        return None
    # Cin < 16 would pad the GEMM K dim to a full 128-lane tile (e.g. the
    # UNet's 9-channel conv_in) - XLA's conv handles those better.
    if H < 2 or W < 2 or Cin < 16 or Cout < 128:
        return None
    # lane-legal cout tiles: divisible by 128 or the whole dimension
    nts = ([Cout] if Cout <= 512 else []) + [
        nt for nt in (512, 384, 256, 128) if Cout % nt == 0]
    # H_T multiples of 8 so the dynamic row-slice start stays provably
    # aligned for Mosaic; whole-H fallback for small images.
    hts = [ht for ht in (64, 32, 16, 8)
           if H % ht == 0 and ht * W <= 4096]
    if not hts:
        # tiny or indivisible H: whole image per tile (single grid step, so
        # the dynamic row start is trivially aligned)
        hts = [8] if H % 8 == 0 else [H]
    if not fused:
        xb = (H + 2) * (W + 2) * Cin * 2
        if xb > int(9.5 * 1024 * 1024):
            return None
        if H * W <= 4096 and B <= 3:
            # UNet-latent scale at serving batches (CFG triple-batch or
            # smaller): simple budgets validated extensively on hardware -
            # one padded image + one cout-tile of weights resident,
            # largest row tile. Left untouched so serving plans never
            # change. Larger batches (training) double-buffer the image
            # block across the batch grid dim and need the strict budget
            # below ((8,64,64,512)x512 OOMed the scoped-vmem limit here).
            for nt in nts:
                if 9 * Cin * nt * 2 <= 6 * 1024 * 1024:
                    if H * W >= 4096 and Cout > nt:
                        # multi-cout-tile plan on a full 64x64 image: the
                        # (3,64,64,640)x640 conv of the 1024px UNet OOMs
                        # the scoped-vmem limit at every row tile tried
                        # (the image block is held across cout tiles and
                        # double-buffers) - XLA's conv takes it. No
                        # 256/512px serving shape hits this: their 64x64
                        # convs are all single-cout-tile.
                        return None
                    return hts[0], nt
            else:
                return None
        # Larger-spatial shapes (VAE module path, training batches):
        # these OOMed the 16 MB scoped-vmem budget with the simple rule
        # ((8,128,128,128)x256 in the bf16 train step; (2,128,128,256)
        # x512 standalone). Here the padded image IS double-buffered
        # across the batch grid dim, the out tile double-buffers, and
        # the f32 accumulator lives on the stack - walk (nt, ht) against
        # the full sum and fall back to XLA's conv (good at these
        # shapes) when nothing fits.
        for nt in nts:
            wb = 9 * Cin * nt * 2
            if wb > 6 * 1024 * 1024:
                continue
            for ht in hts:
                if 2 * xb + wb + ht * W * nt * 8 <= 16 * 1024 * 1024:
                    return ht, nt
        return None
    for nt in nts:
        for ht in hts:
            if _vmem_estimate(H, W, Cin, nt, ht, fused) <= _VMEM_LIMIT:
                return ht, nt
    return None


def _conv_kernel(x_ref, w_ref, b_ref, out_ref, *, H_T, W, Cin, N_T):
    """One (batch, cout-tile, row-tile) grid step: 9 MXU taps.

    x_ref:  (1, H+2, W+2, Cin) - one whole padded image, resident in VMEM
    w_ref:  (9, Cin, N_T)      - weight taps for this cout tile
    b_ref:  (1, N_T)
    out_ref:(1, H_T, W, N_T)
    """
    hi = pl.program_id(2)
    row0 = pl.multiple_of(hi * H_T, H_T)
    bias = b_ref[0].astype(jnp.float32)
    acc = None
    for k in range(9):
        di, dj = k // 3, k % 3
        slab = x_ref[0, pl.ds(row0 + di, H_T), pl.ds(dj, W), :]
        a = slab.reshape(H_T * W, Cin)
        d = jnp.dot(a, w_ref[k], preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    y = acc + bias[None, :]
    out_ref[0] = y.reshape(H_T, W, N_T).astype(out_ref.dtype)


def _conv_kernel_inpad(x_ref, w_ref, b_ref, out_ref, xp_ref,
                       *, H, H_T, W, Cin, N_T):
    """Same 9-tap conv, but SAME-padding happens IN VMEM: the unpadded
    image block is copied once per batch into a zero-bordered scratch
    (VPU bandwidth, ~us), replacing a per-conv jnp.pad that round-trips
    the whole tensor through HBM (~0.5 ms/UNet-step across 44 convs).

    x_ref: (1, H, W, Cin) unpadded image resident in VMEM
    xp_ref: (H+2, W+2, Cin) scratch, persistent across the sequential grid
    """
    ni = pl.program_id(1)
    hi = pl.program_id(2)

    @pl.when((ni == 0) & (hi == 0))
    def _fill():
        zrow = jnp.zeros((1, W + 2, Cin), x_ref.dtype)
        xp_ref[0:1] = zrow
        xp_ref[H + 1:H + 2] = zrow
        zcol = jnp.zeros((H, 1, Cin), x_ref.dtype)
        xp_ref[1:H + 1, 0:1] = zcol
        xp_ref[1:H + 1, W + 1:W + 2] = zcol
        xp_ref[1:H + 1, 1:W + 1] = x_ref[0]

    row0 = pl.multiple_of(hi * H_T, H_T)
    bias = b_ref[0].astype(jnp.float32)
    acc = None
    for k in range(9):
        di, dj = k // 3, k % 3
        slab = xp_ref[pl.ds(row0 + di, H_T), pl.ds(dj, W), :]
        a = slab.reshape(H_T * W, Cin)
        d = jnp.dot(a, w_ref[k], preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    y = acc + bias[None, :]
    out_ref[0] = y.reshape(H_T, W, N_T).astype(out_ref.dtype)


# In-kernel padding switch - negative result, kept measurable: replacing
# the HBM jnp.pad before each kernel with a once-per-batch VMEM copy
# measured DEAD EVEN on v5e (29.79 vs 29.82 ms/UNet-step, within-session
# A/B) - XLA overlaps the pads with other work, so they are not on the
# critical path. It also costs an extra image-sized block of VMEM
# residency, which makes STANDALONE kernel compiles (eager/test
# harnesses) exceed the remote compiler's 16 MB scoped limit at shapes
# that fit fine inside larger jitted programs. Off by default.
_IN_PAD = False


def _conv3x3_pallas(x, w, b, plan, interpret=False, in_pad=None):
    if in_pad is None:
        in_pad = _IN_PAD
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    H_T, N_T = plan
    w9 = w.reshape(9, Cin, Cout)
    b2 = (b if b is not None else jnp.zeros((Cout,), x.dtype)).reshape(1, Cout)
    flops = 2 * B * H * W * Cin * Cout * 9
    bytes_accessed = (x.size + w9.size + B * H * W * Cout) * x.dtype.itemsize
    # in-kernel padding needs the unpadded block AND the padded scratch
    # resident at once (vs just the padded block); fall back to the HBM
    # jnp.pad when their sum crowds the 16 MB scoped-vmem limit (the
    # Cin=1920 up-block concat convs OOMed at 8.37 MB here).
    in_pad = in_pad and (
        ((H + 2) * (W + 2) + H * W) * Cin * x.dtype.itemsize
        <= int(7.5 * 1024 * 1024))
    if in_pad:
        kernel = functools.partial(_conv_kernel_inpad, H=H, H_T=H_T, W=W,
                                   Cin=Cin, N_T=N_T)
        return pl.pallas_call(
            kernel,
            grid=(B, Cout // N_T, H // H_T),
            in_specs=[
                pl.BlockSpec((1, H, W, Cin), lambda bb, n, h: (bb, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9, Cin, N_T), lambda bb, n, h: (0, 0, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N_T), lambda bb, n, h: (0, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, H_T, W, N_T),
                                   lambda bb, n, h: (bb, h, 0, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
            scratch_shapes=[pltpu.VMEM((H + 2, W + 2, Cin), x.dtype)],
            cost_estimate=pl.CostEstimate(flops=flops,
                                          bytes_accessed=bytes_accessed,
                                          transcendentals=0),
            interpret=interpret,
        )(x, w9, b2)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    kernel = functools.partial(_conv_kernel, H_T=H_T, W=W, Cin=Cin, N_T=N_T)
    return pl.pallas_call(
        kernel,
        grid=(B, Cout // N_T, H // H_T),
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, Cin),
                         lambda bb, n, h: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, Cin, N_T), lambda bb, n, h: (0, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_T), lambda bb, n, h: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H_T, W, N_T),
                               lambda bb, n, h: (bb, h, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )(xp, w9, b2)


# Scoped dispatch override. Training sets this to "xla": the pallas
# kernels' custom_vjp re-derives gradients through an f32 XLA conv per
# call, which measured ~60x slower per train step than letting XLA
# differentiate its own conv natively (5.9 s vs ~0.1 s at batch 8). The
# override routes AROUND the custom_vjp wrapper entirely so forward AND
# backward are plain XLA convs. Serving (no differentiation) leaves it
# None. A ContextVar, NOT a module global: the serving process traces
# programs from several threads at once (the ctor's async warmup
# thread, the batched-serving executor, tornado session executors), and
# a plain global let one thread's conv_impl("xla") window leak into a
# concurrent thread's trace - silently compiling a fused program with
# XLA convs, or worse, restoring mid-trace so a vmapped batched program
# picked the Pallas dispatch its kernels cannot lower.
import contextvars

_FORCE_IMPL_VAR = contextvars.ContextVar("conv3x3_force_impl",
                                         default=None)


def current_impl():
    """The active scoped dispatch override (None | 'xla' | 'pallas')."""
    return _FORCE_IMPL_VAR.get()


# Route too-big-for-resident upsample-convs to the streamed subpixel
# kernel (gn_conv_stream.upconv_stream). Isolated per-shape wins
# (tools/bench_upconv.py: 2.4 vs 4.0 ms at 128^2x512, 2.6 vs 5.9 at
# 256^2x256) did NOT survive in context - the full 512px VAE decode
# regressed 20.3 -> 43 ms with this on (round-3 bisect) - so it stays
# opt-in until the in-context loss is understood.
_UPCONV_STREAM_DISPATCH = False


def set_conv_impl(force):
    """None (auto) | "xla" | "pallas" - see _FORCE_IMPL_VAR. Sets the
    override for the CURRENT context (thread) only."""
    _FORCE_IMPL_VAR.set(force)


import contextlib  # noqa: E402


@contextlib.contextmanager
def conv_impl(force):
    """Scoped conv-dispatch override. The override is consulted at TRACE
    time, so enter this inside the function being jitted (the body runs
    while tracing); the previous impl is restored on exit, and the scope
    is per-context (thread/task), so a trace in one thread can neither
    leak into nor be clobbered by a concurrent trace in another."""
    token = _FORCE_IMPL_VAR.set(force)
    try:
        yield
    finally:
        _FORCE_IMPL_VAR.reset(token)


def _dispatch(x, w, b, force):
    if force == "xla":
        return _lax_conv3x3(x, w, b)
    plan = pallas_plan(x.shape, w.shape)
    backend = jax.default_backend()
    if force == "pallas":
        if plan is None:
            raise ValueError(
                f"pallas conv3x3 does not support {x.shape} x {w.shape}")
        return _conv3x3_pallas(x, w, b, plan, interpret=(backend != "tpu"))
    # auto: pallas on TPU when supported, XLA otherwise. The streaming
    # variant (_conv3x3_stream) is deliberately NOT auto-dispatched: see
    # its STATUS note.
    if plan is not None and backend == "tpu":
        return _conv3x3_pallas(x, w, b, plan)
    return _lax_conv3x3(x, w, b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3(x, w, b, force="auto"):
    """3x3 stride-1 SAME conv, NHWC, float32 accumulation.

    force: "auto" (pallas on TPU where supported), "pallas", or "xla".
    """
    return _dispatch(x, w, b, force)


def _conv3x3_fwd(x, w, b, force):
    return _dispatch(x, w, b, force), (x, w, b)


def _cast_like(grads, primals):
    return tuple(None if g is None else g.astype(p.dtype)
                 for g, p in zip(grads, primals))


def _to_f32(*arrays):
    return tuple(None if a is None else a.astype(jnp.float32)
                 for a in arrays)


def _conv3x3_bwd(force, res, g):
    # Backward runs entirely in f32: the transpose rule of a
    # preferred_element_type=f32 conv over bf16 operands mixes dtypes
    # (lax.conv requires them equal), so under mixed precision the
    # re-derivation must not see bf16 primals. Grads are cast back to
    # each primal's dtype.
    x, w, b = res
    _, vjp = jax.vjp(lambda x_, w_, b_: _lax_conv3x3(x_, w_, b_),
                     *_to_f32(x, w, b))
    return _cast_like(vjp(g.astype(jnp.float32)), (x, w, b))


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)


from flax import linen as nn  # noqa: E402


class Conv3x3(nn.Module):
    """Drop-in for nn.Conv(features, (3,3), padding=1): identical param
    tree ({kernel: (3,3,Cin,Cout), bias: (Cout,)}) so checkpoints and the
    torch->JAX converter are unaffected."""

    features: int
    dtype: jnp.dtype = jnp.float32
    force: str = "auto"

    @nn.compact
    def __call__(self, x, params_only: bool = False):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        if params_only:
            # declare-only mode for callers that fuse the conv into a
            # larger kernel (gn_silu_conv3x3)
            return kernel, bias
        if current_impl() == "xla":
            # bypass the custom_vjp wrapper: native XLA conv + native AD
            return _lax_conv3x3_nat(x.astype(self.dtype),
                                    kernel.astype(self.dtype),
                                    bias.astype(self.dtype))
        return conv3x3(x.astype(self.dtype), kernel.astype(self.dtype),
                       bias.astype(self.dtype),
                       current_impl() or self.force)


# ---------------------------------------------------------------------------
# Fused GroupNorm(+affine) -> SiLU -> 3x3 conv (+ time-embedding / residual
# adds). The SD ResnetBlock body is exactly two of these.
#
# STATUS: experimental, NOT wired into ResnetBlock. Measured end-to-end on
# v5e it is ~10% slower than the unfused GroupNorm32 + Conv3x3 path: the
# per-image statistics pass (whether in XLA or in-kernel under pl.when)
# serializes against the MXU tap pipeline, while XLA's own fusion of the
# unfused form overlaps it. Kept (with tests) for future Mosaic versions.
#
# GroupNorm statistics stay in XLA (one cheap fused reduction pass); the
# kernel receives the folded per-(batch, channel) affine a, c with
# y = x * a + c == GN(x) * scale + bias, and applies affine -> SiLU ->
# zero-border -> 9 MXU taps -> +bias (+temb) (+residual) without any of the
# intermediate tensors (normalized x, silu(x), padded x, pre-residual sum)
# ever touching HBM. Profiling showed those intermediates - not the conv
# itself - dominate the ResnetBlock on this hardware (layout-conflict
# copies between GroupNorm's f32 reduction and the conv's NHWC layout).
# ---------------------------------------------------------------------------


def gn_affine_params(x, scale, bias, num_groups: int, eps: float):
    """Fold GroupNorm stats + affine into per-(B, C) a, c (float32)."""
    c = x.shape[-1]
    g = num_groups
    gmat = jnp.asarray(np.kron(np.eye(g), np.ones((c // g, 1))), jnp.float32)
    axes = tuple(range(1, x.ndim - 1))
    n = (c // g) * int(np.prod([x.shape[i] for i in axes]))
    s1 = jnp.sum(x, axis=axes, dtype=jnp.float32) @ gmat
    s2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axes) @ gmat
    mean_g = s1 / n
    var_g = s2 / n - jnp.square(mean_g)
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = mean_g @ gmat.T  # (B, C)
    inv_c = inv_g @ gmat.T
    a = inv_c * scale.astype(jnp.float32)[None]
    cc = bias.astype(jnp.float32)[None] - mean_c * a
    return a, cc


def _silu_f32(v):
    return v * jax.nn.sigmoid(v)


def _gn_conv_kernel(*refs, H, W, H_T, Cin, N_T, G, eps,
                    has_temb, has_res):
    if has_temb and has_res:
        (x_ref, s_ref, b0_ref, gm_ref, w_ref, b_ref, t_ref, r_ref,
         out_ref, ac_ref) = refs
    elif has_temb:
        x_ref, s_ref, b0_ref, gm_ref, w_ref, b_ref, t_ref, out_ref, ac_ref = refs
        r_ref = None
    elif has_res:
        x_ref, s_ref, b0_ref, gm_ref, w_ref, b_ref, r_ref, out_ref, ac_ref = refs
        t_ref = None
    else:
        x_ref, s_ref, b0_ref, gm_ref, w_ref, b_ref, out_ref, ac_ref = refs
        t_ref = r_ref = None
    bb = pl.program_id(0)
    ni = pl.program_id(1)
    hi = pl.program_id(2)

    # GroupNorm statistics, computed in-kernel on the VMEM-resident block
    # once per batch image (first grid step of each b) and cached in
    # scratch. The zero SAME-padding border contributes nothing to either
    # sum, so summing the whole padded block is exact. Keeping the stats
    # here (instead of an XLA reduce) avoids the transposed-f32
    # materializations XLA picks for NHWC spatial reductions.
    @pl.when((ni == 0) & (hi == 0))
    def _compute_stats():
        s1 = jnp.zeros((1, Cin), jnp.float32)
        s2 = jnp.zeros((1, Cin), jnp.float32)
        for h0 in range(0, H + 2, 8):
            hh = min(8, H + 2 - h0)
            chunk = x_ref[0, h0:h0 + hh, :, :].astype(jnp.float32)
            s1_c = jnp.sum(chunk, axis=(0, 1))
            s2_c = jnp.sum(chunk * chunk, axis=(0, 1))
            s1 = s1 + s1_c[None]
            s2 = s2 + s2_c[None]
        # collapse channels->groups and expand back with tiny MXU dots
        # against the one-hot (Cin, G) matrix (a lane->sublane reshape of
        # the (1, Cin) sums is an unsupported relayout in Mosaic)
        n = H * W * (Cin // G)
        gm = gm_ref[:, :]  # (Cin, G) f32 one-hot
        s1g = jnp.dot(s1, gm, preferred_element_type=jnp.float32)  # (1, G)
        s2g = jnp.dot(s2, gm, preferred_element_type=jnp.float32)
        mean_g = s1g / n
        var_g = s2g / n - mean_g * mean_g
        inv_g = jax.lax.rsqrt(var_g + eps)
        expand = lambda v: jax.lax.dot_general(
            v, gm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (1, G)x(Cin, G) -> (1, Cin)
        mean_c = expand(mean_g)
        inv_c = expand(inv_g)
        a = inv_c * s_ref[:, :].astype(jnp.float32)
        c0 = b0_ref[:, :].astype(jnp.float32) - mean_c * a
        ac_ref[0:1, :] = a
        ac_ref[1:2, :] = c0

    rows = x_ref[0, pl.ds(pl.multiple_of(hi * H_T, H_T), H_T + 2), :, :]
    a = ac_ref[0:1, :][0]
    c0 = ac_ref[1:2, :][0]
    v = rows.astype(jnp.float32) * a[None, None, :] + c0[None, None, :]
    v = _silu_f32(v)
    # zero the 1-px SAME-padding border (it must contribute 0 to the taps).
    # 2D f32 0/1 mask broadcast over channels: minor-dim insertion is only
    # legal for 32-bit types, and a 3D iota would cost ~10 MB of VMEM.
    gr = hi * H_T + jax.lax.broadcasted_iota(jnp.int32, (H_T + 2, W + 2), 0)
    gc = jax.lax.broadcasted_iota(jnp.int32, (H_T + 2, W + 2), 1)
    interior = (gr >= 1) & (gr <= H) & (gc >= 1) & (gc <= W)
    v = (v * interior.astype(jnp.float32)[..., None]).astype(x_ref.dtype)
    acc = None
    for k in range(9):
        di, dj = divmod(k, 3)
        slab = jax.lax.slice(v, (di, dj, 0), (di + H_T, dj + W, Cin))
        d = jnp.dot(slab.reshape(H_T * W, Cin), w_ref[k],
                    preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    y = acc + b_ref[0].astype(jnp.float32)[None]
    if t_ref is not None:
        # t_ref is (B, n_tiles, N_T); select [bb, ni] via masked sum
        arr = t_ref[:, :, :].astype(jnp.float32)
        selb = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 0) == bb
        seln = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1) == ni
        tv = jnp.sum(arr * (selb & seln).astype(jnp.float32), axis=(0, 1))
        y = y + tv[None]
    y = y.reshape(H_T, W, N_T)
    if r_ref is not None:
        y = y + r_ref[0].astype(jnp.float32)
    out_ref[0] = y.astype(out_ref.dtype)


def _gn_conv_pallas(x, scale, bias, w, b, temb, residual, plan,
                    num_groups, eps, interpret=False):
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    H_T, N_T = plan
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w9 = w.reshape(9, Cin, Cout)
    b2 = (b if b is not None else jnp.zeros((Cout,), x.dtype)).reshape(1, Cout)
    scale2 = scale.astype(jnp.float32).reshape(1, Cin)
    bias2 = bias.astype(jnp.float32).reshape(1, Cin)
    gmat = jnp.asarray(
        np.kron(np.eye(num_groups), np.ones((Cin // num_groups, 1))),
        jnp.float32)  # (Cin, G)

    kernel = functools.partial(
        _gn_conv_kernel, H=H, W=W, H_T=H_T, Cin=Cin, N_T=N_T,
        G=num_groups, eps=eps,
        has_temb=temb is not None, has_res=residual is not None)
    in_specs = [
        pl.BlockSpec((1, H + 2, W + 2, Cin), lambda bb, n, h: (bb, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Cin), lambda bb, n, h: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Cin), lambda bb, n, h: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Cin, num_groups), lambda bb, n, h: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, Cin, N_T), lambda bb, n, h: (0, 0, n),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N_T), lambda bb, n, h: (0, n),
                     memory_space=pltpu.VMEM),
    ]
    args = [xp, scale2, bias2, gmat, w9, b2]
    if temb is not None:
        temb3 = temb.reshape(B, Cout // N_T, N_T)
        in_specs.append(pl.BlockSpec(temb3.shape, lambda bb, n, h: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(temb3)
    if residual is not None:
        in_specs.append(pl.BlockSpec((1, H_T, W, N_T),
                                     lambda bb, n, h: (bb, h, 0, n),
                                     memory_space=pltpu.VMEM))
        args.append(residual)
    flops = 2 * B * H * W * Cin * Cout * 9
    return pl.pallas_call(
        kernel,
        grid=(B, Cout // N_T, H // H_T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, H_T, W, N_T),
                               lambda bb, n, h: (bb, h, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((8, Cin), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(xp.size + w9.size + B * H * W * Cout)
            * x.dtype.itemsize,
            transcendentals=B * (H + 2) * (W + 2) * Cin,
        ),
        interpret=interpret,
    )(*args)


def _gn_conv_reference(x, scale, bias, w, b, temb, residual,
                       num_groups, eps):
    a, c = gn_affine_params(x, scale, bias, num_groups, eps)
    shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
    v = x.astype(jnp.float32) * a.reshape(shape) + c.reshape(shape)
    v = _silu_f32(v).astype(x.dtype)
    y = _lax_conv3x3(v, w, b).astype(jnp.float32)
    if temb is not None:
        y = y + temb.astype(jnp.float32)[:, None, None, :]
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    return y.astype(x.dtype)


def _gn_conv_dispatch(x, scale, bias, w, b, temb, residual,
                      num_groups, eps, force):
    if force == "xla":
        return _gn_conv_reference(x, scale, bias, w, b, temb, residual,
                                  num_groups, eps)
    plan = pallas_plan(x.shape, w.shape, fused=True)
    backend = jax.default_backend()
    if plan is None or (force != "pallas" and backend != "tpu"):
        return _gn_conv_reference(x, scale, bias, w, b, temb, residual,
                                  num_groups, eps)
    return _gn_conv_pallas(x, scale, bias, w, b, temb, residual, plan,
                           num_groups, eps, interpret=(backend != "tpu"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def gn_silu_conv3x3(x, scale, bias, w, b, temb, residual,
                    num_groups=32, eps=1e-5, force="auto"):
    """GroupNorm(scale,bias) -> SiLU -> 3x3 SAME conv(w,b)
    [+ temb (B,Cout)] [+ residual (B,H,W,Cout)], fused on TPU.

    temb / residual may be None (static). force: "auto"|"pallas"|"xla".
    """
    return _gn_conv_dispatch(x, scale, bias, w, b, temb, residual,
                             num_groups, eps, force)


def _gn_conv_fwd(x, scale, bias, w, b, temb, residual,
                 num_groups, eps, force):
    out = _gn_conv_dispatch(x, scale, bias, w, b, temb, residual,
                            num_groups, eps, force)
    return out, (x, scale, bias, w, b, temb, residual)


def _gn_conv_bwd(num_groups, eps, force, res, g):
    x, scale, bias, w, b, temb, residual = res
    primals = (x, scale, bias, w, b, temb, residual)
    _, vjp = jax.vjp(
        lambda *args: _gn_conv_reference(*args, num_groups, eps),
        *_to_f32(*primals))
    return _cast_like(vjp(g.astype(jnp.float32)), primals)


gn_silu_conv3x3.defvjp(_gn_conv_fwd, _gn_conv_bwd)


# ---------------------------------------------------------------------------
# Subpixel fused nearest-2x-upsample + 3x3 conv.
#
# conv3x3(nearest_upsample_2x(x)) decomposes exactly into four parity
# planes, each a 2x2-tap conv over the SOURCE image with folded weights:
# out[2y+ry, 2x+rx] = sum_{di,dj} w[di,dj] * src[y+floor((ry+di-1)/2),
#                                               x+floor((rx+dj-1)/2)]
# and floor((p+d-1)/2) only takes two values per parity, so taps that land
# on the same source pixel fold by summing their weights (row folding:
# p=0 -> {w0 | w1+w2}, p=1 -> {w0+w1 | w2}; columns identical). This cuts
# conv FLOPs 2.25x (16 source-size taps vs 9 at 4x the pixels) and never
# materializes the upsampled tensor. The parity planes are written as
# (B, 2, 2, H, W, Cout) and interleaved by one XLA transpose outside.
# SAME-padding semantics are exact (border taps fold onto the same padded
# zero pixel). Used by layers.Upsample (UNet up path + VAE decoder).
# ---------------------------------------------------------------------------


def _fold_upsample_weights(w):
    """(3,3,Cin,Cout) -> (16,Cin,Cout): [ry,rx,ai,bi] folded 2x2 taps."""
    sel = {0: ((0,), (1, 2)), 1: ((0, 1), (2,))}
    planes = []
    for ry in (0, 1):
        for rx in (0, 1):
            for ais in sel[ry]:
                for bjs in sel[rx]:
                    planes.append(sum(w[di, dj] for di in ais for dj in bjs))
    return jnp.stack(planes)  # (16, Cin, Cout)


def _upconv_kernel(x_ref, w_ref, b_ref, out_ref, xp_ref,
                   *, H, H_T, W, Cin, N_T):
    """x_ref: (1, H, W, Cin) unpadded SOURCE resident in VMEM; padded once
    per batch into the xp_ref scratch (see _conv_kernel_inpad).
    w_ref: (16, Cin, N_T) folded taps. out_ref: (1, 2, 2, H_T, W, N_T)."""
    ni = pl.program_id(1)
    hi = pl.program_id(2)

    @pl.when((ni == 0) & (hi == 0))
    def _fill():
        zrow = jnp.zeros((1, W + 2, Cin), x_ref.dtype)
        xp_ref[0:1] = zrow
        xp_ref[H + 1:H + 2] = zrow
        zcol = jnp.zeros((H, 1, Cin), x_ref.dtype)
        xp_ref[1:H + 1, 0:1] = zcol
        xp_ref[1:H + 1, W + 1:W + 2] = zcol
        xp_ref[1:H + 1, 1:W + 1] = x_ref[0]

    h0 = pl.multiple_of(hi * H_T, H_T)
    bias = b_ref[0].astype(jnp.float32)
    for ry in (0, 1):
        for rx in (0, 1):
            acc = None
            for ai in (0, 1):
                for bi in (0, 1):
                    k = ((ry * 2 + rx) * 2 + ai) * 2 + bi
                    slab = xp_ref[pl.ds(h0 + ry + ai, H_T),
                                  pl.ds(rx + bi, W), :]
                    d = jnp.dot(slab.reshape(H_T * W, Cin), w_ref[k],
                                preferred_element_type=jnp.float32)
                    acc = d if acc is None else acc + d
            y = (acc + bias[None]).reshape(H_T, W, N_T)
            out_ref[0, ry, rx] = y.astype(out_ref.dtype)


def _upconv_kernel_padded(x_ref, w_ref, b_ref, out_ref,
                          *, H_T, W, Cin, N_T):
    """Padded-input variant for shapes where the in-pad scratch (2x the
    image resident) does not fit VMEM. x_ref: (1, H+2, W+2, Cin)."""
    hi = pl.program_id(2)
    h0 = pl.multiple_of(hi * H_T, H_T)
    bias = b_ref[0].astype(jnp.float32)
    for ry in (0, 1):
        for rx in (0, 1):
            acc = None
            for ai in (0, 1):
                for bi in (0, 1):
                    k = ((ry * 2 + rx) * 2 + ai) * 2 + bi
                    slab = x_ref[0, pl.ds(h0 + ry + ai, H_T),
                                 pl.ds(rx + bi, W), :]
                    d = jnp.dot(slab.reshape(H_T * W, Cin), w_ref[k],
                                preferred_element_type=jnp.float32)
                    acc = d if acc is None else acc + d
            y = (acc + bias[None]).reshape(H_T, W, N_T)
            out_ref[0, ry, rx] = y.astype(out_ref.dtype)


def _upconv_pallas(x, w, b, plan, interpret=False):
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    H_T, N_T = plan
    w16 = _fold_upsample_weights(w)
    b2 = (b if b is not None else jnp.zeros((Cout,), x.dtype)).reshape(1, Cout)
    in_pad = _IN_PAD and (
        ((H + 2) * (W + 2) + H * W) * Cin * x.dtype.itemsize
        <= int(7.5 * 1024 * 1024))
    common = dict(
        grid=(B, Cout // N_T, H // H_T),
        out_specs=pl.BlockSpec((1, 2, 2, H_T, W, N_T),
                               lambda bb, n, h: (bb, 0, 0, h, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, 2, H, W, Cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * Cin * Cout * 16,
            bytes_accessed=(x.size + w16.size + 4 * B * H * W * Cout)
            * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )
    w_spec = pl.BlockSpec((16, Cin, N_T), lambda bb, n, h: (0, 0, n),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, N_T), lambda bb, n, h: (0, n),
                          memory_space=pltpu.VMEM)
    if in_pad:
        kernel = functools.partial(_upconv_kernel, H=H, H_T=H_T, W=W,
                                   Cin=Cin, N_T=N_T)
        planes = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec((1, H, W, Cin), lambda bb, n, h: (bb, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                w_spec, b_spec,
            ],
            scratch_shapes=[pltpu.VMEM((H + 2, W + 2, Cin), x.dtype)],
            **common,
        )(x, w16, b2)
    else:
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        kernel = functools.partial(_upconv_kernel_padded, H_T=H_T, W=W,
                                   Cin=Cin, N_T=N_T)
        planes = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec((1, H + 2, W + 2, Cin),
                             lambda bb, n, h: (bb, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                w_spec, b_spec,
            ],
            **common,
        )(xp, w16, b2)
    # (B,2,2,H,W,C) -> (B,H,2,W,2,C) -> (B,2H,2W,C): one XLA transpose
    out = jnp.transpose(planes, (0, 3, 1, 4, 2, 5))
    return out.reshape(B, 2 * H, 2 * W, Cout)


def _upconv_reference(x, w, b):
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return _lax_conv3x3(up, w, b)


def _upconv_plan(x_shape, w_shape):
    plan = pallas_plan(x_shape, w_shape)
    if plan is None:
        return None
    ht, nt = plan
    Cin, Cout = w_shape[2], w_shape[3]
    # 16 folded taps (vs 9): shrink the cout tile until the weight block fits
    while 16 * Cin * nt * 2 > 6 * 1024 * 1024:
        smaller = [c for c in (512, 384, 256, 128) if c < nt and Cout % c == 0]
        if not smaller:
            return None
        nt = smaller[0]
    # the output block holds all four parity planes (4x a plain conv tile):
    # shrink the row tile until it stays modest
    H = x_shape[1]
    W = x_shape[2]
    while 4 * ht * W * nt * 2 * 2 > 4 * 1024 * 1024 and ht > 8 and ht % 2 == 0             and H % (ht // 2) == 0:
        ht //= 2
    return ht, nt


def _upconv_dispatch(x, w, b, force):
    if force == "xla":
        return _upconv_reference(x, w, b)
    plan = _upconv_plan(x.shape, w.shape)
    backend = jax.default_backend()
    if force == "pallas":
        if plan is None:
            raise ValueError(
                f"pallas upsample-conv unsupported for {x.shape} x {w.shape}")
        return _upconv_pallas(x, w, b, plan, interpret=(backend != "tpu"))
    if plan is not None and backend == "tpu":
        return _upconv_pallas(x, w, b, plan)
    if backend == "tpu" and _UPCONV_STREAM_DISPATCH:
        # images too large for the VMEM-resident kernel (the decoder's
        # 128^2x512 / 256^2x256 upsamples): the streamed subpixel kernel
        # (windowed DMA, in-VMEM plane interleave) replaces XLA's
        # repeat+conv over the 4x materialized upsample.
        from .gn_conv_stream import upconv_stream, upconv_stream_plan

        if upconv_stream_plan(x.shape, w.shape, x.dtype.itemsize):
            out, _ = upconv_stream(x, w, b, want_stats=False)
            return out
    return _upconv_reference(x, w, b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _upconv_vjp(x, w, b, force):
    return _upconv_dispatch(x, w, b, force)


def upsample2x_conv3x3(x, w, b, force="auto"):
    """nearest-2x upsample fused with a 3x3 SAME conv (NHWC)."""
    if current_impl() == "xla":
        up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return _lax_conv3x3_nat(up, w, b)  # native XLA AD (training)
    return _upconv_vjp(x, w, b, current_impl() or force)


def _upconv_fwd(x, w, b, force):
    return _upconv_dispatch(x, w, b, force), (x, w, b)


def _upconv_bwd(force, res, g):
    x, w, b = res
    _, vjp = jax.vjp(_upconv_reference, *_to_f32(x, w, b))
    return _cast_like(vjp(g.astype(jnp.float32)), (x, w, b))


_upconv_vjp.defvjp(_upconv_fwd, _upconv_bwd)


# ---------------------------------------------------------------------------
# Streaming variant: large-spatial images whose padded activation does not
# fit VMEM (the VAE's 128-512 px levels). The input stays in HBM; each grid
# step DMAs its (H_T+2) row window (with halo) into a VMEM scratch and runs
# the same 9 MXU taps.
#
# STATUS: experimental, NOT auto-dispatched. The kernel itself is ~2x
# faster than XLA's conv at these shapes (0.5 ms vs 2.5 ms at 2x128x128x512
# -> 512), but end-to-end the VAE regressed 56 -> 66 ms: XLA's conv
# "fusions" were co-computing the f32 GroupNorm preparation of the next
# layer, which becomes a standalone transposed materialization once the
# conv moves into pallas. Needs a GN-stats epilogue inside this kernel
# (sum/sumsq of the output tile accumulated across grid steps) to win.
# ---------------------------------------------------------------------------


def streaming_plan(x_shape, w_shape):
    """(H_T, N_T) for the streaming kernel, else None."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return None
    B, H, W, Cin = x_shape
    kh, kw, wcin, Cout = w_shape
    if (kh, kw) != (3, 3) or wcin != Cin:
        return None
    if H < 8 or W < 2 or Cin < 16 or Cout < 128:
        return None
    nts = ([Cout] if Cout <= 512 else []) + [
        nt for nt in (512, 384, 256, 128) if Cout % nt == 0]
    nt = next((n for n in nts if 9 * Cin * n * 2 <= 6 * 1024 * 1024), None)
    if nt is None:
        return None
    for ht in (32, 16, 8):
        if H % ht == 0 and (ht + 2) * (W + 2) * Cin * 2 <= 4 * 1024 * 1024 \
                and ht * W * nt * 4 <= 4 * 1024 * 1024:
            return ht, nt
    return None


def _conv_stream_kernel(x_hbm, w_ref, b_ref, out_ref, xwin, sem,
                        *, H_T, W, Cin, N_T):
    bb = pl.program_id(0)
    hi = pl.program_id(2)
    row0 = pl.multiple_of(hi * H_T, H_T)
    copy = pltpu.make_async_copy(
        x_hbm.at[bb, pl.ds(row0, H_T + 2)], xwin, sem)
    copy.start()
    copy.wait()
    bias = b_ref[0].astype(jnp.float32)
    acc = None
    for k in range(9):
        di, dj = divmod(k, 3)
        slab = xwin[pl.ds(di, H_T), pl.ds(dj, W), :]
        d = jnp.dot(slab.reshape(H_T * W, Cin), w_ref[k],
                    preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    y = acc + bias[None]
    out_ref[0] = y.reshape(H_T, W, N_T).astype(out_ref.dtype)


def _conv3x3_stream(x, w, b, plan, interpret=False):
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    H_T, N_T = plan
    # right-pad the width so the DMA'd window's sublane dim (W+2) is
    # 8-aligned (Mosaic requires tiled-dim slices aligned to the tiling)
    wpad = (-(W + 2)) % 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + wpad), (0, 0)))
    w9 = w.reshape(9, Cin, Cout)
    b2 = (b if b is not None else jnp.zeros((Cout,), x.dtype)).reshape(1, Cout)
    kernel = functools.partial(_conv_stream_kernel, H_T=H_T, W=W, Cin=Cin,
                               N_T=N_T)
    return pl.pallas_call(
        kernel,
        grid=(B, Cout // N_T, H // H_T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM, DMA'd
            pl.BlockSpec((9, Cin, N_T), lambda bb, n, h: (0, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_T), lambda bb, n, h: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H_T, W, N_T),
                               lambda bb, n, h: (bb, h, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((H_T + 2, W + 2 + wpad, Cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * Cin * Cout * 9,
            bytes_accessed=(xp.size * (1 + 2 // max(H_T, 1)) + w9.size
                            + B * H * W * Cout) * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xp, w9, b2)


# ---------------------------------------------------------------------------
# Resident chained-GN conv: affine prologue + stats epilogue.
#
# The UNet's resnet bodies at latent resolution fit entirely in VMEM
# (the _conv_kernel path). This variant additionally (a) applies a
# PRECOMPUTED folded GroupNorm affine + SiLU to the resident image -
# once per batch, reused across cout tiles - and (b) emits the
# (sum, sumsq) of its own output, so the NEXT GroupNorm's statistics
# need no separate pass over the tensor (the resident analog of
# ops/gn_conv_stream.py; the earlier gn_silu_conv3x3 computed stats
# in-kernel from its own input and lost ~10% because its INPUT stats
# still required a separate XLA pass - chaining removes that pass).
# ---------------------------------------------------------------------------


def _gn_res_kernel(x_ref, a_ref, c_ref, w_ref, b_ref, *rest,
                   H, W, H_T, Cin, N_T, has_res, want_stats, apply_gn,
                   pro_rows=8):
    if has_res and want_stats:
        res_ref, out_ref, st_ref = rest
    elif has_res:
        (res_ref, out_ref), st_ref = rest, None
    elif want_stats:
        (out_ref, st_ref), res_ref = rest, None
    else:
        (out_ref,), res_ref, st_ref = rest, None, None

    ni = pl.program_id(1)
    hi = pl.program_id(2)
    num_h = pl.num_programs(2)

    # Prologue: normalize the resident padded image IN PLACE once per
    # batch (the x block's index map ignores n/h, so it stays resident
    # across all cout/row tiles of this batch image). Runs in the
    # ACTIVATION dtype (bf16: packed 2x VPU rate, like the module path's
    # GroupNorm32 apply); the SAME-padding border must end up zero
    # (silu(0*a + c) != 0), handled by 4 cheap zero STORES over the
    # border rows/cols instead of the old full iota interior mask
    # (which cost ~15 VPU ops/element in f32).
    @pl.when((ni == 0) & (hi == 0) & apply_gn)
    def _normalize():
        a = a_ref[0, 0, :].astype(x_ref.dtype)
        c0 = c_ref[0, 0, :].astype(x_ref.dtype)
        for h0 in range(0, H + 2, pro_rows):
            rows = min(pro_rows, H + 2 - h0)
            chunk = x_ref[0, h0:h0 + rows, :, :]
            chunk = chunk * a[None, None, :] + c0[None, None, :]
            x_ref[0, h0:h0 + rows, :, :] = _silu_same_dtype(chunk)
        zrow = jnp.zeros((1, W + 2, Cin), x_ref.dtype)
        x_ref[0, 0:1] = zrow
        x_ref[0, H + 1:H + 2] = zrow
        zcol = jnp.zeros((H + 2, 1, Cin), x_ref.dtype)
        x_ref[0, :, 0:1] = zcol
        x_ref[0, :, W + 1:W + 2] = zcol

    row0 = pl.multiple_of(hi * H_T, H_T)
    bias = b_ref[0].astype(jnp.float32)
    acc = None
    for k in range(9):
        di, dj = k // 3, k % 3
        slab = x_ref[0, pl.ds(row0 + di, H_T), pl.ds(dj, W), :]
        d = jnp.dot(slab.reshape(H_T * W, Cin), w_ref[k],
                    preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    y = acc + bias[None, :]
    # Module-path epilogue ordering (matches gn_conv_stream._kernel and
    # _reference): round the conv result to the activation dtype FIRST,
    # add the residual in that dtype, f32 stats over the rounded tensor.
    yb = y.astype(out_ref.dtype)
    if res_ref is not None:
        yb = yb + res_ref[0].reshape(H_T * W, N_T)
    if st_ref is not None:
        @pl.when(hi == 0)
        def _zero():
            st_ref[...] = jnp.zeros_like(st_ref)

        yf = yb.astype(jnp.float32)
        st_ref[0, 0:1, :] += jnp.sum(yb, axis=0, dtype=jnp.float32)[None]
        st_ref[0, 1:2, :] += jnp.sum(yf * yf, axis=0)[None]
    out_ref[0] = yb.reshape(H_T, W, N_T)


def gn_conv_resident_plan(x_shape, w_shape, has_res: bool = True,
                          itemsize: int = 2):
    """Itemized VMEM budget walk for the chained resident kernel.

    Returns (H_T, N_T, prologue_rows) or None. Components held at once
    under the 16 MB scoped-VMEM ceiling:
      - the whole padded image (constant index map -> single copy),
      - one cout-tile of weights (double-buffered only when Cout spans
        multiple tiles - the tile changes across the middle grid dim),
      - out (+ optional residual) tiles, double-buffered,
      - the f32 tap accumulator,
      - the prologue's f32 normalize temporaries (row chunk adapts down
        at fat-Cin shapes: the up-block concat convs, Cin 960-2560,
        OOMed the fixed 8-row chunk).
    `itemsize` = activation/weight dtype byte width (2 for bf16 serving,
    4 for the f32 fidelity-reference path - budgeting f32 shapes with
    bf16 sizes accepted plans whose kernels overflow scoped VMEM).
    Calibrated on v5e via tools/probe_gn_resident_shapes.py."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return None
    B, H, W, Cin = x_shape
    kh, kw, wcin, Cout = w_shape
    if (kh, kw) != (3, 3) or wcin != Cin:
        return None
    if H < 2 or W < 2 or Cin < 16 or Cout < 128:
        return None
    it = int(itemsize)
    limit = int(15 * 1024 * 1024)
    img = (H + 2) * (W + 2) * Cin * it
    if img > int(9.5 * 1024 * 1024):
        return None
    nts = ([Cout] if Cout <= 512 else []) + [
        nt for nt in (512, 384, 256, 128) if Cout % nt == 0]
    # row tiles capped at 16: at (3,64,64,320) ht=16 measured ~13% faster
    # than ht=32 (smaller out/acc footprint, same MXU shape)
    hts = [ht for ht in (16, 8) if H % ht == 0] or [H]
    for nt in nts:
        wb = 9 * Cin * nt * it * (2 if Cout > nt else 1)
        if img + wb > limit:
            continue
        for ht in hts:
            # out tile double-buffered + optional residual tile
            # double-buffered + f32 tap accumulator
            tiles = ht * W * nt * (2 * it + (2 * it if has_res else 0) + 4)
            stats = 8 * nt * 4 * 2  # (STATS_ROWS, N_T) f32, double-buffered
            room = limit - img - wb - tiles - stats
            if room <= 0:
                continue
            # activation-dtype chunk + silu temp + store
            per_row = (W + 2) * Cin * 3 * it
            pro_rows = min(8, room // per_row)
            if pro_rows >= 1:
                return ht, nt, int(pro_rows)
    return None


def _gn_conv_resident_pallas(x, a, c, w, b, residual, want_stats, apply_gn,
                             plan, interpret=False):
    from .gn_conv_stream import _STATS_ROWS

    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    H_T, N_T, pro_rows = plan
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w9 = w.reshape(9, Cin, Cout)
    b2 = (b if b is not None else jnp.zeros((Cout,), x.dtype)).reshape(1, Cout)
    a2 = (a.astype(jnp.float32) if a is not None
          else jnp.zeros((B, Cin), jnp.float32)).reshape(B, 1, Cin)
    c2 = (c.astype(jnp.float32) if c is not None
          else jnp.zeros((B, Cin), jnp.float32)).reshape(B, 1, Cin)
    kernel = functools.partial(
        _gn_res_kernel, H=H, W=W, H_T=H_T, Cin=Cin, N_T=N_T,
        has_res=residual is not None, want_stats=want_stats,
        apply_gn=apply_gn, pro_rows=pro_rows)
    in_specs = [
        pl.BlockSpec((1, H + 2, W + 2, Cin), lambda bb, n, h: (bb, 0, 0, 0),
                     memory_space=pltpu.VMEM),
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
    out_specs = [pl.BlockSpec((1, H_T, W, N_T), lambda bb, n, h: (bb, h, 0, n),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype)]
    if want_stats:
        out_specs.append(pl.BlockSpec((1, _STATS_ROWS, N_T),
                                      lambda bb, n, h: (bb, 0, n),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(
            jax.ShapeDtypeStruct((B, _STATS_ROWS, Cout), jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=(B, Cout // N_T, H // H_T),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * Cin * Cout * 9,
            bytes_accessed=(xp.size + w9.size + B * H * W * Cout)
            * x.dtype.itemsize,
            transcendentals=B * (H + 2) * (W + 2) * Cin,
        ),
        interpret=interpret,
    )(*args)
    if want_stats:
        return out[0], out[1]
    return (out if not isinstance(out, (tuple, list)) else out[0]), None


def _gn_conv_resident_reference(x, a, c, w, b, residual, want_stats,
                                apply_gn):
    from .gn_conv_stream import _reference

    return _reference(x, a, c, w, b, residual, want_stats, apply_gn)


def gn_conv_resident(x, a, c, w, b, residual=None, want_stats=True,
                     apply_gn=True, force="auto"):
    """silu(x*a + c) -> resident 3x3 SAME conv [+ residual], returning
    (out, stats-or-None). a, c: (B, Cin) f32 folded GN affine
    (gn_conv_stream.gn_affine_from_stats). Serving-only (no VJP)."""
    if force != "xla":
        plan = gn_conv_resident_plan(x.shape, w.shape,
                                     has_res=residual is not None,
                                     itemsize=x.dtype.itemsize)
        backend = jax.default_backend()
        if force == "pallas":
            if plan is None:
                raise ValueError(
                    f"gn_conv_resident unsupported for {x.shape} x {w.shape}")
            return _gn_conv_resident_pallas(x, a, c, w, b, residual,
                                            want_stats, apply_gn, plan,
                                            interpret=(backend != "tpu"))
        if plan is not None and backend == "tpu":
            return _gn_conv_resident_pallas(x, a, c, w, b, residual,
                                            want_stats, apply_gn, plan)
    return _gn_conv_resident_reference(x, a, c, w, b, residual, want_stats,
                                       apply_gn)
