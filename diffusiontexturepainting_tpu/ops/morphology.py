"""Binary morphology on TPU: square-kernel dilation with *dynamic* radius.

Replaces the reference's `kornia.morphology.dilation(mask, ones(pad,pad))`
(CUDA; trt_inference/handler.py:25-33) used to build the texture-guidance
context mask. The wire protocol makes `pad` a per-request value
(server_io: u8 context_pad), and a naive max-pool window would bake it
into the compiled program shape. Instead we use the prefix-sum identity

    dilate(m, ones(p, p))[y, x] = [ sum of m over the p x p window > 0 ]

and compute window sums from 2D inclusive prefix sums with *dynamically
clipped gather indices* - O(HW) work, fully static shapes, `pad` stays a
traced scalar. Separable (rows then columns) so only 1D cumsums and four
gathers are needed.

Window convention: offsets [-(p-1)//2, p//2] on each axis (odd p is the
centered window; even p extends one extra to the bottom/right).
"""

from __future__ import annotations

import jax.numpy as jnp


def _window_any_1d(mask, pad, axis):
    """mask: float/bool array; returns 1.0 where any element within the
    window [i - (p-1)//2, i + p//2] along `axis` is nonzero."""
    n = mask.shape[axis]
    left = (pad - 1) // 2
    right = pad // 2
    csum = jnp.cumsum((mask > 0).astype(jnp.int32), axis=axis)
    # prepend zero so windowsum = S[hi] - S[lo-1] works at the boundary
    pad_widths = [(0, 0)] * mask.ndim
    pad_widths[axis] = (1, 0)
    csum = jnp.pad(csum, pad_widths)
    idx = jnp.arange(n)
    hi = jnp.clip(idx + right, 0, n - 1) + 1
    lo = jnp.clip(idx - left, 0, n)
    wsum = jnp.take(csum, hi, axis=axis) - jnp.take(csum, lo, axis=axis)
    return (wsum > 0).astype(mask.dtype)


def dilate_square(mask, pad):
    """Square-kernel binary dilation.

    Args:
        mask: (..., H, W, C) nonnegative mask; nonzero = set.
        pad: kernel size (traced or static scalar int). pad <= 1 is a no-op
            (matching a 1x1 structuring element).

    Returns:
        0/1 mask of the same shape/dtype.
    """
    pad = jnp.maximum(jnp.asarray(pad, jnp.int32), 1)
    out = _window_any_1d(mask, pad, axis=-3)
    out = _window_any_1d(out, pad, axis=-2)
    return out


def add_extra_context(source_image, masked_image, mask, pad):
    """Build the texture-guidance context branch.

    Pastes the brush `source_image` everywhere OUTSIDE the dilated painted
    mask, producing (context_masked_image, context_mask). Mirrors the
    reference semantics (handler.py:25-33): the dilation creates a "keep
    out" margin of `pad` px around painted content so the pasted hint
    never abuts the region being generated.

    Args:
        source_image: (B, H, W, 3) brush image in [-1, 1].
        masked_image: (B, H, W, 3) canvas * mask in [-1, 1].
        mask: (B, H, W, 1) painted mask (1 = painted/known).
        pad: dilation kernel size (dynamic scalar).
    """
    hint_mask = 1.0 - dilate_square(mask, pad)
    context_masked_image = masked_image + source_image * hint_mask
    context_mask = jnp.clip(mask + hint_mask, 0.0, 1.0)
    return context_masked_image, context_mask
