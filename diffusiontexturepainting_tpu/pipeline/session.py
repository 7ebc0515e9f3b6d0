"""Device-resident stroke sessions: the canvas lives on the TPU.

The per-request path (inpaint.py) uploads a full res^2 RGBA canvas and
downloads a res^2 stamp for EVERY brush stamp - on a remote/tunneled
backend that transfer + round-trip dominates the wall clock (the device
computes a 512px 4-step stamp in ~136 ms while the wire adds ~100 ms).

A stroke session instead keeps the WHOLE painting canvas resident in
device HBM as a donated buffer and makes each stamp a tiny request:

    STAMP_AT(x0, y0, settings)  ->  device program:
        crop res^2 window from the resident canvas (dynamic_slice)
        -> [optional overpaint: clear the crop's center alpha]
        -> the one-program inpaint stamp (inpaint.py make_stamp_fn)
        -> write composited RGB + painted alpha back under the stamp
           edge mask (1px border cut, client/painter.py semantics from
           reference manager.py:42-45, 264-270)
        -> dynamic_update_slice into the resident canvas (donated, so
           XLA updates it in place)

Nothing but two int32 coordinates and the settings scalars travels to
the device, and nothing needs to travel back until the client asks
(FETCH_CANVAS) - consecutive stamps of a stroke chain their data
dependency entirely on-device, so a client can fire stamps
back-to-back and the wire round-trip amortizes across the stroke.
This is the TPU answer to the reference's per-stamp torch round trips
(kit_app manager.py:232-273: render -> websocket -> texture update on
the client for every stamp).

Coordinates are top-left corners of the stamp window, clamped on device
so the window always fits inside the canvas. All stamp-semantics
constants mirror client/painter.py (the reference TexturePainterManager):
STAMP_EDGE_MARGIN=1, the Overpaint center-clear margin 37/256, and the
Erase circle mask (PIL ellipse, margin 2) that zeroes texture RGBA.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .inpaint import StampModels, make_stamp_fn

# reference manager.py:42-45 / client/painter.py STAMP_EDGE_MARGIN
STAMP_EDGE_MARGIN = 1


def _edge_mask(res: int, margin: int = STAMP_EDGE_MARGIN):
    """(res, res, 1) float mask: 1 inside, 0 on a `margin`-px border."""
    ii = jnp.arange(res)
    inside = (ii >= margin) & (ii < res - margin)
    return (inside[:, None] & inside[None, :]).astype(jnp.uint8)[..., None]


def _clamped_corner(x0, y0, res: int, width: int, height: int):
    y0c = jnp.clip(y0.astype(jnp.int32), 0, height - res)
    x0c = jnp.clip(x0.astype(jnp.int32), 0, width - res)
    return x0c, y0c


def make_session_stamp_fn(models: StampModels, scheduler_name: str,
                          num_steps: int, deep_cache_interval=1,
                          final_step_f32: bool = False):
    """Build the resident-canvas stamp program.

    Returns fn(params, canvas_u8(H,W,4), brush(1,res,res,3), cond, uncond,
               rng, counter, x0, y0, cfg_weight, tg_weight, tg_steps,
               context_pad, overpaint_margin)
        -> (new_canvas_u8(H,W,4), composited_crop_u8(res,res,3))

    `overpaint_margin` is a traced int32: 0 = plain inpaint stamp; > 0
    clears the crop's center alpha by that margin before inpainting
    (Overpaint mode, reference manager.py:243-247).

    The canvas argument is meant to be donated (jax.jit(...,
    donate_argnums=1)) so XLA reuses its HBM buffer for the output.
    """
    stamp = make_stamp_fn(models, scheduler_name, num_steps,
                          deep_cache_interval=deep_cache_interval,
                          final_step_f32=final_step_f32)

    def session_stamp(params, canvas_u8, brush, cond, uncond, rng, counter,
                      x0, y0, cfg_weight, tg_weight, tg_steps, context_pad,
                      overpaint_margin):
        height, width = canvas_u8.shape[0], canvas_u8.shape[1]
        res = brush.shape[1]
        x0c, y0c = _clamped_corner(x0, y0, res, width, height)
        crop = jax.lax.dynamic_slice(
            canvas_u8, (y0c, x0c, jnp.int32(0)), (res, res, 4))

        # Overpaint: clear center alpha so the brush regenerates it
        # (traced margin; margin <= 0 leaves the crop untouched).
        m = overpaint_margin.astype(jnp.int32)
        ii = jnp.arange(res)
        center = ((ii >= m) & (ii < res - m))
        clear = (center[:, None] & center[None, :]) & (m > 0)
        alpha = jnp.where(clear, jnp.uint8(0), crop[..., 3])
        rgb = jnp.where(clear[..., None], jnp.uint8(0), crop[..., :3])
        crop_in = jnp.concatenate([rgb, alpha[..., None]], axis=-1)

        _, comp_u8 = stamp(params, crop_in[None], brush, cond, uncond, rng,
                           counter, cfg_weight, tg_weight, tg_steps,
                           context_pad)

        # Texture update under the stamp edge mask (reference
        # manager.py:264-270: replace RGB where update alpha > 0, set
        # painted coverage there).
        edge = _edge_mask(res)
        new_rgb = jnp.where(edge > 0, comp_u8, crop[..., :3])
        new_a = jnp.where(edge[..., 0] > 0, jnp.uint8(255), crop[..., 3])
        new_crop = jnp.concatenate([new_rgb, new_a[..., None]], axis=-1)
        new_canvas = jax.lax.dynamic_update_slice(
            canvas_u8, new_crop, (y0c, x0c, jnp.int32(0)))
        return new_canvas, comp_u8

    return session_stamp


def make_session_stroke_fn(models: StampModels, scheduler_name: str,
                           num_steps: int, deep_cache_interval=1,
                           final_step_f32: bool = False):
    """K chained resident-canvas stamps as ONE device program.

    A fire-and-forget stroke client never needs a stamp's pixels, only
    its acks - but dispatching one program per stamp pays one full
    host->device round trip each (measured 12-30 ms through tunneled
    backends, ~20% of the stroke wall time on top of ~125 ms device).
    This program lax.scans the session stamp over K stacked requests so
    a whole stroke segment is ONE dispatch; the canvas chains through
    the scan carry entirely on-device. jit re-specializes per K (the
    stacked leading dim), so callers get K-bucket programs for free
    from the compile cache.

    Returns fn(params, canvas_u8(H,W,4), brush, cond, uncond, rng,
               counters(K,), xs(K,), ys(K,), cfg_ws(K,), tg_ws(K,),
               tg_stepss(K,), pads(K,), margins(K,)) -> new_canvas_u8.
    Semantically identical to K sequential session stamps with those
    per-request scalars (same RNG stream: each stamp folds its own
    counter).
    """
    stamp = make_session_stamp_fn(models, scheduler_name, num_steps,
                                  deep_cache_interval=deep_cache_interval,
                                  final_step_f32=final_step_f32)

    def session_stroke(params, canvas_u8, brush, cond, uncond, rng,
                       counters, xs, ys, cfg_ws, tg_ws, tg_stepss, pads,
                       margins):
        def body(canvas, row):
            counter, x0, y0, cfg_w, tg_w, tg_s, pad, margin = row
            new_canvas, _ = stamp(params, canvas, brush, cond, uncond,
                                  rng, counter, x0, y0, cfg_w, tg_w,
                                  tg_s, pad, margin)
            return new_canvas, None

        new_canvas, _ = jax.lax.scan(
            body, canvas_u8,
            (counters, xs, ys, cfg_ws, tg_ws, tg_stepss, pads, margins))
        return new_canvas

    return session_stroke


def make_session_erase_fn(res: int):
    """Resident-canvas erase program: zero RGBA under a filled-circle
    stamp mask (reference manager.py:48-53 circle + 267-270
    `texture = ~update_mask * texture`; client analog
    client/painter.py BrushMode.ERASE).

    Returns fn(canvas_u8(H,W,4), x0, y0)
        -> (new_canvas_u8, erased_crop_u8(res,res,3))
    """
    from ..client.painter import circle_mask

    circle_np = (circle_mask(res)[..., 0] > 0.0)

    def session_erase(canvas_u8, x0, y0):
        height, width = canvas_u8.shape[0], canvas_u8.shape[1]
        x0c, y0c = _clamped_corner(x0, y0, res, width, height)
        crop = jax.lax.dynamic_slice(
            canvas_u8, (y0c, x0c, jnp.int32(0)), (res, res, 4))
        circle = jnp.asarray(circle_np)[..., None]
        new_crop = jnp.where(circle, jnp.uint8(0), crop)
        new_canvas = jax.lax.dynamic_update_slice(
            canvas_u8, new_crop, (y0c, x0c, jnp.int32(0)))
        return new_canvas, new_crop[..., :3]

    return session_erase


def host_stamp_update(canvas_u8: np.ndarray, comp_u8: np.ndarray,
                      x0: int, y0: int) -> np.ndarray:
    """Host-side oracle for the session update rule (used by the generic
    ConditionalInpainterBase session fallback and by tests): writes the
    composited crop + painted alpha under the edge mask at the clamped
    corner. Mirrors session_stamp's texture update exactly."""
    res = comp_u8.shape[0]
    height, width = canvas_u8.shape[:2]
    y0 = int(np.clip(y0, 0, height - res))
    x0 = int(np.clip(x0, 0, width - res))
    m = STAMP_EDGE_MARGIN
    out = canvas_u8.copy()
    window = out[y0:y0 + res, x0:x0 + res]
    window[m:res - m, m:res - m, :3] = comp_u8[m:res - m, m:res - m]
    window[m:res - m, m:res - m, 3] = 255
    return out
