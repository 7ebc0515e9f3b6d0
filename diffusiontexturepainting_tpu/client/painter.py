"""Headless texture painter: the client-side painting state machine.

Re-implements the paint logic of the reference's TexturePainterManager
(kit_app/.../manager.py:77-354) without Omniverse: per-mesh live texture,
brush modes (Inpaint / Erase / Overpaint), orthographic stamp camera
oriented along the stroke, render -> inpaint -> back-project texture
updates, an undo stack, and texture baking to npy/png. Used by the
headless integration tests and as the programmatic API for driving the
TPU server from any 3D pipeline.
"""

from __future__ import annotations

import enum
import logging
import os
from collections import deque

import numpy as np

from ..serving.model_base import ConditionalInpainterBase
from ..utils.textures import checkerboard
from .render import Mesh, OrthoCamera, backproject_texture, render_view

logger = logging.getLogger(__name__)


class BrushMode(enum.Enum):
    INPAINT = 0
    ERASE = 1
    OVERPAINT = 2


DEFAULT_MODEL_SETTINGS = {
    # reference manager.py:104-110 defaults
    "context_pad": 150,
    "steps": 20,
    "tg_steps": 20,
    "cfg_weight": 2.0,
    "tg_weight": 1.0,
}

OVERPAINT_MARGIN_FRAC = 37 / 256  # center-clear margin (manager.py:37-39)
STAMP_EDGE_MARGIN = 1  # px cut from the stamp mask border (manager.py:129-135)


def overpaint_canvas(canvas: np.ndarray, margin: int) -> np.ndarray:
    """Clear the center of the canvas alpha so the brush regenerates it
    (Overpaint mode, reference manager.py:243-247)."""
    out = canvas.copy()
    h, w = canvas.shape[:2]
    out[margin : h - margin, margin : w - margin, 3] = 0.0
    return out


def circle_mask(size: int, margin: int = 2) -> np.ndarray:
    """(size, size, 1) filled-circle stamp mask for Erase mode (reference
    manager.py:48-53: PIL ellipse from (margin, margin) to
    (size-margin, size-margin), white fill)."""
    from PIL import Image, ImageDraw

    img = Image.new("L", (size, size))
    ImageDraw.Draw(img).ellipse(
        (margin, margin, size - margin, size - margin), fill=255)
    return (np.asarray(img, np.float32) / 255.0)[..., None]


def stamp_edge_mask(res: int, margin: int = STAMP_EDGE_MARGIN) -> np.ndarray:
    """(res, res, 1) mask that cuts a `margin`-px border off the stamp so
    bilinear edge bleed never lands in the texture (manager.py:42-45)."""
    m = np.zeros((res, res, 1), np.float32)
    m[margin : res - margin, margin : res - margin] = 1.0
    return m


class TexturePainter:
    """Holds one mesh + one live texture and paints stamps onto it."""

    def __init__(self, model: ConditionalInpainterBase, mesh: Mesh,
                 texture_width: int = 1024, texture: np.ndarray | None = None,
                 flip_normals: bool = False, undo_depth: int = 10,
                 savedir: str | None = None):
        self.model = model
        self.mesh = mesh
        self.texture_width = int(texture_width)
        # dynamic texture: RGBA float32; alpha tracks painted coverage
        if texture is None:
            texture = checkerboard(self.texture_width)
            texture[..., 3] = 0.0  # nothing painted yet
        self.texture = texture.astype(np.float32)
        self.flip_normals = flip_normals
        self.model_settings = dict(DEFAULT_MODEL_SETTINGS)
        self.mode = BrushMode.INPAINT
        self.undo_stack: deque[np.ndarray] = deque(maxlen=undo_depth)
        self.savedir = savedir
        # stamp camera distance: 5% of largest bbox dim (manager.py:185-186)
        self.fov_distance = 0.05 * mesh.bbox_max_dim()

    # --- camera ---

    def make_camera(self, hit: np.ndarray, normal: np.ndarray,
                    prev_point: np.ndarray | None, radius: float) -> OrthoCamera:
        """Orthographic camera at the brush tip: eye = hit + normal,
        up = previous stroke point - hit so the stamp is oriented along
        the stroke (reference manager.py:199-227)."""
        hit = np.asarray(hit, np.float32)
        normal = np.asarray(normal, np.float32)
        normal = normal / max(np.linalg.norm(normal), 1e-12)
        if prev_point is None:
            up = np.array([0.0, 1.0, 0.0], np.float32)
        else:
            up = np.asarray(prev_point, np.float32) - hit
            n = np.linalg.norm(up)
            up = up / n if n > 1e-8 else np.array([0.0, 1.0, 0.0], np.float32)
        res = self.model.resolution()
        return OrthoCamera(eye=hit + normal * self.fov_distance, at=hit,
                           up=up, half_width=float(radius),
                           height=res, width=res)

    # --- painting ---

    def begin_stroke(self):
        self.undo_stack.append(self.texture.copy())

    def undo(self) -> bool:
        if not self.undo_stack:
            return False
        self.texture = self.undo_stack.pop()
        return True

    def stamp(self, hit, normal, prev_point=None, radius: float | None = None):
        """One brush stamp: render view -> mode preprocessing -> inpaint ->
        back-project -> masked texture update (reference manager.py:232-273).
        """
        radius = radius if radius is not None else self.fov_distance
        camera = self.make_camera(hit, normal, prev_point, radius)
        res = render_view(camera, self.mesh, texture=self.texture,
                          flip_normals=self.flip_normals)
        canvas = np.asarray(res["render"], np.float32)

        if self.mode == BrushMode.ERASE:
            # Erase paints all-white with a circle stamp mask; the texture
            # under the stamp is CLEARED back to unpainted (reference
            # manager.py:246-250, 267-270: texture = ~update_mask * texture).
            result = np.ones_like(canvas[..., :3])
            edge = circle_mask(canvas.shape[0])
        else:
            if self.mode == BrushMode.OVERPAINT:
                margin = max(1, int(OVERPAINT_MARGIN_FRAC * canvas.shape[0]))
                canvas = overpaint_canvas(canvas, margin)
            result = self.model.generate(canvas, **self.model_settings)
            edge = stamp_edge_mask(canvas.shape[0])

        painted = np.concatenate([result[..., :3], edge], axis=-1)

        update = backproject_texture(self.mesh, res["proj_mesh"],
                                     res["face_idx"], painted,
                                     self.texture_width)
        # reference manager.py:267: replace only nonzero-alpha texels
        mask = update[..., 3:4] > 0.0
        if self.mode == BrushMode.ERASE:
            self.texture = np.where(mask, 0.0, self.texture)
        else:
            upd = np.clip(update, None, 1.0)
            self.texture = np.where(mask, upd, self.texture)
        return update

    # --- baking ---

    def bake_texture(self, path: str) -> str:
        """Save the live texture as npy + png (reference manager.py:281-301
        + util/async_save.py)."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.save(path + ".npy", self.texture)
        try:
            from PIL import Image

            img = (np.clip(self.texture, 0, 1) * 255).astype(np.uint8)
            Image.fromarray(img, mode="RGBA").save(path + ".png")
            return path + ".png"
        except Exception as e:  # pragma: no cover
            logger.warning("png save failed (%s); npy written", e)
            return path + ".npy"
