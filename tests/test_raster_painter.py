"""Rasterizer + headless painter tests.

The analog of the reference's Kit integration test (tests/tests.py:19-54:
create stage, paint onto a primitive with the mock model, bake, assert the
texture is written) - but fully headless on the JAX rasterizer.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from diffusiontexturepainting_tpu.client.brush import BrushStroke
from diffusiontexturepainting_tpu.client.mock_model import MockConditionalInpainter
from diffusiontexturepainting_tpu.client.painter import BrushMode, TexturePainter
from diffusiontexturepainting_tpu.client.render import (
    Mesh,
    OrthoCamera,
    backproject_texture,
    projected_mesh_attributes,
    render_view,
)
from diffusiontexturepainting_tpu.ops.raster import rasterize, texture_mapping
from diffusiontexturepainting_tpu.utils.textures import checkerboard


def quad_mesh(size=1.0):
    """Unit quad in the XY plane at z=0, facing +z, full UV coverage."""
    v = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                 np.float32) * size
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    # UVs: u = x, v = 1 - y (texture row 0 = top = +y)
    uv = np.array([[[0, 1], [1, 1], [1, 0]],
                   [[0, 1], [1, 0], [0, 0]]], np.float32)
    return Mesh(v, f, uv)


def test_rasterize_fullscreen_triangle():
    # one big triangle covering the viewport
    fvi = jnp.asarray([[[-3, -3], [3, -3], [0, 3]]], jnp.float32)
    fz = jnp.zeros((1, 3), jnp.float32)
    feats = jnp.asarray([[[1.0], [1.0], [1.0]]], jnp.float32)
    out, idx = rasterize(16, 16, feats, fz, fvi)
    assert (np.asarray(idx) == 0).all()
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


def test_rasterize_depth_order():
    """Closer face (larger camera z) must win the z-buffer."""
    fvi = jnp.asarray([[[-3, -3], [3, -3], [0, 3]],
                       [[-3, -3], [3, -3], [0, 3]]], jnp.float32)
    fz = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]], jnp.float32)
    feats = jnp.asarray([[[5.0]] * 3, [[9.0]] * 3], jnp.float32)
    out, idx = rasterize(8, 8, feats, fz, fvi)
    assert (np.asarray(idx) == 1).all()
    np.testing.assert_allclose(np.asarray(out), 9.0, atol=1e-5)


def test_rasterize_valid_faces_mask():
    fvi = jnp.asarray([[[-3, -3], [3, -3], [0, 3]]], jnp.float32)
    fz = jnp.zeros((1, 3), jnp.float32)
    feats = jnp.ones((1, 3, 1), jnp.float32)
    _, idx = rasterize(8, 8, feats, fz, fvi, jnp.asarray([False]))
    assert (np.asarray(idx) == -1).all()


def test_texture_mapping_corners():
    tex = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4, 1))
    uv = jnp.asarray([[[0.0, 0.0], [1.0, 0.0]], [[0.0, 1.0], [1.0, 1.0]]])
    out = np.asarray(texture_mapping(uv, tex))[..., 0]
    np.testing.assert_allclose(out, [[0, 3], [12, 15]], atol=1e-5)


def test_render_view_quad():
    mesh = quad_mesh()
    tex = checkerboard(64, cell=16)
    cam = OrthoCamera(eye=np.array([0, 0, 1.0], np.float32),
                      at=np.zeros(3, np.float32),
                      up=np.array([0, 1, 0], np.float32),
                      half_width=1.0, height=32, width=32)
    res = render_view(cam, mesh, texture=tex)
    assert res["render"].shape == (32, 32, 4)
    assert res["alpha"].mean() > 0.95  # quad covers the whole view
    # camera up = +y; texture row 0 (top) must appear at image row 0
    assert res["render_uvs"][0, 0, 1] < 0.2


def test_backface_culling():
    mesh = quad_mesh()
    cam = OrthoCamera(eye=np.array([0, 0, -1.0], np.float32),  # behind
                      at=np.zeros(3, np.float32),
                      up=np.array([0, 1, 0], np.float32),
                      half_width=1.0, height=16, width=16)
    res = render_view(cam, mesh)
    assert res["alpha"].sum() == 0.0  # all faces culled


def test_backprojection_roundtrip():
    """Painting a constant-color stamp over the whole quad must fill the
    texture's painted alpha over (nearly) the full UV square."""
    mesh = quad_mesh()
    cam = OrthoCamera(eye=np.array([0, 0, 1.0], np.float32),
                      at=np.zeros(3, np.float32),
                      up=np.array([0, 1, 0], np.float32),
                      half_width=1.1, height=64, width=64)
    res = render_view(cam, mesh, texture=checkerboard(64))
    stamp = np.full((64, 64, 3), 0.25, np.float32)
    update = backproject_texture(mesh, res["proj_mesh"], res["face_idx"],
                                 stamp, texture_width=64)
    assert update.shape == (64, 64, 4)
    painted = update[..., 3] > 0.5
    assert painted.mean() > 0.9
    np.testing.assert_allclose(update[..., :3][painted], 0.25, atol=0.02)


def test_painter_stamp_and_bake(tmp_path):
    model = MockConditionalInpainter(64)
    model.set_brush(np.full((64, 64, 3), 0.6, np.float32))
    mesh = quad_mesh()
    painter = TexturePainter(model, mesh, texture_width=64)
    painter.model_settings["steps"] = 2

    painter.begin_stroke()
    update = painter.stamp(hit=np.zeros(3), normal=np.array([0, 0, 1.0]),
                           radius=0.8)
    assert (painter.texture[..., 3] > 0).any()
    painted = painter.texture[..., 3] > 0.5
    np.testing.assert_allclose(painter.texture[..., :3][painted], 0.6, atol=0.05)

    # undo restores the pristine texture
    assert painter.undo()
    assert (painter.texture[..., 3] == 0).all()

    painter.stamp(hit=np.zeros(3), normal=np.array([0, 0, 1.0]), radius=0.8)
    out = painter.bake_texture(str(tmp_path / "baked"))
    import os

    assert os.path.exists(out)
    assert os.path.exists(str(tmp_path / "baked") + ".npy")


def test_brush_stroke_interpolation():
    model = MockConditionalInpainter(32)
    model.set_brush(np.full((32, 32, 3), 0.5, np.float32))
    mesh = quad_mesh(size=2.0)
    painter = TexturePainter(model, mesh, texture_width=32)
    painter.model_settings["steps"] = 1

    stroke = BrushStroke(painter, radius=0.5)
    assert stroke.begin([-1.5, 0, 0], [0, 0, 1.0]) == 1
    # move 1.0 world units -> 2 stamps at radius 0.5
    emitted = stroke.move([-0.5, 0, 0], [0, 0, 1.0])
    assert emitted == 2
    # tiny move below threshold -> no stamp
    assert stroke.move([-0.45, 0, 0], [0, 0, 1.0]) == 0
    stroke.end()


def test_brush_stroke_stamps_evenly_spaced():
    """Stamps land every step_dist along the segment (regression: stepping
    from the updated prev_point spaced them 1,3,6,... steps apart)."""
    model = MockConditionalInpainter(32)
    mesh = quad_mesh(size=8.0)
    painter = TexturePainter(model, mesh, texture_width=32)
    hits = []
    painter.stamp = lambda hit, normal, prev_point=None, radius=None: \
        hits.append(np.asarray(hit, np.float32))

    stroke = BrushStroke(painter, radius=0.5)
    stroke.begin([0, 0, 0], [0, 0, 1.0])
    emitted = stroke.move([2.0, 0, 0], [0, 0, 1.0])
    assert emitted == 4
    xs = [float(h[0]) for h in hits]
    np.testing.assert_allclose(xs, [0.0, 0.5, 1.0, 1.5, 2.0], atol=1e-6)


def test_erase_mode_clears_to_unpainted():
    """Erase uses a circle stamp mask and CLEARS the texture under it —
    erased texels revert to unpainted (reference manager.py:246-250,
    267-270: texture = ~update_mask * texture)."""
    model = MockConditionalInpainter(32)
    model.set_brush(np.full((32, 32, 3), 0.6, np.float32))
    mesh = quad_mesh()
    painter = TexturePainter(model, mesh, texture_width=32)
    painter.model_settings["steps"] = 1

    painter.stamp(hit=np.zeros(3), normal=np.array([0, 0, 1.0]), radius=0.8)
    assert (painter.texture[..., 3] > 0).mean() > 0.5  # painted

    painter.mode = BrushMode.ERASE
    painter.stamp(hit=np.zeros(3), normal=np.array([0, 0, 1.0]), radius=0.8)
    # circle interior is erased: alpha AND rgb back to 0 (unpainted)
    center = painter.texture[12:20, 12:20]
    np.testing.assert_allclose(center, 0.0, atol=1e-6)
    # corners of the square stamp lie outside the circle -> still painted
    assert (painter.texture[..., 3] > 0).any()


def test_erase_circle_mask_shape():
    from diffusiontexturepainting_tpu.client.painter import circle_mask

    m = circle_mask(32)
    assert m.shape == (32, 32, 1)
    assert m[16, 16, 0] == 1.0  # center inside
    assert m[0, 0, 0] == 0.0  # corner outside
