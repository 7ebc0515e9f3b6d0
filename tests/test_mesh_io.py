"""OBJ loader tests: round-trip, quads triangulated, negative indices."""

import numpy as np

from diffusiontexturepainting_tpu.client.mesh_io import load_obj, make_unit_quad, save_obj


def test_obj_roundtrip(tmp_path):
    mesh = make_unit_quad(2.0)
    path = str(tmp_path / "quad.obj")
    save_obj(path, mesh)
    loaded = load_obj(path)
    np.testing.assert_allclose(loaded.vertices, mesh.vertices, atol=1e-6)
    np.testing.assert_array_equal(loaded.faces, mesh.faces)
    np.testing.assert_allclose(loaded.face_uvs, mesh.face_uvs, atol=1e-6)


def test_obj_quad_triangulation(tmp_path):
    path = tmp_path / "q.obj"
    path.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f 1/1 2/2 3/3 4/4\n")
    mesh = load_obj(str(path))
    assert mesh.faces.shape == (2, 3)  # quad -> 2 triangles
    np.testing.assert_array_equal(mesh.faces, [[0, 1, 2], [0, 2, 3]])
    # flip_v: vt 0 0 -> v' = 1
    np.testing.assert_allclose(mesh.face_uvs[0, 0], [0.0, 1.0])


def test_obj_negative_indices(tmp_path):
    path = tmp_path / "n.obj"
    path.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "f -3 -2 -1\n")
    mesh = load_obj(str(path))
    np.testing.assert_array_equal(mesh.faces, [[0, 1, 2]])


def test_obj_paintable_end_to_end(tmp_path):
    """Loaded OBJ drives the painter."""
    from diffusiontexturepainting_tpu.client.mock_model import (
        MockConditionalInpainter)
    from diffusiontexturepainting_tpu.client.painter import TexturePainter

    mesh = make_unit_quad()
    path = str(tmp_path / "m.obj")
    save_obj(path, mesh)
    loaded = load_obj(path)
    model = MockConditionalInpainter(32)
    model.set_brush(np.full((32, 32, 3), 0.3, np.float32))
    painter = TexturePainter(model, loaded, texture_width=32)
    painter.stamp(hit=np.zeros(3), normal=np.array([0, 0, 1.0]), radius=0.8)
    assert (painter.texture[..., 3] > 0).any()
