"""Headless stamp rendering + UV back-projection.

Re-implements the reference client's 3D math
(kit_app/.../util/render.py:22-178) on the pure-JAX rasterizer
(ops/raster.py) instead of kaolin CUDA: orthographic projection of the
mesh around the brush tip, texture-mapped RGBA stamp render, and inverse
rasterization in UV space to write the generated stamp back into the
texture image.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..ops.raster import face_normals, rasterize, texture_mapping


@dataclass
class Mesh:
    """Minimal triangle mesh with per-face UVs."""

    vertices: np.ndarray  # (V, 3) float32
    faces: np.ndarray  # (F, 3) int32
    face_uvs: np.ndarray  # (F, 3, 2) float32 in [0, 1]

    @property
    def num_faces(self):
        return self.faces.shape[0]

    def bbox_diag(self) -> float:
        lo = self.vertices.min(axis=0)
        hi = self.vertices.max(axis=0)
        return float(np.linalg.norm(hi - lo))

    def bbox_max_dim(self) -> float:
        lo = self.vertices.min(axis=0)
        hi = self.vertices.max(axis=0)
        return float((hi - lo).max())


@dataclass
class OrthoCamera:
    """Orthographic camera looking from `eye` toward `at`, with view
    half-width `half_width` (the reference's fov_distance, manager.py:
    199-227: eye = hit + normal, up = previous stroke point - hit)."""

    eye: np.ndarray
    at: np.ndarray
    up: np.ndarray
    half_width: float
    height: int = 256
    width: int = 256

    def basis(self):
        z = self.eye - self.at
        z = z / max(np.linalg.norm(z), 1e-12)
        up = self.up
        up = up - z * float(np.dot(up, z))
        n = np.linalg.norm(up)
        if n < 1e-8:  # degenerate up: pick any perpendicular
            up = np.cross(z, np.array([1.0, 0.0, 0.0], np.float32))
            if np.linalg.norm(up) < 1e-8:
                up = np.cross(z, np.array([0.0, 1.0, 0.0], np.float32))
            n = np.linalg.norm(up)
        y = up / n
        x = np.cross(y, z)
        return np.stack([x, y, z], axis=0).astype(np.float32)  # rows = axes


def projected_mesh_attributes(mesh: Mesh, camera: OrthoCamera,
                              flip_normals: bool = False):
    """Camera-space face vertices, NDC image coords, unit face normals
    (reference render.py:22-30)."""
    R = camera.basis()
    verts_cam = (mesh.vertices - camera.eye[None, :]) @ R.T  # (V, 3)
    fv_cam = verts_cam[mesh.faces]  # (F, 3, 3)
    # NDC: x right, y DOWN (screen rows). Camera y is "up", so negate.
    ndc_x = fv_cam[..., 0] / camera.half_width
    ndc_y = -fv_cam[..., 1] / camera.half_width
    fv_img = np.stack([ndc_x, ndc_y], axis=-1).astype(np.float32)
    normals = np.asarray(face_normals(jnp.asarray(fv_cam)))
    if flip_normals:
        normals = -normals
    # camera looks along -z: facing faces have normal_z toward camera (+z)
    return {
        "face_vertices_camera": fv_cam.astype(np.float32),
        "face_vertices_image": fv_img,
        "face_normals": normals.astype(np.float32),
    }


def _norm_cam_z(face_vertices_camera):
    z = face_vertices_camera[..., 2]
    z = z - z.min()
    m = z.max()
    return (z / (m if m > 1e-4 else 1.0)).astype(np.float32)


def render_view(camera: OrthoCamera, mesh: Mesh, texture=None,
                partial_result=None, flip_normals: bool = False):
    """RGBA stamp render of the mesh around the brush tip (reference
    render.py:44-111). Returns dict with render (4, H, W layout? -> we use
    (H, W, 4)), face_idx, render_uvs, alpha."""
    res = partial_result if partial_result is not None else {"cam": camera}
    if "proj_mesh" not in res:
        res["proj_mesh"] = projected_mesh_attributes(mesh, camera,
                                                     flip_normals=flip_normals)
    pm = res["proj_mesh"]
    if "face_idx" not in res:
        nz = _norm_cam_z(pm["face_vertices_camera"])[..., None]  # (F, 3, 1)
        feats = np.concatenate([mesh.face_uvs.astype(np.float32), nz], axis=-1)
        valid = pm["face_normals"][:, 2] >= 0.0
        # depth: camera looks along -z, so closer = larger z
        img_feats, face_idx = rasterize(
            camera.height, camera.width,
            jnp.asarray(feats),
            jnp.asarray(pm["face_vertices_camera"][..., 2]),
            jnp.asarray(pm["face_vertices_image"]),
            jnp.asarray(valid))
        res["face_idx"] = np.asarray(face_idx)
        res["render_uvs"] = np.asarray(img_feats[..., :2])
        res["alpha"] = (res["face_idx"] != -1).astype(np.float32)

    if texture is not None:
        tex = jnp.asarray(texture, jnp.float32)
        render = np.array(texture_mapping(jnp.asarray(res["render_uvs"]), tex))
        # alpha-mask off-mesh pixels
        if render.shape[-1] == 4:
            render[..., 3] *= res["alpha"]
        res["render"] = render
    else:
        res["render"] = np.concatenate(
            [np.zeros(res["alpha"].shape + (3,), np.float32),
             res["alpha"][..., None]], axis=-1)
    return res


def get_valid_faces(face_normals_arr, face_idx):
    """Faces that contribute meaningfully to the render: visible in the
    rasterization AND facing the camera with normal_z >= 0.5 (reference
    render.py:113-130)."""
    visible = np.zeros(face_normals_arr.shape[0], dtype=bool)
    hits = face_idx[face_idx >= 0]
    if hits.size:
        uniq, counts = np.unique(hits, return_counts=True)
        visible[uniq[counts >= 1]] = True
    return np.logical_and(face_normals_arr[:, 2] >= 0.5, visible)


def backproject_texture(mesh: Mesh, proj_mesh, face_idx, in_render,
                        texture_width: int):
    """Write the stamp back into UV space by rasterizing the mesh *in UV
    coordinates* with screen positions as features, then sampling the
    stamp there (reference render.py:133-178).

    Args:
        in_render: (H, W, 3 or 4) stamp image (alpha multiplied by render
            visibility if present).
    Returns:
        (texture_width, texture_width, 4) RGBA texture update.
    """
    valid = get_valid_faces(proj_mesh["face_normals"], face_idx)
    if valid.sum() == 0:
        return np.zeros((texture_width, texture_width, 4), np.float32)

    # features = screen positions in [0,1] (y down, matching our NDC)
    screen_pos = proj_mesh["face_vertices_image"] / 2.0 + 0.5  # (F, 3, 2)
    # rasterize in UV space: uv in [0,1] -> NDC [-1,1]; v maps to rows
    uv_ndc = mesh.face_uvs.astype(np.float32) * 2.0 - 1.0

    tex_feats, tex_face_idx = rasterize(
        texture_width, texture_width,
        jnp.asarray(screen_pos.astype(np.float32)),
        jnp.zeros(mesh.face_uvs.shape[:2], jnp.float32),
        jnp.asarray(uv_ndc),
        jnp.asarray(valid))
    tex_feats = np.asarray(tex_feats)
    tex_hit = (np.asarray(tex_face_idx) != -1).astype(np.float32)

    alpha = (face_idx != -1).astype(np.float32)
    if in_render.shape[-1] == 3:
        stamp = np.concatenate([in_render, alpha[..., None]], axis=-1)
    else:
        stamp = np.concatenate(
            [in_render[..., :3], in_render[..., 3:4] * alpha[..., None]], axis=-1)

    tex = np.array(texture_mapping(jnp.asarray(tex_feats),
                                   jnp.asarray(stamp, jnp.float32)))
    tex[..., 3] *= tex_hit
    return tex.astype(np.float32)
