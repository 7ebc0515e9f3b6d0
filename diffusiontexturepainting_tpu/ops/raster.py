"""Pure-JAX triangle rasterizer + texture sampling.

TPU-native replacement for the kaolin CUDA rasterizer and
`texture_mapping` the reference client uses for stamp rendering and UV
back-projection (kit_app/.../util/render.py:76-83, 100, 156-176; N10 in
SURVEY.md section 2.4). Needed by the headless painting client and its
tests; stamp viewports are small (256^2) and meshes modest, so a dense
barycentric formulation (vectorized over pixels x faces, z-buffered with
a max-reduce) is simple, fully jittable, and fast enough on TPU/CPU.

Conventions (self-consistent across render and backprojection):
  - face_vertices_image: (F, 3, 2) NDC in [-1, 1], x right, y DOWN
    (pixel row 0 = y -1), matching image row-major order.
  - Rasterization is top-left-rule-free (inclusive edges) with
    perspective-free (orthographic) barycentrics.
  - face_idx = -1 where no face covers the pixel.
"""

from __future__ import annotations

import jax.numpy as jnp


def rasterize(height: int, width: int, face_features, face_vertices_z,
              face_vertices_image, valid_faces=None):
    """Z-buffered barycentric rasterization.

    Args:
        face_features: (F, 3, C) per-corner attributes to interpolate.
        face_vertices_z: (F, 3) camera-space depth (larger = closer).
        face_vertices_image: (F, 3, 2) NDC xy in [-1, 1] (y down).
        valid_faces: (F,) bool; False faces never rasterize.

    Returns:
        (features (H, W, C), face_idx (H, W) int32)
    """
    F = face_features.shape[0]
    # pixel centers in NDC
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2.0 - 1.0
    px = jnp.broadcast_to(xs[None, :], (height, width))
    py = jnp.broadcast_to(ys[:, None], (height, width))
    p = jnp.stack([px, py], axis=-1).reshape(-1, 2)  # (P, 2)

    v0 = face_vertices_image[:, 0]  # (F, 2)
    v1 = face_vertices_image[:, 1]
    v2 = face_vertices_image[:, 2]

    # barycentrics via edge functions: w_i proportional to signed areas
    def edge(a, b, pt):
        # (P, F): cross(b - a, pt - a)
        ab = b - a  # (F, 2)
        ap = pt[:, None, :] - a[None, :, :]  # (P, F, 2)
        return ab[None, :, 0] * ap[..., 1] - ab[None, :, 1] * ap[..., 0]

    w0 = edge(v1, v2, p)
    w1 = edge(v2, v0, p)
    w2 = edge(v0, v1, p)
    area = (v1 - v0)[:, 0] * (v2 - v0)[:, 1] - (v1 - v0)[:, 1] * (v2 - v0)[:, 0]
    area = jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)

    b0 = w0 / area[None, :]
    b1 = w1 / area[None, :]
    b2 = w2 / area[None, :]
    inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0)
    if valid_faces is not None:
        inside = inside & valid_faces[None, :]

    z = (b0 * face_vertices_z[None, :, 0] + b1 * face_vertices_z[None, :, 1]
         + b2 * face_vertices_z[None, :, 2])
    z = jnp.where(inside, z, -jnp.inf)

    face_idx = jnp.argmax(z, axis=1)  # (P,)
    hit = jnp.isfinite(jnp.max(z, axis=1))
    face_idx = jnp.where(hit, face_idx, -1)

    take = jnp.clip(face_idx, 0, F - 1)
    bary = jnp.stack([
        jnp.take_along_axis(b0, take[:, None], axis=1)[:, 0],
        jnp.take_along_axis(b1, take[:, None], axis=1)[:, 0],
        jnp.take_along_axis(b2, take[:, None], axis=1)[:, 0],
    ], axis=-1)  # (P, 3)
    feats = face_features[take]  # (P, 3, C)
    out = jnp.einsum("pk,pkc->pc", bary, feats)
    out = jnp.where(hit[:, None], out, 0.0)

    C = face_features.shape[-1]
    return out.reshape(height, width, C), face_idx.reshape(height, width).astype(jnp.int32)


def texture_mapping(uv, texture):
    """Bilinear texture sampling.

    Args:
        uv: (H, W, 2) coordinates in [0, 1], (0,0) = texture top-left
            (row 0), u = x/width, v = y/rows.
        texture: (Ht, Wt, C).

    Returns: (H, W, C) samples (edge-clamped).
    """
    th, tw = texture.shape[0], texture.shape[1]
    x = uv[..., 0] * (tw - 1)
    y = uv[..., 1] * (th - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, tw - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, th - 1)
    x1 = jnp.clip(x0 + 1, 0, tw - 1)
    y1 = jnp.clip(y0 + 1, 0, th - 1)
    fx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
    fy = jnp.clip(y - y0, 0.0, 1.0)[..., None]
    t00 = texture[y0, x0]
    t01 = texture[y0, x1]
    t10 = texture[y1, x0]
    t11 = texture[y1, x1]
    return ((t00 * (1 - fx) + t01 * fx) * (1 - fy)
            + (t10 * (1 - fx) + t11 * fx) * fy)


def face_normals(face_vertices, unit: bool = True):
    """(F, 3, 3) camera-space corners -> (F, 3) normals."""
    e1 = face_vertices[:, 1] - face_vertices[:, 0]
    e2 = face_vertices[:, 2] - face_vertices[:, 0]
    n = jnp.cross(e1, e2)
    if unit:
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return n
