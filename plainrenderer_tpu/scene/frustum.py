"""View frustums and AABB-vs-frustum culling.

Parity: Plain/src/Runtime/Rendering/ViewFrustum.cpp (camera frustum from
extrinsic/intrinsic, light-fitted ortho frustum) and Culling.cpp:5-41
(8-corner halfspace test). Frustums are stored as a (8, 3) point array plus a
(6, 3) normal / (6, 3) plane-point array pair; culling is vectorized over an
(N,) object list so it can run inside the jitted frame.

Point order (matches getFrustumPoints, ViewFrustum.cpp:231-242):
  0 l_l_f, 1 l_l_n, 2 r_l_f, 3 r_l_n, 4 l_u_f, 5 l_u_n, 6 r_u_f, 7 r_u_n
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .camera import Camera, look_at

# indices into the 8-point array
L_L_F, L_L_N, R_L_F, R_L_N, L_U_F, L_U_N, R_U_F, R_U_N = range(8)


@dataclasses.dataclass
class ViewFrustum:
    points: jnp.ndarray  # (8, 3)
    plane_points: jnp.ndarray  # (6, 3) a point on each plane
    plane_normals: jnp.ndarray  # (6, 3) outward normals


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def _normals_from_points(p):
    """ViewFrustum.cpp:39-52 — six outward plane normals from the 8 corners."""
    top = _normalize(jnp.cross(p[R_U_F] - p[R_U_N], p[R_U_N] - p[L_U_N]))
    bot = _normalize(jnp.cross(p[R_L_N] - p[L_L_N], p[R_L_F] - p[R_L_N]))
    right = _normalize(jnp.cross(p[R_U_N] - p[R_L_N], p[R_L_F] - p[R_L_N]))
    left = _normalize(jnp.cross(p[L_L_F] - p[L_L_N], p[L_U_N] - p[L_L_N]))
    near = _normalize(jnp.cross(p[R_U_N] - p[R_L_N], p[R_L_N] - p[L_L_N]))
    far = _normalize(jnp.cross(p[R_L_F] - p[L_L_F], p[R_U_F] - p[R_L_F]))
    return jnp.stack([top, bot, near, far, left, right], axis=0)


def _plane_points(p):
    """Culling.cpp:17-24 — the reference's chosen on-plane points, same order
    as _normals_from_points: top, bot, near, far, left, right."""
    return jnp.stack(
        [p[L_U_F], p[L_L_F], p[L_U_N], p[L_U_F], p[L_U_F], p[R_U_F]], axis=0
    )


def _frustum_from_points(points):
    return ViewFrustum(
        points=points,
        plane_points=_plane_points(points),
        plane_normals=_normals_from_points(points),
    )


def compute_view_frustum(camera: Camera) -> ViewFrustum:
    """ViewFrustum.cpp:4-37."""
    e, i = camera.extrinsic, camera.intrinsic
    pos = jnp.asarray(e.position, jnp.float32)
    fwd = jnp.asarray(e.forward, jnp.float32)
    up = jnp.asarray(e.up, jnp.float32)
    right = jnp.asarray(e.right, jnp.float32)

    near_c = pos + fwd * i.near
    far_c = pos + fwd * i.far
    tan_fov = jnp.tan(jnp.deg2rad(jnp.asarray(i.fov, jnp.float32)) * 0.5)
    h_near, h_far = tan_fov * i.near, tan_fov * i.far
    w_near, w_far = h_near * i.aspect_ratio, h_far * i.aspect_ratio

    pts = [None] * 8
    pts[R_U_F] = far_c + up * h_far + right * w_far
    pts[L_U_F] = far_c + up * h_far - right * w_far
    pts[R_L_F] = far_c - up * h_far + right * w_far
    pts[L_L_F] = far_c - up * h_far - right * w_far
    pts[R_U_N] = near_c + up * h_near + right * w_near
    pts[L_U_N] = near_c + up * h_near - right * w_near
    pts[R_L_N] = near_c - up * h_near + right * w_near
    pts[L_L_N] = near_c - up * h_near - right * w_near
    return _frustum_from_points(jnp.stack(pts, axis=0))


def compute_ortho_frustum_fitted_to_camera(camera_frustum: ViewFrustum,
                                           light_direction) -> ViewFrustum:
    """ViewFrustum.cpp:244-283 — light-space AABB fit around the camera frustum.

    Used for the whole-scene sun shadow frustum (the per-cascade tightening is
    done on-device by the lightMatrix pass, ops/shadow.py).
    """
    light_direction = jnp.asarray(light_direction, jnp.float32)
    up = jnp.where(
        jnp.abs(light_direction[1]) < 0.999,
        jnp.asarray([0.0, -1.0, 0.0], jnp.float32),
        jnp.asarray([0.0, 0.0, -1.0], jnp.float32),
    )
    v = look_at(-light_direction, jnp.zeros(3, jnp.float32), up)
    pts_h = jnp.concatenate(
        [camera_frustum.points, jnp.ones((8, 1), jnp.float32)], axis=1
    )
    transformed = (v @ pts_h.T).T[:, :3]
    min_p = transformed.min(axis=0)
    max_p = transformed.max(axis=0)
    scale = 2.0 / (max_p - min_p)
    offset = -0.5 * (max_p + min_p) * scale
    clip = jnp.eye(4, dtype=jnp.float32)
    clip = clip.at[0, 0].set(scale[0]).at[1, 1].set(scale[1]).at[2, 2].set(scale[2])
    clip = clip.at[:3, 3].set(offset)
    clip_to_world = jnp.linalg.inv(clip @ v)

    ndc = jnp.asarray(
        [
            [-1, -1, -1], [1, -1, -1], [-1, 1, -1], [1, 1, -1],
            [-1, -1, 1], [1, -1, 1], [-1, 1, 1], [1, 1, 1],
        ],
        jnp.float32,
    )
    # ViewFrustum.cpp:272-279 order: l_l_n, r_l_n, l_u_n, r_u_n, l_l_f, ...
    ndc_h = jnp.concatenate([ndc, jnp.ones((8, 1), jnp.float32)], axis=1)
    world = (clip_to_world @ ndc_h.T).T
    world = world[:, :3] / world[:, 3:4]
    pts = [None] * 8
    pts[L_L_N], pts[R_L_N], pts[L_U_N], pts[R_U_N] = world[0], world[1], world[2], world[3]
    pts[L_L_F], pts[R_L_F], pts[L_U_F], pts[R_U_F] = world[4], world[5], world[6], world[7]
    return _frustum_from_points(jnp.stack(pts, axis=0))


def visible_objects_clipspace(view_proj, bb_min, bb_max, cull_z: bool = True):
    """Conservative per-object culling against an arbitrary view-projection.

    Same role as the reference's CPU frustum cull (RenderFrontend.cpp:565-587
    + Culling.cpp:5-41) but expressed in clip space so it covers the main
    camera, split-frame band sub-frusta, and ortho cascade matrices with one
    code path inside jit. An AABB is culled iff all 8 corners are outside the
    same clip half-space (|x|>w, |y|>w, z<0 or z>w with reverse-Z Vulkan
    conventions); conservative exactly like the 8-corner plane-sign test.

    bb_min/bb_max: (N, 3). Returns (N,) bool.
    """
    from .aabb import aabb_corners

    corners = aabb_corners(bb_min, bb_max)  # (N, 8, 3)
    flat = corners.reshape(-1, 3)
    clip = flat @ view_proj[:3, :3].T + view_proj[:3, 3]
    w = flat @ view_proj[3, :3] + view_proj[3, 3]
    clip = clip.reshape(corners.shape[0], 8, 3)
    w = w.reshape(corners.shape[0], 8)
    out_l = jnp.all(clip[..., 0] < -w, axis=1)
    out_r = jnp.all(clip[..., 0] > w, axis=1)
    out_t = jnp.all(clip[..., 1] < -w, axis=1)
    out_b = jnp.all(clip[..., 1] > w, axis=1)
    outside = out_l | out_r | out_t | out_b
    if cull_z:
        # cull_z=False for shadow cascades: depth clamping keeps casters
        # outside the fitted z-range relevant (lightMatrix.comp semantics)
        out_n = jnp.all(clip[..., 2] < 0.0, axis=1)
        out_f = jnp.all(clip[..., 2] > w, axis=1)
        outside = outside | out_n | out_f
    return ~outside


def expand_object_mask(obj_mask, tri_starts, t_count: int):
    """Per-object mask (O,) bool -> per-triangle mask (T,) bool.

    Triangles are stored object-contiguous (scenebuild flattening), so the
    owner of triangle j is non-decreasing and the expansion is a scatter of
    per-object DELTAS at each object's first-triangle index + one cumsum —
    the same fill-forward trick as ops/raster._fill_forward. Replaces
    `obj_mask[tri_object]`: XLA's generic gather measured ~3.5-5 ms per call
    at 75k triangles on v5e (4 calls/frame: main view + 3 cascades); this is
    one T-length cumsum. Padding triangles (past tri_starts' range) inherit
    the last object's value; they are degenerate and culled by area anyway.

    tri_starts: (O,) i32 device array of first-triangle indices.
    """
    from ..ops.scanlib import exact_cumsum

    vals = obj_mask.astype(jnp.int32)
    deltas = jnp.diff(vals, prepend=0)
    acc = jnp.zeros((t_count,), jnp.int32).at[tri_starts].add(
        deltas, mode="drop")
    return exact_cumsum(acc) > 0


def aabb_intersects_frustum(frustum: ViewFrustum, bb_min, bb_max):
    """Culling.cpp:5-41 vectorized: (N, 3) AABBs -> (N,) bool visibility.

    An AABB is culled iff all 8 of its corners are strictly outside any one
    plane (sign of dot(corner - plane_point, normal) > 0), matching the
    reference's conservative test exactly.
    """
    from .aabb import aabb_corners

    corners = aabb_corners(bb_min, bb_max)  # (N, 8, 3)
    # diff: (N, 6planes, 8corners, 3)
    diff = corners[:, None, :, :] - frustum.plane_points[None, :, None, :]
    signs = jnp.sign(jnp.einsum("npkj,pj->npk", diff, frustum.plane_normals))
    outside_plane = jnp.all(signs > 0, axis=2)  # (N, 6)
    return ~jnp.any(outside_plane, axis=1)
