"""Camera matrices with the reference's exact conventions.

Parity: Plain/src/Runtime/Rendering/Camera.{h,cpp} and the TAA jitter path
(TAA.cpp:168-179, RenderFrontend.cpp:423-454).

Conventions (kept identical so .plain scenes and camera paths match):
  - world is y-down (default extrinsic up = (0,-1,0), Camera.h:4-9);
  - view matrix rows are (right, up, -forward), then translate by -position;
  - projection = Vulkan/reverse-Z correction @ GL-style perspective
    (Camera.cpp:14-27): NDC y flipped, depth mapped to [0,1] with near->1,
    far->0 (reverse-Z; all depth tests are GreaterEqual);
  - matrices are (4,4) row-major, applied as ``M @ v`` to column vectors.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class CameraExtrinsic:
    """Camera.h:4-9."""

    position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.0, -1.0, -5.0], np.float32))
    forward: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.0, 0.0, -1.0], np.float32))
    right: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([1.0, 0.0, 0.0], np.float32))
    up: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.0, -1.0, 0.0], np.float32))


@dataclasses.dataclass
class CameraIntrinsic:
    """Camera.h:11-16. fov is vertical, degrees."""

    fov: float = 35.0
    aspect_ratio: float = 1.0
    near: float = 0.1
    far: float = 300.0


@dataclasses.dataclass
class Camera:
    extrinsic: CameraExtrinsic = dataclasses.field(default_factory=CameraExtrinsic)
    intrinsic: CameraIntrinsic = dataclasses.field(default_factory=CameraIntrinsic)


def view_matrix_from_extrinsic(position, forward, right, up):
    """Camera.cpp:4-13 — rows (right, up, -forward) * translate(-position)."""
    position = jnp.asarray(position, jnp.float32)
    r = jnp.asarray(right, jnp.float32)
    u = jnp.asarray(up, jnp.float32)
    f = jnp.asarray(forward, jnp.float32)
    rot = jnp.stack([r, u, -f], axis=0)  # (3,3) rows
    trans = -rot @ position
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, :3].set(rot)
    m = m.at[:3, 3].set(trans)
    return m


def projection_matrix_from_intrinsic(fov_deg: float, aspect: float, near: float,
                                     far: float):
    """Camera.cpp:15-27 — GL perspective + Vulkan/reverse-Z correction.

    Depth: near plane -> 1, far plane -> 0 (reverse-Z). NDC y points down on
    screen (Vulkan convention: y flipped vs GL).
    """
    tan_half = jnp.tan(jnp.deg2rad(jnp.asarray(fov_deg, jnp.float32)) * 0.5)
    p = jnp.zeros((4, 4), jnp.float32)
    p = p.at[0, 0].set(1.0 / (aspect * tan_half))
    p = p.at[1, 1].set(1.0 / tan_half)
    p = p.at[2, 2].set(-(far + near) / (far - near))
    p = p.at[2, 3].set(-(2.0 * far * near) / (far - near))
    p = p.at[3, 2].set(-1.0)
    correction = jnp.asarray(
        [
            [1.0, 0.0, 0.0, 0.0],
            [0.0, -1.0, 0.0, 0.0],
            [0.0, 0.0, -0.5, 0.5],
            [0.0, 0.0, 0.0, 1.0],
        ],
        jnp.float32,
    )
    return correction @ p


def apply_projection_jitter(projection, jitter_ndc):
    """TAA.cpp:172-179 — write jitter into column 2 of rows 0/1.

    jitter_ndc is the per-frame camera jitter in NDC units (jitter-in-pixels
    scaled by 1/resolution, RenderFrontend.cpp:433-440).
    """
    projection = jnp.asarray(projection)
    return projection.at[0, 2].set(jitter_ndc[0]).at[1, 2].set(jitter_ndc[1])


def view_projection(camera: Camera, jitter_ndc=None):
    """RenderFrontend.cpp:423-454 — (jittered) projection @ view."""
    e, i = camera.extrinsic, camera.intrinsic
    view = view_matrix_from_extrinsic(e.position, e.forward, e.right, e.up)
    proj = projection_matrix_from_intrinsic(i.fov, i.aspect_ratio, i.near, i.far)
    if jitter_ndc is not None:
        proj = apply_projection_jitter(proj, jitter_ndc)
    return proj @ view


def look_at(eye, center, up):
    """glm::lookAt (RH) — used by the shadow-frustum fit (ViewFrustum.cpp:258)."""
    eye = jnp.asarray(eye, jnp.float32)
    center = jnp.asarray(center, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    f = center - eye
    f = f / jnp.linalg.norm(f)
    s = jnp.cross(f, up)
    s = s / jnp.linalg.norm(s)
    u = jnp.cross(s, f)
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[0, :3].set(s)
    m = m.at[1, :3].set(u)
    m = m.at[2, :3].set(-f)
    m = m.at[0, 3].set(-jnp.dot(s, eye))
    m = m.at[1, 3].set(-jnp.dot(u, eye))
    m = m.at[2, 3].set(jnp.dot(f, eye))
    return m


def extrinsic_from_angles(position, pitch_deg: float, yaw_deg: float) -> CameraExtrinsic:
    """CameraController.cpp:9-56 — fly-camera forward/right/up from pitch/yaw.

    Mirrors the controller's spherical parameterization in the y-down world.
    """
    pitch = np.deg2rad(pitch_deg)
    yaw = np.deg2rad(yaw_deg)
    forward = np.array(
        [np.cos(pitch) * np.cos(yaw), np.sin(pitch), np.cos(pitch) * np.sin(yaw)],
        np.float32,
    )
    forward /= np.linalg.norm(forward)
    world_up = np.array([0.0, -1.0, 0.0], np.float32)
    right = np.cross(world_up, forward)
    nrm = np.linalg.norm(right)
    if nrm < 1e-6:
        right = np.array([1.0, 0.0, 0.0], np.float32)
    else:
        right /= nrm
    up = np.cross(forward, right)
    up /= np.linalg.norm(up)
    return CameraExtrinsic(
        position=np.asarray(position, np.float32), forward=forward, right=right, up=up
    )
