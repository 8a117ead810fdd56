"""The per-frame pass graph as one jittable pure function.

Replaces RenderFrontend::prepareRenderpasses + RenderBackend::renderFrame
(RenderFrontend.cpp:313-406, RenderBackend.cpp:367-431): the ordered pass
list becomes SSA dataflow inside a single XLA program; barriers, descriptor
sets and the transient-image allocator dissolve into the compiler. Temporal
state (FrameState) is donated and stays in HBM; zero host round-trips per
frame.

Pass order mirrors the reference frame (SURVEY 3.2):
  histogram -> exposure -> sky LUT -> raster G-buffer -> [shadow cascades]
  -> [SDF GI] -> forward shade -> sky composite -> [volumetrics] -> [TAA]
  -> [bloom] -> tonemap.
Bracketed passes land in later milestones; the graph already threads their
state so adding them does not change the interface.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderSettings
from ..ops import exposure as exposure_ops
from ..ops import post, raster, shade, sky
from ..utils import mathutils, sampling
from .state import FrameState


def camera_arrays(position, forward, right, up):
    """Dynamic camera inputs as a dict of jnp arrays."""
    return {
        "position": jnp.asarray(position, jnp.float32),
        "forward": jnp.asarray(forward, jnp.float32),
        "right": jnp.asarray(right, jnp.float32),
        "up": jnp.asarray(up, jnp.float32),
    }


def _view_matrix(cam):
    rot = jnp.stack([cam["right"], cam["up"], -cam["forward"]], axis=0)
    trans = -rot @ cam["position"]
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[:3, :3].set(rot).at[:3, 3].set(trans)


FOV_DEG = 35.0  # CameraIntrinsic defaults (Camera.h:11-16)
NEAR_PLANE = 0.1
FAR_PLANE = 300.0


def _projection(settings: RenderSettings, fov=FOV_DEG, near=NEAR_PLANE,
                far=FAR_PLANE):
    """Camera.cpp:14-27 — GL perspective + Vulkan reverse-Z correction."""
    import math

    aspect = settings.width / settings.height
    tan_half = math.tan(math.radians(fov) * 0.5)
    p = np.zeros((4, 4), np.float32)
    p[0, 0] = 1.0 / (aspect * tan_half)
    p[1, 1] = 1.0 / tan_half
    p[2, 2] = -(far + near) / (far - near)
    p[2, 3] = -(2.0 * far * near) / (far - near)
    p[3, 2] = -1.0
    correction = np.asarray(
        [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -0.5, 0.5], [0, 0, 0, 1]],
        np.float32)
    return jnp.asarray(correction @ p)


_JITTER_TABLE = sampling.taa_jitter_sequence(8) * 2.0  # TAA.cpp:168-170


@functools.partial(
    jax.jit,
    static_argnames=("settings", "interpret"),
    donate_argnames=("state",),
)
def render_frame(
    state: FrameState,
    scene: dict,  # device arrays from scenebuild.RenderScene
    cam: dict,  # camera_arrays(...)
    luts: dict,  # {'transmission': (3,128,128), 'multiscatter': (3,32,32)}
    delta_time,
    settings: RenderSettings,
    interpret: bool = False,
):
    """One frame: (image_u8 (H, W, 3), FrameState')."""
    width, height = settings.width, settings.height
    pw, ph = raster.pad_resolution(width, height)
    nty, ntx = ph // raster.TILE_H, pw // raster.TILE_W

    sun_dir = mathutils.direction_to_vector(
        jnp.asarray(settings.sun_direction_angles, jnp.float32))
    # the reference's sunDirection points TOWARDS the sun in shading
    sun_dir = -sun_dir

    # --- exposure from the previous frame's color (SURVEY 3.2 passes 1+3) ---
    histogram = exposure_ops.compute_histogram(state.prev_color, state.exposure)
    new_exposure, sun_strength_exposed = exposure_ops.pre_expose_lights(
        histogram, state.exposure,
        jnp.asarray(settings.sun_illuminance, jnp.float32),
        jnp.asarray(settings.exposure_offset, jnp.float32),
        jnp.asarray(settings.exposure_adaption_speed, jnp.float32),
        delta_time, float(width * height),
    )
    sun_color = sky.sample_transmission_towards_sun(
        luts["transmission"], sun_dir)

    # --- sky LUT (pass 4) ---
    sky_lut = sky.bake_sky_lut(
        sun_dir, sun_strength_exposed, luts["multiscatter"],
        settings=settings.atmosphere)

    # --- camera matrices + TAA jitter (RenderFrontend.cpp:423-454) ---
    view = _view_matrix(cam)
    proj = _projection(settings)
    if settings.taa.enabled:
        jitter_px = jnp.asarray(_JITTER_TABLE, jnp.float32)[
            state.frame_index % 8]
        jitter_ndc = jitter_px / jnp.asarray([width, height], jnp.float32)
        proj = proj.at[0, 2].set(jitter_ndc[0]).at[1, 2].set(jitter_ndc[1])
    else:
        jitter_ndc = jnp.zeros(2, jnp.float32)
    view_proj = proj @ view

    # --- G-buffer raster (passes 5, 12 geometry side) ---
    setup = raster.geometry_setup(
        scene["corners"], scene["corner_uvs"], scene["corner_normals"],
        scene["corner_tangents"], scene["corner_bitangents"],
        scene["tri_material"],
        jnp.ones(scene["corners"].shape[0], bool),
        view_proj, state.prev_view_projection, pw, ph, cull="back",
    )
    pairs = raster.build_pairs(setup, nty, ntx)
    pair_edges, pair_attrs = raster.gather_pair_setups(setup, pairs, True)
    depth, vis, gbuf = raster.rasterize_gbuffer(
        pair_edges, pair_attrs, pairs, nty, ntx, interpret=interpret)
    valid = vis >= 0

    # --- shading inputs ---
    inv_vp = jnp.linalg.inv(view_proj)
    world_pos = shade.reconstruct_world_position(depth, inv_vp, pw, ph)
    material = post.material_lookup(
        scene["material_table"], gbuf[raster._CH_MAT], valid)
    albedo = material[0:3]
    rough_metal = jnp.stack(
        [jnp.ones_like(material[3]), material[3], material[4]], axis=0)

    hdr = shade.shade_forward(
        config=settings.shading,
        world_pos=world_pos,
        geo_normal=gbuf[raster._CH_N:raster._CH_N + 3],
        tangent=gbuf[raster._CH_T:raster._CH_T + 3],
        bitangent=gbuf[raster._CH_B:raster._CH_B + 3],
        valid=valid,
        albedo_srgb_linear=albedo,
        normal_ts=jnp.zeros((2, ph, pw), jnp.float32),
        specular=rough_metal,
        sun_direction=sun_dir,
        sun_color=sun_color,
        sun_strength_exposed=sun_strength_exposed,
        sun_shadow=jnp.ones((ph, pw), jnp.float32),
        camera_position=cam["position"],
        indirect_y_sh=None,
        indirect_cocg=None,
    )

    # --- sky composite (pass 14) ---
    import math

    tan_fov_half = math.tan(math.radians(35.0) * 0.5)
    view_dirs = sky.view_directions(
        pw, ph, cam["forward"], cam["up"], cam["right"], tan_fov_half,
        width / height)
    hdr = sky.apply_sky(
        hdr, valid, sky_lut, luts["transmission"], view_dirs, sun_dir,
        sun_strength_exposed)

    # --- tonemap (pass 17) ---
    time = state.frame_index.astype(jnp.float32) * 0.016
    image = post.tonemap_pass(hdr, time)[:height, :width]

    new_state = state._replace(
        frame_index=state.frame_index + 1,
        exposure=new_exposure,
        prev_color=hdr,
        prev_depth=depth,
        prev_view_projection=view_proj,
        prev_jitter=jitter_ndc,
    )
    return image, new_state


def scene_to_device(rs) -> dict:
    """RenderScene (numpy) -> device array dict consumed by render_frame."""
    return {
        "corners": jnp.asarray(rs.corners),
        "corner_uvs": jnp.asarray(rs.corner_uvs),
        "corner_normals": jnp.asarray(rs.corner_normals),
        "corner_tangents": jnp.asarray(rs.corner_tangents),
        "corner_bitangents": jnp.asarray(rs.corner_bitangents),
        "tri_material": jnp.asarray(rs.tri_material),
        "tri_object": jnp.asarray(rs.tri_object),
        "material_table": jnp.asarray(rs.material_table),
        "object_bb_min": jnp.asarray(rs.object_bb_min),
        "object_bb_max": jnp.asarray(rs.object_bb_max),
    }


def bake_static_luts(settings: RenderSettings):
    """Atmosphere-dependent LUTs (rebaked only on settings change)."""
    transmission = sky.bake_transmission_lut(settings.atmosphere)
    multiscatter = sky.bake_multiscatter_lut(settings.atmosphere)
    return {"transmission": transmission, "multiscatter": multiscatter}
