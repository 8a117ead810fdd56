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
from ..ops import bloom as bloom_ops
from ..ops import hiz, post, raster, shade, shadow, sky, taa as taa_ops
from ..utils import mathutils, noise as noise_mod, sampling
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

    # --- sun shadow cascades (passes 6-8: hi-Z -> lightMatrix -> render) ---
    import math

    tan_fov_half = math.tan(math.radians(FOV_DEG) * 0.5)
    aspect = width / height
    if settings.shadows.cascade_count > 0:
        d_min, d_max = hiz.depth_min_max(depth)
        cascade_mats, splits, cascade_scales = shadow.compute_cascade_info(
            d_min, d_max, cam["position"], cam["forward"], cam["up"],
            cam["right"], tan_fov_half, aspect, NEAR_PLANE, FAR_PLANE,
            sun_dir, settings.shadows.cascade_count,
            jnp.asarray(settings.sdf_trace.influence_radius, jnp.float32),
            jnp.asarray(settings.volumetrics.max_distance, jnp.float32),
        )
        sres = settings.shadows.resolution
        s_nty, s_ntx = sres // raster.TILE_H, sres // raster.TILE_W
        shadow_maps = []
        for c in range(shadow.MAX_CASCADES):
            if c < settings.shadows.cascade_count:
                s_setup = raster.geometry_setup(
                    scene["corners"], scene["corner_uvs"],
                    scene["corner_normals"], scene["corner_tangents"],
                    scene["corner_bitangents"], scene["tri_material"],
                    jnp.ones(scene["corners"].shape[0], bool),
                    cascade_mats[c], cascade_mats[c], sres, sres,
                    cull="none", with_attrs=False,
                )
                s_pairs = raster.build_pairs(s_setup, s_nty, s_ntx)
                s_edges, _ = raster.gather_pair_setups(s_setup, s_pairs, False)
                shadow_maps.append(raster.rasterize_depth(
                    s_edges, s_pairs, s_nty, s_ntx, interpret=interpret))
            else:
                shadow_maps.append(jnp.zeros((sres, sres), jnp.float32))
        shadow_maps = jnp.stack(shadow_maps)

        # pixel linear depth = dot(V, -forward) (triangle.frag:205-207)
        to_cam = cam["position"].reshape(3, 1, 1) - world_pos
        pixel_depth = -jnp.sum(to_cam * cam["forward"].reshape(3, 1, 1), axis=0)
        pixel_depth = jnp.where(valid, pixel_depth, 0.0)
        # per-frame blue noise tiled to screen (RenderFrontend.cpp:40-56)
        noise_tile = luts["blue_noise"][state.frame_index % 4]
        reps = (ph // noise_tile.shape[0] + 1, pw // noise_tile.shape[1] + 1)
        noise_full = jnp.tile(noise_tile, reps)[:ph, :pw]
        sun_shadow = shadow.shadow_resolve(
            world_pos, pixel_depth, noise_full, shadow_maps, cascade_mats,
            cascade_scales, splits, settings.shadows.cascade_count,
            taps=settings.shadows.pcf_taps, interpret=interpret)
    else:
        sun_shadow = jnp.ones((ph, pw), jnp.float32)

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
        sun_shadow=sun_shadow,
        camera_position=cam["position"],
        indirect_y_sh=None,
        indirect_cocg=None,
    )

    # --- sky composite (pass 14) ---
    view_dirs = sky.view_directions(
        pw, ph, cam["forward"], cam["up"], cam["right"], tan_fov_half,
        aspect)
    hdr = sky.apply_sky(
        hdr, valid, sky_lut, luts["transmission"], view_dirs, sun_dir,
        sun_strength_exposed)
    scene_color = hdr  # pre-TAA color feeds next frame's histogram

    # --- TAA (pass 15) ---
    if settings.taa.enabled:
        motion = taa_ops.compute_motion(
            gbuf[raster._CH_PREV:raster._CH_PREV + 2], valid, jitter_ndc,
            state.prev_jitter, width, height)
        camera_cut = state.frame_index == 0
        hdr, taa_history = taa_ops.temporal_filter(
            hdr, state.taa_history, motion, depth, jitter_px, camera_cut,
            width, height,
            use_clipping=settings.taa.use_clipping,
            use_motion_dilation=settings.taa.use_motion_vector_dilation,
            use_tonemapping=settings.taa.filter_use_tonemapping,
            interpret=interpret,
        )
    else:
        taa_history = state.taa_history

    # --- bloom (pass 16) ---
    if settings.bloom.enabled:
        hdr = bloom_ops.compute_bloom(
            hdr, settings.bloom.strength, settings.bloom.blur_radius,
            settings.bloom.mip_count)

    # --- tonemap (pass 17) ---
    time = state.frame_index.astype(jnp.float32) * 0.016
    image = post.tonemap_pass(hdr, time)[:height, :width]

    new_state = state._replace(
        frame_index=state.frame_index + 1,
        exposure=new_exposure,
        prev_color=scene_color,
        prev_depth=depth,
        taa_history=taa_history,
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


@functools.lru_cache(maxsize=4)
def _blue_noise_textures(count: int = 4, size: int = 32):
    """RenderFrontend.cpp:40-56 — 4 void-and-cluster blue-noise tiles."""
    tiles = [
        noise_mod.generate_blue_noise((size, size), seed=i).astype(np.float32)
        / 255.0
        for i in range(count)
    ]
    return np.stack(tiles)


def bake_static_luts(settings: RenderSettings):
    """Atmosphere-dependent LUTs + noise (rebaked only on settings change)."""
    transmission = sky.bake_transmission_lut(settings.atmosphere)
    multiscatter = sky.bake_multiscatter_lut(settings.atmosphere)
    return {
        "transmission": transmission,
        "multiscatter": multiscatter,
        "blue_noise": jnp.asarray(_blue_noise_textures()),
    }
