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

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderSettings
from ..ops import exposure as exposure_ops
from ..ops import bloom as bloom_ops
from ..ops import hiz, post, raster, sdfgi, shade, shadow, sky
from ..ops import taa as taa_ops
from ..ops import volumetrics as vol_ops
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
                far=FAR_PLANE, full_height: int | None = None):
    """Camera.cpp:14-27 — GL perspective + Vulkan reverse-Z correction."""
    import math

    aspect = settings.width / (full_height or settings.height)
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


@jax.named_scope("scene.object_transforms")
def _apply_object_transforms(scene, transforms, positions_only=False):
    """Dynamic scenes (App.cpp:64-74, SDFGI.cpp:260-313 per-frame model
    matrices): apply per-object DELTA transforms (current model matrix x
    the build-time inverse) to the baked world-space corner arrays.

    transforms (O, 4, 4) is a TRACED input — objects move without any
    recompile. Cost is one (T, 12) row gather + ~60 flops/triangle, paid
    only when the scene dict carries 'object_transforms'. Returns
    (corners, normals, tangents, bitangents[, bb_min, bb_max]); attribute
    vectors are rotated by the delta's inverse-transpose (exact under
    non-uniform scale; the raster kernel renormalizes per pixel)."""
    delta = jnp.einsum("oij,ojk->oik", transforms,
                       scene["object_build_inv"],
                       precision=jax.lax.Precision.HIGHEST)
    rows = delta[:, :3, :].reshape(-1, 12)  # (O, 12)
    tr = rows[scene["tri_object"]]  # (T, 12) contiguous row gather

    def col(i):  # (T, 1) broadcast against (T, 3 corners)
        return tr[:, i:i + 1]

    def apply_pts(c):
        x, y, z = c[..., 0], c[..., 1], c[..., 2]
        return jnp.stack([
            col(0) * x + col(1) * y + col(2) * z + col(3),
            col(4) * x + col(5) * y + col(6) * z + col(7),
            col(8) * x + col(9) * y + col(10) * z + col(11),
        ], axis=-1)

    corners = apply_pts(scene["corners"])
    if positions_only:
        return corners
    # inverse-transpose rotation for direction attributes
    nrm_mat = jnp.linalg.inv(delta[:, :3, :3]).transpose(0, 2, 1)
    nrows = nrm_mat.reshape(-1, 9)[scene["tri_object"]]  # (T, 9)

    def apply_dir(c):
        x, y, z = c[..., 0], c[..., 1], c[..., 2]

        def ncol(i):
            return nrows[:, i:i + 1]

        return jnp.stack([
            ncol(0) * x + ncol(1) * y + ncol(2) * z,
            ncol(3) * x + ncol(4) * y + ncol(5) * z,
            ncol(6) * x + ncol(7) * y + ncol(8) * z,
        ], axis=-1)

    normals = apply_dir(scene["corner_normals"])
    tangents = apply_dir(scene["corner_tangents"])
    bitangents = apply_dir(scene["corner_bitangents"])
    # culling AABBs: transformed-AABB bound via the |R| trick (AABB.cpp
    # axisAlignedBoundingBoxTransformed analog)
    bmin, bmax = scene["object_bb_min"], scene["object_bb_max"]
    ctr = (bmin + bmax) * 0.5
    ext = (bmax - bmin) * 0.5
    r = delta[:, :3, :3]
    t = delta[:, :3, 3]
    nctr = jnp.einsum("oij,oj->oi", r, ctr) + t
    next_ = jnp.einsum("oij,oj->oi", jnp.abs(r), ext)
    return corners, normals, tangents, bitangents, nctr - next_, nctr + next_


def shadow_bin_sub(sres: int) -> int:
    """Raster-bin height (in 16px rows) for the shadow atlas: depth-only
    bins have no winner-slot cap, so use the tallest bin the resolution
    divides (128px at the reference's 2048 maps) — 8x fewer Pallas
    programs and a ~4x smaller pair stream than 16px tiles."""
    sub = 8
    while sub > 1 and sres % (raster.TILE_H * sub):
        sub //= 2
    return sub


def main_bin_sub(ph: int) -> int:
    """Raster-bin height for the main view: 32px when the padded height
    allows. Bounded by the winner-slot budget (SLOT_BITS mantissa packing
    caps pairs per bin at 2048 - GROUP), which 64px bins would crowd at
    Sponza-class densities."""
    return 2 if ph % (raster.TILE_H * 2) == 0 else 1


@jax.named_scope("shadow.atlas_setup")
def shadow_atlas_setup(scene, g_corners, g_normals, g_tangents,
                       g_bitangents, obj_bb_min, obj_bb_max, cascade_mats,
                       n_cas: int, sres: int, alpha_slots, t_count: int):
    """All cascades as ONE vertical-atlas TriangleSetup: one vmapped
    geometry stage, one pair sort, one setup gather, one Pallas launch (the
    per-cascade version paid each fixed cost 3x; SURVEY 3.2 pass 8 renders
    cascades as separate drawcall batches because Vulkan framebuffers force
    it — nothing forces it here).

    Casters are FRONT-face culled, matching the reference's shadow pass
    rasterization state (RenderFrontend.cpp:1576 CullMode::Front) — halves
    the caster pair stream for closed geometry and biases acne off lit
    surfaces."""
    from ..scene.frustum import expand_object_mask, visible_objects_clipspace

    sub = shadow_bin_sub(sres)
    s_nty = sres // (raster.TILE_H * sub)
    cas_mats = cascade_mats[:n_cas]
    cas_visible = jax.vmap(
        lambda m: expand_object_mask(
            visible_objects_clipspace(
                m, obj_bb_min, obj_bb_max,
                cull_z=False),
            scene["tri_starts"], t_count))(cas_mats)
    # edges out_axes=2: the vmapped geometry stage emits (3, n_pl, n_cas,
    # T) directly, so flattening cascades into the atlas triangle stream
    # is a FREE trailing-dims reshape — the previous (n_cas, 3, n_pl, T)
    # transpose(1, 2, 0, 3) copied the whole 84 MB 8-plane edge table
    # (~1.9 ms/frame as unscoped bitcast/dynamic-update-slice ops in the
    # round-5 profile)
    s_setup = jax.vmap(
        lambda m, vis: raster.geometry_setup(
            g_corners, scene["corner_uvs"],
            g_normals, g_tangents,
            g_bitangents, scene["tri_material"],
            vis, m, m, sres, sres, cull="front", with_attrs=False,
            tri_alpha_slot=alpha_slots, bin_rows=sub),
        out_axes=raster.TriangleSetup(
            edges=2, attrs=0, tile_bbox=0, valid=0, fine_y=0),
    )(cas_mats, cas_visible)
    # shift each cascade's edge planes into its atlas row band:
    # evaluating at atlas y needs c' = c - b*off, and offset bboxes
    y_off = (jnp.arange(n_cas, dtype=jnp.float32)
             * sres).reshape(1, n_cas, 1)
    # coeff axis is 0 in the out_axes=2 layout (3, n_pl, n_cas, T)
    edges_a = s_setup.edges.at[2].add(-s_setup.edges[1] * y_off)
    n_pl = edges_a.shape[1]
    edges_a = edges_a.reshape(3, n_pl, -1)
    offs = (jnp.arange(n_cas, dtype=jnp.int32) * s_nty)[:, None]
    bbox_a = s_setup.tile_bbox.at[..., 0].add(offs)
    bbox_a = bbox_a.at[..., 2].add(offs)
    # offset each view's fine 16px rows into its atlas band (both columns;
    # invalid entries stay empty ranges under a uniform shift)
    fine_offs = (jnp.arange(n_cas, dtype=jnp.int32)
                 * (sres // raster.TILE_H)).reshape(n_cas, 1, 1)
    fine_a = s_setup.fine_y + fine_offs
    return raster.TriangleSetup(
        edges=edges_a,
        attrs=jnp.zeros((raster.NATTR, 0), jnp.float32),
        tile_bbox=bbox_a.reshape(-1, 4),
        valid=s_setup.valid.reshape(-1),
        fine_y=fine_a.reshape(-1, 2))


def _atlas_band_slice(stp, row0_bins, nbd_bins: int, sub: int):
    """Restrict an atlas TriangleSetup to a horizontal band of bins (the
    multi-device shadow-atlas sharding: each device rasterizes only its
    band of cascade rows, then the bands are all_gather'd — the reference
    renders each cascade once per frame, RenderFrontend.cpp:760-774, and
    so must the device mesh as a whole, not once per device).

    row0_bins is the TRACED global bin row of this device's first bin;
    nbd_bins the static band height in bins. Edge planes are rebased so
    band-local pixel y = 0 sits at global row row0_bins * sub * 16
    (value at local y needs c' = c + b * y0_px); bboxes and fine rows
    shift/clamp, and triangles outside the band are invalidated."""
    y0_px = (row0_bins * (sub * raster.TILE_H)).astype(jnp.float32)
    edges = stp.edges.at[2].add(stp.edges[1] * y0_px)
    ty0 = stp.tile_bbox[:, 0] - row0_bins
    ty1 = stp.tile_bbox[:, 2] - row0_bins
    valid = stp.valid & (ty1 >= 0) & (ty0 < nbd_bins)
    bbox = jnp.stack([
        jnp.where(valid, jnp.clip(ty0, 0, nbd_bins - 1), 1),
        jnp.where(valid, stp.tile_bbox[:, 1], 1),
        jnp.where(valid, jnp.clip(ty1, 0, nbd_bins - 1), 0),
        jnp.where(valid, stp.tile_bbox[:, 3], 0)], axis=1)
    r16 = row0_bins * sub
    n_f = nbd_bins * sub
    fine = jnp.stack([
        jnp.where(valid, jnp.clip(stp.fine_y[:, 0] - r16, 0, n_f - 1), 1),
        jnp.where(valid, jnp.clip(stp.fine_y[:, 1] - r16, 0, n_f - 1), 0),
    ], axis=1)
    return dataclasses.replace(stp, edges=edges, tile_bbox=bbox,
                               valid=valid, fine_y=fine)


@functools.partial(
    jax.jit,
    static_argnames=("settings", "interpret", "axis_name", "full_height"),
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
    axis_name: str | None = None,
    full_height: int | None = None,
):
    """One frame: (image_u8 (H, W, 3), FrameState').

    Under shard_map (parallel/sharding.py) each device renders a horizontal
    screen band: `cam` carries 'ndc_y_scale'/'ndc_y_offset' describing the
    band's asymmetric sub-frustum, and `axis_name` enables the cross-band
    collectives (exposure histogram psum).
    """
    width, height = settings.width, settings.height
    pw, ph = raster.pad_resolution(width, height)
    m_sub = main_bin_sub(ph)
    nty, ntx = ph // (raster.TILE_H * m_sub), pw // raster.TILE_W

    # camera-path mode: leaves with a leading path dimension are indexed by
    # the frame counter ON DEVICE. Callers with a precomputed flight path
    # (bench, batch renders) upload it ONCE and stop paying per-frame
    # host->device transfers (~45 ms/frame measured over the tunneled
    # device in round 2 — a fifth of the whole frame).
    if cam["position"].ndim == 2:
        n_path = cam["position"].shape[0]
        # every non-scalar leaf MUST carry the path dim: inferring from
        # shape[0] silently misindexed e.g. an unstacked (3,) vector on a
        # 3-frame path (ADVICE r3)
        for k, v in cam.items():
            if getattr(v, "ndim", 0) >= 1 and v.shape[0] != n_path:
                raise ValueError(
                    f"camera-path mode: leaf {k!r} shape {v.shape} does not "
                    f"lead with the path length {n_path}; stack every "
                    "non-scalar camera leaf along the path dimension")
        path_idx = state.frame_index % n_path
        cam = {k: (v[path_idx] if getattr(v, "ndim", 0) >= 1 else v)
               for k, v in cam.items()}

    # directionToVector already points TOWARDS the sun (y-down world: zenith
    # is (0,-1,0)); the reference uses it unnegated everywhere
    # (RenderFrontend.cpp:1159, triangle.frag:197, preExposeLights.comp:86)
    sun_dir = mathutils.direction_to_vector(
        jnp.asarray(settings.sun_direction_angles, jnp.float32))

    # --- exposure from the previous frame's color (SURVEY 3.2 passes 1+3) ---
    histogram = exposure_ops.compute_histogram(state.prev_color, state.exposure)
    if axis_name is not None:
        # bands contribute to one global histogram (histogramCombineTiles
        # analog across devices)
        histogram = jax.lax.psum(histogram, axis_name)
    new_exposure, sun_strength_exposed = exposure_ops.pre_expose_lights(
        histogram, state.exposure,
        jnp.asarray(settings.sun_illuminance, jnp.float32),
        jnp.asarray(settings.exposure_offset, jnp.float32),
        jnp.asarray(settings.exposure_adaption_speed, jnp.float32),
        delta_time,
        # in band mode the histogram is psum'd over all bands, so the
        # percentile normalization needs the FULL frame's pixel count
        float(width * (full_height or height)),
        # frame 0 has a black prev-frame histogram and frame 1 the first
        # real one: snap exposure for both instead of adapting at EV/s
        camera_cut=state.frame_index <= 1,
    )
    sun_color = sky.sample_transmission_towards_sun(
        luts["transmission"], sun_dir)

    # --- sky LUT (pass 4) ---
    sky_lut = sky.bake_sky_lut(
        sun_dir, sun_strength_exposed, luts["multiscatter"],
        settings=settings.atmosphere)

    # --- camera matrices + TAA jitter (RenderFrontend.cpp:423-454) ---
    view = _view_matrix(cam)
    proj = _projection(settings, full_height=full_height or settings.height)
    if "ndc_y_scale" in cam:
        # asymmetric sub-frustum for split-frame band rendering:
        # y' = scale * y + offset * w
        band = jnp.eye(4, dtype=jnp.float32)
        band = band.at[1, 1].set(cam["ndc_y_scale"])
        band = band.at[1, 3].set(cam["ndc_y_offset"])
        proj = band @ proj
    if settings.taa.enabled:
        jitter_px = jnp.asarray(_JITTER_TABLE, jnp.float32)[
            state.frame_index % 8]
        jitter_ndc = jitter_px / jnp.asarray([width, height], jnp.float32)
        # .add, not .set: in band mode proj[1,2] carries the band's
        # sub-frustum offset (band @ proj above) and must survive the jitter
        proj = proj.at[0, 2].add(jitter_ndc[0]).at[1, 2].add(jitter_ndc[1])
    else:
        jitter_ndc = jnp.zeros(2, jnp.float32)
    view_proj = proj @ view

    # --- dynamic object transforms (App.cpp:64-74 per-frame matrices) ---
    if "object_transforms" in scene:
        (g_corners, g_normals, g_tangents, g_bitangents,
         obj_bb_min, obj_bb_max) = _apply_object_transforms(
            scene, scene["object_transforms"])
        prev_g_corners = _apply_object_transforms(
            scene, scene["prev_object_transforms"], positions_only=True)
    else:
        g_corners = scene["corners"]
        g_normals = scene["corner_normals"]
        g_tangents = scene["corner_tangents"]
        g_bitangents = scene["corner_bitangents"]
        obj_bb_min = scene["object_bb_min"]
        obj_bb_max = scene["object_bb_max"]
        prev_g_corners = None

    # --- dynamic SDF recomposite (SDFGI.cpp:260-313 per-frame instance
    # buffer): moved instances min-composite into a working copy of the
    # pristine brick-packed global SDF, window-local, on device ---
    sdf_vol = scene.get("sdf_volume")
    sdf_alb = scene.get("sdf_albedo")
    sdf_coarse = scene.get("sdf_coarse")  # (sdf, alb, dims) or None
    if "object_transforms" in scene and "sdf_dyn_vols" in scene \
            and sdf_vol is not None:
        from ..ops import sdf_scene as sdf_scene_mod

        sdf_coarse = None  # working volume changed; rebuild in trace_gi
        sdf_vol, sdf_alb = sdf_scene_mod.recomposite_dynamic(
            sdf_vol, sdf_alb, scene["sdf_origin"],
            scene["sdf_voxel_size"], scene["sdf_shape"].shape[:3],
            scene["sdf_dyn_vols"], scene["sdf_dyn_tokens"],
            scene["sdf_dyn_pad_min"], scene["sdf_dyn_pad_max"],
            scene["sdf_dyn_albedo"], scene["sdf_dyn_obj"],
            scene["object_transforms"])

    # --- CPU frustum cull analog (RenderFrontend.cpp:565-587) ---
    from ..scene.frustum import expand_object_mask, visible_objects_clipspace

    t_count = scene["corners"].shape[0]
    obj_visible = visible_objects_clipspace(
        view_proj, obj_bb_min, obj_bb_max)
    tri_visible = expand_object_mask(obj_visible, scene["tri_starts"],
                                     t_count)

    # --- G-buffer raster (passes 5, 12 geometry side) ---
    alpha_masks = scene.get("alpha_masks")
    alpha_slots = scene.get("tri_alpha_slot")
    setup = raster.geometry_setup(
        g_corners, scene["corner_uvs"], g_normals,
        g_tangents, g_bitangents,
        scene["tri_material"],
        tri_visible,
        view_proj, state.prev_view_projection, pw, ph, cull="back",
        near_w=NEAR_PLANE,
        tri_alpha_slot=alpha_slots,
        prev_corners=prev_g_corners,
        bin_rows=m_sub,
    )
    # order_rows + row_skip: y-sorted pair segments let the kernel skip
    # sub-blocks outside each group's row extent. Winner ties between
    # EXACTLY-equal quantized depths resolve by stream position (now
    # y-order, not triangle order) — coplanar-only, same class of tie the
    # slot packing already made arbitrary.
    # every binning stage (owner fill, decode, sort, setup gather) is
    # O(pair_budget), so the budget is sized to the CULLED stream, not
    # t_count: back-face + frustum culling leaves ~1/8 of triangles live
    # at measured framings (tools/pair_stats.py: 37k of 292k live, 59k
    # real pairs) and the budgets carry ~2x headroom over that. A scene
    # that still outgrows them trips the per-frame overflow counters
    # (asserted zero in tests, shown in the overlay) and the App path
    # AUTO-ESCALATES pair_budget_scale and re-warns (runtime/app.py),
    # so pathological framings recover instead of silently dropping
    def scaled(budget: int) -> int:
        # static python int: settings is a static jit arg, so raising the
        # scale recompiles with proportionally larger pair streams
        return int(budget * settings.pair_budget_scale)

    # band mode: each band's sub-frustum culls to a slice of the scene, so
    # the triangle-proportional budget term shares out across bands (kept
    # at 2x the even share — a band can legitimately hold well over 1/N of
    # the visible triangles; the overflow counter + App auto-escalation
    # cover pathological framings). Every O(budget) binning stage then
    # scales with the mesh instead of replicating (PERF_r05 projection).
    n_dev_bands = (max(1, full_height // height)
                   if (axis_name is not None and full_height) else 1)
    band_share = max(1, n_dev_bands // 2)

    m_budget = scaled(t_count // (4 * band_share)
                      + 8 * nty * m_sub * ntx)
    if alpha_masks is None:
        pairs = raster.build_pairs(setup, nty, ntx, bin_rows=m_sub,
                                   order_rows=True, pair_budget=m_budget,
                                   interpret=interpret)
        pair_edges, pair_attrs = raster.gather_pair_setups(
            setup, pairs, True, row_extents=True)
        depth, vis, gbuf = raster.rasterize_gbuffer(
            pair_edges, pair_attrs, pairs, nty, ntx, interpret=interpret,
            sub=m_sub, row_skip=True)
        main_overflow = pairs.overflow
    else:
        # OPAQUE/ALPHA STREAM SPLIT (same reasoning as the shadow atlas):
        # carrying the 8-plane table for every pair costs ~7 ms/frame at
        # bench sizes even with the per-group alpha gate (32-row DMAs +
        # transposes + 72-row attr gathers). Rasterize opaque pairs on the
        # 4-plane path, the (few) alpha pairs on the full path, and merge
        # by depth in XLA — pure elementwise selects over the G-buffer.
        is_alpha_main = alpha_slots > 0
        setup_o = dataclasses.replace(
            setup, edges=setup.edges[:, :4],
            valid=setup.valid & ~is_alpha_main)
        setup_a = dataclasses.replace(
            setup, valid=setup.valid & is_alpha_main)
        pairs_o = raster.build_pairs(setup_o, nty, ntx, bin_rows=m_sub,
                                     order_rows=True,
                                     pair_budget=m_budget,
                                     interpret=interpret)
        pe_o, pa_o = raster.gather_pair_setups(setup_o, pairs_o, True,
                                               row_extents=True)
        d1, v1, g1 = raster.rasterize_gbuffer(
            pe_o, pa_o, pairs_o, nty, ntx, interpret=interpret,
            sub=m_sub, row_skip=True)
        ma_budget = scaled(t_count // (32 * band_share)
                           + 4 * nty * m_sub * ntx)
        pairs_a = raster.build_pairs(setup_a, nty, ntx, bin_rows=m_sub,
                                     order_rows=True,
                                     pair_budget=ma_budget,
                                     interpret=interpret)
        pe_a, pa_a = raster.gather_pair_setups(setup_a, pairs_a, True,
                                               row_extents=True)
        d2, v2, g2 = raster.rasterize_gbuffer(
            pe_a, pa_a, pairs_a, nty, ntx, interpret=interpret,
            alpha_masks=alpha_masks, sub=m_sub, row_skip=True)
        # reverse-Z: larger depth wins; uncovered pixels are 0 on both
        # sides so the merged validity is the union
        win2 = d2 > d1
        depth = jnp.where(win2, d2, d1)
        vis = jnp.where(win2, v2, v1)
        gbuf = jnp.where(win2[None], g2, g1)
        main_overflow = pairs_o.overflow + pairs_a.overflow
    valid = vis >= 0

    # --- shading inputs ---
    inv_vp = jnp.linalg.inv(view_proj)
    world_pos = shade.reconstruct_world_position(depth, inv_vp, pw, ph)
    # unpack material id + tangent-frame handedness (raster packs
    # mat * 2 + (handedness < 0) into one constant plane) and reconstruct
    # the bitangent: B = handedness * cross(N, T) — the corner bitangent's
    # only degree of freedom vs cross(N, T); halves the interpolated
    # vec3 planes in the raster kernel
    mat_packed = gbuf[raster._CH_MAT]
    mat_id = jnp.floor(mat_packed * 0.5)
    handedness = 1.0 - 2.0 * (mat_packed - 2.0 * mat_id)
    geo_n = gbuf[raster._CH_N:raster._CH_N + 3]
    geo_t = gbuf[raster._CH_T:raster._CH_T + 3]
    geo_b = jnp.cross(geo_n, geo_t, axis=0) * handedness[None]
    geo_b = geo_b * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(geo_b * geo_b, axis=0, keepdims=True), 1e-20))
    # previous-frame NDC: interpolated planes for dynamic scenes; static
    # scenes reproject the depth-derived world position (identical surface
    # point through the previous view-projection — see raster.NATTR note)
    if prev_g_corners is not None:
        prev_ndc = gbuf[raster._CH_PREV:raster._CH_PREV + 2]
    else:
        pvp = state.prev_view_projection
        pc = (pvp[:2, :3] @ world_pos.reshape(3, -1)
              + pvp[:2, 3:4]).reshape(2, ph, pw)
        pw_h = (pvp[3, :3] @ world_pos.reshape(3, -1)
                + pvp[3, 3]).reshape(ph, pw)
        prev_ndc = pc / jnp.where(jnp.abs(pw_h) > 1e-9, pw_h, 1.0)[None]
        prev_ndc = jnp.where(valid[None], prev_ndc, 0.0)
    material = post.material_lookup(
        scene["material_table"], mat_id, valid,
        interpret=interpret)
    albedo = material[0:3]
    rough_metal = jnp.stack(
        [jnp.ones_like(material[3]), material[3], material[4]], axis=0)
    normal_ts = jnp.zeros((2, ph, pw), jnp.float32)

    if "tex_word0" in scene:
        # per-pixel material textures (triangle.frag:177-201 analog);
        # mip bias = log2(0.5) with TAA supersampling (Filmic SMAA p.117,
        # RenderFrontend.cpp:1176-1181)
        from ..assets.textures import MAX_MIPS
        from ..ops import texture as texture_ops

        bias = -1.0 if (settings.taa.enabled
                        and settings.taa.use_mip_bias) else 0.0
        ts = texture_ops.sample_materials(
            gbuf[raster._CH_U:raster._CH_U + 2],
            gbuf[raster._CH_DUDX:raster._CH_DUDX + 4],
            mat_id, valid,
            scene["mat_tex"], scene["tex_info"],
            scene["tex_word0"], scene["tex_word1"],
            n_mips=MAX_MIPS, mip_bias=bias,
            trilinear=settings.shading.texture_filter >= 1,
            aniso=settings.shading.texture_filter >= 2,
            two_mat=settings.shading.texture_two_mat,
            interpret=interpret)
        tex_ok = ts[8] > 0.5
        albedo = jnp.where(tex_ok[None], ts[0:3], albedo)
        normal_ts = jnp.where(tex_ok[None], ts[4:6], normal_ts)
        rough_metal = jnp.stack([
            jnp.ones_like(material[3]),
            jnp.where(tex_ok, ts[6], material[3]),
            jnp.where(tex_ok, ts[7], material[4]),
        ], axis=0)

    # --- sun shadow cascades (passes 6-8: hi-Z -> lightMatrix -> render) ---
    import math

    tan_fov_half = math.tan(math.radians(FOV_DEG) * 0.5)
    aspect = width / (full_height or height)  # band height is not the frame
    shadow_overflow = jnp.zeros((), jnp.int32)
    if settings.shadows.cascade_count > 0:
        d_min, d_max = hiz.depth_min_max(depth)
        if axis_name is not None:
            # fit cascades to the FULL frame's depth range so every band
            # produces identical light matrices (and matches single-device)
            d_min = jax.lax.pmin(d_min, axis_name)
            d_max = jax.lax.pmax(d_max, axis_name)
        cascade_mats, splits, cascade_scales = shadow.compute_cascade_info(
            d_min, d_max, cam["position"], cam["forward"], cam["up"],
            cam["right"], tan_fov_half, aspect, NEAR_PLANE, FAR_PLANE,
            sun_dir, settings.shadows.cascade_count,
            jnp.asarray(settings.sdf_trace.influence_radius, jnp.float32),
            jnp.asarray(settings.volumetrics.max_distance, jnp.float32),
            sample_radius=settings.shadows.sample_radius,
        )
        # ALL cascades render as ONE vertical-atlas raster pass: one vmapped
        # geometry stage, one pair sort, one setup gather, one Pallas launch
        # (the per-cascade version paid each fixed cost 3x; SURVEY 3.2
        # pass 8 renders cascades as separate drawcall batches because
        # Vulkan framebuffers force it — nothing forces it here)
        sres = settings.shadows.resolution
        s_sub = shadow_bin_sub(sres)
        s_nty = sres // (raster.TILE_H * s_sub)
        s_ntx = sres // raster.TILE_W
        n_cas = settings.shadows.cascade_count
        # 'atlas/' scope prefix: tools/project_multichip.py keys its
        # sharding classification on it (the cascade atlas is the
        # one row-band-sharded, non-pixel-space phase)
        with jax.named_scope("atlas"):
            atlas_setup = shadow_atlas_setup(
                scene, g_corners, g_normals, g_tangents, g_bitangents,
                obj_bb_min, obj_bb_max, cascade_mats, n_cas, sres,
                alpha_slots, t_count)
            # MULTI-DEVICE ATLAS SHARDING: in band mode each device bins +
            # rasterizes only a horizontal slice of the cascade atlas (ceil'd
            # to equal static bands), then the slices are all_gather'd over
            # ICI (~sres^2 * n_cas * 4B total, sub-ms on a v5e pod slice).
            # Without this every band re-rendered the ENTIRE 3x2048^2 atlas —
            # the dominant band-invariant cost (VERDICT r3 missing #1).
            nb = n_cas * s_nty
            n_dev_atlas = 1
            if axis_name is not None and full_height:
                n_dev_atlas = max(1, full_height // height)
            if n_dev_atlas > 1:
                nb_d = -(-nb // n_dev_atlas)  # ceil: last band may pad
                atlas_row0 = jax.lax.axis_index(axis_name) * nb_d
            else:
                nb_d = nb
                atlas_row0 = None
            # atlas t_count is n_cas * T; front-face culling plus per-cascade
            # frustum culling leaves ~12% live at bench framing (108k of 878k
            # slots, 128.6k pairs measured — tools/atlas_cost_model.py).
            # Budget 1/6 + a per-bin floor = 1.33x measured headroom: every
            # binning stage (expand, sort, segments, setup gather) is
            # O(budget), and the App path auto-escalates pair_budget_scale
            # on overflow, so tight-by-default is safe (VERDICT r4 task 7).
            # Sharded: 2x the even share per band.
            s_budget = scaled((n_cas * t_count)
                              // (6 * max(n_dev_atlas // 2, 1))
                              + 4 * nb_d * s_sub * s_ntx)

            if alpha_masks is not None:
                # OPAQUE/ALPHA STREAM SPLIT: the alpha path (3 extra plane
                # evals, a divide, the mask lane-gathers per sub-block) costs
                # ~7x the opaque depth loop per group, and y-sorted emission
                # scatters the few alpha-tested casters across most groups —
                # profiled +20 ms/frame for 4 banners. Rasterize the opaque
                # casters with the 4-plane table, then max-merge the (tiny)
                # alpha stream on top (sunShadow.frag runs one pipeline per
                # drawcall batch; the split is the same idea stream-wise).
                is_alpha_atlas = jnp.tile(alpha_slots > 0, n_cas)
                setup_o = dataclasses.replace(
                    atlas_setup,
                    edges=atlas_setup.edges[:, :4],
                    valid=atlas_setup.valid & ~is_alpha_atlas)
                setup_a = dataclasses.replace(
                    atlas_setup, valid=atlas_setup.valid & is_alpha_atlas)
                if n_dev_atlas > 1:
                    setup_o = _atlas_band_slice(setup_o, atlas_row0, nb_d,
                                                s_sub)
                pairs_o = raster.build_pairs(setup_o, nb_d, s_ntx,
                                             n_views=n_cas, tile_cap=1 << 15,
                                             bin_rows=s_sub, order_rows=True,
                                             pair_budget=s_budget,
                                             view_row0=atlas_row0,
                                             rows_per_view=s_nty,
                                             interpret=interpret)
                edges_o, _ = raster.gather_pair_setups(setup_o, pairs_o, False,
                                                       row_extents=True)
                # eval_width stays at the default 32: the cost model
                # says 16-pair slices cut eval volume 0.86 -> 0.70 G
                # pair-px, but the measured on-chip A/B (tools/
                # shadow_bench.py --culls front+rowskip+opaque+ewNN:
                # 8.05 / 9.32 / 9.13 / 14.69 ms for ew 32/16/64/128)
                # shows the per-slice fixed costs (dynamic sublane window
                # read, row_skip reduce, gating) eat the win below 32
                atlas = raster.rasterize_depth(edges_o, pairs_o, nb_d,
                                               s_ntx, interpret=interpret,
                                               sub=s_sub, row_skip=True)
                # The alpha depth kernel at sub=8 was the single worst Mosaic
                # compile in the frame (146 s measured: 8 unrolled copies of
                # the UV/mask-gather body). The alpha stream is tiny (banner
                # geometry), so rasterize it on a sub=4 bin grid instead: the
                # 4x-unrolled body stays in the fast compile class (~8 s) and
                # the grid has 4x fewer programs than sub=1 bins — with ~2k
                # live pairs the pass is pure per-program overhead, measured
                # 2.35 ms at sub=2's 3072 programs. (sub=1 would overflow the
                # packed sort key at MAX_CASCADES x 2048 x 292k tris.)
                # NOT s_sub: the sub=8 alpha-depth Mosaic compile bomb is
                # alive and well — 713.8 s measured THIS round with the
                # coefficient-poison formulation (tools/compile_bisect.py
                # --stage depth8a); the ~1 ms/frame that a 768-program
                # grid would save is not worth it
                a_sub = min(4, s_sub)
                a_nty = sres // (raster.TILE_H * a_sub)
                fine_bbox = jnp.stack(
                    [setup_a.fine_y[:, 0] // a_sub,
                     atlas_setup.tile_bbox[:, 1],
                     setup_a.fine_y[:, 1] // a_sub,
                     atlas_setup.tile_bbox[:, 3]], axis=1)
                # invalid rows: fine_y is (1, 0) -> ty0 = 0 = ty1, span gated
                # by setup.valid anyway
                setup_a = dataclasses.replace(setup_a, tile_bbox=fine_bbox)
                # the alpha pass re-bins on the finer a_sub grid; its band
                # covers the SAME pixel rows as the opaque band (s_sub is a
                # multiple of a_sub), so init_depth accumulation lines up
                a_scale = s_sub // a_sub
                a_nbd = nb_d * a_scale
                a_row0 = None if atlas_row0 is None else atlas_row0 * a_scale
                if n_dev_atlas > 1:
                    setup_a = _atlas_band_slice(setup_a, a_row0, a_nbd, a_sub)
                a_budget = scaled((n_cas * t_count)
                                  // (24 * max(n_dev_atlas // 2, 1))
                                  + 4 * a_nbd * a_sub * s_ntx)
                pairs_a = raster.build_pairs(setup_a, a_nbd, s_ntx,
                                             n_views=n_cas, tile_cap=1 << 15,
                                             bin_rows=a_sub,
                                             pair_budget=a_budget,
                                             view_row0=a_row0,
                                             rows_per_view=a_nty,
                                             interpret=interpret)
                edges_a, _ = raster.gather_pair_setups(setup_a, pairs_a, False)
                atlas = raster.rasterize_depth(edges_a, pairs_a, a_nbd,
                                               s_ntx, interpret=interpret,
                                               alpha_masks=alpha_masks,
                                               sub=a_sub,
                                               init_depth=atlas)
                shadow_overflow = pairs_o.overflow + pairs_a.overflow
            else:
                setup_full = atlas_setup
                if n_dev_atlas > 1:
                    setup_full = _atlas_band_slice(atlas_setup, atlas_row0,
                                                   nb_d, s_sub)
                s_pairs = raster.build_pairs(setup_full, nb_d, s_ntx,
                                             n_views=n_cas, tile_cap=1 << 15,
                                             bin_rows=s_sub, order_rows=True,
                                             pair_budget=s_budget,
                                             view_row0=atlas_row0,
                                             rows_per_view=s_nty,
                                             interpret=interpret)
                shadow_overflow = s_pairs.overflow
                s_edges, _ = raster.gather_pair_setups(
                    setup_full, s_pairs, False, row_extents=True)
                atlas = raster.rasterize_depth(s_edges, s_pairs, nb_d,
                                               s_ntx, interpret=interpret,
                                               sub=s_sub, row_skip=True)
            if n_dev_atlas > 1:
                # reassemble the full atlas from the device bands over ICI;
                # ceil-padded tail rows (if nb % n_dev != 0) are sliced off
                atlas = jax.lax.all_gather(
                    atlas, axis_name, axis=0, tiled=True)[:n_cas * sres]
        shadow_maps = atlas.reshape(n_cas, sres, sres)
        if n_cas < shadow.MAX_CASCADES:
            shadow_maps = jnp.concatenate([
                shadow_maps,
                jnp.zeros((shadow.MAX_CASCADES - n_cas, sres, sres),
                          jnp.float32)])

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
            taps=settings.shadows.pcf_taps,
            sample_radius=settings.shadows.sample_radius,
            interpret=interpret)
    else:
        sun_shadow = jnp.ones((ph, pw), jnp.float32)

    # --- SDF GI (pass 10): trace -> resolve -> spatial -> temporal ->
    # spatial -> upscale ---
    indirect_y_sh = None
    indirect_cocg = None
    new_gi_history = state.gi_history
    # cross-band halo exchange for stencil passes (parallel/halo.py): band
    # filters read real neighbor rows instead of clamping at band borders
    from ..parallel import halo as halo_mod

    n_dev = (full_height // height) if (axis_name is not None
                                        and full_height) else 1

    def extend(p, n):
        """Halo-extend rows: neighbor exchange in band mode, edge-pad
        single-device (same clamp semantics at the outer frame borders, so
        band and single-device renders agree at frame edges too)."""
        if n == 0:
            return p
        if axis_name is None:
            return halo_mod.halo_extend(p, n, "", 1)
        return halo_mod.halo_extend(p, n, axis_name, n_dev)

    use_gi = (settings.sdf_trace.enabled
              and settings.shading.indirect_lighting_tech == 0
              and "sdf_volume" in scene)
    if use_gi:
        half = settings.sdf_trace.half_resolution
        stride = 2 if half else 1
        gh, gw = state.gi_history.shape[1:]

        from ..utils.stencil import point_downsample

        def to_gi_res(plane):
            p = point_downsample(plane, stride, stride)
            pad_h = gh - p.shape[-2]
            pad_w = gw - p.shape[-1]
            widths = [(0, 0)] * (p.ndim - 2) + [(0, pad_h), (0, pad_w)]
            return jnp.pad(p, widths)

        gi_valid = to_gi_res(valid)
        gi_wpos = to_gi_res(world_pos)
        gi_normal = to_gi_res(gbuf[raster._CH_N:raster._CH_N + 3])
        gi_lindepth = to_gi_res(
            jnp.where(valid, -jnp.sum(
                (cam["position"].reshape(3, 1, 1) - world_pos)
                * cam["forward"].reshape(3, 1, 1), axis=0), 0.0))

        # cosine ray per pixel from two blue-noise channels
        # (sdfDiffuseTrace.comp:141-158)
        xi0_tile = luts["blue_noise"][state.frame_index % 4]
        xi1_tile = luts["blue_noise"][(state.frame_index + 1) % 4]
        reps_gi = (gh // 32 + 1, gw // 32 + 1)
        xi = jnp.stack([
            jnp.tile(xi0_tile, reps_gi)[:gh, :gw],
            jnp.tile(xi1_tile, reps_gi)[:gh, :gw]])
        from ..utils.sampling import importance_sample_cosine

        n_hwc = jnp.moveaxis(gi_normal, 0, -1)
        dirs = importance_sample_cosine(jnp.moveaxis(xi, 0, -1), n_hwc)
        gi_dirs = jnp.moveaxis(dirs, -1, 0)

        sky_lowres = jax.image.resize(sky_lut, (3, 32, 64), method="linear")
        y_sh, cocg, _gi_escaped = sdfgi.trace_gi(
            gi_wpos, gi_normal, gi_dirs, gi_valid, sky_lowres,
            sdf_vol, sdf_alb, scene["sdf_origin"],
            scene["sdf_voxel_size"], scene["sdf_dims"],
            sun_dir, sun_color, sun_strength_exposed,
            steps=settings.sdf_trace.trace_steps,
            # the fine trace clamps to its window half-extent internally;
            # escaped rays continue in the 4x coarse whole-scene volume
            # (settings.sdf_trace.coarse_fallback) up to this influence
            influence=settings.sdf_trace.influence_radius * 2.5,
            strict=settings.sdf_trace.strict_influence_radius_cutoff,
            dims_zyx=scene["sdf_shape"].shape[:3],
            coarse_fallback=settings.sdf_trace.coarse_fallback,
            coarse_tables=sdf_coarse,
            interpret=interpret)

        # the GI filter chain (resolve -> spatial -> temporal -> spatial)
        # reaches ~40 half-res rows; one 48-row halo covers the whole chain
        halo_gi = min(48, gh) // raster.TILE_H * raster.TILE_H
        y_sh = extend(y_sh, halo_gi)
        cocg = extend(cocg, halo_gi)
        gi_normal_e = extend(gi_normal, halo_gi)
        gi_wpos_e = extend(gi_wpos, halo_gi)
        gi_lindepth_e = extend(gi_lindepth, halo_gi)

        y_sh, cocg = sdfgi.neighborhood_resolve(
            y_sh, cocg, gi_normal_e, gi_lindepth_e)
        proj_scale = 0.5 * (full_height or height) / tan_fov_half
        y_sh, cocg = sdfgi.spatial_filter(
            y_sh, cocg, gi_normal_e, gi_wpos_e, gi_lindepth_e,
            state.frame_index, 1.5, proj_scale / stride, seed=0)

        gi_motion = to_gi_res(motion_for_gi := taa_ops.compute_motion(
            prev_ndc, valid, jitter_ndc,
            state.prev_jitter, width, height))
        gi_motion_e = extend(gi_motion, halo_gi)
        hist_channels, hist_ok = taa_ops.resample_packed_planes(
            extend(state.gi_history, halo_gi), gi_motion_e, gw, gh,
            interpret=interpret)
        hist_y_sh = hist_channels[0:4]
        hist_cocg = hist_channels[4:6]
        motion_mag_px = jnp.sqrt(
            (gi_motion_e[0] * width) ** 2 + (gi_motion_e[1] * height) ** 2)
        camera_cut_gi = state.frame_index == 0
        y_sh, cocg = sdfgi.temporal_filter_gi(
            y_sh, cocg, hist_y_sh, hist_cocg, hist_ok, motion_mag_px,
            camera_cut_gi)
        new_gi_history = halo_mod.crop_halo(jnp.stack([
            taa_ops.pack_f16_pair(y_sh[0], y_sh[1]),
            taa_ops.pack_f16_pair(y_sh[2], y_sh[3]),
            taa_ops.pack_f16_pair(cocg[0], cocg[1]),
        ]), halo_gi)
        y_sh, cocg = sdfgi.spatial_filter(
            y_sh, cocg, gi_normal_e, gi_wpos_e, gi_lindepth_e,
            state.frame_index, 1.0, proj_scale / stride, seed=1)
        y_sh = halo_mod.crop_halo(y_sh, halo_gi)
        cocg = halo_mod.crop_halo(cocg, halo_gi)

        if half:
            gi_depth_half = to_gi_res(depth)
            y_sh, cocg = sdfgi.upscale_half_to_full(
                y_sh, cocg, depth, gi_depth_half, NEAR_PLANE, FAR_PLANE)
            indirect_y_sh = y_sh[:, :ph, :pw]
            indirect_cocg = cocg[:, :ph, :pw]
        else:
            indirect_y_sh = y_sh[:, :ph, :pw]
            indirect_cocg = cocg[:, :ph, :pw]

    hdr = shade.shade_forward(
        config=settings.shading,
        world_pos=world_pos,
        geo_normal=geo_n,
        tangent=geo_t,
        bitangent=geo_b,
        valid=valid,
        albedo_srgb_linear=albedo,
        normal_ts=normal_ts,
        specular=rough_metal,
        sun_direction=sun_dir,
        sun_color=sun_color,
        sun_strength_exposed=sun_strength_exposed,
        sun_shadow=sun_shadow,
        camera_position=cam["position"],
        indirect_y_sh=indirect_y_sh,
        indirect_cocg=indirect_cocg,
    )

    if (settings.shadows.debug_cascade_colors
            and settings.shadows.cascade_count > 0):
        # sunShadowCascades.inc:23-31 cascade debug tint
        from ..ops import debugviz

        cascade_idx = jnp.zeros((ph, pw), jnp.int32)
        for c in range(settings.shadows.cascade_count - 1):
            cascade_idx = cascade_idx + (
                pixel_depth >= splits[c]).astype(jnp.int32)
        hdr = debugviz.cascade_debug_tint(
            hdr, jnp.where(valid, cascade_idx, -1),
            settings.shadows.cascade_count)

    # --- sky composite (pass 14) ---
    view_dirs = sky.view_directions(
        pw, ph, cam["forward"], cam["up"], cam["right"], tan_fov_half,
        aspect, ndc_y_scale=cam.get("ndc_y_scale"),
        ndc_y_offset=cam.get("ndc_y_offset"))
    hdr = sky.apply_sky(
        hdr, valid, sky_lut, luts["transmission"], view_dirs, sun_dir,
        sun_strength_exposed)

    # --- froxel volumetric lighting (pass 11 + apply) ---
    new_vol_history = state.volumetric_history
    if settings.volumetrics.enabled and settings.shadows.cascade_count > 0:
        vs = settings.volumetrics
        fd = state.volumetric_history.shape[1]
        fh, fw = state.volumetric_history.shape[2:]
        wind_dir = jnp.asarray([
            np.cos(np.deg2rad(vs.wind_direction_deg)), 0.0,
            np.sin(np.deg2rad(vs.wind_direction_deg))], jnp.float32)
        wind_offset = wind_dir * (
            vs.wind_speed * state.frame_index.astype(jnp.float32) * 0.016)
        fpos = vol_ops.froxel_world_positions(
            (fw, fh, fd), cam, tan_fov_half, aspect, vs.max_distance)
        mat_vol = vol_ops.material_volume(fpos, vs, wind_offset)

        # coarse sun-shadow grid (replaces per-froxel shadow taps)
        cd, ch, cw = max(fd // 4, 1), max(fh // 4, 1), max(fw // 4, 1)
        cpos = vol_ops.froxel_world_positions(
            (cw, ch, cd), cam, tan_fov_half, aspect, vs.max_distance)
        last_c = settings.shadows.cascade_count - 1
        m_light = cascade_mats[last_c]
        cp = cpos.reshape(3, -1).T  # (N, 3) coarse points, N ~ 30k
        lxy = cp @ m_light[:2, :3].T + m_light[:2, 3]
        lz = cp @ m_light[2, :3] + m_light[2, 3]
        sres_f = settings.shadows.resolution
        su = jnp.clip(((lxy[:, 0] * 0.5 + 0.5) * sres_f).astype(jnp.int32),
                      0, sres_f - 1)
        sv = jnp.clip(((lxy[:, 1] * 0.5 + 0.5) * sres_f).astype(jnp.int32),
                      0, sres_f - 1)
        smap_depth = shadow_maps[last_c][sv, su]
        shadow_c = (jnp.clip(lz, 0.0, 1.0) >= smap_depth).astype(jnp.float32)
        shadow_c = shadow_c.reshape(cd, ch, cw)

        coarse_halo = None
        if axis_name is not None:
            coarse_halo = lambda p: halo_mod.halo_extend(  # noqa: E731
                p, 1, axis_name, n_dev)
        scat_vol = vol_ops.light_scattering(
            mat_vol, fpos, shadow_c, cam, sun_dir, sun_color,
            sun_strength_exposed, vs.phase_g, ambient=vs.ambient,
            halo_fn=coarse_halo)
        scat_vol = vol_ops.temporal_reprojection(
            scat_vol, state.volumetric_history, cpos,
            state.prev_view_projection, cam["position"], cam["forward"],
            vs.max_distance, state.frame_index == 0, halo_fn=coarse_halo)
        new_vol_history = scat_vol
        integrated = vol_ops.integrate_froxels(scat_vol, vs.max_distance)

        pixel_depth_fog = jnp.where(
            valid,
            -jnp.sum((cam["position"].reshape(3, 1, 1) - world_pos)
                     * cam["forward"].reshape(3, 1, 1), axis=0),
            vs.max_distance)  # sky uses max depth (sky.frag:31-34)
        noise_fog = jnp.tile(
            luts["blue_noise"][state.frame_index % 4],
            (ph // 32 + 1, pw // 32 + 1))[:ph, :pw]
        fog_halo = None
        if axis_name is not None:
            fog_halo = lambda p: halo_mod.halo_extend(  # noqa: E731
                p, 1, axis_name, n_dev)
        hdr = vol_ops.apply_froxel_fog(
            hdr, pixel_depth_fog, integrated, vs.max_distance, noise_fog,
            halo_fn=fog_halo)

    scene_color = hdr  # pre-TAA color feeds next frame's histogram

    # --- TAA (pass 15): optional supersampling pre-pass + main filter ---
    new_taa_luminance = state.taa_luminance
    if settings.taa.enabled:
        # TAA reach: 3x3 neighborhoods + dilation + the bicubic history
        # window — one 16-row halo (32 with the supersampling pre-pass)
        want = 32 if settings.taa.use_separate_supersampling else 16
        halo_taa = min(want, ph) // raster.TILE_H * raster.TILE_H
        motion = taa_ops.compute_motion(
            prev_ndc, valid, jitter_ndc,
            state.prev_jitter, width, height)
        hdr_e = extend(hdr, halo_taa)
        motion_e = extend(motion, halo_taa)
        depth_e = extend(depth, halo_taa)
        camera_cut = state.frame_index == 0
        if settings.taa.use_separate_supersampling:
            from ..ops.color_packing import pack_r11g11b10
            from ..ops.shadow import linearize_depth

            prev_packed = extend(pack_r11g11b10(state.prev_color), halo_taa)
            prev_ld = extend(taa_ops.pack_f16_pair(
                state.taa_luminance,
                linearize_depth(state.prev_depth, NEAR_PLANE, FAR_PLANE)),
                halo_taa)
            hdr_e, new_taa_luminance = taa_ops.temporal_supersampling(
                hdr_e, prev_packed, prev_ld, motion_e, depth_e,
                NEAR_PLANE, FAR_PLANE, width, height, camera_cut,
                use_tonemapping=settings.taa.supersample_use_tonemapping,
                interpret=interpret)
            new_taa_luminance = halo_mod.crop_halo(new_taa_luminance,
                                                   halo_taa)
        hdr_e, taa_history = taa_ops.temporal_filter(
            hdr_e, extend(state.taa_history, halo_taa), motion_e, depth_e,
            jitter_px, camera_cut,
            width, height,
            use_clipping=settings.taa.use_clipping,
            use_motion_dilation=settings.taa.use_motion_vector_dilation,
            use_tonemapping=settings.taa.filter_use_tonemapping,
            history_sampling_tech=settings.taa.history_sampling_tech,
            interpret=interpret,
        )
        hdr = halo_mod.crop_halo(hdr_e, halo_taa)
        taa_history = halo_mod.crop_halo(taa_history, halo_taa)
    else:
        taa_history = state.taa_history

    # --- bloom (pass 16) ---
    if settings.bloom.enabled:
        if axis_name is not None:
            # exact split-frame bloom: band-local fine mips + all_gather'd
            # coarse pyramid (compute_bloom_banded docstring)
            hdr = bloom_ops.compute_bloom_banded(
                hdr, settings.bloom.strength, settings.bloom.blur_radius,
                settings.bloom.mip_count, axis_name, n_dev,
                lambda p, n: halo_mod.halo_extend(p, n, axis_name, n_dev))
        else:
            hdr = bloom_ops.compute_bloom(
                hdr, settings.bloom.strength, settings.bloom.blur_radius,
                settings.bloom.mip_count)

    # --- tonemap (pass 17) ---
    time = state.frame_index.astype(jnp.float32) * 0.016
    # global dither coordinates: in band mode the hash must see the frame
    # row, not the band row, to match the single-device image
    row0 = (jax.lax.axis_index(axis_name) * height
            if axis_name is not None else 0)
    image = post.tonemap_pass(hdr, time, row_offset=row0)[:height, :width]

    if settings.draw_bounding_boxes:
        # debug AABB wireframes (debug.vert, RenderFrontend.cpp:947-956);
        # band mode draws with the band's sub-frustum matrix, so each band
        # scatters only its own rows
        from ..ops import debugviz as debugviz_mod

        image = debugviz_mod.aabb_line_overlay(
            image, obj_bb_min, obj_bb_max, view_proj, width, height)

    if settings.sdf_debug.visualisation_mode != 0 and "sdf_volume" in scene:
        # sdfDebugVisualisation.comp — replaces the final image (the
        # reference writes the debug trace straight to the color target)
        from ..ops import debugviz

        dbg_scene = dict(scene)
        dbg_scene["sdf_volume"] = sdf_vol  # dynamic recomposite, if any
        dbg_scene["sdf_albedo"] = sdf_alb
        dbg = debugviz.sdf_debug_image(
            settings.sdf_debug.visualisation_mode, dbg_scene, cam, sky_lut,
            luts["transmission"], sun_dir, sun_color, sun_strength_exposed,
            pw, ph, tan_fov_half, aspect)
        image = jnp.moveaxis(
            jnp.clip(jnp.round(dbg[:, :height, :width] * 255.0), 0, 255),
            0, -1).astype(jnp.uint8)

    new_state = state._replace(
        frame_index=state.frame_index + 1,
        exposure=new_exposure,
        prev_color=scene_color,
        prev_depth=depth,
        taa_luminance=new_taa_luminance,
        taa_history=taa_history,
        gi_history=new_gi_history,
        volumetric_history=new_vol_history,
        prev_view_projection=view_proj,
        prev_jitter=jitter_ndc,
        debug_counters=jnp.stack(
            [main_overflow, shadow_overflow]).astype(jnp.int32),
    )
    return image, new_state


@functools.partial(
    jax.jit,
    static_argnames=("settings", "n_frames", "interpret"),
    donate_argnames=("state",),
)
def render_flight(state, scene, cam_path, luts, delta_time,
                  settings: RenderSettings, n_frames: int,
                  interpret: bool = False):
    """Render n_frames consecutive frames in ONE dispatch (lax.scan).

    cam_path leaves carry a leading path dimension indexed on device by
    state.frame_index (the render_frame camera-path mode), so the scan body
    is exactly the per-frame program. Returns the LAST frame's image plus
    the final state. One executable launch covers the whole flight: the
    per-dispatch host latency (measured ~40 ms per execute through the
    tunneled TPU; also what any remote/batch deployment pays) amortizes to
    zero. This is the renderer's batch/flythrough mode — the analog of the
    reference presenting frames without CPU readback (its swapchain loop,
    Runtime/main.cpp:79-90); the interactive path still dispatches per
    frame for input latency.
    """
    body = render_frame.__wrapped__  # trace inline; scan reuses carries

    def step(carry, _):
        st, _last = carry
        img, st2 = body(st, scene, cam_path, luts, delta_time, settings,
                        interpret, None, None)
        return (st2, img), None

    # the last image rides the CARRY (not a stacked scan output): the frame
    # body is traced exactly ONCE — tracing it a second time for the final
    # frame doubled the whole module's XLA+Mosaic compile time (~2x of a
    # 400 s cold compile measured in round 3)
    img0 = jnp.zeros((settings.height, settings.width, 3), jnp.uint8)
    (state, image), _ = jax.lax.scan(step, (state, img0), None,
                                     length=n_frames)
    return image, state


def scene_to_device(rs) -> dict:
    """RenderScene (numpy) -> device array dict consumed by render_frame."""
    scene = {
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
        # first-triangle index per object (triangles are object-contiguous);
        # drives the gather-free per-triangle culling-mask expansion
        "tri_starts": jnp.asarray(np.searchsorted(
            rs.tri_object[:rs.triangle_count],
            np.arange(rs.object_count)).astype(np.int32)),
        # build-pose inverses: dynamic scenes compose per-frame matrices
        # with these to get delta transforms (App.cpp:64-74 analog). The
        # caller opts in by adding 'object_transforms' /
        # 'prev_object_transforms' (O, 4, 4) traced arrays to this dict.
        "object_build_inv": jnp.asarray(np.linalg.inv(
            np.asarray(rs.object_matrices, np.float64)).astype(np.float32)),
    }
    if rs.tex_word0 is not None:
        scene["mat_tex"] = jnp.asarray(rs.mat_tex)
        scene["tex_info"] = jnp.asarray(rs.tex_info)
        scene["tex_word0"] = jnp.asarray(rs.tex_word0)
        scene["tex_word1"] = jnp.asarray(rs.tex_word1)
    if getattr(rs, "alpha_masks", None) is not None:
        scene["alpha_masks"] = jnp.asarray(rs.alpha_masks)
        scene["tri_alpha_slot"] = jnp.asarray(rs.tri_alpha_slot)
    return scene


@functools.lru_cache(maxsize=4)
def _blue_noise_textures(count: int = 4, size: int = 32):
    """RenderFrontend.cpp:40-56 — 4 void-and-cluster blue-noise tiles."""
    tiles = [
        noise_mod.generate_blue_noise((size, size), seed=i).astype(np.float32)
        / 255.0
        for i in range(count)
    ]
    return np.stack(tiles)


def attach_global_sdf(scene_dict: dict, gsdf) -> dict:
    """Add the composited scene SDF (ops/sdf_scene.GlobalSDF) to the scene
    arrays, padded/quantized for the trace kernel."""
    vol = np.asarray(gsdf.volume)
    alb = np.asarray(gsdf.albedo)
    d, h, w = vol.shape
    from ..ops.sdfgi import BRICK, WINDOW, pack_albedo_volume, \
        quantize_sdf_volume

    # pad each axis to a multiple of the brick size, and to at least one
    # full 2x2x2-brick trace window
    def pad_amount(n):
        return max(WINDOW, (n + BRICK - 1) // BRICK * BRICK) - n

    pd, ph_, pw_ = pad_amount(d), pad_amount(h), pad_amount(w)
    vol = np.pad(vol, ((0, pd), (0, ph_), (0, pw_)), constant_values=1e4)
    alb = np.pad(alb, ((0, pd), (0, ph_), (0, pw_), (0, 0)),
                 constant_values=0.5)
    scene_dict = dict(scene_dict)
    scene_dict["sdf_volume"] = quantize_sdf_volume(
        jnp.asarray(vol), gsdf.voxel_size)
    scene_dict["sdf_albedo"] = pack_albedo_volume(jnp.asarray(alb))
    scene_dict["sdf_origin"] = jnp.asarray(gsdf.origin)
    scene_dict["sdf_voxel_size"] = float(gsdf.voxel_size)
    scene_dict["sdf_dims"] = jnp.asarray(vol.shape, jnp.float32)
    # zero-byte shape token: carries the volume dims STATICALLY (array
    # leaves are traced under jit; shapes are not) for the debug tracer
    scene_dict["sdf_shape"] = jnp.zeros(vol.shape + (0,), jnp.float32)
    # prebuilt coarse-fallback tables (static scenes reuse them every
    # frame; dynamic recomposites rebuild inside the frame jit instead)
    from ..ops.sdfgi import build_coarse_tables

    scene_dict["sdf_coarse"] = build_coarse_tables(
        scene_dict["sdf_volume"], scene_dict["sdf_albedo"], vol.shape)
    return scene_dict


def attach_dynamic_sdf(scene_dict: dict, dyn) -> dict:
    """Add per-dynamic-instance SDF data (ops/sdf_scene.DynamicSDFSet) so
    render_frame recomposites moved instances into the global volume each
    frame (requires 'object_transforms' in the scene dict)."""
    scene_dict = dict(scene_dict)
    scene_dict["sdf_dyn_vols"] = [jnp.asarray(v, jnp.float32)
                                  for v in dyn.volumes]
    # zero-byte tokens carrying each instance's STATIC window shape
    scene_dict["sdf_dyn_tokens"] = [
        jnp.zeros(tuple(wv) + (0,), jnp.float32) for wv in dyn.window_vox]
    scene_dict["sdf_dyn_pad_min"] = jnp.asarray(dyn.pad_min, jnp.float32)
    scene_dict["sdf_dyn_pad_max"] = jnp.asarray(dyn.pad_max, jnp.float32)
    scene_dict["sdf_dyn_albedo"] = jnp.asarray(dyn.albedo, jnp.float32)
    scene_dict["sdf_dyn_obj"] = jnp.asarray(dyn.object_index, jnp.int32)
    return scene_dict


def bake_static_luts(settings: RenderSettings):
    """Atmosphere-dependent LUTs + noise (rebaked only on settings change)."""
    transmission = sky.bake_transmission_lut(settings.atmosphere)
    multiscatter = sky.bake_multiscatter_lut(settings.atmosphere)
    return {
        "transmission": transmission,
        "multiscatter": multiscatter,
        "blue_noise": jnp.asarray(_blue_noise_textures()),
    }
