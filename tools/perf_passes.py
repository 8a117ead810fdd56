#!/usr/bin/env python
"""Per-pass timing breakdown on the real TPU.

The analog of the reference's timestamp-query table
(Backend/VulkanTimestampQueries.cpp:45-92 + RenderFrontend.cpp:1858-1879):
each pass of the frame is jitted and timed standalone with realistic
1080p-scale inputs, so regressions and optimization targets are visible
per pass rather than only as a whole-frame number.

Usage: python tools/perf_passes.py [--width 1920 --height 1080] [--scale 2]
"""

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def timed(fn, *args, n=20, warmup=3, **kwargs):
    import jax

    jfn = jax.jit(fn)
    out = jfn(*args, **kwargs)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = jfn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = jfn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--scale", type=int, default=2)
    ap.add_argument("--frames", type=int, default=20)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".cache/jax"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import numpy as np

    from plainrenderer_tpu.assets import procedural
    from plainrenderer_tpu.config import RenderSettings
    from plainrenderer_tpu.ops import bloom as bloom_ops
    from plainrenderer_tpu.ops import exposure as exposure_ops
    from plainrenderer_tpu.ops import post, raster, sdfgi, shade, shadow, sky
    from plainrenderer_tpu.ops import taa as taa_ops
    from plainrenderer_tpu.render import frame as frame_mod
    from plainrenderer_tpu.render import scenebuild
    from plainrenderer_tpu.render.state import initial_state
    from plainrenderer_tpu.scene import camera as cam_mod

    s = args.scale
    cfg = procedural.AtriumConfig(
        columns_per_row=6, column_segments=16 * s,
        floor_subdiv=16 * s, box_count=12, box_subdiv=4 * s)
    scene_data = procedural.build_atrium_scene(cfg)
    rs = scenebuild.build_render_scene(scene_data)
    scene = frame_mod.scene_to_device(rs)
    settings = RenderSettings(width=args.width, height=args.height)
    pw, ph = raster.pad_resolution(args.width, args.height)
    nty, ntx = ph // raster.TILE_H, pw // raster.TILE_W
    print(f"# {rs.triangle_count} triangles, {pw}x{ph} padded, "
          f"{nty}x{ntx} tiles", file=sys.stderr)

    luts = frame_mod.bake_static_luts(settings)
    ext = cam_mod.extrinsic_from_angles([-9.0, -1.8, 0.0], pitch_deg=8.0,
                                        yaw_deg=10.0)
    cam = frame_mod.camera_arrays(ext.position, ext.forward, ext.right,
                                  ext.up)
    view = jnp.eye(4)
    import math

    view = frame_mod._view_matrix(cam)
    proj = frame_mod._projection(settings)
    view_proj = proj @ view

    rows = []

    def rec(name, ms):
        rows.append((name, ms))
        print(f"{name:32s} {ms:8.3f} ms", flush=True)

    # geometry + binning (XLA)
    def geom(corners, uvs, nrm, tan, bit, mat):
        setup = raster.geometry_setup(
            corners, uvs, nrm, tan, bit, mat,
            jnp.ones(corners.shape[0], bool), view_proj, view_proj, pw, ph)
        pairs = raster.build_pairs(setup, nty, ntx)
        pe, pa = raster.gather_pair_setups(setup, pairs, True)
        return pe, pa, pairs.pair_tri, pairs.tile_start, pairs.tile_count

    t = timed(lambda: geom(scene["corners"], scene["corner_uvs"],
                           scene["corner_normals"], scene["corner_tangents"],
                           scene["corner_bitangents"], scene["tri_material"]),
              n=args.frames)
    rec("geometry+binning+gather", t)

    # --- binning sub-steps ---
    t = timed(lambda: raster.geometry_setup(
        scene["corners"], scene["corner_uvs"], scene["corner_normals"],
        scene["corner_tangents"], scene["corner_bitangents"],
        scene["tri_material"], jnp.ones(scene["corners"].shape[0], bool),
        view_proj, view_proj, pw, ph), n=args.frames)
    rec("  geometry_setup only", t)
    setup0 = raster.geometry_setup(
        scene["corners"], scene["corner_uvs"], scene["corner_normals"],
        scene["corner_tangents"], scene["corner_bitangents"],
        scene["tri_material"], jnp.ones(scene["corners"].shape[0], bool),
        view_proj, view_proj, pw, ph)
    t = timed(lambda s: raster.build_pairs(s, nty, ntx), setup0,
              n=args.frames)
    rec("  build_pairs only", t)
    pairs0 = raster.build_pairs(setup0, nty, ntx)
    t = timed(lambda s, p: raster.gather_pair_setups(s, p, True), setup0,
              pairs0, n=args.frames)
    rec("  gather_pair_setups only", t)

    # shadow-view prep (cull=none, no attrs, 1024^2)
    sres0 = settings.shadows.resolution
    t = timed(lambda: (lambda s: (raster.build_pairs(
        s, sres0 // raster.TILE_H, sres0 // raster.TILE_W),
        raster.gather_pair_setups(s, raster.build_pairs(
            s, sres0 // raster.TILE_H, sres0 // raster.TILE_W), False)))(
        raster.geometry_setup(
            scene["corners"], scene["corner_uvs"], scene["corner_normals"],
            scene["corner_tangents"], scene["corner_bitangents"],
            scene["tri_material"], jnp.ones(scene["corners"].shape[0], bool),
            view_proj, view_proj, sres0, sres0, cull="none",
            with_attrs=False)), n=args.frames)
    rec(f"shadow geometry+binning {sres0}^2 (x"
        f"{settings.shadows.cascade_count})", t)

    setup = raster.geometry_setup(
        scene["corners"], scene["corner_uvs"], scene["corner_normals"],
        scene["corner_tangents"], scene["corner_bitangents"],
        scene["tri_material"], jnp.ones(scene["corners"].shape[0], bool),
        view_proj, view_proj, pw, ph)
    pairs = raster.build_pairs(setup, nty, ntx)
    pair_edges, pair_attrs = raster.gather_pair_setups(setup, pairs, True)
    print(f"# pair stream: {pair_edges.shape}", file=sys.stderr)

    t = timed(lambda pe, pa: raster.rasterize_gbuffer(
        pe, pa, pairs, nty, ntx), pair_edges, pair_attrs, n=args.frames)
    rec("raster gbuffer kernel", t)

    depth, vis, gbuf = jax.jit(lambda pe, pa: raster.rasterize_gbuffer(
        pe, pa, pairs, nty, ntx))(pair_edges, pair_attrs)
    valid = vis >= 0

    # shadow cascades: one depth raster at 2048^2
    sres = settings.shadows.resolution
    s_nty, s_ntx = sres // raster.TILE_H, sres // raster.TILE_W
    s_setup = raster.geometry_setup(
        scene["corners"], scene["corner_uvs"], scene["corner_normals"],
        scene["corner_tangents"], scene["corner_bitangents"],
        scene["tri_material"], jnp.ones(scene["corners"].shape[0], bool),
        view_proj, view_proj, sres, sres, cull="none", with_attrs=False)
    s_pairs = raster.build_pairs(s_setup, s_nty, s_ntx)
    s_edges, _ = raster.gather_pair_setups(s_setup, s_pairs, False)
    t = timed(lambda pe: raster.rasterize_depth(pe, s_pairs, s_nty, s_ntx),
              s_edges, n=args.frames)
    rec(f"shadow depth raster {sres}^2 (x{settings.shadows.cascade_count})",
        t)

    # shadow resolve
    inv_vp = jnp.linalg.inv(view_proj)
    world_pos = shade.reconstruct_world_position(depth, inv_vp, pw, ph)
    pixel_depth = jnp.where(valid, 5.0, 0.0)
    noise = jnp.tile(luts["blue_noise"][0],
                     (ph // 32 + 1, pw // 32 + 1))[:ph, :pw]
    maps = jnp.zeros((shadow.MAX_CASCADES, sres, sres), jnp.float32)
    mats = jnp.stack([jnp.eye(4)] * shadow.MAX_CASCADES)
    scales = jnp.ones((shadow.MAX_CASCADES, 2))
    splits = jnp.asarray([10.0, 20.0, 40.0, 300.0])
    t = timed(lambda wp: shadow.shadow_resolve(
        wp, pixel_depth, noise, maps, mats, scales, splits, 4),
        world_pos, n=args.frames)
    rec("shadow resolve (PCF kernel)", t)

    # forward shade
    t = timed(lambda wp, gb: shade.shade_forward(
        config=settings.shading, world_pos=wp,
        geo_normal=gb[raster._CH_N:raster._CH_N + 3],
        tangent=gb[raster._CH_T:raster._CH_T + 3],
        bitangent=gb[raster._CH_B:raster._CH_B + 3],
        valid=valid,
        albedo_srgb_linear=jnp.ones((3, ph, pw)) * 0.5,
        normal_ts=jnp.zeros((2, ph, pw)),
        specular=jnp.ones((3, ph, pw)) * 0.5,
        sun_direction=jnp.asarray([0.5, -0.7, 0.5]),
        sun_color=jnp.ones(3),
        sun_strength_exposed=jnp.asarray(50.0),
        sun_shadow=noise,
        camera_position=cam["position"]),
        world_pos, gbuf, n=args.frames)
    rec("forward shade", t)

    # sky LUT + apply
    t = timed(lambda: sky.bake_sky_lut(
        jnp.asarray([0.5, -0.7, 0.5]), jnp.asarray(50.0),
        luts["multiscatter"], settings=settings.atmosphere), n=args.frames)
    rec("sky LUT bake", t)

    hdr = jnp.ones((3, ph, pw)) * 0.5
    vd = sky.view_directions(pw, ph, cam["forward"], cam["up"], cam["right"],
                             math.tan(math.radians(frame_mod.FOV_DEG) / 2),
                             pw / ph)
    sky_lut = sky.bake_sky_lut(jnp.asarray([0.5, -0.7, 0.5]),
                               jnp.asarray(50.0), luts["multiscatter"],
                               settings=settings.atmosphere)
    t = timed(lambda h: sky.apply_sky(
        h, valid, sky_lut, luts["transmission"], vd,
        jnp.asarray([0.5, -0.7, 0.5]), jnp.asarray(50.0)), hdr,
        n=args.frames)
    rec("sky apply", t)

    # GI (half res)
    gh, gw = ph // 2, pw // 2
    gh = (gh + raster.TILE_H - 1) // raster.TILE_H * raster.TILE_H
    gw = (gw + raster.TILE_W - 1) // raster.TILE_W * raster.TILE_W
    nb = 8 * 8 * 8
    sdfv = jnp.zeros((nb, 8, 128), jnp.int32)
    albv = jnp.zeros((nb, 32, 128), jnp.int32)
    wpos_g = jnp.zeros((3, gh, gw))
    dirs_g = jnp.zeros((3, gh, gw)).at[1].set(-1.0)
    sky_low = jnp.ones((3, 32, 64))
    t = timed(lambda wp: sdfgi.trace_gi(
        wp, dirs_g, dirs_g, jnp.ones((gh, gw), bool), sky_low, sdfv, albv,
        jnp.zeros(3), 0.25, jnp.asarray([128.0, 128.0, 128.0]),
        jnp.asarray([0.5, -0.7, 0.5]), jnp.ones(3), jnp.asarray(50.0),
        steps=settings.sdf_trace.trace_steps), wpos_g, n=args.frames)
    rec(f"GI trace kernel ({gw}x{gh}, {settings.sdf_trace.trace_steps} steps)",
        t)

    y_sh = jnp.zeros((4, gh, gw))
    cocg = jnp.zeros((2, gh, gw))
    lind = jnp.ones((gh, gw)) * 5.0
    t = timed(lambda y, c: sdfgi.spatial_filter(
        y, c, dirs_g, wpos_g, lind, jnp.asarray(0), 1.5, 500.0, seed=0),
        y_sh, cocg, n=args.frames)
    rec("GI spatial filter (one of two)", t)

    t = timed(lambda y, c: sdfgi.neighborhood_resolve(y, c, dirs_g, lind),
              y_sh, cocg, n=args.frames)
    rec("GI neighborhood resolve", t)

    hist3 = jnp.zeros((3, gh, gw), jnp.int32)
    motion_g = jnp.zeros((2, gh, gw))
    t = timed(lambda h: taa_ops.resample_packed_planes(
        h, motion_g, args.width, args.height), hist3, n=args.frames)
    rec("GI history resample kernel", t)

    # TAA
    hist = jnp.zeros((ph, pw), jnp.int32)
    motion = jnp.zeros((2, ph, pw))
    t = timed(lambda h, m: taa_ops.temporal_filter(
        hdr, h, m, depth, jnp.zeros(2), jnp.asarray(False),
        args.width, args.height), hist, motion, n=args.frames)
    rec("TAA temporal filter", t)

    # bloom + tonemap + exposure
    t = timed(lambda h: bloom_ops.compute_bloom(h, 0.02, 1.5, 6), hdr,
              n=args.frames)
    rec("bloom chain", t)

    t = timed(lambda h: post.tonemap_pass(h, jnp.asarray(0.0)), hdr,
              n=args.frames)
    rec("tonemap", t)

    t = timed(lambda h: exposure_ops.compute_histogram(h, jnp.asarray(1.0)),
              hdr, n=args.frames)
    rec("exposure histogram", t)

    # volumetrics chain (froxel grid w/8 x h/8 x 64)
    from plainrenderer_tpu.config import VolumetricsSettings
    from plainrenderer_tpu.ops import volumetrics as vol_ops

    vs = VolumetricsSettings()
    fd, fh, fw = 64, ph // 8, pw // 8
    tanf = math.tan(math.radians(frame_mod.FOV_DEG) / 2)

    def vol_chain(hist):
        fpos = vol_ops.froxel_world_positions(
            (fw, fh, fd), cam, tanf, pw / ph, vs.max_distance)
        mat = vol_ops.material_volume(fpos, vs, jnp.zeros(3))
        cd, ch, cw = fd // 4, fh // 4, fw // 4
        cpos = vol_ops.froxel_world_positions(
            (cw, ch, cd), cam, tanf, pw / ph, vs.max_distance)
        scat = vol_ops.light_scattering(
            mat, fpos, jnp.ones((cd, ch, cw)), cam,
            jnp.asarray([0.5, -0.7, 0.5]), jnp.ones(3), jnp.asarray(50.0),
            vs.phase_g, ambient=vs.ambient)
        scat = vol_ops.temporal_reprojection(
            scat, hist, cpos, view_proj, cam["position"], cam["forward"],
            vs.max_distance, jnp.asarray(False))
        integ = vol_ops.integrate_froxels(scat, vs.max_distance)
        return vol_ops.apply_froxel_fog(
            hdr, jnp.full((ph, pw), 5.0), integ, vs.max_distance, noise)

    hist_vol = jnp.zeros((4, fd, fh, fw))
    t = timed(vol_chain, hist_vol, n=args.frames)
    rec("volumetrics chain (all passes)", t)

    # texture sampling
    if "tex_word0" in scene:
        from plainrenderer_tpu.assets.textures import MAX_MIPS
        from plainrenderer_tpu.ops import texture as texture_ops

        t = timed(lambda gb: texture_ops.sample_materials(
            gb[raster._CH_U:raster._CH_U + 2],
            gb[raster._CH_DUDX:raster._CH_DUDX + 4],
            gb[raster._CH_MAT], valid,
            scene["mat_tex"], scene["tex_info"],
            scene["tex_word0"], scene["tex_word1"],
            n_mips=MAX_MIPS, mip_bias=-1.0), gbuf, n=args.frames)
        rec("texture sampling kernel", t)

    t = timed(lambda gb: post.material_lookup(
        scene["material_table"], gb[raster._CH_MAT], valid), gbuf,
        n=args.frames)
    rec("material constant lookup", t)

    total = sum(ms for _, ms in rows)
    print(f"{'SUM of standalone passes':32s} {total:8.3f} ms")


if __name__ == "__main__":
    main()
