#!/usr/bin/env python
"""Pair-stream statistics on the bench scene: real pairs vs static budget.

The rasterizer's exact prefix-sum emission (ops/raster.build_pairs) sizes
its stream with ONE static pair_budget; the row gather that duplicates
triangle setups into pair order pays for every STATIC slot, sentinels
included. This tool prints, per view (main + shadow atlas):
  - live triangles after culling,
  - real pairs (sum of tile counts),
  - static stream slots (what the sort + gather actually process),
  - overflow (dropped pairs — must be 0).
Use it to size pair budgets before perf work.

Usage: python tools/pair_stats.py [--scale 4] [--width 1920 --height 1080]
       (add JAX_PLATFORMS=cpu for a CPU run; numbers are identical)
"""

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()

    import jax.numpy as jnp

    from plainrenderer_tpu.assets import procedural
    from plainrenderer_tpu.config import RenderSettings
    from plainrenderer_tpu.ops import raster, shadow
    from plainrenderer_tpu.render import frame as frame_mod
    from plainrenderer_tpu.render import scenebuild
    from plainrenderer_tpu.scene import camera as cam_mod
    from plainrenderer_tpu.scene.frustum import (expand_object_mask,
                                                 visible_objects_clipspace)

    s = args.scale
    cfg = procedural.AtriumConfig(
        columns_per_row=6, column_segments=16 * s,
        floor_subdiv=16 * s, box_count=12, box_subdiv=4 * s, banner_count=4)
    rs = scenebuild.build_render_scene(procedural.build_atrium_scene(cfg))
    dev = frame_mod.scene_to_device(rs)
    settings = RenderSettings(width=args.width, height=args.height)
    pw, ph = raster.pad_resolution(args.width, args.height)
    # production bin grids (frame_mod.main_bin_sub / shadow_bin_sub), so
    # pair/overflow numbers here predict render_frame behavior exactly
    m_sub = frame_mod.main_bin_sub(ph)
    nty, ntx = ph // (raster.TILE_H * m_sub), pw // raster.TILE_W

    ext = cam_mod.extrinsic_from_angles([-9.0, -1.8, 0.0], pitch_deg=8.0,
                                        yaw_deg=10.0)
    view = cam_mod.view_matrix_from_extrinsic(ext.position, ext.forward,
                                              ext.right, ext.up)
    proj = cam_mod.projection_matrix_from_intrinsic(
        60.0, pw / ph, 0.1, 200.0)
    vp = jnp.asarray(proj @ view, jnp.float32)

    t_count = dev["corners"].shape[0]
    vis = expand_object_mask(
        visible_objects_clipspace(vp, dev["object_bb_min"],
                                  dev["object_bb_max"]),
        dev["tri_starts"], t_count)

    def report(name, setup, n_ty, n_tx, n_views=1, tile_cap=None,
               bin_rows=1):
        pairs = raster.build_pairs(setup, n_ty, n_tx, n_views=n_views,
                                   tile_cap=tile_cap, bin_rows=bin_rows)
        live = int(np.asarray(setup.valid.sum()))
        real = int(np.asarray(pairs.tile_count.sum()))
        slots = int(pairs.pair_tri.shape[0])
        ov = int(np.asarray(pairs.overflow))
        print(f"{name:18s} tris={setup.valid.shape[0]:>9,} "
              f"live={live:>9,} real_pairs={real:>9,} "
              f"static_slots={slots:>10,} fill={real / max(slots, 1):.1%} "
              f"overflow={ov}")

    setup = raster.geometry_setup(
        dev["corners"], dev["corner_uvs"], dev["corner_normals"],
        dev["corner_tangents"], dev["corner_bitangents"],
        dev["tri_material"], vis, vp, vp, pw, ph, cull="back",
        near_w=frame_mod.NEAR_PLANE, bin_rows=m_sub)
    report("main view", setup, nty, ntx, bin_rows=m_sub)

    # shadow cascade atlas (the exact path render_frame takes)
    sres = settings.shadows.resolution
    n_casc = settings.shadows.cascade_count
    sun_dir = jnp.asarray([0.3, -0.8, 0.2], jnp.float32)
    sun_dir = sun_dir / jnp.linalg.norm(sun_dir)
    tan_fov_half = float(np.tan(np.deg2rad(30.0)))
    cascade_mats, _, _ = shadow.compute_cascade_info(
        jnp.asarray(0.2), jnp.asarray(60.0),
        jnp.asarray(ext.position), jnp.asarray(ext.forward),
        jnp.asarray(ext.up), jnp.asarray(ext.right),
        tan_fov_half, pw / ph, frame_mod.NEAR_PLANE, frame_mod.FAR_PLANE,
        sun_dir, n_casc,
        jnp.asarray(settings.sdf_trace.influence_radius, jnp.float32),
        jnp.asarray(settings.volumetrics.max_distance, jnp.float32),
        sample_radius=settings.shadows.sample_radius)
    atlas_setup = frame_mod.shadow_atlas_setup(
        dev, dev["corners"], dev["corner_normals"], dev["corner_tangents"],
        dev["corner_bitangents"], dev["object_bb_min"],
        dev["object_bb_max"], cascade_mats, n_casc, sres,
        dev.get("tri_alpha_slot"), t_count)
    s_sub = frame_mod.shadow_bin_sub(sres)
    report("shadow atlas", atlas_setup,
           n_casc * sres // (raster.TILE_H * s_sub),
           sres // raster.TILE_W, n_views=n_casc, tile_cap=1 << 15,
           bin_rows=s_sub)


if __name__ == "__main__":
    main()
