#!/usr/bin/env python
"""Microbenchmark for the shadow-atlas depth raster (the frame's hottest
pass, 108.7 ms of 207 ms device time in round 2).

Builds the bench scene's real 3-cascade atlas workload and times each
phase (geometry setup / binning / setup gather / Pallas raster) for a
matrix of strategies:
  - caster culling: none (round-2 behavior) vs front (the reference's
    shadow-pass cull mode, RenderFrontend.cpp:1576)
  - raster bin height `sub` in {8, 4, 2}

Usage: python tools/shadow_bench.py [--scale 4] [--subs 8,4,2]
       [--culls none,front] [--frames 5]
"""

import argparse
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CACHE_DIR = REPO / ".cache"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--subs", type=str, default="8,4,2")
    ap.add_argument("--culls", type=str, default="none,front")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(CACHE_DIR / "jax"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from plainrenderer_tpu.assets import procedural
    from plainrenderer_tpu.ops import raster, shadow
    from plainrenderer_tpu.render import frame as frame_mod
    from plainrenderer_tpu.render import scenebuild
    from plainrenderer_tpu.scene import camera as cam_mod
    from plainrenderer_tpu.scene.frustum import (expand_object_mask,
                                                 visible_objects_clipspace)
    from plainrenderer_tpu.utils import mathutils

    from profile_frame import hlo_scope_map, parse_trace  # noqa: E402

    s = args.scale
    cfg = procedural.AtriumConfig(
        columns_per_row=6, column_segments=16 * s,
        floor_subdiv=16 * s, box_count=12, box_subdiv=4 * s,
        banner_count=4)
    scene_data = procedural.build_atrium_scene(cfg)
    rs = scenebuild.build_render_scene(scene_data)
    scene = frame_mod.scene_to_device(rs)
    t_count = scene["corners"].shape[0]
    print(f"# triangles: {t_count}", file=sys.stderr)

    # bench camera + plausible depth range -> the real cascade matrices
    ext = cam_mod.extrinsic_from_angles([-9.0, -1.8, 0.0], pitch_deg=8.0,
                                        yaw_deg=10.0)
    cam = frame_mod.camera_arrays(ext.position, ext.forward, ext.right,
                                  ext.up)
    import math
    tan_fov_half = math.tan(math.radians(frame_mod.FOV_DEG) * 0.5)
    sun_dir = mathutils.direction_to_vector(
        jnp.asarray([50.0, 245.0], jnp.float32))
    n_cas, sres = 3, 2048
    cascade_mats, _, _ = shadow.compute_cascade_info(
        jnp.asarray(0.2, jnp.float32), jnp.asarray(0.995, jnp.float32),
        cam["position"], cam["forward"], cam["up"], cam["right"],
        tan_fov_half, 1920.0 / 1080.0, frame_mod.NEAR_PLANE,
        frame_mod.FAR_PLANE, sun_dir, n_cas,
        jnp.asarray(3.0, jnp.float32), jnp.asarray(30.0, jnp.float32))
    cascade_mats = jax.block_until_ready(cascade_mats)

    alpha_masks = scene.get("alpha_masks")
    alpha_slots = scene.get("tri_alpha_slot")

    def make_fn(sub, cull, rowskip=False, opaque=False, ew=None):
        s_nty = sres // (raster.TILE_H * sub)
        s_ntx = sres // raster.TILE_W

        @jax.jit
        def run(mats, scene, alpha_masks, alpha_slots):
            cas = mats[:n_cas]
            cas_visible = jax.vmap(
                lambda m: expand_object_mask(
                    visible_objects_clipspace(
                        m, scene["object_bb_min"], scene["object_bb_max"],
                        cull_z=False),
                    scene["tri_starts"], t_count))(cas)
            setup = jax.vmap(
                lambda m, vis: raster.geometry_setup(
                    scene["corners"], scene["corner_uvs"],
                    scene["corner_normals"], scene["corner_tangents"],
                    scene["corner_bitangents"], scene["tri_material"],
                    vis, m, m, sres, sres, cull=cull, with_attrs=False,
                    tri_alpha_slot=alpha_slots, bin_rows=sub)
            )(cas, cas_visible)
            y_off = (jnp.arange(n_cas, dtype=jnp.float32)
                     * sres).reshape(n_cas, 1, 1)
            edges_a = setup.edges.at[:, 2].add(-setup.edges[:, 1] * y_off)
            n_pl = edges_a.shape[2]
            edges_a = edges_a.transpose(1, 2, 0, 3).reshape(3, n_pl, -1)
            offs = (jnp.arange(n_cas, dtype=jnp.int32) * s_nty)[:, None]
            bbox_a = setup.tile_bbox.at[..., 0].add(offs)
            bbox_a = bbox_a.at[..., 2].add(offs)
            fine_offs = (jnp.arange(n_cas, dtype=jnp.int32)
                         * (sres // raster.TILE_H)).reshape(n_cas, 1, 1)
            atlas_setup = raster.TriangleSetup(
                edges=edges_a,
                attrs=jnp.zeros((raster.NATTR, 0), jnp.float32),
                tile_bbox=bbox_a.reshape(-1, 4),
                valid=setup.valid.reshape(-1),
                fine_y=(setup.fine_y + fine_offs).reshape(-1, 2))
            if opaque:
                # production opaque-stream path: 4-plane table, alpha
                # casters culled out, optional eval_width sweep
                import dataclasses as _dc
                is_a = jnp.tile(alpha_slots > 0, n_cas)
                atlas_setup = _dc.replace(
                    atlas_setup, edges=atlas_setup.edges[:, :4],
                    valid=atlas_setup.valid & ~is_a)
            pairs = raster.build_pairs(atlas_setup, n_cas * s_nty, s_ntx,
                                       n_views=n_cas, tile_cap=1 << 15,
                                       bin_rows=sub, order_rows=rowskip)
            edges_p, _ = raster.gather_pair_setups(atlas_setup, pairs, False,
                                                   row_extents=rowskip)
            atlas = raster.rasterize_depth(edges_p, pairs, n_cas * s_nty,
                                           s_ntx,
                                           alpha_masks=(None if opaque
                                                        else alpha_masks),
                                           sub=sub, row_skip=rowskip,
                                           eval_width=ew)
            return (atlas.sum(), jnp.sum(pairs.tile_count), pairs.overflow,
                    jnp.max(pairs.tile_count))
        return run

    results = {}
    for spec in args.culls.split(","):
        cull, *mods = spec.split("+")
        rowskip = "rowskip" in mods
        opaque = "opaque" in mods
        ew = None
        for m in mods:
            if m.startswith("ew"):
                ew = int(m[2:])
        for sub in (int(x) for x in args.subs.split(",")):
            if sres % (raster.TILE_H * sub):
                continue
            fn = make_fn(sub, cull, rowskip, opaque, ew)
            t0 = time.time()
            out = jax.block_until_ready(fn(cascade_mats, scene, alpha_masks, alpha_slots))
            compile_s = time.time() - t0
            lowered = fn.lower(cascade_mats, scene, alpha_masks, alpha_slots).compile()
            scope_by_op = hlo_scope_map(lowered.as_text())
            trace_dir = tempfile.mkdtemp(prefix="shbench_")
            t0 = time.time()
            with jax.profiler.trace(trace_dir):
                for _ in range(args.frames):
                    out = fn(cascade_mats, scene, alpha_masks, alpha_slots)
                jax.block_until_ready(out)
            wall_ms = (time.time() - t0) / args.frames * 1000.0
            per_scope, _, total = parse_trace(trace_dir, scope_by_op)
            import shutil
            shutil.rmtree(trace_dir, ignore_errors=True)
            n = args.frames
            key = f"cull={spec:13s} sub={sub}"
            rows = {k: v / n for k, v in per_scope.items()}
            results[key] = (wall_ms, total / n, rows, out, compile_s)
            print(f"\n=== {key}  wall {wall_ms:.1f} ms  device "
                  f"{total / n:.1f} ms  (compile {compile_s:.0f}s)")
            print(f"    pairs={int(out[1])}  overflow={int(out[2])} "
                  f"max_tile={int(out[3])}  checksum={float(out[0]):.1f}")
            for k, v in sorted(rows.items(), key=lambda kv: -kv[1]):
                if v >= 0.05:
                    print(f"    {k:40s} {v:8.2f}")

    print("\nsummary (device ms):")
    for key, (wall, dev, rows, out, _) in results.items():
        rd = rows.get("raster.depth", 0.0)
        print(f"  {key}: total {dev:7.2f}  raster.depth {rd:7.2f} "
              f" pairs {int(out[1]):>8d}")


if __name__ == "__main__":
    main()
