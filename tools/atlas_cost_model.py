#!/usr/bin/env python
"""Cost model for the shadow-atlas opaque depth kernel (round 5 perf).

Reconstructs the exact pair stream the frame builds (bench scene, bench
camera, production bin grids) in numpy and reports what the Pallas kernel
actually evaluates:

  - live pairs and their fine-row spans (ideal work = sum spans x 2048 px)
  - per-(GROUP slice of EVAL_WIDTH pairs) gated sub-block evals: the
    kernel's real work unit is (32 pairs x 2048 px) per live sub-block in
    the slice's [min fy0, max fy1] range
  - padding waste: slices partially outside [lead, lead+count), sub-block
    over-evaluation from mixing spans in one slice

This is a MODEL of ops/raster._depth_resolve_loop with row_skip=True; it
must be kept in sync with EVAL_WIDTH/GROUP there.  Pure numpy, no TPU.

Usage: JAX_PLATFORMS=cpu python tools/atlas_cost_model.py [--scale 4]
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
    ap.add_argument("--sres", type=int, default=2048)
    ap.add_argument("--sub", type=int, default=None)
    ap.add_argument("--ew", type=int, default=None)
    args = ap.parse_args()

    import os
    if os.path.exists("/tmp/atlas_setup.npz") and not os.environ.get(
            "ATLAS_MODEL_REBUILD"):
        d = np.load("/tmp/atlas_setup.npz")
        run_model(d["valid"], d["bbox"], d["fine"], d["alpha"],
                  args.sres, args.sub, args.ew)
        return

    import jax
    import jax.numpy as jnp

    from plainrenderer_tpu.assets import procedural
    from plainrenderer_tpu.ops import raster, shadow
    from plainrenderer_tpu.render import frame as frame_mod
    from plainrenderer_tpu.render import scenebuild
    from plainrenderer_tpu.scene import camera as cam_mod
    from plainrenderer_tpu.scene.frustum import (expand_object_mask,
                                                 visible_objects_clipspace)
    from plainrenderer_tpu.utils import mathutils

    s = args.scale
    cfg = procedural.AtriumConfig(
        columns_per_row=6, column_segments=16 * s,
        floor_subdiv=16 * s, box_count=12, box_subdiv=4 * s, banner_count=4)
    rs = scenebuild.build_render_scene(procedural.build_atrium_scene(cfg))
    scene = frame_mod.scene_to_device(rs)
    t_count = scene["corners"].shape[0]

    ext = cam_mod.extrinsic_from_angles([-9.0, -1.8, 0.0], pitch_deg=8.0,
                                        yaw_deg=10.0)
    cam = frame_mod.camera_arrays(ext.position, ext.forward, ext.right,
                                  ext.up)
    import math
    tan_fov_half = math.tan(math.radians(frame_mod.FOV_DEG) * 0.5)
    sun_dir = mathutils.direction_to_vector(
        jnp.asarray([50.0, 245.0], jnp.float32))
    n_cas, sres = 3, args.sres
    cascade_mats, _, _ = shadow.compute_cascade_info(
        jnp.asarray(0.2, jnp.float32), jnp.asarray(0.995, jnp.float32),
        cam["position"], cam["forward"], cam["up"], cam["right"],
        tan_fov_half, 1920.0 / 1080.0, frame_mod.NEAR_PLANE,
        frame_mod.FAR_PLANE, sun_dir, n_cas,
        jnp.asarray(3.0, jnp.float32), jnp.asarray(30.0, jnp.float32))

    sub = args.sub or frame_mod.shadow_bin_sub(sres)
    ew = args.ew or raster.EVAL_WIDTH
    alpha_slots = scene.get("tri_alpha_slot")

    import time
    print("building atlas setup...", flush=True)
    t0 = time.time()
    atlas_setup = frame_mod.shadow_atlas_setup(
        scene, scene["corners"], scene["corner_normals"],
        scene["corner_tangents"], scene["corner_bitangents"],
        scene["object_bb_min"], scene["object_bb_max"],
        cascade_mats, n_cas, sres, alpha_slots, t_count)
    print(f"atlas setup done in {time.time() - t0:.1f}s", flush=True)
    run_model(np.asarray(atlas_setup.valid), np.asarray(atlas_setup.tile_bbox),
              np.asarray(atlas_setup.fine_y), np.asarray(alpha_slots),
              sres, sub, ew)


def run_model(valid_raw, bbox, fine, alpha_slots, sres, sub, ew):
    from plainrenderer_tpu.ops import raster
    sub = sub or 8
    ew = ew or raster.EVAL_WIDTH
    n_cas = 3
    is_alpha = np.tile(np.asarray(alpha_slots) > 0, n_cas)
    valid = valid_raw & ~is_alpha

    s_ntx = sres // raster.TILE_W
    n_bins_y = n_cas * (sres // (raster.TILE_H * sub))

    ty0, tx0, ty1, tx1 = (np.where(valid, bbox[:, i], (1, 1, 0, 0)[i])
                          for i in range(4))
    span_y = np.maximum(ty1 - ty0 + 1, 0)
    span_x = np.maximum(tx1 - tx0 + 1, 0)
    span = np.where(valid, span_y * span_x, 0)
    live_t = int(valid.sum())
    total_pairs = int(span.sum())
    print(f"live opaque {live_t}")
    print(f"pairs: {total_pairs} (sub={sub}, ew={ew}, bins {n_bins_y}x{s_ntx})")

    # emit pairs exactly like build_pairs(order_rows=True)
    tri = np.repeat(np.arange(len(span)), span)
    k = np.arange(len(tri)) - np.repeat(np.cumsum(span) - span, span)
    dy = k // np.maximum(span_x[tri], 1)
    dx = k - dy * np.maximum(span_x[tri], 1)
    tile = (ty0[tri] + dy) * s_ntx + tx0[tri] + dx
    rel_fy0 = np.clip(fine[tri, 0] - ty0[tri] * sub, 0, sub - 1)
    kymin = np.maximum(rel_fy0 - dy * sub, 0)
    order = np.lexsort((tri, kymin, tile))
    tri_s, tile_s = tri[order], tile[order]
    # per-pair fine-row range clipped to its bin
    f0 = np.clip(fine[tri_s, 0] - (tile_s // s_ntx) * sub, 0, sub - 1)
    f1 = np.clip(fine[tri_s, 1] - (tile_s // s_ntx) * sub, 0, sub - 1)
    rows_pair = np.maximum(f1 - f0 + 1, 1)
    ideal_pairpx = int(rows_pair.sum()) * raster.PX_PER_TILE // 1
    print(f"ideal work: {rows_pair.sum()} pair-sub-blocks "
          f"({rows_pair.mean():.2f} rows/pair) = "
          f"{rows_pair.sum() * 2048 / 1e6:.0f} M pair-px")

    # kernel model: per tile segment, GROUP-aligned base, slices of ew
    starts = np.searchsorted(tile_s, np.arange(n_bins_y * s_ntx))
    ends = np.searchsorted(tile_s, np.arange(n_bins_y * s_ntx) + 1)
    slice_evals = 0        # (slice, sub-block) evals actually run
    slice_count = 0        # live slices (the fixed per-slice cost unit)
    groups = 0
    for t in range(n_bins_y * s_ntx):
        st, en = starts[t], ends[t]
        cnt = en - st
        if cnt == 0:
            continue
        base = st // raster.GROUP * raster.GROUP
        lead = st - base
        ng = (lead + cnt + raster.GROUP - 1) // raster.GROUP
        groups += ng
        for g in range(ng):
            for j in range(raster.GROUP // ew):
                r0 = g * raster.GROUP + j * ew
                if not (r0 < lead + cnt and r0 + ew > lead):
                    continue
                lo = max(r0, lead) - lead + st
                hi = min(r0 + ew, lead + cnt) - lead + st
                fmin = f0[lo:hi].min()
                fmax = f1[lo:hi].max()
                slice_count += 1
                slice_evals += int(fmax - fmin + 1)
    px = raster.PX_PER_TILE
    print(f"kernel model: groups={groups} live_slices={slice_count} "
          f"slice-sub-evals={slice_evals}")
    print(f"  eval volume = {slice_evals} x {ew} x {px} px "
          f"= {slice_evals * ew * px / 1e9:.2f} G pair-px")
    print(f"  vs ideal {rows_pair.sum() * px / 1e9:.2f} G "
          f"(waste {slice_evals * ew * px / max(rows_pair.sum() * px, 1):.2f}x)")
    # occupancy of slices
    occ = []
    for t in range(n_bins_y * s_ntx):
        st, en = starts[t], ends[t]
        if en > st:
            occ.append(en - st)
    occ = np.asarray(occ)
    print(f"  segments: n={len(occ)} mean={occ.mean():.1f} "
          f"p50={np.percentile(occ, 50):.0f} p95={np.percentile(occ, 95):.0f} "
          f"max={occ.max()}")


if __name__ == "__main__":
    main()
