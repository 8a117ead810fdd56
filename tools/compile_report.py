#!/usr/bin/env python
"""Whole-frame compile-time attribution (VERDICT r3 task 3).

Times trace+lower and XLA+Mosaic compile of render_frame at bench shapes
(1080p, scale-4 atrium, 3x2048 cascades) for a ladder of settings variants,
so subsystem compile cost = full - variant-without-it. Persistent cache is
DISABLED: every number is a true cold compile.

Usage: python tools/compile_report.py [--variants full,no_gi,...] [--flight]
Writes a markdown table to stdout; redirect into COMPILE_rNN.md.
"""

import argparse
import dataclasses
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=(
        "no_shadow_alpha,no_alpha,no_gi,no_taa,no_vol,no_bloom,"
        "no_shadows,minimal,full"))
    ap.add_argument("--flight", action="store_true",
                    help="also compile the 60-frame render_flight wrapper")
    ap.add_argument("--scale", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from plainrenderer_tpu.assets import procedural
    from plainrenderer_tpu.config import (RenderSettings, SDFTraceSettings,
                                          ShadowSettings, TAASettings,
                                          VolumetricsSettings, BloomSettings)
    from plainrenderer_tpu.render import frame as frame_mod
    from plainrenderer_tpu.render.state import initial_state
    from plainrenderer_tpu.scene import camera as cam_mod

    s = args.scale
    cfg = procedural.AtriumConfig(
        columns_per_row=6, column_segments=16 * s,
        floor_subdiv=16 * s, box_count=12, box_subdiv=4 * s,
        banner_count=4)
    from plainrenderer_tpu.render import scenebuild
    scene_data = procedural.build_atrium_scene(cfg)
    rs = scenebuild.build_render_scene(scene_data)
    scene = frame_mod.scene_to_device(rs)
    print(f"# triangles: {rs.triangle_count}", file=sys.stderr)

    # GI volume: shapes drive compile time, not content — attach a dummy
    # volume matching the bench bake's class (cap 32 -> ~160^3 global)
    cache = sorted((REPO / ".cache").glob("sdf_*.npz"))
    if cache:
        data = np.load(cache[0])
        from plainrenderer_tpu.ops import sdf_scene
        gsdf = sdf_scene.GlobalSDF(
            volume=data["volume"], albedo=data["albedo"],
            origin=data["origin"], voxel_size=float(data["voxel_size"]))
        scene = frame_mod.attach_global_sdf(scene, gsdf)
        print(f"# sdf dims: {data['volume'].shape}", file=sys.stderr)
    else:
        print("# no cached SDF -> no_gi only", file=sys.stderr)

    base = RenderSettings(width=1920, height=1080)
    variants = {
        "full": base,
        "no_gi": dataclasses.replace(
            base, sdf_trace=SDFTraceSettings(enabled=False)),
        "no_taa": dataclasses.replace(base, taa=TAASettings(enabled=False)),
        "no_vol": dataclasses.replace(
            base, volumetrics=VolumetricsSettings(enabled=False)),
        "no_bloom": dataclasses.replace(
            base, bloom=BloomSettings(enabled=False)),
        "no_shadows": dataclasses.replace(
            base, shadows=ShadowSettings(cascade_count=0)),
        "minimal": dataclasses.replace(
            base,
            sdf_trace=SDFTraceSettings(enabled=False),
            taa=TAASettings(enabled=False),
            volumetrics=VolumetricsSettings(enabled=False),
            bloom=BloomSettings(enabled=False),
            shadows=ShadowSettings(cascade_count=0)),
    }

    luts = frame_mod.bake_static_luts(base)
    state = initial_state(1920, 1080)
    ext = cam_mod.extrinsic_from_angles([-9.0, -1.8, 0.0], pitch_deg=8.0,
                                        yaw_deg=10.0)
    cam = frame_mod.camera_arrays(ext.position, ext.forward, ext.right,
                                  ext.up)

    # scene variants: alpha-split cost = full - no_alpha
    scene_noalpha = {k: v for k, v in scene.items()
                     if k not in ("alpha_masks", "tri_alpha_slot")}

    rows = []
    for name in args.variants.split(","):
        sc = scene
        if name == "no_alpha":
            sc, st = scene_noalpha, base
        elif name == "no_shadow_alpha":
            # alpha masks only in the MAIN view split: shadow alpha pass
            # cost shows as full - this (needs a code toggle; approximate
            # by no_alpha for now) -- skipped
            continue
        else:
            st = variants[name]
        t0 = time.time()
        lowered = frame_mod.render_frame.lower(
            state, sc, cam, luts, jnp.asarray(1 / 60, jnp.float32), st)
        t_lower = time.time() - t0
        t0 = time.time()
        lowered.compile()
        t_compile = time.time() - t0
        rows.append((name, t_lower, t_compile))
        print(f"{name:16s} lower {t_lower:7.1f}s   compile {t_compile:7.1f}s",
              flush=True)

    if args.flight:
        cam_path = {k: jnp.stack([v] * 61) for k, v in cam.items()}
        t0 = time.time()
        lowered = frame_mod.render_flight.lower(
            state, scene, cam_path, luts, jnp.asarray(1 / 60, jnp.float32),
            base, 60)
        t_lower = time.time() - t0
        t0 = time.time()
        lowered.compile()
        print(f"{'flight(60)':16s} lower {t_lower:7.1f}s   "
              f"compile {time.time() - t0:7.1f}s", flush=True)


if __name__ == "__main__":
    main()
