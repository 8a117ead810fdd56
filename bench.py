#!/usr/bin/env python
"""Benchmark: full-pipeline frame rate on the flagship procedural scene.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

The baseline target is 60 FPS at 1920x1080 with the full SDF-GI + TAA
pipeline (BASELINE.md; the reference publishes no numbers of its own).
The scene is the deterministic procedural atrium (the reference ships no
scene assets) at Sponza-class load by default: 292k triangles (>= Sponza's
~262k), shadow resolution 2048, 128 trace steps, half-res GI — the
reference's own quality defaults (RenderFrontend.cpp:40, SDF.inc:144,
SDFGI.h:18). Use --scale to vary tessellation.
"""

import argparse
import hashlib
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

CACHE_DIR = REPO / ".cache"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--scale", type=int, default=4,
                    help="scene tessellation scale; 4 = Sponza-class "
                    "(292k triangles >= Sponza's ~262k, BASELINE.md load)")
    ap.add_argument("--no-gi", action="store_true")
    ap.add_argument("--per-frame-dispatch", action="store_true",
                    help="also measure chained per-frame launches (adds a "
                         "second XLA compile; diagnostic only)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    CACHE_DIR.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(CACHE_DIR / "jax"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import numpy as np

    from plainrenderer_tpu.assets import procedural
    from plainrenderer_tpu.config import RenderSettings, SDFTraceSettings
    from plainrenderer_tpu.render import frame as frame_mod
    from plainrenderer_tpu.render import scenebuild
    from plainrenderer_tpu.render.state import initial_state
    from plainrenderer_tpu.scene import camera as cam_mod

    s = args.scale
    cfg = procedural.AtriumConfig(
        columns_per_row=6, column_segments=16 * s,
        floor_subdiv=16 * s, box_count=12, box_subdiv=4 * s,
        banner_count=4)  # alpha-tested fabric (Sponza-banner analog)
    scene_data = procedural.build_atrium_scene(cfg)
    rs = scenebuild.build_render_scene(scene_data)
    print(f"# triangles: {rs.triangle_count}", file=sys.stderr)

    settings = RenderSettings(
        width=args.width, height=args.height,
        sdf_trace=SDFTraceSettings(enabled=not args.no_gi),
    )
    scene = frame_mod.scene_to_device(rs)

    if not args.no_gi:
        key = hashlib.sha1(
            f"{cfg}".encode() + rs.corners.tobytes()[:1024]).hexdigest()[:16]
        sdf_cache = CACHE_DIR / f"sdf_{key}.npz"
        from plainrenderer_tpu.ops import sdf_scene

        if sdf_cache.exists():
            data = np.load(sdf_cache)
            gsdf = sdf_scene.GlobalSDF(
                volume=data["volume"], albedo=data["albedo"],
                origin=data["origin"], voxel_size=float(data["voxel_size"]))
        else:
            t0 = time.time()
            gsdf = sdf_scene.build_scene_sdf(rs, scene_data,
                                             use_jax_bake=True,
                                             bake_resolution_cap=32)
            print(f"# SDF bake: {time.time()-t0:.1f}s", file=sys.stderr)
            np.savez_compressed(
                sdf_cache, volume=gsdf.volume, albedo=gsdf.albedo,
                origin=gsdf.origin, voxel_size=gsdf.voxel_size)
        scene = frame_mod.attach_global_sdf(scene, gsdf)

    luts = frame_mod.bake_static_luts(settings)
    state = initial_state(args.width, args.height)

    def camera_at(t):
        ext = cam_mod.extrinsic_from_angles(
            [-9.0 + 0.02 * t, -1.8, 0.3 * np.sin(t * 0.05)],
            pitch_deg=8.0, yaw_deg=10.0 + t * 0.1)
        return frame_mod.camera_arrays(ext.position, ext.forward, ext.right,
                                       ext.up)

    # the whole flight path is uploaded ONCE; render_frame indexes it by
    # state.frame_index on device — the frame loop is pure jit dispatch
    # with zero per-frame host->device transfers
    n_path = args.warmup + args.frames + 1
    cams = [camera_at(i) for i in range(n_path)]
    cam_path = {k: jnp.stack([c[k] for c in cams]) for k in cams[0]}

    dt = jnp.asarray(1.0 / 60.0)

    if args.per_frame_dispatch:
        # diagnostic: chained per-frame launches pay the host/tunnel
        # execute latency (~40 ms each measured over the tunneled TPU) —
        # what an interactive per-frame loop sees on this link
        t0 = time.time()
        image, state = frame_mod.render_frame(
            state, scene, cam_path, luts, dt, settings)
        np.asarray(image[:1, :1])
        print(f"# per-frame compile+first: {time.time()-t0:.1f}s",
              file=sys.stderr)
        t0 = time.time()
        for _ in range(args.frames):
            image, state = frame_mod.render_frame(
                state, scene, cam_path, luts, dt, settings)
        np.asarray(image[:1, :1])
        print(f"# per-frame-dispatch: "
              f"{(time.time()-t0)/args.frames*1000.0:.2f} ms/frame",
              file=sys.stderr)

    # headline: batched dispatch (render_flight) — ONE executable launch
    # renders the whole flight on device, wall == device time. The first
    # call doubles as warmup (exposure/TAA histories converge over the
    # flight exactly as they would frame by frame).
    t0 = time.time()
    image, state = frame_mod.render_flight(
        state, scene, cam_path, luts, dt, settings, args.frames)
    np.asarray(image[:1, :1])
    print(f"# compile+first frame: {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    image, state = frame_mod.render_flight(
        state, scene, cam_path, luts, dt, settings, args.frames)
    np.asarray(image[:1, :1])  # forces completion of the flight
    elapsed = time.time() - t0

    fps = args.frames / elapsed
    ms = elapsed / args.frames * 1000.0
    print(f"# {ms:.2f} ms/frame", file=sys.stderr)
    ovf = np.asarray(state.debug_counters)
    print(f"# pair overflow after flight: main={int(ovf[0])} "
          f"shadow={int(ovf[1])} (must be 0)", file=sys.stderr)
    print(json.dumps({
        "metric": "atrium_1080p_full_pipeline_fps",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
