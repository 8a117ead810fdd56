#!/usr/bin/env python
"""Bisect which pass faults on the real TPU at full resolution.

Runs the REAL frame at 1080p with pass groups toggled via settings, in
order of increasing surface area. Usage: python tools/bisect_frame.py N
where N picks the config (0..5)."""

import dataclasses
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    idx = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".cache/jax"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from plainrenderer_tpu.assets import procedural
    from plainrenderer_tpu.config import (
        BloomSettings, RenderSettings, SDFTraceSettings, ShadowSettings,
        TAASettings, VolumetricsSettings)
    from plainrenderer_tpu.render import frame as frame_mod
    from plainrenderer_tpu.render import scenebuild
    from plainrenderer_tpu.render.state import initial_state
    from plainrenderer_tpu.scene import camera as cam_mod

    cfg = procedural.AtriumConfig(
        columns_per_row=6, column_segments=32,
        floor_subdiv=32, box_count=12, box_subdiv=8)
    scene_data = procedural.build_atrium_scene(cfg)
    rs = scenebuild.build_render_scene(scene_data)
    scene = frame_mod.scene_to_device(rs)

    off = dict(
        taa=TAASettings(enabled=False),
        sdf_trace=SDFTraceSettings(enabled=False),
        volumetrics=VolumetricsSettings(enabled=False),
        bloom=BloomSettings(enabled=False),
        shadows=ShadowSettings(cascade_count=0),
    )
    configs = [
        ("raster+shade only", dict(off)),
        ("+shadows", {**off, "shadows": ShadowSettings()}),
        ("+taa", {**off, "shadows": ShadowSettings(),
                  "taa": TAASettings()}),
        ("+volumetrics", {**off, "shadows": ShadowSettings(),
                          "taa": TAASettings(),
                          "volumetrics": VolumetricsSettings()}),
        ("+bloom (full no-gi)", {**off, "shadows": ShadowSettings(),
                                 "taa": TAASettings(),
                                 "volumetrics": VolumetricsSettings(),
                                 "bloom": BloomSettings()}),
        ("raster+bloom only", {**off, "bloom": BloomSettings()}),
        ("raster+bloom mips3", {**off, "bloom": BloomSettings(mip_count=3)}),
    ]
    name, over = configs[idx]
    settings = RenderSettings(width=1920, height=1080, **over)
    print(f"### config {idx}: {name}", flush=True)

    luts = frame_mod.bake_static_luts(settings)
    state = initial_state(1920, 1080)
    ext = cam_mod.extrinsic_from_angles([-9.0, -1.8, 0.0], pitch_deg=8.0,
                                        yaw_deg=10.0)
    cam = frame_mod.camera_arrays(ext.position, ext.forward, ext.right,
                                  ext.up)
    dt = jnp.asarray(1.0 / 60.0)
    t0 = time.time()
    for i in range(3):
        image, state = frame_mod.render_frame(
            state, scene, cam, luts, dt, settings)
    val = np.asarray(image[:8, :8])
    print(f"### config {idx} OK in {time.time()-t0:.1f}s mean={val.mean():.1f}",
          flush=True)


if __name__ == "__main__":
    main()
