#!/usr/bin/env python
"""Regenerate the checked-in golden frame (tests/golden_frame.npz).

Run after INTENTIONAL image changes; tests/test_golden.py diffs every
suite run against this capture (the repo's pixel-regression harness —
BASELINE.md's tonemapped-diff acceptance metric, applied to our own
renderer since the Vulkan reference cannot run in this environment).
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def render_golden_frames(n_frames: int = 3):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from plainrenderer_tpu.assets import procedural
    from plainrenderer_tpu.config import (RenderSettings, SDFTraceSettings,
                                          ShadowSettings)
    from plainrenderer_tpu.ops import sdf_scene
    from plainrenderer_tpu.render import frame as frame_mod
    from plainrenderer_tpu.render import scenebuild
    from plainrenderer_tpu.render.state import initial_state
    from plainrenderer_tpu.scene import camera as cam_mod

    cfg = procedural.AtriumConfig(
        columns_per_row=2, floor_subdiv=2, box_count=3, box_subdiv=1,
        column_segments=8)
    scene_data = procedural.build_atrium_scene(cfg)
    rs = scenebuild.build_render_scene(scene_data)
    scene = frame_mod.scene_to_device(rs)
    gsdf = sdf_scene.build_scene_sdf(rs, scene_data, bake_resolution_cap=16)
    scene = frame_mod.attach_global_sdf(scene, gsdf)

    settings = RenderSettings(
        width=256, height=128,
        sdf_trace=SDFTraceSettings(enabled=True, trace_steps=16),
        # tests pin 1024 shadows: full reference parity (2048) is a bench /
        # production default; the golden predates the default bump
        shadows=ShadowSettings(resolution=512),
        exposure_adaption_speed=1000.0)
    luts = frame_mod.bake_static_luts(settings)
    state = initial_state(256, 128)
    ext = cam_mod.extrinsic_from_angles([0.0, -1.7, 0.0], pitch_deg=5.0,
                                        yaw_deg=20.0)
    cam = frame_mod.camera_arrays(ext.position, ext.forward, ext.right,
                                  ext.up)
    dt = jnp.asarray(1.0 / 60.0)
    for _ in range(n_frames):
        image, state = frame_mod.render_frame(
            state, scene, cam, luts, dt, settings, interpret=True)
    return np.asarray(image)


if __name__ == "__main__":
    img = render_golden_frames()
    out = REPO / "tests" / "golden_frame.npz"
    import numpy as np

    np.savez_compressed(out, image=img)
    print(f"wrote {out}: {img.shape} mean={img.mean():.2f}")
