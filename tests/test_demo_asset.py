"""Real-asset end-to-end test (VERDICT r3 task 5).

The committed demo asset (assets/demo/courtyard.*) exercises the full asset
contract the reference defines (AssetPipeline/mainPipeline.cpp:29-71 ->
App load -> render): a textured glTF scene converted to .plain with baked
SDF DDS volumes and an alpha-tested ivy sheet. This test drives the SAME
loader path a user would (runtime.app.App with a .plain path): DDS SDF
load, texture pool build, alpha mask build, then full frames on the CPU
interpret backend.
"""

from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
ASSET = REPO / "assets" / "demo" / "courtyard.plain"


@pytest.mark.skipif(not ASSET.exists(), reason="demo asset not present")
def test_courtyard_renders_end_to_end():
    from plainrenderer_tpu.config import (RenderSettings, SDFTraceSettings,
                                          ShadowSettings,
                                          VolumetricsSettings)
    from plainrenderer_tpu.runtime.app import App

    settings = RenderSettings(
        width=256, height=128,
        sdf_trace=SDFTraceSettings(enabled=True, trace_steps=8),
        volumetrics=VolumetricsSettings(enabled=False),
        shadows=ShadowSettings(resolution=512),
        exposure_adaption_speed=1000.0)
    app = App(settings, str(ASSET), with_gi=True, interpret=True)

    # the loader must have found the baked DDS volumes (no re-bake) and the
    # ivy's alpha-tested albedo
    assert "sdf_volume" in app.scene  # composited global SDF attached
    assert "alpha_masks" in app.scene, "ivy albedo alpha must build a mask"
    assert "tex_word0" in app.scene  # real textures reached the pool

    # aim at the courtyard centroid from outside the -x face (yaw 0 looks
    # toward +x in the y-down world, shell.py forward_vector)
    lo = np.asarray(app.scene["object_bb_min"]).min(0)
    hi = np.asarray(app.scene["object_bb_max"]).max(0)
    center = (lo + hi) * 0.5
    app.camera.position = np.asarray(
        [lo[0] - 0.6 * (hi[0] - lo[0]), center[1], center[2]], np.float32)
    app.camera.yaw = 0.0
    app.camera.pitch = 0.0

    img = None
    for _ in range(2):
        img = np.asarray(app.run_frame())
    assert img.shape == (128, 256, 3)
    assert img.mean() > 2 and img.mean() < 253  # not black, not blown out
    assert img.std() > 5  # actual content
    ovf = np.asarray(app.state.debug_counters)
    assert not ovf.any(), f"raster pair overflow on the demo asset: {ovf}"
