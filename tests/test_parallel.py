import jax
import jax.numpy as jnp
import numpy as np

from plainrenderer_tpu.config import RenderSettings, SDFTraceSettings
from plainrenderer_tpu.parallel import sharding
from plainrenderer_tpu.render import frame as frame_mod
from plainrenderer_tpu.scene import camera as cam_mod
from tests.test_frame import build_test_scene


def test_sharded_frame_8_devices():
    n = 8
    assert len(jax.devices()) >= n
    settings = RenderSettings(
        width=256, height=32 * n,
        sdf_trace=SDFTraceSettings(enabled=False),
        exposure_adaption_speed=1000.0,
    )
    scene = build_test_scene()
    luts = frame_mod.bake_static_luts(settings)
    ext = cam_mod.extrinsic_from_angles([0.0, -1.7, 0.0], pitch_deg=5.0,
                                        yaw_deg=20.0)
    cam = frame_mod.camera_arrays(ext.position, ext.forward, ext.right,
                                  ext.up)
    mesh = sharding.make_mesh(jax.devices()[:n])
    run, bset = sharding.sharded_frame_fn(settings, n, interpret=True)
    state = sharding.initial_sharded_state(settings, n)

    img_stacked, state = run(mesh, state, scene, cam, luts,
                             jnp.asarray(1 / 60))
    img = sharding.assemble_image(img_stacked)
    assert img.shape == (32 * n, 256, 3)
    assert np.isfinite(img.astype(np.float64)).all()
    # bands must tile a continuous image: adjacent band-border rows should
    # be correlated (not wildly different exposures/content)
    seam_diff = []
    for b in range(1, n):
        r0 = img[32 * b - 1].astype(np.float32)
        r1 = img[32 * b].astype(np.float32)
        seam_diff.append(np.abs(r0 - r1).mean())
    interior_diff = np.abs(
        img[15].astype(np.float32) - img[16].astype(np.float32)).mean()
    assert np.mean(seam_diff) < 60.0
    # the frame is not empty
    assert img.std() > 3


def test_band_matches_single_device_geometry():
    """A 2-band render must produce the same coverage layout as 1-device."""
    import dataclasses

    from plainrenderer_tpu.config import BloomSettings, TAASettings

    n = 2
    settings = RenderSettings(
        width=256, height=64 * n,
        sdf_trace=SDFTraceSettings(enabled=False),
        taa=TAASettings(enabled=False),
        bloom=BloomSettings(enabled=False),
        exposure_adaption_speed=1000.0,
    )
    scene = build_test_scene()
    luts = frame_mod.bake_static_luts(settings)
    ext = cam_mod.extrinsic_from_angles([0.0, -1.7, 0.0], pitch_deg=5.0,
                                        yaw_deg=20.0)
    cam = frame_mod.camera_arrays(ext.position, ext.forward, ext.right,
                                  ext.up)

    # single-device reference
    from plainrenderer_tpu.render.state import initial_state

    state1 = initial_state(settings.width, settings.height)
    img1, _ = frame_mod.render_frame(
        state1, scene, cam, luts, jnp.asarray(1 / 60), settings,
        interpret=True)
    img1 = np.asarray(img1)

    mesh = sharding.make_mesh(jax.devices()[:n])
    run, _ = sharding.sharded_frame_fn(settings, n, interpret=True)
    state = sharding.initial_sharded_state(settings, n)
    img_stacked, _ = run(mesh, state, scene, cam, luts, jnp.asarray(1 / 60))
    img2 = sharding.assemble_image(img_stacked)

    # same geometry coverage: compare "is sky" masks (exposure may differ
    # slightly on frame 0 since band exposure adapts from the same zero
    # state with a psum'd histogram -> actually identical; allow tolerance)
    diff = np.abs(img1.astype(np.float32) - img2.astype(np.float32))
    assert (diff < 40).mean() > 0.98
