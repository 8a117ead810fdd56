import dataclasses

import jax.numpy as jnp
import numpy as np

from plainrenderer_tpu.assets import procedural
from plainrenderer_tpu.config import RenderSettings, ShadowSettings, TAASettings
from plainrenderer_tpu.render import frame as frame_mod
from plainrenderer_tpu.render import scenebuild
from plainrenderer_tpu.render.state import initial_state
from plainrenderer_tpu.scene import camera as cam

W, H = 256, 128


def small_settings(**kw):
    return RenderSettings(
        width=W, height=H,
        exposure_adaption_speed=1000.0,  # converge instantly in tests
        **kw,
    )


def build_test_scene():
    cfg = procedural.AtriumConfig(
        columns_per_row=2, floor_subdiv=2, box_count=3, box_subdiv=1,
        column_segments=8,
    )
    # untextured: interpret-mode texture sampling is covered by
    # test_texture.py; frame tests stay fast without it
    scene = procedural.build_atrium_scene(cfg, textured=False)
    rs = scenebuild.build_render_scene(scene)
    return frame_mod.scene_to_device(rs)


def test_minimal_frame_end_to_end():
    settings = small_settings()
    scene = build_test_scene()
    luts = frame_mod.bake_static_luts(settings)
    state = initial_state(W, H)
    ext = cam.extrinsic_from_angles([0.0, -1.7, 0.0], pitch_deg=5.0, yaw_deg=20.0)
    camera = frame_mod.camera_arrays(ext.position, ext.forward, ext.right, ext.up)

    image = None
    for _ in range(3):
        image, state = frame_mod.render_frame(
            state, scene, camera, luts, jnp.asarray(0.016), settings,
            interpret=True)
    image = np.asarray(image)

    assert image.shape == (H, W, 3)
    assert image.dtype == np.uint8
    # frame must not be empty or saturated
    assert image.mean() > 2
    assert image.mean() < 253
    # scene geometry must cover a reasonable portion of the frame with
    # something that is not sky (sky is up; camera looks slightly down)
    assert image.std() > 5
    # state advanced
    assert int(state.frame_index) == 3
    assert float(state.exposure) > 0
    assert np.isfinite(np.asarray(state.prev_color)).all()


def test_frame_deterministic():
    settings = small_settings()
    scene = build_test_scene()
    luts = frame_mod.bake_static_luts(settings)
    ext = cam.extrinsic_from_angles([0.0, -1.7, 0.0], pitch_deg=0.0, yaw_deg=0.0)
    camera = frame_mod.camera_arrays(ext.position, ext.forward, ext.right, ext.up)

    imgs = []
    for _ in range(2):
        state = initial_state(W, H)
        img, _ = frame_mod.render_frame(
            state, scene, camera, luts, jnp.asarray(0.016), settings,
            interpret=True)
        imgs.append(np.asarray(img))
    np.testing.assert_array_equal(imgs[0], imgs[1])


def test_sky_luts_sane():
    settings = small_settings()
    luts = frame_mod.bake_static_luts(settings)
    t = np.asarray(luts["transmission"])
    assert t.shape == (3, 128, 128)
    assert (t >= 0).all() and (t <= 1.0 + 1e-5).all()
    # zenith transmittance higher than horizon, and blue extinguished more
    # than red at the horizon (Rayleigh)
    from plainrenderer_tpu.ops import sky as sky_ops

    up = sky_ops.sample_transmission_towards_sun(
        luts["transmission"], jnp.asarray([0.0, -1.0, 0.0]))
    horizon = sky_ops.sample_transmission_towards_sun(
        luts["transmission"], jnp.asarray([1.0, 0.0, 0.0]))
    up = np.asarray(up)
    horizon = np.asarray(horizon)
    assert (up > horizon - 1e-6).all()
    assert horizon[0] > horizon[2]  # red survives better than blue

    ms = np.asarray(luts["multiscatter"])
    assert np.isfinite(ms).all() and (ms >= 0).all()
