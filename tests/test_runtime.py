import numpy as np

from plainrenderer_tpu.runtime.overlay import burn_stats, burn_text
from plainrenderer_tpu.runtime.shell import (CameraController, FrameIndex,
                                             InputState, Timer)


def test_burn_text_draws_and_preserves():
    img = np.full((64, 128, 3), 40, np.uint8)
    out = burn_text(img, "123.4 FPS", 2, 2)
    assert out.shape == img.shape and out.dtype == np.uint8
    # glyph pixels got the bright color, backdrop darkened, rest untouched
    assert (out == 255).any()
    assert (out[20:] == 40).all()
    # original not mutated
    assert (img == 40).all()


def test_burn_stats_multiline_and_clipping():
    img = np.zeros((20, 30, 3), np.uint8)
    out = burn_stats(img, ["FPS 60.0", "MEM 123.4 MB"], scale=2)
    assert out.shape == img.shape
    # text wider than the frame clips instead of raising
    assert out.max() == 255


def test_shell_camera_and_timer():
    t = Timer()
    t.mark_new_frame()
    assert 0.0 <= t.delta_time <= 0.3  # the 0.3 s clamp (main.cpp analog)
    f = FrameIndex()
    f.mark_new_frame()
    cam = CameraController()
    ext = cam.update(InputState(), 0.016)
    assert np.isfinite(ext.position).all()


def _tiny_app(tmp_path):
    """Shared tiny-scene App at a FIXED settings hash so every runtime test
    reuses one compiled frame program (suite-latency budget)."""
    from plainrenderer_tpu.assets import plain_format, procedural
    from plainrenderer_tpu.config import (RenderSettings, SDFTraceSettings,
                                          ShadowSettings,
                                          VolumetricsSettings)
    from plainrenderer_tpu.runtime.app import App

    mesh = procedural.box_mesh(4.0, 1.0, 4.0)
    mesh.texture_paths = plain_format.TexturePaths(
        albedo="", normal="", specular="", sdf="")
    mesh.mean_albedo = (0.5, 0.5, 0.5)
    scene = plain_format.Scene(
        objects=[plain_format.ObjectBinary(
            model_matrix=np.eye(4, dtype="float32"),
            mesh_index=0)],
        meshes=[mesh])
    path = tmp_path / "tiny.plain"
    plain_format.save_binary_scene(path, plain_format.scene_to_binary(scene))

    settings = RenderSettings(
        width=256, height=128,
        sdf_trace=SDFTraceSettings(enabled=False),
        volumetrics=VolumetricsSettings(enabled=False),
        shadows=ShadowSettings(resolution=512))
    return App(settings, str(path), with_gi=False, interpret=True)


def test_app_toggle_and_precompile(tmp_path):
    """App.set_settings swaps variants at runtime; precompile_variants
    AOT-compiles them (the staleness-flag analog of
    RenderFrontend.cpp:233-264)."""
    import dataclasses

    app = _tiny_app(tmp_path)
    settings = app.settings
    img0 = np.asarray(app.run_frame())
    assert img0.shape == (128, 256, 3)

    variant = dataclasses.replace(settings, draw_bounding_boxes=True)
    app.precompile_variants([variant])  # AOT, no state consumed
    app.set_settings(variant)
    img1 = np.asarray(app.run_frame())
    assert (img1 != img0).any()  # wireframes drawn
    # and back without error
    app.set_settings(settings)
    app.run_frame()


def test_interactive_loop_scripted(tmp_path):
    """interactive_loop driven by a scripted command stream (the stdin
    InputManager/ImGui analog, Runtime/InputManager.cpp +
    RenderFrontend.cpp:1829-2011): movement, mouse-look, a settings toggle
    and quit — asserts the settings actually changed, the camera moved,
    and latest.png was presented."""
    from plainrenderer_tpu.runtime.app import interactive_loop

    app = _tiny_app(tmp_path)
    pos0 = np.array(app.camera.position, np.float32).copy()
    yaw0 = app.camera.yaw
    assert not app.settings.draw_bounding_boxes

    out = tmp_path / "frames"
    out.mkdir()
    # aabb reuses the compiled draw_bounding_boxes variant from the tiny
    # settings hash; w/look exercise the camera path without a recompile
    script = ["w 2", "look 15 0", "aabb", "", "bogus_command", "q"]
    interactive_loop(app, out, overlay=True, overlay_scale=1,
                     max_frames=5, command_stream=script)

    assert app.settings.draw_bounding_boxes  # toggle applied
    assert (out / "latest.png").exists()  # frame presented
    pos1 = np.array(app.camera.position, np.float32)
    assert np.linalg.norm(pos1 - pos0) > 1.0  # moved ~2 m forward
    assert app.camera.yaw != yaw0  # mouse-look applied


def test_pair_budget_auto_escalation(tmp_path):
    """A framing that exceeds the assumed cull ratio must ESCALATE, not
    silently drop pairs (VERDICT r4 task 7): stacked full-view boxes give
    每 triangle a multi-bin span, overflowing the tight default budget;
    App then auto-doubles pair_budget_scale until a frame renders with
    zero overflow."""
    from plainrenderer_tpu.assets import plain_format, procedural
    from plainrenderer_tpu.config import (RenderSettings, SDFTraceSettings,
                                          ShadowSettings,
                                          VolumetricsSettings)
    from plainrenderer_tpu.runtime.app import App

    # 48 coincident boxes -> 576 triangles, each spanning most of the
    # screen: ~8 bins/triangle of pairs vs a budget of t/4 + grid floor
    objs = []
    meshes = []
    for i in range(48):
        mesh = procedural.box_mesh(6.0, 3.0, 6.0)
        mesh.texture_paths = plain_format.TexturePaths(
            albedo="", normal="", specular="", sdf="")
        mesh.mean_albedo = (0.5, 0.5, 0.5)
        meshes.append(mesh)
        objs.append(plain_format.ObjectBinary(
            model_matrix=np.eye(4, dtype="float32"), mesh_index=i))
    scene = plain_format.Scene(objects=objs, meshes=meshes)
    path = tmp_path / "stack.plain"
    plain_format.save_binary_scene(path, plain_format.scene_to_binary(scene))

    settings = RenderSettings(
        width=256, height=128,
        sdf_trace=SDFTraceSettings(enabled=False),
        volumetrics=VolumetricsSettings(enabled=False),
        taa=__import__("plainrenderer_tpu.config", fromlist=["TAASettings"])
        .TAASettings(enabled=False),
        shadows=ShadowSettings(cascade_count=0))
    app = App(settings, str(path), with_gi=False, interpret=True)
    # camera just outside the stack, boxes filling the whole view: every
    # front-facing triangle spans most of the screen's raster bins
    app.camera.position = np.asarray([0.0, -1.0, -4.5], np.float32)

    assert app.settings.pair_budget_scale == 1.0
    clean = False
    for _ in range(6):
        app.run_frame()
        if not np.asarray(app.state.debug_counters).any():
            clean = True
            break
    assert app.settings.pair_budget_scale > 1.0, \
        "overflow framing must raise the budget scale"
    assert clean, "escalation must converge to a zero-overflow frame"
