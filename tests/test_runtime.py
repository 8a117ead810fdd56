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
