"""Golden-frame pixel regression (the repo's image-diff harness).

The Vulkan reference cannot execute in this environment, so the acceptance
metric of BASELINE.md (per-pass pixel diff within tonemap tolerance) is
applied against our own captured golden: any unintentional change to the
full pipeline's image — raster, shading, shadows, GI, sky, fog, TAA,
bloom, tonemap — trips this test. Regenerate intentionally with
tools/make_golden.py after reviewed image changes.
"""

from pathlib import Path

import numpy as np

GOLDEN = Path(__file__).parent / "golden_frame.npz"


def test_full_pipeline_matches_golden():
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    from make_golden import render_golden_frames

    img = render_golden_frames()
    want = np.load(GOLDEN)["image"]
    assert img.shape == want.shape
    diff = np.abs(img.astype(np.int32) - want.astype(np.int32))
    # dither is deterministic (hash of pixel/time), so the tolerance only
    # absorbs cross-platform float noise
    frac_close = (diff <= 2).mean()
    assert frac_close > 0.999, (frac_close, diff.max())
