#!/usr/bin/env python
"""Per-pass timing breakdown on the real TPU.

The analog of the reference's timestamp-query table
(Backend/VulkanTimestampQueries.cpp:45-92 + RenderFrontend.cpp:1858-1879).

This tool used to re-jit every pass standalone with 1080p inputs; that paid
one cold XLA compile per pass (>10 minutes wall — it never completed in CI).
The measurement now comes from tools/profile_frame.py: ONE already-compiled
whole-frame program is traced with jax.profiler and device time is
aggregated per `jax.named_scope`, so the numbers reflect real fusion inside
the single frame program and the whole run takes ~2 minutes cold, seconds
warm. This file stays as the documented entry point; both spellings run the
same profiler.

Usage: python tools/perf_passes.py [--width 1920 --height 1080] [--scale 2]
       [--frames 6] [--no-gi] [--json out.json] [--ops N]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from profile_frame import main  # noqa: E402

if __name__ == "__main__":
    main()
