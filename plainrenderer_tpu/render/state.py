"""Carried per-frame state (the HBM-resident temporal history).

The reference's cross-frame state — TAA history ping-pong (TAA.cpp:33-37),
GI history, volumetric history, previous frame targets, exposure in the
light buffer (RenderFrontend.h FrameRenderTargets / lightBuffer) — becomes
one donated pytree threaded through render_frame: state' = f(state, inputs).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp


class FrameState(NamedTuple):
    """All cross-frame arrays. Donated into the jitted frame function."""

    frame_index: jnp.ndarray  # () int32
    exposure: jnp.ndarray  # () f32 (lightBuffer.previousFrameExposure)
    prev_color: jnp.ndarray  # (3, H, W) previous frame HDR (histogram input)
    prev_depth: jnp.ndarray  # (H, W) previous reverse-Z depth
    taa_history: jnp.ndarray  # (H, W) int32 R11G11B10-packed TAA history
    taa_luminance: jnp.ndarray  # (H, W) scene luminance history
    gi_history: jnp.ndarray  # (3, Hg, Wg) int32 f16-pair-packed YSH+CoCg
    volumetric_history: jnp.ndarray  # (4, D, Hv, Wv) froxel scattering history
    prev_view_projection: jnp.ndarray  # (4, 4)
    prev_jitter: jnp.ndarray  # (2,)
    debug_counters: jnp.ndarray  # (2,) i32 [main pair overflow, shadow
    #   pair overflow] — the allocator/drawcall-stats analog; MUST stay 0
    #   (dropped pairs = missing geometry; see ops/raster.build_pairs)


def initial_state(width: int, height: int, gi_half_res: bool = True,
                  froxel_depth: int = 64) -> FrameState:
    """State buffers use the TILE-PADDED framebuffer size."""
    from ..ops.raster import pad_resolution

    w, h = pad_resolution(width, height)
    if gi_half_res:
        gw, gh = pad_resolution(w // 2, h // 2)
    else:
        gh, gw = h, w
    vh, vw = max(h // 8, 1), max(w // 8, 1)
    return FrameState(
        frame_index=jnp.zeros((), jnp.int32),
        exposure=jnp.asarray(1e-4, jnp.float32),
        prev_color=jnp.zeros((3, h, w), jnp.float32),
        prev_depth=jnp.zeros((h, w), jnp.float32),
        taa_history=jnp.zeros((h, w), jnp.int32),
        taa_luminance=jnp.zeros((h, w), jnp.float32),
        gi_history=jnp.zeros((3, gh, gw), jnp.int32),
        volumetric_history=jnp.zeros((4, froxel_depth, vh, vw), jnp.float32),
        prev_view_projection=jnp.eye(4, dtype=jnp.float32),
        prev_jitter=jnp.zeros((2,), jnp.float32),
        debug_counters=jnp.zeros((2,), jnp.int32),
    )
