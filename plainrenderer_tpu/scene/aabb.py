"""Axis-aligned bounding boxes.

Parity: Plain/src/Common/AABB.{h,cpp} (AABB from positions, transformed AABB
via 8-corner enumeration, corner extraction) and Common/sdfUtilities.cpp:5-18
(SDF padding rule shared by the baker, culling and trace).

AABBs are stored as a pair of (..., 3) arrays (min, max) so object lists
vectorize: (N, 3) mins/maxs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def aabb_from_positions(positions):
    """AABB.cpp — min/max over a (N, 3) position array."""
    positions = jnp.asarray(positions)
    return positions.min(axis=0), positions.max(axis=0)


def aabb_corners(bb_min, bb_max):
    """AABB.cpp getAxisAlignedBoundingBoxPoints — the 8 corners, (..., 8, 3)."""
    bb_min = jnp.asarray(bb_min)
    bb_max = jnp.asarray(bb_max)
    picks = jnp.asarray(
        [
            [0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
            [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1],
        ],
        jnp.float32,
    )  # (8, 3): 0 -> min, 1 -> max
    lo = bb_min[..., None, :]
    hi = bb_max[..., None, :]
    return lo + (hi - lo) * picks


def aabb_transformed(bb_min, bb_max, matrix):
    """AABB.cpp axisAlignedBoundingBoxTransformed — transform 8 corners, re-min/max.

    matrix is (..., 4, 4) row-major; bb_min/bb_max are (..., 3).
    """
    corners = aabb_corners(bb_min, bb_max)  # (..., 8, 3)
    rot = matrix[..., :3, :3]
    trans = matrix[..., :3, 3]
    world = jnp.einsum("...ij,...kj->...ki", rot, corners) + trans[..., None, :]
    return world.min(axis=-2), world.max(axis=-2)


def pad_sdf_bounding_box(bb_min, bb_max):
    """sdfUtilities.cpp:5-18 — pad by 7.5% of extent, min 0.5m per side.

    Shared rule between the SDF baker (SceneSDF.cpp), the GI culling passes and
    the trace kernel, so baked volumes and runtime sampling agree.
    """
    # stays in the caller's namespace: host callers (the SDF baker / asset
    # pipeline) get pure numpy — routing a 6-float pad through the device
    # costs a dispatch + transfer round-trip (minutes over a tunneled TPU).
    # numpy ONLY when BOTH bounds are host types: a traced jnp array mixed
    # with a numpy bound must route through jnp or it raises
    # TracerArrayConversionError under jit (ADVICE r3)
    host = (np.ndarray, list, tuple)
    xp = np if (isinstance(bb_min, host) and isinstance(bb_max, host)) else jnp
    bb_min = xp.asarray(bb_min, xp.float32)
    bb_max = xp.asarray(bb_max, xp.float32)
    extent = bb_max - bb_min
    padding = xp.maximum(extent * 0.075, 0.5)
    return bb_min - padding, bb_max + padding
