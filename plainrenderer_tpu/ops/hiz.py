"""Hi-Z min/max depth pyramid.

Parity: depthHiZPyramid.comp — the reference builds an 11-mip min/max
pyramid in a single dispatch with shared-memory + global-counter tricks (AMD
SPD style). On TPU the whole pyramid is a chain of 2x2 window reductions
that XLA fuses; the single-pass trick is unnecessary (no inter-workgroup
sync problem exists inside one XLA program).

Consumers: GPU cascade fitting reads the lowest mip's min/max
(lightMatrix.comp:83-85); SDF tile culling optionally reads a mid mip for
depth-range rejection (sdfCameraTileCulling.comp:66-74).
"""

from __future__ import annotations

import jax.numpy as jnp


def _reduce2x2(plane, op):
    h, w = plane.shape
    p = plane.reshape(h // 2, 2, w // 2, 2)
    return op(op(p, axis=3), axis=1)


def build_min_max_pyramid(depth, max_mips: int = 11):
    """depth (H, W) reverse-Z -> list of (min, max) planes per mip.

    mip 0 is the input resolution's first reduction (half res), matching the
    reference which writes mips of a half-res pyramid. Sky pixels (0) ride
    along: reverse-Z min naturally tracks the farthest depth including sky,
    exactly like the reference's cleared-to-zero depth buffer.
    """
    mins, maxs = [depth], [depth]
    levels = []
    cur_min, cur_max = depth, depth
    for _ in range(max_mips):
        h, w = cur_min.shape
        if h < 2 or w < 2 or (h % 2) or (w % 2):
            break
        cur_min = _reduce2x2(cur_min, jnp.min)
        cur_max = _reduce2x2(cur_max, jnp.max)
        levels.append((cur_min, cur_max))
    return levels


def depth_min_max(depth):
    """The lowest-mip (1x1) values: (min_depth, max_depth) scalars."""
    return jnp.min(depth), jnp.max(depth)
