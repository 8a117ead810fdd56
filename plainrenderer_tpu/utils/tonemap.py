"""ACES tonemapping curves.

Parity: resources/shaders/tonemapping.inc (Narkowicz approximate fit and the
BakingLab fitted RRT+ODT, both standard published curves). Channel-last.
"""

from __future__ import annotations

import jax.numpy as jnp

# tonemapping.inc:17-22 — ACESInputMat rows (HLSL row-major; the GLSL code
# transposes, so the effective transform is out = M_in @ color).
_ACES_INPUT = (
    (0.59719, 0.35458, 0.04823),
    (0.07600, 0.90834, 0.01566),
    (0.02840, 0.13383, 0.83777),
)
# tonemapping.inc:25-30
_ACES_OUTPUT = (
    (1.60475, -0.53108, -0.07367),
    (-0.10208, 1.10813, -0.00605),
    (-0.00327, -0.07276, 1.07602),
)


def aces_film_approximate(x: jnp.ndarray) -> jnp.ndarray:
    """tonemapping.inc:5-13 — Narkowicz ACES fit, clamped to [0,1]."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def _rrt_odt_fit(v: jnp.ndarray) -> jnp.ndarray:
    """tonemapping.inc:32-37."""
    a = v * (v + 0.0245786) - 0.000090537
    b = v * (0.983729 * v + 0.4329510) + 0.238081
    return a / b


def aces_fitted(color: jnp.ndarray) -> jnp.ndarray:
    """tonemapping.inc:40-49 — fitted ACES RRT+ODT; color is (..., 3).

    The 3x3 transforms are explicit scalar FMAs, NOT an einsum: on TPU an
    einsum lowers to an MXU matmul whose default precision is bf16, which
    broke the curve's monotonicity at the ~4e-3 relative level (the round-4
    parity FAIL was platform-dependent for exactly this reason — CPU ran
    the same einsum in f32). The GLSL reference is scalar FMA math too."""
    r, g, b = color[..., 0], color[..., 1], color[..., 2]

    def mat3(m, r, g, b):
        return (m[0][0] * r + m[0][1] * g + m[0][2] * b,
                m[1][0] * r + m[1][1] * g + m[1][2] * b,
                m[2][0] * r + m[2][1] * g + m[2][2] * b)

    r, g, b = mat3(_ACES_INPUT, r, g, b)
    r, g, b = _rrt_odt_fit(r), _rrt_odt_fit(g), _rrt_odt_fit(b)
    r, g, b = mat3(_ACES_OUTPUT, r, g, b)
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)


def aces_fitted_planar(color: jnp.ndarray) -> jnp.ndarray:
    """aces_fitted for channel-planar (3, H, W) input (same math; keeps the
    3-wide channel axis off the 128-lane minor dimension)."""
    r, g, b = color[0], color[1], color[2]

    def mat3(m, r, g, b):
        return (m[0][0] * r + m[0][1] * g + m[0][2] * b,
                m[1][0] * r + m[1][1] * g + m[1][2] * b,
                m[2][0] * r + m[2][1] * g + m[2][2] * b)

    r, g, b = mat3(_ACES_INPUT, r, g, b)
    r, g, b = _rrt_odt_fit(r), _rrt_odt_fit(g), _rrt_odt_fit(b)
    r, g, b = mat3(_ACES_OUTPUT, r, g, b)
    return jnp.clip(jnp.stack([r, g, b]), 0.0, 1.0)
