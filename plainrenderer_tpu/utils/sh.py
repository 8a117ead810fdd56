"""Spherical harmonics L1 basis used by the SDF-GI encode/decode.

Parity: resources/shaders/SphericalHarmonics.inc:4-15.
The GI trace stores irradiance as Y * SH_L1(dir) (sdfDiffuseTrace.comp:196-205)
and the forward pass reconstructs irradiance + a dominant direction for
indirect specular (triangle.frag:295-321).
"""

from __future__ import annotations

import jax.numpy as jnp

_SQRT_PI = 1.7724538509055159  # sqrt(pi)
_SQRT3 = 1.7320508075688772


def direction_to_sh_l1(v: jnp.ndarray) -> jnp.ndarray:
    """SphericalHarmonics.inc:5-11 — normalized (c0, -y, z, -x) L1 vector.

    v is (..., 3) unit direction; returns (..., 4).
    """
    c0 = jnp.full(v.shape[:-1], 1.0 / (2.0 * _SQRT_PI), dtype=v.dtype)
    c1 = -_SQRT3 * v[..., 1] / (2.0 * _SQRT_PI)
    c2 = _SQRT3 * v[..., 2] / (2.0 * _SQRT_PI)
    c3 = -_SQRT3 * v[..., 0] / (2.0 * _SQRT_PI)
    sh = jnp.stack([c0, c1, c2, c3], axis=-1)
    norm = jnp.sqrt(jnp.sum(sh * sh, axis=-1, keepdims=True))
    return sh / jnp.maximum(norm, 1e-20)


def dominant_direction_from_sh_l1(c: jnp.ndarray) -> jnp.ndarray:
    """SphericalHarmonics.inc:13-15 — (-c3, -c1, c2)."""
    return jnp.stack([-c[..., 3], -c[..., 1], c[..., 2]], axis=-1)
