"""Miscellaneous math helpers (mirrors Plain/src/Common/Utilities/MathUtils.cpp)."""

from __future__ import annotations

import math

import jax.numpy as jnp


def direction_to_vector(direction_deg: jnp.ndarray) -> jnp.ndarray:
    """MathUtils.cpp:4-16 — (phi, theta) degrees -> unit vector.

    x = phi (azimuth), y = theta (polar); y up is -cos(theta) (the reference's
    sun direction convention, used by the sun-direction UI angles).
    """
    theta = jnp.deg2rad(direction_deg[..., 1])
    phi = jnp.deg2rad(direction_deg[..., 0])
    return jnp.stack(
        [
            jnp.sin(theta) * jnp.cos(phi),
            -jnp.cos(theta),
            jnp.sin(theta) * jnp.sin(phi),
        ],
        axis=-1,
    )


def mip_count_from_resolution(width: int, height: int = 1, depth: int = 1) -> int:
    """MathUtils.cpp:18-20."""
    return 1 + int(math.floor(math.log2(max(width, height, depth))))


def resolution_from_mip(base: tuple[int, ...], mip: int) -> tuple[int, ...]:
    """MathUtils.cpp:22-24 — per-axis max(base >> mip, 1)."""
    return tuple(max(b // (2 ** mip), 1) for b in base)


def dot2(v: jnp.ndarray) -> jnp.ndarray:
    """MathUtils.cpp:80-82 — squared length."""
    return jnp.sum(v * v, axis=-1)
