"""Cross-band halo exchange for split-frame SPMD stencil passes.

Split-frame rendering (parallel/sharding.py) gives each device a horizontal
screen band. Screen-space stencil passes (TAA neighborhoods + history
reprojection, the GI filter chain, bloom) read pixels across band borders;
without exchange they clamp at the band edge and bands disagree at the seam.

halo_extend ships n border rows to each neighbor over ICI with ONE
jax.lax.ppermute per direction (the renderer's ring-attention analog,
SURVEY 2.8): the extended array carries real neighbor rows at interior
borders and edge-replicated rows at the true frame top/bottom — exactly the
clamp-to-edge behavior the single-device filters use, so band-local filter
output matches the single-device render away from deep-stencil residuals.

Traffic: n rows x W x C floats per boundary per pass group (~a few hundred
KB/frame at 1080p/8) — noise next to ICI bandwidth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def halo_extend(x, n: int, axis_name: str, n_devices: int):
    """(..., H, W) band array -> (..., n+H+n, W) with neighbor halo rows.

    Interior borders receive the true rows of the adjacent band; the first/
    last band's outer halo replicates its edge row (clamp-to-edge parity
    with the single-device filters). n is clamped to the band height.
    """
    h = x.shape[-2]
    n = min(n, h)
    if n_devices <= 1:
        widths = [(0, 0)] * (x.ndim - 2) + [(n, n), (0, 0)]
        return jnp.pad(x, widths, mode="edge")
    # rows this band sends down to the band below (its bottom rows become
    # the receiver's TOP halo), and up to the band above
    down = [(i, i + 1) for i in range(n_devices - 1)]
    up = [(i, i - 1) for i in range(1, n_devices)]
    from_above = jax.lax.ppermute(x[..., -n:, :], axis_name, down)
    from_below = jax.lax.ppermute(x[..., :n, :], axis_name, up)
    idx = jax.lax.axis_index(axis_name)
    top_edge = jnp.broadcast_to(x[..., :1, :], x.shape[:-2] + (n, x.shape[-1]))
    bot_edge = jnp.broadcast_to(x[..., -1:, :],
                                x.shape[:-2] + (n, x.shape[-1]))
    top = jnp.where(idx == 0, top_edge, from_above)
    bot = jnp.where(idx == n_devices - 1, bot_edge, from_below)
    return jnp.concatenate([top, x, bot], axis=-2)


def crop_halo(x, n: int):
    """Inverse of halo_extend on the row axis."""
    if n == 0:
        return x
    return x[..., n:-n, :]
