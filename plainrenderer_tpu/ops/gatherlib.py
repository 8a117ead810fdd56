"""In-kernel gather primitives for Pallas TPU kernels.

TPU vector hardware has exactly one fast gather: jnp.take_along_axis along
the 128-lane axis within a vreg-shaped block. Everything else (XLA gather,
scatter) costs ~8 cycles per element. These helpers compose the lane-gather
with cross-sublane selects so kernels can fetch from small VMEM-resident
tables (texture/shadow windows, LUTs, per-tile attribute slabs) at a cost
linear in table size / 1024 per (16, 128)-shaped index block.

Used by: shadow resolve (window fetch), texture sampling, SDF-GI trace,
TAA history resampling, sky LUT (kernel variant).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_rows_128(table, flat_idx):
    """Gather from a (R, 128) table by flat indices in [0, R*128).

    table: (R, 128) f32/i32 jnp value already loaded from VMEM.
    flat_idx: (S, 128) int32 (S = any sublane multiple, typically 8 or 16).
    Returns (S, 128) gathered values: out[s, l] = table.ravel()[flat_idx[s, l]].

    Cost: R * ~3 vector ops per call — keep R <= ~64 per call and tile
    larger tables through VMEM windows.
    """
    rows = table.shape[0]
    col = flat_idx & 127
    row = flat_idx >> 7
    out = jnp.zeros(flat_idx.shape, table.dtype)
    for r in range(rows):
        # broadcast row r across sublanes, lane-gather by col, select
        bc = jnp.broadcast_to(table[r:r + 1, :], flat_idx.shape)
        val = jnp.take_along_axis(bc, col, axis=1)
        out = jnp.where(row == r, val, out)
    return out


def gather_window_2d(window, x, y):
    """Sample a 2D VMEM window at integer texel coords (clamped).

    window: (WH, WW) with WW a multiple of 128.
    x, y: (S, 128) int32 texel coords; clamped to the window.
    """
    wh, ww = window.shape
    assert ww % 128 == 0, "2D windows must be a multiple of 128 texels wide"
    xc = jnp.clip(x, 0, ww - 1)
    yc = jnp.clip(y, 0, wh - 1)
    if ww == 128:
        return gather_rows_128(window, yc * 128 + xc)
    return gather_rows_128(window.reshape(wh * ww // 128, 128),
                           yc * ww + xc)


def sample_window_bilinear(window, u, v):
    """Bilinear sample of a (WH, 128) window at fractional texel coords."""
    x0 = jnp.floor(u - 0.5)
    y0 = jnp.floor(v - 0.5)
    fx = (u - 0.5) - x0
    fy = (v - 0.5) - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    v00 = gather_window_2d(window, x0i, y0i)
    v01 = gather_window_2d(window, x0i + 1, y0i)
    v10 = gather_window_2d(window, x0i, y0i + 1)
    v11 = gather_window_2d(window, x0i + 1, y0i + 1)
    return (
        v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy + v11 * fx * fy
    )
