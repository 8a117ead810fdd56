"""Post-processing: tonemap pass (bloom lives in ops/bloom.py).

Parity: tonemapping.comp — ACES fitted RRT+ODT -> sRGB encode -> hash-noise
dither -> RGBA8, as one fused elementwise pass.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import color as colorlib
from ..utils import tonemap as tonemaplib


def tonemap_pass(hdr, time, dither: bool = True):
    """hdr (3, H, W) linear -> (H, W, 3) uint8 sRGB (tonemapping.comp)."""
    c = jnp.moveaxis(hdr, 0, -1)  # (H, W, 3)
    c = tonemaplib.aces_fitted(c)
    c = colorlib.linear_to_srgb(c)
    if dither:
        h, w = c.shape[:2]
        px = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :, None],
                              (h, w, 1))[..., 0]
        py = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32)[:, None, None],
                              (h, w, 1))[..., 0]
        c = colorlib.dither_rgb8(c, px, py, jnp.asarray(time, jnp.float32))
    return jnp.clip(jnp.round(c * 255.0), 0, 255).astype(jnp.uint8)


def material_lookup(material_table, material_ids, valid):
    """Per-pixel material constants without gathers.

    material_table (M, C) f32; material_ids (H, W) f32/int; returns (C, H, W).
    Implemented as a one-hot contraction (M is small), matching the pattern
    used everywhere in this codebase where XLA gathers would be too slow.
    """
    m, c = material_table.shape
    ids = material_ids.astype(jnp.int32)
    onehot = (ids[None] == jnp.arange(m, dtype=jnp.int32)[:, None, None])
    onehot = onehot.astype(jnp.float32) * valid[None]
    # out[c, h, w] = sum_m onehot[m, h, w] * table[m, c]
    return jnp.einsum("mhw,mc->chw", onehot, material_table)
