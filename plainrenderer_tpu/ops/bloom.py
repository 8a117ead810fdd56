"""Bloom: CoD:AW mip-chain downsample/upsample + lerp apply.

Parity: bloomDownsample.comp (13-tap partial-Karis downsample pattern),
bloomUpsample.comp (9-tap tent blur + previous-mip repeated-box add),
applyBloom.comp (mix(scene, bloom, strength)), orchestrated over 6 mips on
transient images (Bloom.cpp:56-144).

All taps are fixed-offset bilinear fetches on regular grids — pure dense XLA
(shift/avg pipelines), no gathers. Transient-mip aliasing is XLA's problem
now (the reference's temporary-image pool dissolves).
"""

from __future__ import annotations

import jax.numpy as jnp


def _bilinear_at_half_offsets(img, dy, dx):
    """Sample (C, H, W) at each pixel center + (dx, dy) in SOURCE texels,
    clamped; offsets are multiples of 0.5 so this is exact averaging."""

    def shift(a, sy, sx):
        # clamp shifts to the mip size (tiny mips at small resolutions)
        sy = max(-(a.shape[-2] - 1), min(a.shape[-2] - 1, sy))
        sx = max(-(a.shape[-1] - 1), min(a.shape[-1] - 1, sx))
        out = jnp.roll(a, (-sy, -sx), axis=(-2, -1))
        if sy > 0:
            out = out.at[..., -sy:, :].set(out[..., -sy - 1:-sy, :])
        elif sy < 0:
            out = out.at[..., :-sy, :].set(out[..., -sy:-sy + 1, :])
        if sx > 0:
            out = out.at[..., :, -sx:].set(out[..., :, -sx - 1:-sx])
        elif sx < 0:
            out = out.at[..., :, :-sx].set(out[..., :, -sx:-sx + 1])
        return out

    # offsets arrive as python floats; decompose into integer + fraction
    # (pure-python math: jnp on constants would create tracers under
    # shard_map and break the static shift offsets)
    import math

    def axis_samples(d):
        d = float(d)
        lo = math.floor(d)
        frac = d - lo
        if frac == 0.0:
            return [(lo, 1.0)]
        return [(lo, 1.0 - frac), (lo + 1, frac)]

    out = 0.0
    for sy, wy in axis_samples(float(dy)):
        for sx, wx in axis_samples(float(dx)):
            out = out + shift(img, sy, sx) * (wy * wx)
    return out


def downsample_13tap(src):
    """bloomDownsample.comp — half-res 13-tap downsample of (C, H, W)."""
    c, h, w = src.shape
    # destination pixel (i,j) center maps to source (2i+0.5+? ...): uv center
    # of dst texel == source coordinate (2i+1, 2j+1) in half-texel units.
    # Build the taps on the source grid then take every 2nd pixel.
    taps = [
        ((0.0, 0.0), 0.125),
        ((0.5, 0.5), 0.125), ((0.5, -0.5), 0.125),
        ((-0.5, 0.5), 0.125), ((-0.5, -0.5), 0.125),
        ((0.0, 1.5), 0.0625), ((0.0, -1.5), 0.0625),
        ((1.5, 0.0), 0.0625), ((-1.5, 0.0), 0.0625),
        ((1.5, 1.5), 0.03125), ((1.5, -1.5), 0.03125),
        ((-1.5, 1.5), 0.03125), ((-1.5, -1.5), 0.03125),
    ]
    # dst center lies between 4 source texels: offset +0.5 in source space
    acc = 0.0
    for (dy, dx), weight in taps:
        acc = acc + _bilinear_at_half_offsets(src, dy + 0.5, dx + 0.5) * weight
    return acc[:, ::2, ::2]


def upsample_tent(src, prev_mip, blur_radius: float, is_lowest: bool):
    """bloomUpsample.comp — 9-tap tent blur of src (C, h, w) + 2x-upsampled
    previous mip (C, h/2, w/2) repeated-box add. Returns (C, h, w)."""
    r = blur_radius
    taps = [
        ((0.0, 0.0), 0.25),
        ((0.0, r), 0.125), ((0.0, -r), 0.125),
        ((r, 0.0), 0.125), ((-r, 0.0), 0.125),
        ((r, r), 0.0625), ((r, -r), 0.0625),
        ((-r, r), 0.0625), ((-r, -r), 0.0625),
    ]
    color = 0.0
    for (dy, dx), weight in taps:
        color = color + _bilinear_at_half_offsets(src, dy, dx) * weight
    if not is_lowest and prev_mip is not None:
        up = jnp.repeat(jnp.repeat(prev_mip, 2, axis=-2), 2, axis=-1)
        up = up[:, :src.shape[1], :src.shape[2]]
        # repeated box at +-0.5 source texels == 3x3 tent on the upsampled grid
        box = (
            _bilinear_at_half_offsets(up, 0.5, 0.5) * 0.25
            + _bilinear_at_half_offsets(up, 0.5, -0.5) * 0.25
            + _bilinear_at_half_offsets(up, -0.5, 0.5) * 0.25
            + _bilinear_at_half_offsets(up, -0.5, -0.5) * 0.25)
        color = color + box
    return color


def compute_bloom(color, strength: float, blur_radius: float, mip_count: int):
    """Bloom.cpp:56-144 — full chain; color (3, H, W) -> bloomed (3, H, W)."""
    mips = [color]
    for _ in range(mip_count - 1):
        if mips[-1].shape[-1] < 4 or mips[-1].shape[-2] < 4:
            break
        mips.append(downsample_13tap(mips[-1]))
    prev = None
    for level in range(len(mips) - 1, 0, -1):
        prev = upsample_tent(mips[level], prev, blur_radius,
                             is_lowest=(level == len(mips) - 1))
    bloom = upsample_tent(mips[0], prev, blur_radius, is_lowest=False) \
        if prev is not None else mips[0]
    return color + (bloom - color) * strength
