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


def tent9(src, blur_radius: float):
    """bloomUpsample.comp taps 1-9 — 9-tap tent blur at src's own res."""
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
    return color


def _box_upsample(src, out_h: int, out_w: int):
    """2x bilinear upsample at the quarter-texel target phases (nearest
    repeat + symmetric half-texel box == exact bilinear of the source)."""
    up = jnp.repeat(jnp.repeat(src, 2, axis=-2), 2, axis=-1)
    up = up[:, :out_h, :out_w]
    return (
        _bilinear_at_half_offsets(up, 0.5, 0.5) * 0.25
        + _bilinear_at_half_offsets(up, 0.5, -0.5) * 0.25
        + _bilinear_at_half_offsets(up, -0.5, 0.5) * 0.25
        + _bilinear_at_half_offsets(up, -0.5, -0.5) * 0.25)


def compute_bloom(color, strength: float, blur_radius: float, mip_count: int):
    """Bloom.cpp:56-144 — full chain; color (3, H, W) -> bloomed (3, H, W).

    Each upsample pass targets mip T from downscale mip T+1 (9-tap tent) plus
    the previous upsampled mip (repeated box), all at FULL weight — the
    reference chain is additive, so bloom's mean is ~(n_mips-1)x the scene's;
    the tiny apply strength is what keeps the result plausible. Note mip 0 of
    the bloom texture has no direct full-res scene term (bloomUpsample.comp
    sources downscale mip 1).
    """
    mips = [color]
    for _ in range(mip_count - 1):
        if mips[-1].shape[-1] < 4 or mips[-1].shape[-2] < 4:
            break
        mips.append(downsample_13tap(mips[-1]))
    if len(mips) == 1:
        return color
    prev = None
    for target in range(len(mips) - 2, -1, -1):
        h, w = mips[target].shape[-2:]
        out = _box_upsample(tent9(mips[target + 1], blur_radius), h, w)
        if prev is not None:
            out = out + _box_upsample(prev, h, w)
        prev = out
    bloom = prev
    return color + (bloom - color) * strength
