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

import jax
import jax.numpy as jnp


def _expand_taps(taps):
    """[( (dy, dx), w )] with half-texel offsets -> integer-offset weights.

    Bilinear at multiples of 0.5 is exact averaging, so every fractional tap
    expands into 2/4 integer taps; duplicate offsets are merged so the whole
    pattern is one fused weighted-sum stencil."""
    import math

    def axis_samples(d):
        d = float(d)
        lo = math.floor(d)
        frac = d - lo
        if frac == 0.0:
            return [(lo, 1.0)]
        return [(lo, 1.0 - frac), (lo + 1, frac)]

    merged = {}
    for (dy, dx), weight in taps:
        for sy, wy in axis_samples(dy):
            for sx, wx in axis_samples(dx):
                merged[(sy, sx)] = merged.get((sy, sx), 0.0) + weight * wy * wx
    return merged


def _stencil(img, merged_taps, stride: int = 1):
    """Apply integer-offset weighted-sum taps as ONE fused shift-add loop
    (clamp-to-edge padding, correlation orientation, optional stride).

    Pad once + static-slice taps fuses into a single XLA loop fusion (the
    EdgePadded pattern that took the TAA filter 8.0 -> 1.6 ms). A depthwise
    NCHW conv expresses the same math as one op but forces layout-relayout
    copies around the conv at C=3 (~0.9-1.7 ms each, measured at 1080p) —
    the TPU conv emitter wants NHWC with lane-major channels. Striding runs
    the stencil dense then point-subsamples (VPU adds are free next to the
    HBM traffic; a strided slice would canonicalize into a gather)."""
    from ..utils.stencil import EdgePadded, point_downsample

    offs = list(merged_taps.items())
    my = max(abs(sy) for (sy, _), _ in offs)
    mx = max(abs(sx) for (_, sx), _ in offs)
    my = min(my, img.shape[-2] - 1)
    mx = min(mx, img.shape[-1] - 1)
    p = EdgePadded(img, my, mx)
    out = None
    for (sy, sx), wt in offs:
        tap = p.tap_fwd(max(min(sy, my), -my), max(min(sx, mx), -mx))
        term = tap * jnp.asarray(wt, img.dtype)
        out = term if out is None else out + term
    if stride != 1:
        out = point_downsample(out, stride, stride)
    return out


def _bilinear_at_half_offsets(img, dy, dx):
    """Sample (C, H, W) at each pixel center + (dx, dy) in SOURCE texels,
    clamped; offsets are multiples of 0.5 so this is exact averaging."""
    return _stencil(img, _expand_taps([((dy, dx), 1.0)]))


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
    merged = _expand_taps(
        [((dy + 0.5, dx + 0.5), weight) for (dy, dx), weight in taps])
    return _stencil(src, merged, stride=2)


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
    return _stencil(src, _expand_taps(taps))


def _box_upsample(src, out_h: int, out_w: int):
    """2x bilinear upsample at the quarter-texel target phases (nearest
    repeat + symmetric half-texel box == exact bilinear of the source)."""
    up = jnp.repeat(jnp.repeat(src, 2, axis=-2), 2, axis=-1)
    up = up[:, :out_h, :out_w]
    merged = _expand_taps([((0.5, 0.5), 0.25), ((0.5, -0.5), 0.25),
                           ((-0.5, 0.5), 0.25), ((-0.5, -0.5), 0.25)])
    return _stencil(up, merged)


@jax.named_scope("bloom")
def compute_bloom_banded(color, strength: float, blur_radius: float,
                         mip_count: int, axis_name: str, n_dev: int,
                         halo_extend_fn):
    """Split-frame bloom with EXACT single-device parity.

    The pyramid's deep mips see the whole frame, so band-local evaluation
    (even with a generous halo) diverges near band borders. Instead:
      - mips 1-2 are computed band-locally from an 8-row halo (enough real
        rows that every band mip-2 row equals the single-device one);
      - band mip-2 rows are all_gather'd into the full mip 2 (H/4 x W/4 —
        ~1.5 MB at 1080p, trivial ICI traffic), and mips 3+ plus the
        upsample chain down to mip 1 run REPLICATED on every device
        (cheap: <= 1/16 of the full-res pixel count);
      - the final mip-0 rows are recomposed band-locally from the halo'd
        band mip 1 and the band's slice of the replicated mip-1 chain.
    """
    hb, w = color.shape[-2:]
    # blur_radius > 2.5 would out-reach the fixed mip-1 halo margins
    if n_dev <= 1 or mip_count <= 2 or hb % 16 != 0 or blur_radius > 2.5:
        return compute_bloom(color, strength, blur_radius, mip_count)

    ext = halo_extend_fn(color, 8).astype(jnp.bfloat16)  # (3, hb+16, w)
    m1e = downsample_13tap(ext)  # mip-1 rows [-4, hb/2+4)
    m2e = downsample_13tap(m1e)  # mip-2 rows [-2, hb/4+2)
    m2_band = m2e[:, 2:-2]
    m2_full = jax.lax.all_gather(m2_band, axis_name, axis=1, tiled=True)

    mips_full = [m2_full]
    for _ in range(mip_count - 3):
        if mips_full[-1].shape[-1] < 4 or mips_full[-1].shape[-2] < 4:
            break
        mips_full.append(downsample_13tap(mips_full[-1]))

    prev = None  # replicated upsample chain back down to mip-2 res
    for t in range(len(mips_full) - 2, -1, -1):
        h2, w2 = mips_full[t].shape[-2:]
        out = _box_upsample(tent9(mips_full[t + 1], blur_radius), h2, w2)
        if prev is not None:
            out = out + _box_upsample(prev, h2, w2)
        prev = out
    u2_full = prev  # None when only mip 2 exists

    # u1 (mip-1 res), replicated
    h1, w1 = m2_full.shape[-2] * 2, m2_full.shape[-1] * 2
    u1_full = _box_upsample(tent9(m2_full, blur_radius), h1, w1)
    if u2_full is not None:
        u1_full = u1_full + _box_upsample(u2_full, h1, w1)

    def box_up_crop(src_1halo):
        """2x upsample of band rows carrying a 1-row halo -> exact band."""
        up = _box_upsample(src_1halo, src_1halo.shape[-2] * 2, w)
        return up[:, 2:-2]

    # band slice of u1 with a 1-row halo (edge-padded at frame borders to
    # match the conv's clamp semantics)
    hb1 = hb // 2
    u1_pad = jnp.pad(u1_full, ((0, 0), (1, 1), (0, 0)), mode="edge")
    row0 = jax.lax.axis_index(axis_name) * hb1
    u1_band = jax.lax.dynamic_slice_in_dim(u1_pad, row0, hb1 + 2, axis=1)

    t1_band = tent9(m1e, blur_radius)[:, 3:-3]  # mip-1 rows [-1, hb1+1)
    bloom = (box_up_crop(t1_band) + box_up_crop(u1_band)).astype(jnp.float32)
    return color + (bloom - color) * strength


@jax.named_scope("bloom")
def compute_bloom(color, strength: float, blur_radius: float, mip_count: int):
    """Bloom.cpp:56-144 — full chain; color (3, H, W) -> bloomed (3, H, W).

    Each upsample pass targets mip T from downscale mip T+1 (9-tap tent) plus
    the previous upsampled mip (repeated box), all at FULL weight — the
    reference chain is additive, so bloom's mean is ~(n_mips-1)x the scene's;
    the tiny apply strength is what keeps the result plausible. Note mip 0 of
    the bloom texture has no direct full-res scene term (bloomUpsample.comp
    sources downscale mip 1).
    """
    # the whole pyramid runs in bf16: bloom is a wide soft blur mixed in at
    # a few percent; bf16 halves the HBM traffic of every level (the chain
    # is bandwidth-bound) and the error is far below the apply strength
    mips = [color.astype(jnp.bfloat16)]
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
    bloom = prev.astype(jnp.float32)
    return color + (bloom - color) * strength
