"""Temporal anti-aliasing.

Parity:
  - temporalFilter.comp — 3x3 neighborhood with jitter-aware Blackman-Harris
    resolve weights (TAA.cpp:181-202), motion dilation via closest-depth 3x3
    (temporalReprojection.inc:70-87), AABB clip/clamp (:8-33),
    contrast-change-adaptive blend 0.03-0.13 (:151-160), reversible luma
    tonemap option (:37-44), camera-cut and offscreen fallbacks;
  - bicubicSampling.inc — Catmull-Rom history sampling; the default
    Bicubic1Tap (CoD Siggraph p.111) takes ONE bilinear history tap and
    reconstructs the bicubic corners from the CURRENT frame's neighborhood;
  - depthPrepass.frag:33-40 — motion vectors (computed here from the
    G-buffer's previous-frame NDC plane).

TPU split: everything local (neighborhood ops, clip, blend) is pure XLA on
shifted planes; ONLY the motion-offset history fetch runs as a Pallas kernel
where each screen tile DMAs a history window (TILE + margins) and taps it
with lane-gathers on the R11G11B10-packed history (one gather per tap).
Motion beyond the window margins falls back to blend=1 exactly like the
reference's offscreen-reprojection path (temporalFilter.comp:166-170).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.color import luminance
from ..utils.stencil import EdgePadded
from . import gatherlib
from .color_packing import pack_r11g11b10, unpack_r11g11b10
from .raster import TILE_H, TILE_W

# history window per tile: x is centered on the tile's MEAN reprojected
# position (uniform horizontal motion of any magnitude costs nothing;
# only per-tile spread consumes the >= 64-texel snapped margin), y stays
# TILE-anchored with the fixed 8-row margins. y must not follow the mean:
# in split-frame band mode the window would clamp against the band's halo
# where the single-device window clamps against the frame, diverging the
# fallback pixel sets between the two (band-parity tests caught this);
# x has the full frame width in both modes, so x centering is exact.
# Flat gather rows drop 96 -> 64 vs the old fixed (32, 384) window — the
# in-kernel gather cost is linear in rows.
WIN_H = 32
WIN_W = 256


@jax.named_scope("taa.motion")
def compute_motion(prev_ndc, valid, cur_jitter, prev_jitter, width, height):
    """depthPrepass.frag:33-40 — motion in UV units; uv_last = uv + motion.

    prev_ndc (2, H, W) interpolated previous-frame NDC from the G-buffer;
    jitters in NDC units (g_currentFrameCameraJitter convention).
    """
    _, h, w = prev_ndc.shape
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / height * 2.0 - 1.0
    cur_x = jnp.broadcast_to(xs[None, :], (h, w))
    cur_y = jnp.broadcast_to(ys[:, None], (h, w))
    mx = (prev_ndc[0] + prev_jitter[0] - (cur_x + cur_jitter[0])) * 0.5
    my = (prev_ndc[1] + prev_jitter[1] - (cur_y + cur_jitter[1])) * 0.5
    motion = jnp.stack([mx, my], axis=0)
    return jnp.where(valid[None], motion, 0.0)


def resolve_weights(jitter_px):
    """TAA.cpp:181-202 — 3x3 gaussian fit of Blackman-Harris around jitter."""
    xs = jnp.asarray([-1.0, 0.0, 1.0])
    dx = jitter_px[0] - xs[None, :]
    dy = jitter_px[1] - xs[:, None]
    d2 = dx * dx + dy * dy
    w = jnp.exp(-2.29 * d2)
    return w / jnp.sum(w)


def _shift(plane, dy, dx):
    """Clamped 2D shift (XLA): out[y, x] = in_clamped[y - dy, x - dx].

    One-off use only — for multi-tap stencils build one EdgePadded and slice
    it per tap so XLA fuses the whole stencil (utils/stencil.py)."""
    return EdgePadded(plane, abs(dy), abs(dx)).tap(dy, dx)


def _neighborhood(color):
    """(3, H, W) -> list of 9 shifted (3, H, W) planes, [dy+1][dx+1] order."""
    p = EdgePadded(color, 1, 1)
    return [[p.tap(-dy, -dx) for dx in (-1, 0, 1)] for dy in (-1, 0, 1)]


def _fast_recip(x):
    """1/x for x > 0 as rsqrt^2 + one Newton step (~1 ulp) — the TPU VPU
    lowers a full-precision f32 divide to a long software sequence; this
    is the XLA-side twin of ops/raster._kernel_recip, used where the TAA
    filter divides whole 1080p planes."""
    r = jax.lax.rsqrt(x)
    r = r * r
    return r * (2.0 - x * r)


def _reversible_tonemap(c):
    """temporalReprojection.inc:37-40."""
    return c * _fast_recip(1.0 + luminance(c, axis=0)[None])


def _reversible_tonemap_inverse(c):
    """temporalReprojection.inc:42-44."""
    return c * _fast_recip(jnp.maximum(1.0 - luminance(c, axis=0)[None],
                                       1e-4))


def dilate_motion(motion, depth):
    """temporalReprojection.inc:70-87 — motion of the closest (max reverse-Z)
    depth in the 3x3 neighborhood."""
    pd = EdgePadded(depth, 1, 1)
    pm = EdgePadded(motion, 1, 1)
    best_depth = depth
    best = motion
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            d = pd.tap(-dy, -dx)
            m = pm.tap(-dy, -dx)
            take = d > best_depth
            best = jnp.where(take[None], m, best)
            best_depth = jnp.maximum(best_depth, d)
    return best


def _history_tap_kernel(history_ref, coords_ref, out_ref, window,
                        sem, *, win_h: int, win_w: int, n_taps: int):
    """Per tile: DMA a packed-history window, K bilinear taps per pixel.

    coords_ref (2*K, TILE_H, TILE_W): absolute source pixel coords per tap
    (the bicubic history sampler variants are sets of bilinear taps at
    per-pixel positions). out (3*K + 1, TILE_H, TILE_W): rgb per tap +
    in-window flag (computed from tap 0 with a 2.5-texel margin).
    """
    ty = pl.program_id(0)
    h = history_ref.shape[0]
    w = history_ref.shape[1]
    # x: mean reprojected position -> window center; y: tile-anchored
    # (see the WIN_H note for why y must not follow the mean)
    mean_x = jnp.sum(coords_ref[0]) * (1.0 / (TILE_H * TILE_W))
    by = pl.multiple_of(
        jnp.clip(ty * TILE_H - (win_h - TILE_H) // 2, 0, h - win_h), 8)
    bx = pl.multiple_of(jnp.clip(
        (mean_x.astype(jnp.int32) - win_w // 2) // 128 * 128,
        0, w - win_w), 128)
    dma = pltpu.make_async_copy(
        history_ref.at[pl.ds(by, win_h), pl.ds(bx, win_w)], window, sem)
    dma.start()
    dma.wait()

    sx0 = coords_ref[0] - bx.astype(jnp.float32)
    sy0 = coords_ref[1] - by.astype(jnp.float32)
    margin = 2.5  # covers the widest (bicubic) tap pattern
    in_window = ((sx0 >= margin) & (sx0 <= win_w - margin)
                 & (sy0 >= margin) & (sy0 <= win_h - margin))

    # window is (win_h, win_w) int32 == (win_h * win_w / 128, 128) flat rows
    flat = window[...].reshape(win_h * win_w // 128, 128)

    for k in range(n_taps):
        sx = coords_ref[2 * k] - bx.astype(jnp.float32)
        sy = coords_ref[2 * k + 1] - by.astype(jnp.float32)
        x0 = jnp.clip(jnp.floor(sx - 0.5), 0, win_w - 2).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(sy - 0.5), 0, win_h - 2).astype(jnp.int32)
        fx = jnp.clip(sx - 0.5 - x0.astype(jnp.float32), 0.0, 1.0)
        fy = jnp.clip(sy - 0.5 - y0.astype(jnp.float32), 0.0, 1.0)

        def tap(xi, yi):
            packed = gatherlib.gather_rows_128(flat, yi * win_w + xi)
            return unpack_r11g11b10(packed)

        c00 = tap(x0, y0)
        c01 = tap(x0 + 1, y0)
        c10 = tap(x0, y0 + 1)
        c11 = tap(x0 + 1, y0 + 1)
        out_ref[3 * k:3 * k + 3] = (
            c00 * (1 - fx) * (1 - fy) + c01 * fx * (1 - fy)
            + c10 * (1 - fx) * fy + c11 * fx * fy)
    out_ref[3 * n_taps] = in_window.astype(jnp.float32)


def resample_history_taps(history_packed, coords, interpret: bool = False):
    """K bilinear taps at per-pixel absolute coords (2K, H, W).

    Returns (rgb (3K, H, W), ok (H, W))."""
    h, w = history_packed.shape
    win_h = min(WIN_H, h)
    win_w = min(WIN_W, w)
    nty, ntx = h // TILE_H, w // TILE_W
    n_taps = coords.shape[0] // 2
    kernel = functools.partial(_history_tap_kernel, win_h=win_h,
                               win_w=win_w, n_taps=n_taps)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((2 * n_taps, TILE_H, TILE_W),
                         lambda ty, tx: (0, ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((3 * n_taps + 1, TILE_H, TILE_W),
                         lambda ty, tx: (0, ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((win_h, win_w), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((3 * n_taps + 1, h, w), jnp.float32)],
        interpret=interpret,
    )(history_packed, coords)
    return out[0:3 * n_taps], out[3 * n_taps] > 0.5


def _base_coords(motion, width, height, h, w):
    """Reprojected absolute pixel coords (2, H, W) at uv + motion."""
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    # motion in UV units of the LOGICAL resolution
    return jnp.stack([
        jnp.broadcast_to(xs[None, :], (h, w)) + motion[0] * width,
        jnp.broadcast_to(ys[:, None], (h, w)) + motion[1] * height,
    ])


def history_resample(history_packed, motion, width, height,
                     interpret: bool = False):
    """Single bilinear history fetch at uv+motion -> ((3,H,W), ok)."""
    h, w = history_packed.shape
    coords = _base_coords(motion, width, height, h, w)
    return resample_history_taps(history_packed, coords, interpret=interpret)


def pack_f16_pair(a, b):
    """Two f32 planes -> one int32 plane (f16 bits lo/hi)."""
    fa = a.astype(jnp.float16).view(jnp.int16).astype(jnp.int32) & 0xFFFF
    fb = b.astype(jnp.float16).view(jnp.int16).astype(jnp.int32) & 0xFFFF
    return fa | (fb << 16)


def unpack_f16_pair(packed):
    """int32 -> (a, b) f32 planes."""
    lo = (packed & 0xFFFF).astype(jnp.uint16).view(jnp.float16)
    hi = ((packed >> 16) & 0xFFFF).astype(jnp.uint16).view(jnp.float16)
    return lo.astype(jnp.float32), hi.astype(jnp.float32)


def _unpack_f16_pair_kernel(packed):
    """In-kernel f16-pair decode via pure 32-bit integer math: Mosaic has no
    16-bit vector bitcast, so widen the f16 bit pattern to f32 manually
    (subnormals flush to zero; inf/nan never stored — history is NaN-scrubbed)
    """
    def decode(bits16):
        em = bits16 & 0x7FFF
        f32bits = (em << 13) + ((127 - 15) << 23)
        mag = jax.lax.bitcast_convert_type(f32bits, jnp.float32)
        val = jnp.where(em >= 0x0400, mag, 0.0)
        return jnp.where((bits16 & 0x8000) != 0, -val, val)

    return decode(packed & 0xFFFF), decode((packed >> 16) & 0xFFFF)


def _packed_planes_tap_kernel(planes_ref, coords_ref, out_ref, window, sem, *,
                              win_h: int, win_w: int, n_planes: int):
    """Like _history_tap_kernel but for N f16-pair-packed planes (used by the
    GI temporal filter, which carries 6 channels in 3 int32 planes)."""
    ty = pl.program_id(0)
    h = planes_ref.shape[1]
    w = planes_ref.shape[2]
    # x: mean reprojected position -> window center; y: tile-anchored
    # (see the WIN_H note for why y must not follow the mean)
    mean_x = jnp.sum(coords_ref[0]) * (1.0 / (TILE_H * TILE_W))
    by = pl.multiple_of(
        jnp.clip(ty * TILE_H - (win_h - TILE_H) // 2, 0, h - win_h), 8)
    bx = pl.multiple_of(jnp.clip(
        (mean_x.astype(jnp.int32) - win_w // 2) // 128 * 128,
        0, w - win_w), 128)
    dma = pltpu.make_async_copy(
        planes_ref.at[:, pl.ds(by, win_h), pl.ds(bx, win_w)], window, sem)
    dma.start()
    dma.wait()

    sx = coords_ref[0] - bx.astype(jnp.float32)
    sy = coords_ref[1] - by.astype(jnp.float32)
    in_window = (
        (sx >= 0.5) & (sx <= win_w - 1.5) & (sy >= 0.5) & (sy <= win_h - 1.5))
    x0 = jnp.clip(jnp.floor(sx - 0.5), 0, win_w - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(sy - 0.5), 0, win_h - 2).astype(jnp.int32)
    fx = jnp.clip(sx - 0.5 - x0.astype(jnp.float32), 0.0, 1.0)
    fy = jnp.clip(sy - 0.5 - y0.astype(jnp.float32), 0.0, 1.0)

    for p in range(n_planes):
        flat = window[p].reshape(win_h * win_w // 128, 128)

        def tap(xi, yi):
            packed = gatherlib.gather_rows_128(flat, yi * win_w + xi)
            return _unpack_f16_pair_kernel(packed)

        a00, b00 = tap(x0, y0)
        a01, b01 = tap(x0 + 1, y0)
        a10, b10 = tap(x0, y0 + 1)
        a11, b11 = tap(x0 + 1, y0 + 1)
        w00 = (1 - fx) * (1 - fy)
        w01 = fx * (1 - fy)
        w10 = (1 - fx) * fy
        w11 = fx * fy
        out_ref[2 * p] = a00 * w00 + a01 * w01 + a10 * w10 + a11 * w11
        out_ref[2 * p + 1] = b00 * w00 + b01 * w01 + b10 * w10 + b11 * w11
    out_ref[2 * n_planes] = in_window.astype(jnp.float32)


@jax.named_scope("taa.history_resample")
def resample_packed_planes(planes_packed, motion, width, height,
                           interpret: bool = False):
    """Motion-offset bilinear resample of (P, H, W) int32 f16-pair planes.

    Returns (channels (2P, H, W) f32, ok (H, W) bool). Used for the GI
    history (filterIndirectDiffuseTemporal.comp's reprojected fetches).
    """
    n_planes, h, w = planes_packed.shape
    win_h = min(WIN_H, h)
    win_w = min(WIN_W, w)
    nty, ntx = h // TILE_H, w // TILE_W
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    coords = jnp.stack([
        jnp.broadcast_to(xs[None, :], (h, w)) + motion[0] * width,
        jnp.broadcast_to(ys[:, None], (h, w)) + motion[1] * height,
    ])
    kernel = functools.partial(
        _packed_planes_tap_kernel, win_h=win_h, win_w=win_w,
        n_planes=n_planes)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((2, TILE_H, TILE_W), lambda ty, tx: (0, ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2 * n_planes + 1, TILE_H, TILE_W),
                         lambda ty, tx: (0, ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_planes, win_h, win_w), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((2 * n_planes + 1, h, w), jnp.float32)],
        interpret=interpret,
    )(planes_packed, coords)
    return out[:2 * n_planes], out[2 * n_planes] > 0.5


@jax.named_scope("taa.supersampling")
def temporal_supersampling(
    color, prev_color_packed, prev_lum_depth_packed, motion, depth,
    near, far, width, height, camera_cut, *,
    use_tonemapping: bool = True, interpret: bool = False,
):
    """temporalSupersampling.comp — the optional pre-pass that blends 50%
    of the reprojected LAST frame into the current one before the main TAA
    filter (TAA.cpp:85-137).

    Acceptance mirrors the Filmic-SMAA tests: 2x2-block min-luminance
    contrast difference < 0.5 (p.126) and closest-neighborhood linear-depth
    difference < 1.0 (p.99), plus offscreen rejection. The last-frame
    color/luminance/depth arrive packed (r11g11b10 color; (lum, linear
    depth) f16 pair) and are fetched with the windowed resample kernels.

    Returns (color', luminance_of_input) — the luminance feeds next frame's
    state (colorToLuminance analog).
    """
    cur_lum = luminance(color, axis=0)
    motion_d = dilate_motion(motion, depth)

    last_rgb, in_window = history_resample(
        prev_color_packed, motion_d, width, height, interpret=interpret)
    ld, ok2 = resample_packed_planes(
        prev_lum_depth_packed[None], motion_d, width, height,
        interpret=interpret)
    last_lum, last_lin_depth = ld[0], ld[1]

    cur = _reversible_tonemap(color) if use_tonemapping else color
    last = _reversible_tonemap(last_rgb) if use_tonemapping else last_rgb

    # 2x2 block luminance contrast (minAbsoluteDifference sums)
    def block(p):
        e = EdgePadded(p, 1, 1)
        return [p, e.tap(0, -1), e.tap(-1, 0), e.tap(-1, -1)]

    cur_b = block(cur_lum)
    last_b = block(last_lum)
    last_max = jnp.maximum(
        jnp.maximum(jnp.abs(last_b[0]), jnp.abs(last_b[1])),
        jnp.maximum(jnp.abs(last_b[2]), jnp.abs(last_b[3])))
    contrast = sum(jnp.abs(c) - last_max for c in cur_b)
    contrast_ok = contrast < 0.5

    # closest-neighborhood linear depth (reverse-Z max)
    from .shadow import linearize_depth

    pdep = EdgePadded(depth, 1, 1)
    closest = depth
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            closest = jnp.maximum(closest, pdep.tap(dy, dx))
    cur_lin = linearize_depth(closest, near, far)
    depth_ok = jnp.abs(cur_lin - last_lin_depth) < 1.0

    accept = contrast_ok & depth_ok & in_window & ok2 & ~camera_cut
    blend = jnp.where(accept, 0.5, 0.0)
    out = cur + (last - cur) * blend[None]
    if use_tonemapping:
        out = _reversible_tonemap_inverse(out)
    out = jnp.where(jnp.isnan(out), color, out)
    return out, cur_lum


def _cr_weights(f):
    """Catmull-Rom 1D weights for the 4-texel footprint at fraction f."""
    f2 = f * f
    f3 = f2 * f
    w0 = -0.5 * f3 + f2 - 0.5 * f
    w1 = 1.5 * f3 - 2.5 * f2 + 1.0
    w2 = -1.5 * f3 + 2.0 * f2 + 0.5 * f
    w3 = 0.5 * f3 - 0.5 * f2
    return w0, w1, w2, w3


def _sample_history(history_packed, motion, width, height, tech: int,
                    nb, interpret: bool):
    """bicubicSampling.inc — the 5 history sampler variants, each built
    from per-pixel bilinear taps of the windowed resample kernel.

    tech: 0 bilinear, 1 bicubic 16-tap, 2 bicubic 9-tap, 3 bicubic 5-tap,
    4 bicubic 1-tap (CoD: 1 history tap + current-frame neighborhood
    corner reconstruction, bicubicSampling.inc:151-183).
    """
    h, w = history_packed.shape
    base = _base_coords(motion, width, height, h, w)
    bx, by = base[0], base[1]
    tx = jnp.floor(bx - 0.5) + 0.5
    ty = jnp.floor(by - 0.5) + 0.5
    fx = bx - tx
    fy = by - ty
    w0x, w1x, w2x, w3x = _cr_weights(fx)
    w0y, w1y, w2y, w3y = _cr_weights(fy)
    wbx, wby = w1x + w2x, w1y + w2y
    tox = tx + w2x / jnp.maximum(wbx, 1e-6)
    toy = ty + w2y / jnp.maximum(wby, 1e-6)

    if tech == 0:  # bilinear
        with jax.named_scope("taa.history_taps"):
            return resample_history_taps(history_packed, base,
                                         interpret=interpret)

    if tech == 1:  # full 16-tap (taps land on texel centers)
        px = [tx - 1, tx, tx + 1, tx + 2]
        py = [ty - 1, ty, ty + 1, ty + 2]
        wx = [w0x, w1x, w2x, w3x]
        wy = [w0y, w1y, w2y, w3y]
        coords = jnp.concatenate(
            [jnp.stack([px[i], py[j]]) for j in range(4) for i in range(4)])
        taps, ok = resample_history_taps(history_packed, coords,
                                         interpret=interpret)
        hist = jnp.zeros((3, h, w), jnp.float32)
        k = 0
        for j in range(4):
            for i in range(4):
                hist = hist + taps[3 * k:3 * k + 3] * (wx[i] * wy[j])[None]
                k += 1
        return hist, ok

    if tech == 2:  # 9-tap (corner-combined bilinear positions)
        px = [tx - 1, tox, tx + 2]
        py = [ty - 1, toy, ty + 2]
        wx = [w0x, wbx, w3x]
        wy = [w0y, wby, w3y]
        coords = jnp.concatenate(
            [jnp.stack([px[i], py[j]]) for j in range(3) for i in range(3)])
        taps, ok = resample_history_taps(history_packed, coords,
                                         interpret=interpret)
        hist = jnp.zeros((3, h, w), jnp.float32)
        k = 0
        for j in range(3):
            for i in range(3):
                hist = hist + taps[3 * k:3 * k + 3] * (wx[i] * wy[j])[None]
                k += 1
        return hist, ok

    if tech == 3:  # 5-tap cross, renormalized (Filmic SMAA p.90)
        pts = [(tox, ty - 1, wbx * w0y), (tx - 1, toy, w0x * wby),
               (tox, toy, wbx * wby), (tx + 2, toy, w3x * wby),
               (tox, ty + 2, wbx * w3y)]
        coords = jnp.concatenate([jnp.stack([p, q]) for p, q, _ in pts])
        taps, ok = resample_history_taps(history_packed, coords,
                                         interpret=interpret)
        hist = jnp.zeros((3, h, w), jnp.float32)
        total = jnp.zeros((h, w), jnp.float32)
        for k, (_, _, wk) in enumerate(pts):
            hist = hist + taps[3 * k:3 * k + 3] * wk[None]
            total = total + wk
        return hist / jnp.maximum(total, 1e-6)[None], ok

    # tech 4: CoD 1-tap — single bilinear tap at the combined position +
    # cross reconstruction from the CURRENT frame's neighborhood
    coords = jnp.stack([tox, toy])
    with jax.named_scope("taa.history_taps"):
        taps, ok = resample_history_taps(history_packed, coords,
                                         interpret=interpret)
    center = nb[1][1]
    total = (w0x * wby + wbx * w0y + wbx * wby + wbx * w3y + w3x * wby)
    hist = (
        (taps + nb[1][0] - center) * (w0x * wby)[None]
        + (taps + nb[0][1] - center) * (wbx * w0y)[None]
        + taps * (wbx * wby)[None]
        + (taps + nb[2][1] - center) * (wbx * w3y)[None]
        + (taps + nb[1][2] - center) * (w3x * wby)[None]
    ) / jnp.maximum(total, 1e-6)[None]
    return hist, ok


@jax.named_scope("taa.temporal_filter")
def temporal_filter(
    color, history_packed, motion, depth, jitter_px,
    camera_cut, width, height, *,
    use_clipping: bool = True,
    use_motion_dilation: bool = True,
    use_tonemapping: bool = True,
    history_sampling_tech: int = 4,
    interpret: bool = False,
):
    """temporalFilter.comp main() — returns (output (3,H,W), new history
    packed (H,W) int32)."""
    if use_motion_dilation:
        motion = dilate_motion(motion, depth)

    nb = _neighborhood(
        _reversible_tonemap(color) if use_tonemapping else color)
    center = nb[1][1]

    weights = resolve_weights(jitter_px)
    resolved = jnp.zeros_like(center)
    for y in range(3):
        for x in range(3):
            # resolveColor indexes weights[x][y] (temporalFilter.comp:41-57)
            resolved = resolved + nb[y][x] * weights[x, y]

    nb_min = center
    nb_max = center
    for y in range(3):
        for x in range(3):
            nb_min = jnp.minimum(nb_min, nb[y][x])
            nb_max = jnp.maximum(nb_max, nb[y][x])

    # NOTE: the 1-tap reconstruction (tech 4) uses the TONEMAPPED current
    # neighborhood, so the history tap must be tonemapped before the
    # correction; the bilinear tap itself commutes (monotone per pixel)
    # closely enough at history granularity
    hist_raw, in_window = _sample_history(
        history_packed, motion, width, height, history_sampling_tech,
        nb, interpret=interpret)
    hist = _reversible_tonemap(hist_raw) if use_tonemapping else hist_raw
    hist_pre_clip = hist  # contrast change is measured on unclipped history

    if use_clipping:
        # clipAABB (temporalReprojection.inc:8-30)
        c = 0.5 * (nb_max + nb_min)
        e = 0.5 * (nb_max - nb_min) + 1e-4
        to_t = hist - c
        norm = jnp.abs(to_t * _fast_recip(e))
        max_comp = jnp.max(norm, axis=0, keepdims=True)
        hist = jnp.where(
            max_comp < 1.0, hist,
            c + to_t * _fast_recip(jnp.maximum(max_comp, 1e-6)))
    else:
        hist = jnp.clip(hist, nb_min, nb_max)
    hist = jnp.where(jnp.isnan(hist), resolved, hist)

    def contrast(n):
        lc = luminance(n[1][1], axis=0)
        total = jnp.zeros_like(lc)
        for y in range(3):
            for x in range(3):
                if x == 1 and y == 1:
                    continue
                total = total + jnp.abs(luminance(n[y][x], axis=0) - lc)
        return total

    cur_contrast = contrast(nb)
    hist_nb = _neighborhood(hist_pre_clip)
    last_contrast = contrast(hist_nb)
    contrast_change = jnp.clip(jnp.abs(cur_contrast - last_contrast), 0.0, 1.0)
    blend = 0.13 + (0.03 - 0.13) * contrast_change

    gaussian = (
        (nb[0][0] + nb[0][2] + nb[2][0] + nb[2][2]) * 0.0625
        + (nb[1][0] + nb[0][1] + nb[1][2] + nb[2][1]) * 0.125
        + nb[1][1] * 0.25)
    blend = jnp.where(in_window, blend, 1.0)
    resolved = jnp.where(in_window[None], resolved, gaussian)
    blend = jnp.where(camera_cut, 1.0, blend)

    out = hist + (resolved - hist) * blend[None]
    if use_tonemapping:
        out = _reversible_tonemap_inverse(out)
    out = jnp.maximum(out, 0.0)
    return out, pack_r11g11b10(out)
