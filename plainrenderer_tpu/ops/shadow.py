"""Cascaded sun shadow maps: GPU-fitted cascades + PCF resolve.

Parity:
  - lightMatrix.comp — cascade splits linear between the hi-Z depth bounds
    (:54-56), per-cascade ortho fit around the sub-frustum in light view
    space (:96-127), last cascade extended by the SDF influence radius and
    the volumetric far plane (:96-127 push constants), sample-radius padding,
    reverse-Z [0,1] depth via the same correction matrix as the camera;
  - sunShadow.vert/.frag — cascade depth render == ops.raster depth-only
    pass with the light matrix;
  - triangle.frag:89-120 calcShadow — 12-tap spiral PCF with per-frame blue
    noise rotation, nearest-sampler shadow tests, cascade chosen per pixel
    by linear depth (:231-239).

TPU design: the per-pixel shadow-map fetches run in a Pallas kernel where
each 16x128 screen tile DMAs a (16..64, 128)-texel window of the cascade's
shadow map around the tile's mean light-space position into VMEM and taps it
with the lane-gather primitives (gatherlib). Pixels whose footprint escapes
the window clamp to its edge — a bounded approximation at extreme depth
discontinuities, revisited with multi-window fetch in a later round.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import gatherlib
from .raster import TILE_H, TILE_W

MAX_CASCADES = 4  # sunShadowCascades.inc:4
SHADOW_SAMPLE_RADIUS = 0.03  # world-space, sunShadowCascades.inc:5
# shadow-map window per tile; origins snap to the DMA alignment grid
# (texel rows: multiples of 16 = 8 packed word rows, cols: multiples of
# 128) so the window keeps >= (8, 64) texels of margin around the
# tile-mean position (PCF tap radii are only a few texels; the margin
# absorbs in-tile position spread). Height is 2x8 packed word rows —
# Mosaic requires DMA sublane extents in multiples of 8.
WINDOW_H = 32
WINDOW_W = 256

# packed per-cascade row layout for the resolve kernel
_ROW_F = 32  # 16 matrix + 2 scale + 1 split + pad -> 32 f32 per cascade


def linearize_depth(depth, near, far):
    """linearDepth.inc:5-8 — reverse-Z [0,1] -> linear view distance."""
    return near * far / (far + (-depth + 1.0) * (near - far))


@jax.named_scope("shadow.light_matrices")
def compute_cascade_info(
    depth_min, depth_max,  # reverse-Z scalars from the hi-Z lowest mip
    camera_position, camera_forward, camera_up, camera_right,
    tan_fov_half, aspect, near, far,
    sun_direction,  # unit, pointing TOWARDS the sun
    cascade_count: int,
    highest_cascade_extra_padding,  # SDF influence radius (lightMatrix push)
    highest_cascade_min_far,  # volumetric max distance
    sample_radius: float = SHADOW_SAMPLE_RADIUS,
):
    """lightMatrix.comp main() — returns (matrices (C,4,4), splits (4,),
    light_space_scale (C,2)). All jnp; runs inside the frame program (the
    reference runs this as a 1-thread compute dispatch)."""
    depth_max_linear = linearize_depth(depth_min, near, far)
    depth_min_linear = linearize_depth(depth_max, near, far)

    # light view matrix (lightMatrix.comp:66-80)
    forward = -jnp.asarray(sun_direction, jnp.float32)
    up0 = jnp.where(
        jnp.abs(forward[1]) < 0.9999,
        jnp.asarray([0.0, -1.0, 0.0], jnp.float32),
        jnp.asarray([0.0, 0.0, -1.0], jnp.float32),
    )
    right = jnp.cross(forward, up0)
    up = jnp.cross(right, forward)
    right = right / jnp.maximum(jnp.linalg.norm(right), 1e-9)
    up = up / jnp.maximum(jnp.linalg.norm(up), 1e-9)
    v = jnp.zeros((4, 4), jnp.float32)
    v = v.at[0, :3].set(right).at[1, :3].set(up).at[2, :3].set(forward)
    v = v.at[3, 3].set(1.0)

    correction = jnp.asarray(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, -0.5, 0.5], [0, 0, 0, 1]],
        jnp.float32)

    # linear splits (lightMatrix.comp:54-56)
    idx = jnp.arange(1, MAX_CASCADES + 1, dtype=jnp.float32)
    splits = depth_min_linear + (
        (depth_max_linear - depth_min_linear) * idx / cascade_count)

    def frustum_points(near_d, far_d):
        """lightMatrix.comp:31-50."""
        pos = jnp.asarray(camera_position, jnp.float32)
        fwd = jnp.asarray(camera_forward, jnp.float32)
        u = jnp.asarray(camera_up, jnp.float32)
        r = jnp.asarray(camera_right, jnp.float32)
        pts = []
        for dist in (far_d, near_d):
            center = pos + fwd * dist
            hh = tan_fov_half * dist
            ww = hh * aspect
            for sy in (1.0, -1.0):
                for sx in (1.0, -1.0):
                    pts.append(center + u * (hh * sy) + r * (ww * sx))
        return jnp.stack(pts)  # (8, 3)

    matrices = []
    scales = []
    for c in range(cascade_count):
        cmin = depth_min_linear if c == 0 else splits[c - 1]
        cmax = splits[c]
        if c == cascade_count - 1:
            cmin = near
            cmax = jnp.maximum(depth_max_linear, highest_cascade_min_far)
        pts = frustum_points(cmin, cmax)
        pts_ls = pts @ v[:3, :3].T
        min_p = pts_ls.min(axis=0)
        max_p = pts_ls.max(axis=0)
        if c == cascade_count - 1:
            min_p = min_p - highest_cascade_extra_padding
            max_p = max_p + highest_cascade_extra_padding
        min_p = min_p - sample_radius * 2
        max_p = max_p + sample_radius * 2
        scale = 2.0 / (max_p - min_p)
        offset = -0.5 * (max_p + min_p) * scale
        p = jnp.zeros((4, 4), jnp.float32)
        p = p.at[0, 0].set(scale[0]).at[1, 1].set(scale[1]).at[2, 2].set(scale[2])
        p = p.at[:3, 3].set(offset).at[3, 3].set(1.0)
        matrices.append(correction @ p @ v)
        scales.append(scale[:2])
    while len(matrices) < MAX_CASCADES:
        matrices.append(jnp.eye(4, dtype=jnp.float32))
        scales.append(jnp.ones(2, jnp.float32))
    return (jnp.stack(matrices[:MAX_CASCADES]), splits,
            jnp.stack(scales[:MAX_CASCADES]))


def _spiral_offsets(taps: int):
    """triangle.frag:108-118 — unit spiral pattern (noise applied per pixel)."""
    i = np.arange(taps, dtype=np.float32)
    return i  # offsets are derived per-pixel from noise inside the kernel


@jax.named_scope("shadow.pack_maps")
def pack_shadow_maps_u16(shadow_maps):
    """(C, S, S) f32 reverse-Z -> (C, S/2, S) i32 of y-adjacent u16 texels.

    The reference's shadow maps are Depth16 (RenderFrontend.cpp:1210
    ImageFormat::Depth16), so 16-bit quantization is exact format parity —
    the PCF compare below reconstructs texel/65535 in f32 and compares the
    unquantized receiver against it, matching the D16 sampler semantics.
    Packing two y-adjacent texels per lane word halves the VMEM window's
    flat row count (the in-kernel gather cost is linear in rows,
    gatherlib.gather_rows_128) while keeping the x axis at texel
    granularity, so window origins still snap in 128-texel steps and the
    guaranteed margins match the unpacked window exactly."""
    q = jnp.round(jnp.clip(shadow_maps, 0.0, 1.0) * 65535.0).astype(jnp.int32)
    return q[..., 0::2, :] | (q[..., 1::2, :] << 16)


def _shadow_resolve_kernel(
    cascade_ref,  # (MAX_CASCADES, _ROW_F) matrices/scales/splits in VMEM
    wpos_ref,  # (3, TILE_H, TILE_W)
    lindepth_ref,  # (TILE_H, TILE_W) linear pixel depth
    noise_ref,  # (TILE_H, TILE_W) blue noise in [0,1)
    maps_ref,  # (MAX_CASCADES, S, S) in ANY
    out_ref,  # (TILE_H, TILE_W)
    window,  # scratch (win_h, win_w) f32
    sem,
    *, cascade_count: int, taps: int, map_size: int,
    win_h: int, win_w: int, sample_radius: float,
):
    valid = lindepth_ref[...] > 0.0
    lin_depth = lindepth_ref[...]

    # per-pixel cascade index (triangle.frag:231-239)
    cascade_idx = jnp.zeros((TILE_H, TILE_W), jnp.int32)
    for c in range(cascade_count - 1):
        split_c = cascade_ref[c, 18]
        cascade_idx = cascade_idx + (lin_depth >= split_c).astype(jnp.int32)

    noise = noise_ref[...]

    wx = wpos_ref[0]
    wy = wpos_ref[1]
    wz = wpos_ref[2]

    # pass 1: light-space coords + window origins for EVERY live cascade,
    # all window DMAs issued together so their HBM latencies overlap (the
    # serial start-wait-per-cascade version stalled up to 4 round trips
    # per tile)
    masks, coords, origins = [], [], []
    for c in range(cascade_count):
        mask = valid & (cascade_idx == c)
        m = cascade_ref[c]
        # light-space position (ortho: w == 1)
        lx = m[0] * wx + m[1] * wy + m[2] * wz + m[3]
        ly = m[4] * wx + m[5] * wy + m[6] * wz + m[7]
        lz = m[8] * wx + m[9] * wy + m[10] * wz + m[11]
        u = (lx * 0.5 + 0.5) * map_size  # texel coords
        v = (ly * 0.5 + 0.5) * map_size

        # window origin around the masked mean texel position
        count = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
        mean_u = jnp.sum(jnp.where(mask, u, 0.0)) / count
        mean_v = jnp.sum(jnp.where(mask, v, 0.0)) / count
        # snap to the DMA alignment grid: x in 128-texel lane steps (the
        # y-pair packing leaves x at texel granularity), y in 16-texel
        # steps (= 8 packed word rows)
        bx = pl.multiple_of(jnp.clip(
            (mean_u.astype(jnp.int32) - win_w // 4) // 128 * 128,
            0, map_size - win_w), 128)
        # y origin computed directly in PACKED word rows so Mosaic can
        # prove the DMA offset's 8-row alignment (a by // 2 of a
        # 16-multiple defeats its divisibility analysis)
        byw = pl.multiple_of(jnp.clip(
            (mean_v.astype(jnp.int32) - win_h // 2) // 16 * 8,
            0, (map_size - win_h) // 2), 8)
        by = byw * 2
        masks.append(mask)
        coords.append((u, v, jnp.clip(lz, 0.0, 1.0)))

        origins.append((bx, by, byw))

        @pl.when(jnp.any(mask))
        def _(c=c, bx=bx, byw=byw):
            pltpu.make_async_copy(
                maps_ref.at[c, pl.ds(byw, win_h // 2),
                            pl.ds(bx, win_w)],
                window.at[c], sem.at[c]).start()

    # pass 2: taps per cascade against its prefetched window
    for c in range(cascade_count):
        mask = masks[c]

        @pl.when(jnp.any(mask))
        def _(c=c, mask=mask):
            u, v, receiver = coords[c]
            bx, by, byw = origins[c]
            pltpu.make_async_copy(
                maps_ref.at[c, pl.ds(byw, win_h // 2),
                            pl.ds(bx, win_w)],
                window.at[c], sem.at[c]).wait()
            # (win_h/2, win_w) words -> flat (win_h/2 * win_w/128, 128):
            # win_w is a multiple of 128, so the reshape only splits lanes
            flat = window[c].reshape(win_h * win_w // 256, 128)

            lu = u - bx.astype(jnp.float32)
            lv = v - by.astype(jnp.float32)

            # spiral PCF (triangle.frag:101-119): offsets in texels
            scale_x = cascade_ref[c, 16]
            scale_y = cascade_ref[c, 17]
            off_scale_u = sample_radius * scale_x * 0.5 * map_size
            off_scale_v = sample_radius * scale_y * 0.5 * map_size
            acc = jnp.zeros((TILE_H, TILE_W), jnp.float32)
            # angle-addition split: cos/sin of the per-pixel noise rotation
            # ONCE, per-tap rotation by compile-time constants (cos(a + b)
            # = cos a cos b - sin a sin b) — replaces 2 transcendentals per
            # tap per pixel with 2 per pixel (the spiral radius sqrt stays:
            # it depends on the tap index AND noise)
            cn = jnp.cos(noise * (2.0 * jnp.pi))
            sn = jnp.sin(noise * (2.0 * jnp.pi))
            for i in range(taps):
                d = jnp.sqrt((i + 0.5 * noise) * (1.0 / taps))
                cb = float(np.cos(2.0 * np.pi * i / taps))
                sb = float(np.sin(2.0 * np.pi * i / taps))
                du = (cn * cb - sn * sb) * d * off_scale_u
                dv = (sn * cb + cn * sb) * d * off_scale_v
                sx = jnp.round(lu + du).astype(jnp.int32)
                sy = jnp.round(lv + dv).astype(jnp.int32)
                # u16-pair word fetch + halfword extract (D16 parity: the
                # receiver stays f32, the texel dequantizes to d/65535 —
                # RenderFrontend.cpp:1210 ImageFormat::Depth16)
                sxc = jnp.clip(sx, 0, win_w - 1)
                syc = jnp.clip(sy, 0, win_h - 1)
                word = gatherlib.gather_rows_128(
                    flat, (syc >> 1) * win_w + sxc)
                half = (word >> ((syc & 1) * 16)) & 0xFFFF
                texel = half.astype(jnp.float32) * (1.0 / 65535.0)
                # nearest-black-border semantics + reverse-Z GreaterEqual
                inside = ((sx >= -bx) & (sy >= -by)
                          & (sx < map_size - bx) & (sy < map_size - by))
                lit = jnp.where(receiver >= texel, 1.0, 0.0)
                acc = acc + jnp.where(inside, lit, 1.0)
            out_ref[...] = jnp.where(mask, acc * (1.0 / taps),
                                     out_ref[...])

    out_ref[...] = jnp.where(valid, out_ref[...], 1.0)


@jax.named_scope("shadow.resolve_pcf")
def shadow_resolve(world_pos, linear_depth, noise, shadow_maps,
                   cascade_matrices, cascade_scales, splits,
                   cascade_count: int, taps: int = 12,
                   sample_radius: float = SHADOW_SAMPLE_RADIUS,
                   interpret: bool = False):
    """Per-pixel sun shadow factor (H, W) in [0, 1].

    world_pos (3, H, W); linear_depth (H, W) (<= 0 marks sky); noise (H, W)
    per-frame blue noise; shadow_maps (MAX_CASCADES, S, S) reverse-Z.
    """
    _, h, w = world_pos.shape
    map_size = shadow_maps.shape[-1]
    nty, ntx = h // TILE_H, w // TILE_W
    assert map_size % 256 == 0, "u16-pair packing needs 256-texel rows"
    maps_packed = pack_shadow_maps_u16(shadow_maps)

    rows = jnp.zeros((MAX_CASCADES, _ROW_F), jnp.float32)
    rows = rows.at[:, :16].set(cascade_matrices.reshape(MAX_CASCADES, 16))
    rows = rows.at[:, 16:18].set(cascade_scales)
    rows = rows.at[:, 18].set(splits)

    win_h = min(WINDOW_H, map_size)
    win_w = min(WINDOW_W, map_size)
    kernel = functools.partial(
        _shadow_resolve_kernel, cascade_count=cascade_count, taps=taps,
        map_size=map_size, win_h=win_h, win_w=win_w,
        sample_radius=sample_radius)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec((MAX_CASCADES, _ROW_F), lambda ty, tx: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE_H, TILE_W), lambda ty, tx: (0, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx: (ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx: (ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx: (ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((cascade_count, win_h // 2, win_w), jnp.int32),
            pltpu.SemaphoreType.DMA((cascade_count,)),
        ],
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((h, w), jnp.float32)],
        interpret=interpret,
    )(rows, world_pos, linear_depth, noise, maps_packed)
    return out
