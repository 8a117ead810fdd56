"""SDF-traced diffuse global illumination.

Parity (technique + outputs identical, evaluation strategy TPU-native):
  - sdfDiffuseTrace.comp — one cosine-importance-sampled ray per (half-res)
    pixel from the G-buffer surface (ray origin offset N*0.2, :152), sphere
    traced with Claybook planar-hit refinement (SDF.inc:160-168); hit ->
    meanAlbedo^2.2 * sun light, miss -> sky LUT (:166-192); output is
    YCoCg as (Y * SH_L1(L), CoCg) (:196-205);
  - the per-frame SDF instance upload + frustum/tile culling passes
    (SDFGI.cpp:260-313, :538-629) are REPLACED by the composited global SDF
    volume (ops/sdf_scene.py): their entire purpose was bounding the
    per-pixel instance loop, which no longer exists;
  - sun visibility at hits uses an 8-step SDF shadow march instead of the
    reference's single shadow-map tap (simpleShadow) — same cost class,
    fewer artifacts at cascade borders;
  - 8x8 neighborhood resolve (normal/depth guided, :66-116) and the
    spatial->temporal->spatial filter chain (filterIndirectDiffuse*.comp)
    with the Metro-Exodus tangent-plane weights; the 32-random-tap disc blur
    becomes a jittered fixed-tap blur (dense shifts, no gathers);
  - depth-aware half->full upscale (indirectLightUpscale.comp).

Trace kernel: the global SDF is stored as a pool of 16^3-voxel BRICKS, each
exactly one (8, 128) int32 tile (s8 distances, 4 per word) so every window
fetch is a tile-aligned DMA (the TPU DMA engine rejects unaligned slices).
Each 16x128 screen tile DMAs the 2x2x2 bricks (= a 32^3 window) around its
mean surface point plus the matching albedo bricks into VMEM and marches
all 2048 rays with masked fixed-count steps and lane-gather point samples.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.color import linear_to_ycocg, ycocg_to_linear  # noqa: F401
from ..utils.stencil import EdgePadded
from . import gatherlib
from .raster import TILE_H, TILE_W

WINDOW = 32  # voxels per axis of the per-tile trace window (2x2x2 bricks)
BRICK = 16  # voxels per brick axis; one brick == one aligned DMA granule
_SDF_SCALE = 8.0  # stored = distance / voxel_size * 8 (1/8-voxel precision)


def quantize_sdf_volume(volume, voxel_size):
    """(D, H, W) f32 world distances (dims multiples of 16) -> brick-pooled
    (NB, 8, 128) int32: 16^3-voxel bricks, s8 quantized, packed 4-per-word
    along x. Each brick is exactly one (8, 128) i32 tile, so the trace
    kernel's window DMAs are tile-aligned by construction (the TPU DMA
    engine rejects unaligned slices; SDFGI.cpp's per-instance 3D textures
    have no such constraint, hence the redesign).

    Brick linear index: (bz * NBY + by) * NBX + bx. In-brick word index:
    (lz * 16 + ly) * 4 + (lx >> 2)."""
    d, h, w = volume.shape
    assert d % BRICK == 0 and h % BRICK == 0 and w % BRICK == 0
    q = jnp.clip(jnp.round(volume / voxel_size * _SDF_SCALE), -127, 127)
    q = q.astype(jnp.int32) & 0xFF
    q = q.reshape(d, h, w // 4, 4)
    words = q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16) | (q[..., 3] << 24)
    nbz, nby, nbx = d // BRICK, h // BRICK, w // BRICK
    b = words.reshape(nbz, BRICK, nby, BRICK, nbx, BRICK // 4)
    b = b.transpose(0, 2, 4, 1, 3, 5)  # (nbz, nby, nbx, lz, ly, wx)
    return b.reshape(nbz * nby * nbx, 8, 128)


def pack_albedo_volume(albedo):
    """(D, H, W, 3) f32 -> brick-pooled (NB, 32, 128) int32 rgb8 (one word
    per voxel; in-brick word index (lz * 16 + ly) * 16 + lx)."""
    d, h, w = albedo.shape[:3]
    assert d % BRICK == 0 and h % BRICK == 0 and w % BRICK == 0
    q = jnp.clip(jnp.round(albedo * 255.0), 0, 255).astype(jnp.int32)
    words = q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16)
    nbz, nby, nbx = d // BRICK, h // BRICK, w // BRICK
    b = words.reshape(nbz, BRICK, nby, BRICK, nbx, BRICK)
    b = b.transpose(0, 2, 4, 1, 3, 5)
    return b.reshape(nbz * nby * nbx, 32, 128)


def _unpack_s8(word, byte):
    v = (word >> (8 * byte)) & 0xFF
    return jnp.where(v > 127, v - 256, v).astype(jnp.float32) / _SDF_SCALE


def _acos_approx(x):
    """Abramowitz-Stegun 4.4.45 polynomial acos (max err ~7e-5); Pallas TPU
    has no acos lowering and the sky-LUT texel math only needs ~1e-3."""
    ax = jnp.abs(x)
    r = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * (
        1.5707288 + ax * (-0.2121144 + ax * (0.0742610 - 0.0187293 * ax)))
    return jnp.where(x < 0.0, np.pi - r, r)


def _atan2_approx(y, x):
    """Octant-folded A&S 4.4.49 polynomial atan2 (max err ~1e-5)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    t = jnp.minimum(ax, ay) / jnp.maximum(jnp.maximum(ax, ay), 1e-20)
    t2 = t * t
    a = t * (0.9998660 + t2 * (-0.3302995 + t2 * (
        0.1801410 + t2 * (-0.0851330 + t2 * 0.0208351))))
    a = jnp.where(ay > ax, np.pi / 2 - a, a)
    a = jnp.where(x < 0.0, np.pi - a, a)
    return jnp.where(y < 0.0, -a, a)


def _trace_kernel(
    meta_ref,  # (1, 16) f32: origin xyz, voxel, dims dhw, fine influence,
    #            coarse dims (8-10), full influence (11)
    wpos_ref, normal_ref, raydir_ref,  # (3, TILE_H, TILE_W)
    valid_ref,  # (TILE_H, TILE_W) f32 (>0 = surface)
    sky_ref,  # (3, SKY_H*SKY_W/128, 128) pre-flattened low-res sky (VMEM)
    sun_ref,  # (1, 8) f32: sun dir xyz, sun color rgb, strength, pad
    sdf_ref,  # brick-pooled global SDF (NB, 8, 128) int32 in HBM
    alb_ref,  # brick-pooled albedo (NB, 32, 128) int32 in HBM
    coarse_sdf_ref,  # (Rs, 128) i32 4x min-pooled whole-scene SDF (VMEM)
    coarse_alb_ref,  # (Ra, 128) i32 4x mean albedo (VMEM)
    out_ref,  # (7, TILE_H, TILE_W): Y_SH(4) + CoCg(2) + escaped(1)
    win_sdf, win_alb, sems,
    *, steps: int, influence: float, sky_h: int, sky_w: int,
    strict: bool = False, coarse: bool = False, coarse_f: int = 4,
):
    ox = meta_ref[0, 0]
    oy = meta_ref[0, 1]
    oz = meta_ref[0, 2]
    voxel = meta_ref[0, 3]
    vd = meta_ref[0, 4].astype(jnp.int32)
    vh = meta_ref[0, 5].astype(jnp.int32)
    vw = meta_ref[0, 6].astype(jnp.int32)
    # influence clamped to the window half-extent (slot 7; the static
    # `influence` arg is only an upper bound — voxel_size is traced)
    influence_eff = meta_ref[0, 7]

    valid = valid_ref[...] > 0.0
    # window origin (brick coords) around the masked mean surface point
    count = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)

    def mean_of(plane):
        return jnp.sum(jnp.where(valid, plane, 0.0)) / count

    cx = (mean_of(wpos_ref[0]) - ox) / voxel
    cy = (mean_of(wpos_ref[1]) - oy) / voxel
    cz = (mean_of(wpos_ref[2]) - oz) / voxel
    nbx = vw // BRICK
    nby = vh // BRICK
    nbz = vd // BRICK
    # base brick so the 2x2x2-brick window roughly centers the mean point
    bx0 = jnp.clip(jnp.floor((cx - 8.0) / BRICK).astype(jnp.int32),
                   0, jnp.maximum(nbx - 2, 0))
    by0 = jnp.clip(jnp.floor((cy - 8.0) / BRICK).astype(jnp.int32),
                   0, jnp.maximum(nby - 2, 0))
    bz0 = jnp.clip(jnp.floor((cz - 8.0) / BRICK).astype(jnp.int32),
                   0, jnp.maximum(nbz - 2, 0))

    # fetch the 8 window bricks (each one aligned (8,128)/(32,128) DMA)
    # all-sky tiles skip the window fetch; their rays are never alive so the
    # march below exits immediately and outputs are fully masked by `valid`
    @pl.when(jnp.any(valid))
    def _():
        dmas = []
        for k, (dz_, dy_, dx_) in enumerate(
                [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)]):
            bidx = ((bz0 + dz_) * nby + (by0 + dy_)) * nbx + (bx0 + dx_)
            dmas.append(pltpu.make_async_copy(
                sdf_ref.at[bidx], win_sdf.at[pl.ds(k * 8, 8)], sems.at[k]))
            dmas.append(pltpu.make_async_copy(
                alb_ref.at[bidx], win_alb.at[pl.ds(k * 32, 32)],
                sems.at[8 + k]))
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()

    sdf_table = win_sdf[...]  # (64, 128): brick k rows [8k, 8k+8)
    alb_table = win_alb[...]  # (256, 128): brick k rows [32k, 32k+32)
    wx0 = (bx0 * BRICK).astype(jnp.float32)
    wy0 = (by0 * BRICK).astype(jnp.float32)
    wz0 = (bz0 * BRICK).astype(jnp.float32)

    # voxel is a traced scalar: Mosaic lowers each in-loop f32 divide to a
    # long VPU software sequence — 3 per march step through window_coords.
    # One reciprocal (rsqrt^2 + Newton, ~1 ulp) turns them into multiplies.
    r_v = jax.lax.rsqrt(voxel)
    r_v = r_v * r_v
    inv_voxel = r_v * (2.0 - voxel * r_v)

    def window_coords(px, py, pz, with_inside=False):
        gxr = (px - ox) * inv_voxel - wx0
        gyr = (py - oy) * inv_voxel - wy0
        gzr = (pz - oz) * inv_voxel - wz0
        gx = jnp.clip(gxr, 0.0, WINDOW - 1.0)
        gy = jnp.clip(gyr, 0.0, WINDOW - 1.0)
        gz = jnp.clip(gzr, 0.0, WINDOW - 1.0)
        ix = gx.astype(jnp.int32)
        iy = gy.astype(jnp.int32)
        iz = gz.astype(jnp.int32)
        brick = ((iz >> 4) << 2) | ((iy >> 4) << 1) | (ix >> 4)
        if with_inside:
            # strictly inside the window (half-voxel slack): a CLAMPED
            # sample reads a boundary voxel the ray is not actually at —
            # treating its distance as real produced whole-tile bright
            # garbage (bogus sun-lit 'hits' on window walls) whenever a
            # tile's mean-position window missed part of its geometry
            # (the round-2 gallery streak; flips with TAA jitter because
            # the tile mean shifts). Hits are gated on `inside`; `excess`
            # (voxels, Chebyshev clamp overshoot) lets the march keep
            # progressing while outside — rays that merely poke out (e.g.
            # the 0.2 m normal offset at a volume border) re-enter instead
            # of being dumped to the coarse fallback.
            inside = ((gxr >= -0.5) & (gxr <= WINDOW - 0.5)
                      & (gyr >= -0.5) & (gyr <= WINDOW - 0.5)
                      & (gzr >= -0.5) & (gzr <= WINDOW - 0.5))
            excess = jnp.maximum(jnp.maximum(jnp.abs(gxr - gx),
                                             jnp.abs(gyr - gy)),
                                 jnp.abs(gzr - gz))
            return brick, ix & 15, iy & 15, iz & 15, inside, excess
        return brick, ix & 15, iy & 15, iz & 15

    def sample_sdf(px, py, pz, with_inside=False):
        """Point-sample the brick window at world position (clamped)."""
        wc = window_coords(px, py, pz, with_inside=with_inside)
        brick, lx, ly, lz = wc[:4]
        flat = brick * 1024 + (lz * BRICK + ly) * 4 + (lx >> 2)
        word = gatherlib.gather_rows_128(sdf_table, flat)
        b = lx & 3
        v = jnp.where(
            b == 0, _unpack_s8(word, 0),
            jnp.where(b == 1, _unpack_s8(word, 1),
                      jnp.where(b == 2, _unpack_s8(word, 2),
                                _unpack_s8(word, 3))))
        if with_inside:
            return v * voxel, wc[4], wc[5]
        return v * voxel

    wx, wy, wz = wpos_ref[0], wpos_ref[1], wpos_ref[2]
    nx, ny, nz = normal_ref[0], normal_ref[1], normal_ref[2]
    dx, dy, dz = raydir_ref[0], raydir_ref[1], raydir_ref[2]

    # ray origin offset along the normal (sdfDiffuseTrace.comp:152)
    px = wx + nx * 0.2
    py = wy + ny * 0.2
    pz = wz + nz * 0.2

    threshold = voxel * 0.43  # length(extents/res)*0.25 analog (SDF.inc:131)
    zero = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    # masks carried as f32 0/1 — Mosaic cannot legalize i1 vectors in
    # scf.while carries ("failed to legalize scf.yield")
    state0 = (jnp.int32(0), zero, zero, zero, zero, zero,
              valid.astype(jnp.float32), zero)

    # early-exit march: a fixed unrolled loop pays all `steps` iterations on
    # every tile; most tiles converge in far fewer (hits are near, sky tiles
    # are skipped wholesale), so the while_loop exits as soon as no ray in
    # the tile is alive
    def cond(state):
        i, _, _, _, _, _, alive_f, _ = state
        return (i < steps) & (jnp.max(alive_f) > 0.0)

    def body(state):
        i, t, d_prev, d_hit, dprev_hit, hit_f, alive_f, exited_f = state
        d, inside, excess = sample_sdf(px + dx * t, py + dy * t, pz + dz * t,
                                       with_inside=True)
        # hits only count INSIDE the window (the clamped boundary voxel is
        # not where the ray is); outside rays keep marching — the step
        # covers the clamp excess so they make progress back toward (or
        # past) the window — and exit to the coarse fallback only once a
        # fine hit is provably out of reach: the window is >= excess away,
        # so t + excess past the influence radius means no re-entry can
        # produce an in-influence hit
        new_hit = (alive_f > 0.0) & inside & (d < threshold)
        exit_now = ((alive_f > 0.0) & ~inside
                    & (t + excess * voxel >= influence_eff))
        d_hit = jnp.where(new_hit, d, d_hit)
        dprev_hit = jnp.where(new_hit, d_prev, dprev_hit)
        hit_f = jnp.maximum(hit_f, new_hit.astype(jnp.float32))
        exited_f = jnp.maximum(exited_f, exit_now.astype(jnp.float32))
        alive = ((alive_f > 0.0) & ~new_hit & ~exit_now
                 & (t < influence_eff))
        step_len = jnp.maximum(jnp.maximum(jnp.abs(d), excess * voxel),
                               voxel * 0.5)
        t = jnp.where(alive, t + step_len, t)
        return (i + 1, t, d, d_hit, dprev_hit, hit_f,
                alive.astype(jnp.float32), exited_f)

    _, t, d_prev, d_hit, dprev_hit, hit_f, _, exited_f = jax.lax.while_loop(
        cond, body, state0)
    hit = hit_f > 0.0

    # Claybook planar refinement (SDF.inc:160-168)
    refine = d_hit / jnp.maximum(1.0 - (d_hit - dprev_hit), 1e-3)
    t_hit = t + jnp.where(hit, refine, 0.0)
    if strict:
        # strictInfluenceRadiusCutoff (SDFGI.h:21): hits past the influence
        # radius are discarded (fall through to the sky term)
        hit = hit & (t_hit <= influence_eff)
    hx = px + dx * t_hit
    hy = py + dy * t_hit
    hz = pz + dz * t_hit

    # rays that ran out of the window-bounded fine influence OR left the
    # window without a hit: the window-approximation escapes (VERDICT r1
    # #8) — reported in out_ref[6] and, with the coarse fallback, marched
    # on below
    escaped_f = (valid & ~hit
                 & ((t >= influence_eff - voxel * 0.25)
                    | (exited_f > 0.0))).astype(jnp.float32)

    # albedo at hit (packed rgb8)
    abrick, alx, aly, alz = window_coords(hx, hy, hz)
    aw = gatherlib.gather_rows_128(
        alb_table, abrick * 4096 + (alz * BRICK + aly) * BRICK + alx)
    alb_r = ((aw >> 0) & 0xFF).astype(jnp.float32) / 255.0
    alb_g = ((aw >> 8) & 0xFF).astype(jnp.float32) / 255.0
    alb_b = ((aw >> 16) & 0xFF).astype(jnp.float32) / 255.0

    # sun visibility at hit: sparse SDF shadow march (replaces simpleShadow)
    sdx = sun_ref[0, 0]
    sdy = sun_ref[0, 1]
    sdz = sun_ref[0, 2]
    def shadow_cond(state):
        i, _, _ = state
        # skipped wholesale on all-miss tiles
        return (i < 8) & (jnp.max(hit_f) > 0.0)

    def shadow_body(state):
        i, st, lit = state
        ds = sample_sdf(hx + sdx * st, hy + sdy * st, hz + sdz * st)
        lit = jnp.where(ds < threshold * 0.8, 0.0, lit)
        return (i + 1, st + jnp.maximum(jnp.abs(ds), voxel), lit)

    _, _, lit = jax.lax.while_loop(
        shadow_cond, shadow_body,
        (jnp.int32(0), jnp.full((TILE_H, TILE_W), voxel * 1.5),
         jnp.ones((TILE_H, TILE_W), jnp.float32)))

    if coarse:
        # --- coarse fallback march (the full-volume SDF.inc:103-185 trace,
        # at 4x voxels): escaped rays continue in the whole-scene min-pooled
        # volume up to the FULL influence radius ---
        cd = meta_ref[0, 8].astype(jnp.int32)
        chh = meta_ref[0, 9].astype(jnp.int32)
        cww = meta_ref[0, 10].astype(jnp.int32)
        cww_words = meta_ref[0, 12].astype(jnp.int32)  # x-padded stride
        influence_far = meta_ref[0, 11]
        voxel_c = voxel * float(coarse_f)
        coarse_table = coarse_sdf_ref[...]
        coarse_alb_table = coarse_alb_ref[...]

        inv_voxel_c = inv_voxel * (1.0 / float(coarse_f))

        def sample_coarse(px_, py_, pz_):
            gx = jnp.clip((px_ - ox) * inv_voxel_c, 0.0,
                          cww.astype(jnp.float32) - 1.0)
            gy = jnp.clip((py_ - oy) * inv_voxel_c, 0.0,
                          chh.astype(jnp.float32) - 1.0)
            gz = jnp.clip((pz_ - oz) * inv_voxel_c, 0.0,
                          cd.astype(jnp.float32) - 1.0)
            ix = gx.astype(jnp.int32)
            iy = gy.astype(jnp.int32)
            iz = gz.astype(jnp.int32)
            widx = (iz * chh + iy) * cww_words + (ix >> 2)
            word = gatherlib.gather_rows_128(coarse_table, widx)
            b = ix & 3
            v = jnp.where(
                b == 0, _unpack_s8(word, 0),
                jnp.where(b == 1, _unpack_s8(word, 1),
                          jnp.where(b == 2, _unpack_s8(word, 2),
                                    _unpack_s8(word, 3))))
            return v * voxel_c, (iz * chh + iy) * cww + ix

        thr_c = voxel_c * 0.6
        esc_state0 = (jnp.int32(0), t, jnp.zeros_like(t), escaped_f)

        def c_cond(state):
            i, _, _, alive2 = state
            return (i < 24) & (jnp.max(alive2) > 0.0)

        def c_body(state):
            i, t2, hitc, alive2 = state
            dc, _ = sample_coarse(px + dx * t2, py + dy * t2, pz + dz * t2)
            new_hit = (alive2 > 0.0) & (dc < thr_c)
            hitc = jnp.maximum(hitc, new_hit.astype(jnp.float32))
            alive = (alive2 > 0.0) & ~new_hit & (t2 < influence_far)
            step = jnp.maximum(jnp.abs(dc) * 0.8, voxel_c * 0.5)
            t2 = jnp.where(alive, t2 + step, t2)
            return (i + 1, t2, hitc, alive.astype(jnp.float32))

        _, t_c, hitc_f, _ = jax.lax.while_loop(c_cond, c_body, esc_state0)
        hit_c = (hitc_f > 0.0) & ~hit
        cx_ = px + dx * t_c
        cy_ = py + dy * t_c
        cz_ = pz + dz * t_c
        # albedo fetch gated on any coarse hit: the (Ra, 128) table gather
        # costs ~3 vector ops PER ROW — skipped wholesale on all-miss tiles
        # via a 1-iteration while_loop (pl.when cannot return values)
        zero_px = jnp.zeros((TILE_H, TILE_W), jnp.float32)

        def alb_cond(st):
            return (st[0] < 1) & (jnp.max(hitc_f) > 0.0)

        def alb_body(st):
            _, c_aidx = sample_coarse(cx_, cy_, cz_)
            caw = gatherlib.gather_rows_128(coarse_alb_table, c_aidx)
            return (st[0] + 1,
                    ((caw >> 0) & 0xFF).astype(jnp.float32) / 255.0,
                    ((caw >> 8) & 0xFF).astype(jnp.float32) / 255.0,
                    ((caw >> 16) & 0xFF).astype(jnp.float32) / 255.0)

        _, calb_r, calb_g, calb_b = jax.lax.while_loop(
            alb_cond, alb_body, (jnp.int32(0), zero_px, zero_px, zero_px))

        def cs_cond(state):
            i, _, _ = state
            return (i < 6) & (jnp.max(hitc_f) > 0.0)

        def cs_body(state):
            i, st, litc = state
            ds, _ = sample_coarse(cx_ + sdx * st, cy_ + sdy * st,
                                  cz_ + sdz * st)
            litc = jnp.where(ds < thr_c * 0.8, 0.0, litc)
            return (i + 1, st + jnp.maximum(jnp.abs(ds), voxel_c), litc)

        _, _, lit_c = jax.lax.while_loop(
            cs_cond, cs_body,
            (jnp.int32(0), jnp.full((TILE_H, TILE_W), voxel_c * 1.5),
             jnp.ones((TILE_H, TILE_W), jnp.float32)))

        # merge: coarse hits behave exactly like fine hits downstream
        alb_r = jnp.where(hit_c, calb_r, alb_r)
        alb_g = jnp.where(hit_c, calb_g, alb_g)
        alb_b = jnp.where(hit_c, calb_b, alb_b)
        lit = jnp.where(hit_c, lit_c, lit)
        t_hit = jnp.where(hit_c, t_c, t_hit)
        hit = hit | hit_c

    sun_r = sun_ref[0, 3] * sun_ref[0, 6]
    sun_g = sun_ref[0, 4] * sun_ref[0, 6]
    sun_b = sun_ref[0, 5] * sun_ref[0, 6]
    # meanAlbedo^2.2 (sdfDiffuseTrace.comp:178 pow 2.2)
    gamma = 2.2
    hit_r = jnp.power(alb_r, gamma) * sun_r * lit
    hit_g = jnp.power(alb_g, gamma) * sun_g * lit
    hit_b = jnp.power(alb_b, gamma) * sun_b * lit

    # sky fallback from the low-res sky map indexed by ray direction
    # (sampleSkyLut mapping, sky.inc:85-93)
    theta = _acos_approx(jnp.clip(-dy, -1.0, 1.0))
    ylut = theta / jnp.pi * 2.0 - 1.0
    ylut = jnp.sign(ylut) * jnp.sqrt(jnp.abs(ylut)) * 0.5 + 0.5
    phi = -_atan2_approx(dz, dx)
    xlut = phi / (2.0 * jnp.pi) + 0.5
    sx = jnp.clip(xlut * sky_w, 0.0, sky_w - 1.0).astype(jnp.int32)
    sy = jnp.clip(ylut * sky_h, 0.0, sky_h - 1.0).astype(jnp.int32)
    # sky arrives pre-flattened (3, sky_h*sky_w/128, 128): Mosaic rejects
    # lane-crossing reshapes inside the kernel
    sky_flat_r = sky_ref[0]
    sky_flat_g = sky_ref[1]
    sky_flat_b = sky_ref[2]
    sidx = sy * sky_w + sx
    sky_r = gatherlib.gather_rows_128(sky_flat_r, sidx)
    sky_g = gatherlib.gather_rows_128(sky_flat_g, sidx)
    sky_b = gatherlib.gather_rows_128(sky_flat_b, sidx)

    # out-of-influence hits count as misses only under strict cutoff; here
    # rays that exit the window/influence without hit use the sky
    r = jnp.where(hit, hit_r, sky_r)
    g = jnp.where(hit, hit_g, sky_g)
    b = jnp.where(hit, hit_b, sky_b)
    # self-intersection rejection (sdfDiffuseTrace.comp:198-203)
    self_hit = hit & (t_hit < 1e-4)
    r = jnp.where(self_hit, 0.0, r)
    g = jnp.where(self_hit, 0.0, g)
    b = jnp.where(self_hit, 0.0, b)

    # YCoCg encode + SH_L1(L) projection (sdfDiffuseTrace.comp:205-209)
    y = 0.25 * r + 0.5 * g + 0.25 * b
    co = 0.5 * r - 0.5 * b
    cg = -0.25 * r + 0.5 * g - 0.25 * b

    inv_2sqrtpi = float(1.0 / (2.0 * np.sqrt(np.pi)))
    sqrt3 = float(np.sqrt(3.0))
    sh0 = jnp.full((TILE_H, TILE_W), inv_2sqrtpi)
    sh1 = -sqrt3 * dy * inv_2sqrtpi
    sh2 = sqrt3 * dz * inv_2sqrtpi
    sh3 = -sqrt3 * dx * inv_2sqrtpi
    norm = jax.lax.rsqrt(sh0 * sh0 + sh1 * sh1 + sh2 * sh2 + sh3 * sh3 + 1e-20)

    out_ref[0] = jnp.where(valid, y * sh0 * norm, 0.0)
    out_ref[1] = jnp.where(valid, y * sh1 * norm, 0.0)
    out_ref[2] = jnp.where(valid, y * sh2 * norm, 0.0)
    out_ref[3] = jnp.where(valid, y * sh3 * norm, 0.0)
    out_ref[4] = jnp.where(valid, co, 0.0)
    out_ref[5] = jnp.where(valid, cg, 0.0)
    out_ref[6] = escaped_f


COARSE = 4  # MINIMUM fine voxels per coarse-fallback voxel axis


def coarse_factor_for(dims_zyx: tuple) -> int:
    """Pick the pooling factor so the coarse volume stays <= 8192 voxels:
    the in-kernel table gather (gatherlib.gather_rows_128) costs ~3 vector
    ops PER TABLE ROW, so the albedo table (1 word/voxel) must stay at
    <= 64 (R, 128) rows."""
    f = COARSE
    d, h, w = dims_zyx
    while (d // f) * (h // f) * (w // f) > 8192 and f < 16:
        f *= 2
    return f


@jax.named_scope("sdfgi.coarse_volume")
def build_coarse_tables(sdf_packed, albedo_packed, dims_zyx: tuple):
    """Min-pooled whole-scene SDF + mean albedo, lane-flattened for VMEM.

    The per-tile 32^3 window bounds the fine trace; rays leaving it fell
    straight through to the sky (VERDICT r1 #8: 'GI trace window can miss
    geometry'). The fallback marches this coarse volume instead — whole
    scene, resident in VMEM, capped at 8192 voxels via coarse_factor_for
    (the kernel's table gather is linear in table rows). Distances are
    MIN-pooled so the coarse march never oversteps geometry the fine grid
    knows about; derived from the packed bricks (cheap dense XLA) so
    dynamic recomposites are included. Returns (coarse_sdf (Rs, 128) i32,
    coarse_alb (Ra, 128) i32, (cd, ch, cw), factor)."""
    d, h, w = dims_zyx
    from . import debugviz

    f = coarse_factor_for(dims_zyx)
    vol = debugviz.unpack_sdf_volume(sdf_packed, (d, h, w))  # voxel units
    cd, ch, cw = d // f, h // f, w // f
    vol = vol[:cd * f, :ch * f, :cw * f].reshape(cd, f, ch, f, cw, f)
    coarse = vol.min(axis=(1, 3, 5))
    q = jnp.clip(jnp.round(coarse / f * _SDF_SCALE), -127, 127)
    q = q.astype(jnp.int32) & 0xFF
    pad_x = (-cw) % 4  # word packing needs 4-aligned x; pad with +max dist
    if pad_x:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_x)), constant_values=127)
    cw_words = (cw + pad_x) // 4
    q = q.reshape(cd, ch, cw_words, 4)
    words = (q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16)
             | (q[..., 3] << 24)).reshape(-1)
    pad = (-words.shape[0]) % 128
    sdf_flat = jnp.pad(words, (0, pad)).reshape(-1, 128)

    alb = debugviz.unpack_albedo_volume(albedo_packed, (d, h, w))
    alb = alb[:, :cd * f, :ch * f, :cw * f].reshape(
        3, cd, f, ch, f, cw, f)
    alb_c = alb.mean(axis=(2, 4, 6))
    aq = jnp.clip(jnp.round(alb_c * 255.0), 0, 255).astype(jnp.int32)
    awords = (aq[0] | (aq[1] << 8) | (aq[2] << 16)).reshape(-1)
    pad_a = (-awords.shape[0]) % 128
    alb_flat = jnp.pad(awords, (0, pad_a)).reshape(-1, 128)
    return sdf_flat, alb_flat, (cd, ch, cw), f


@jax.named_scope("sdfgi.trace")
def trace_gi(world_pos, normal, ray_dirs, valid, sky_lowres, sdf_packed,
             albedo_packed, volume_origin, voxel_size, volume_dims,
             sun_direction, sun_color, sun_strength, *,
             steps: int = 32, influence: float = 8.0,
             strict: bool = False, dims_zyx: tuple | None = None,
             coarse_fallback: bool = True, coarse_tables=None,
             interpret: bool = False):
    """Trace one GI ray per pixel. All image inputs at trace resolution
    (typically half-res). Returns (Y_SH (4,H,W), CoCg (2,H,W),
    escaped (H,W) f32 0/1 — rays that left the fine window; when
    dims_zyx is given and coarse_fallback is on, those rays continued in
    the 4x coarse whole-scene volume instead of falling through to sky)."""
    _, h, w = world_pos.shape
    nty, ntx = h // TILE_H, w // TILE_W
    sky_h, sky_w = sky_lowres.shape[1:]
    use_coarse = coarse_fallback and dims_zyx is not None

    meta = jnp.zeros((1, 16), jnp.float32)
    meta = meta.at[0, 0:3].set(volume_origin)
    meta = meta.at[0, 3].set(voxel_size)
    meta = meta.at[0, 4].set(volume_dims[0])
    meta = meta.at[0, 5].set(volume_dims[1])
    meta = meta.at[0, 6].set(volume_dims[2])
    # effective FINE influence: never past the brick window around the
    # tile mean; the coarse fallback (slot 11) carries the full influence
    meta = meta.at[0, 7].set(jnp.minimum(
        jnp.asarray(influence, jnp.float32),
        (WINDOW // 2 - 2) * jnp.asarray(voxel_size, jnp.float32)))
    meta = meta.at[0, 11].set(jnp.asarray(influence, jnp.float32))

    coarse_f = 4
    if use_coarse:
        # the factor must be STATIC for the kernel; coarse_factor_for is a
        # pure function of the (static) dims, so it always agrees with the
        # factor the tables were built with
        coarse_f = coarse_factor_for(dims_zyx)
        # static scenes pass tables prebuilt at attach_global_sdf; dynamic
        # recomposites rebuild per frame from the working volume
        coarse_sdf, coarse_alb, (cd, ch, cw), _ = (
            coarse_tables if coarse_tables is not None
            else build_coarse_tables(sdf_packed, albedo_packed, dims_zyx))
        meta = meta.at[0, 8].set(cd)
        meta = meta.at[0, 9].set(ch)
        meta = meta.at[0, 10].set(cw)
        meta = meta.at[0, 12].set((cw + 3) // 4)  # word stride (x-padded)
    else:
        coarse_sdf = jnp.zeros((1, 128), jnp.int32)
        coarse_alb = jnp.zeros((1, 128), jnp.int32)

    sun = jnp.zeros((1, 8), jnp.float32)
    sun = sun.at[0, 0:3].set(sun_direction)
    sun = sun.at[0, 3:6].set(sun_color)
    sun = sun.at[0, 6].set(sun_strength)

    kernel = functools.partial(
        _trace_kernel, steps=steps, influence=influence,
        sky_h=sky_h, sky_w=sky_w, strict=strict, coarse=use_coarse,
        coarse_f=coarse_f)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec((1, 16), lambda ty, tx: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE_H, TILE_W), lambda ty, tx: (0, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE_H, TILE_W), lambda ty, tx: (0, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE_H, TILE_W), lambda ty, tx: (0, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx: (ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, sky_h * sky_w // 128, 128),
                         lambda ty, tx: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda ty, tx: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            # whole-scene coarse fallback tables, VMEM-resident
            pl.BlockSpec(coarse_sdf.shape, lambda ty, tx: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(coarse_alb.shape, lambda ty, tx: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((7, TILE_H, TILE_W), lambda ty, tx: (0, ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((64, 128), jnp.int32),  # 8 sdf bricks
            pltpu.VMEM((256, 128), jnp.int32),  # 8 albedo bricks
            pltpu.SemaphoreType.DMA((16,)),
        ],
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((7, h, w), jnp.float32)],
        interpret=interpret,
    )(meta, world_pos, normal, ray_dirs, valid.astype(jnp.float32),
      sky_lowres.reshape(3, sky_h * sky_w // 128, 128), sun, sdf_packed,
      albedo_packed, coarse_sdf, coarse_alb)
    return out[0:4], out[4:6], out[6]


# --------------------------------------------------------------------------
# filters (XLA, dense)
# --------------------------------------------------------------------------

def _shift(p, dy, dx):
    """out[y, x] = in_clamped[y + dy, x + dx] — one-off use; multi-tap
    stencils below share one EdgePadded per plane so XLA fuses them."""
    # clamp to the image size (filter radii can exceed tiny test images)
    dy = max(-(p.shape[-2] - 1), min(p.shape[-2] - 1, dy))
    dx = max(-(p.shape[-1] - 1), min(p.shape[-1] - 1, dx))
    return EdgePadded(p, abs(dy), abs(dx)).tap_fwd(dy, dx)


def _clamp_offs(p, offs):
    """Clamp tap offsets to the plane size (tiny test images)."""
    h, w = p.shape[-2], p.shape[-1]
    return [(max(-(h - 1), min(h - 1, dy)), max(-(w - 1), min(w - 1, dx)))
            for dy, dx in offs]


@jax.named_scope("sdfgi.neighborhood_resolve")
def neighborhood_resolve(y_sh, cocg, normal, lin_depth):
    """sdfDiffuseTrace.comp:66-116 — 3x3 normal/depth-guided gaussian over
    the per-ray results (the reference's 8x8 shared-memory resolve)."""
    pn = EdgePadded(normal, 1, 1)
    pd = EdgePadded(lin_depth, 1, 1)
    py = EdgePadded(y_sh, 1, 1)
    pc = EdgePadded(cocg, 1, 1)
    acc_y = y_sh
    acc_c = cocg
    total = jnp.ones_like(lin_depth)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            n2 = pn.tap_fwd(dy, dx)
            d2 = pd.tap_fwd(dy, dx)
            non = jnp.sum(normal * n2, axis=0)
            ok = (non > 0.9) & (jnp.abs(lin_depth - d2) < 0.5)
            w = (1.0 if dy == 0 else 0.5) * (1.0 if dx == 0 else 0.5)
            wm = jnp.where(ok, w, 0.0)
            acc_y = acc_y + py.tap_fwd(dy, dx) * wm[None]
            acc_c = acc_c + pc.tap_fwd(dy, dx) * wm[None]
            total = total + wm
    return acc_y / total[None], acc_c / total[None]


_SPATIAL_TAPS = 16
_SPATIAL_ROTATIONS = 4  # per-frame spiral rotation sets (lax.switch branches)
_SPATIAL_NOMINAL_R = 16.0  # outermost-tap radius in pixels
_GOLDEN_ANGLE = 2.39996323


def _spiral_offsets(seed: int, rotation: int):
    """Static integer spiral tap offsets (pure Python — computed at trace
    time so the kernel sees only constant shifts; the round-1 version mixed
    a tracer into the angle and crashed every jit of the GI path)."""
    import math

    rot = rotation * (2.0 * math.pi / (_SPATIAL_ROTATIONS * _SPATIAL_TAPS))
    offs = []
    for i in range(_SPATIAL_TAPS):
        frac = (i + 0.5) / _SPATIAL_TAPS
        ang = i * _GOLDEN_ANGLE + seed * 1.7 + rot
        r = math.sqrt(frac) * _SPATIAL_NOMINAL_R
        dx = int(round(math.cos(ang) * r))
        dy = int(round(math.sin(ang) * r))
        if dx == 0 and dy == 0:
            dx = 1
        offs.append((dy, dx))
    return offs


@jax.named_scope("sdfgi.spatial_filter")
def spatial_filter(y_sh, cocg, normal, world_pos, lin_depth, frame_index,
                   radius_world: float, proj_scale, seed: int):
    """filterIndirectDiffuseSpatial.comp — tangent-plane-weighted disc blur.

    TPU variant: 16 spiral taps at static integer pixel shifts (dense rolls,
    no gathers) instead of 32 random projected world-space taps. Per-pixel
    world radius (filterIndirectDiffuseSpatial.comp:60-66) is honored by
    zero-weighting taps beyond each pixel's projected radius; per-frame
    rotation selects one of 4 precomputed spiral rotations via lax.switch.
    The Metro-Exodus tangent-plane distance weighting is kept exactly.
    """
    radius_px = jnp.clip(radius_world * proj_scale / jnp.maximum(
        lin_depth, 0.5), 1.0, 24.0)

    margin_y = min(int(_SPATIAL_NOMINAL_R) + 1, y_sh.shape[-2] - 1)
    margin_x = min(int(_SPATIAL_NOMINAL_R) + 1, y_sh.shape[-1] - 1)

    # pad ONCE, outside the rotation switch: per-branch pads materialize as
    # separate ~2 ms kLoop fusions per branch (measured); the hoisted pads
    # fuse with their producers and cross the switch boundary as operands
    pw_ = EdgePadded(world_pos, margin_y, margin_x)
    py_ = EdgePadded(y_sh, margin_y, margin_x)
    pc_ = EdgePadded(cocg, margin_y, margin_x)

    def make_branch(rotation: int):
        offsets = _clamp_offs(y_sh, _spiral_offsets(seed, rotation))

        def branch(operands):
            pw_pad, py_pad, pc_pad, normal, world_pos, radius_px = operands
            pw = EdgePadded.from_padded(pw_pad, margin_y, margin_x)
            py = EdgePadded.from_padded(py_pad, margin_y, margin_x)
            pc = EdgePadded.from_padded(pc_pad, margin_y, margin_x)
            acc_y = jnp.zeros((4,) + radius_px.shape, y_sh.dtype)
            acc_c = jnp.zeros((2,) + radius_px.shape, cocg.dtype)
            total = jnp.zeros_like(radius_px)
            for dy, dx in offsets:
                p2 = pw.tap_fwd(dy, dx)
                dist_plane = jnp.abs(
                    jnp.sum(normal * (p2 - world_pos), axis=0))
                w = jnp.clip(0.25 / jnp.maximum(dist_plane, 1e-4),
                             0.0, 1.0) ** 2
                # per-pixel radius: taps beyond radius_px fade to zero
                tap_r = float(np.hypot(dx, dy))
                w = w * jnp.clip(radius_px / tap_r, 0.0, 1.0) ** 2
                acc_y = acc_y + py.tap_fwd(dy, dx) * w[None]
                acc_c = acc_c + pc.tap_fwd(dy, dx) * w[None]
                total = total + w
            return acc_y, acc_c, total

        return branch

    acc_y, acc_c, total = jax.lax.switch(
        frame_index % _SPATIAL_ROTATIONS,
        [make_branch(k) for k in range(_SPATIAL_ROTATIONS)],
        (pw_.padded, py_.padded, pc_.padded, normal, world_pos, radius_px))
    acc_y = acc_y + y_sh
    acc_c = acc_c + cocg
    total = total + 1.0
    return acc_y / total[None], acc_c / total[None]


@jax.named_scope("sdfgi.temporal_filter")
def temporal_filter_gi(y_sh, cocg, hist_y_sh, hist_cocg, ok, motion_mag_px,
                       camera_cut):
    """filterIndirectDiffuseTemporal.comp — EMA alpha 0.8 -> 0.6 with the
    SMAA motion-difference metric and >3px fast-motion path. History values
    arrive already motion-reprojected (ok = reprojection valid)."""
    alpha_default = 0.8
    cur_len = jnp.sqrt(jnp.sum(y_sh * y_sh, axis=0))
    hist_len = jnp.sqrt(jnp.sum(hist_y_sh * hist_y_sh, axis=0))
    alpha_min = jnp.maximum(0.6 - 0.3 * jnp.abs(cur_len - hist_len), 0.0)
    fast = motion_mag_px > 3.0
    alpha = jnp.where(fast, alpha_min, alpha_default)
    alpha = jnp.where(ok, alpha, 0.0)
    alpha = jnp.where(camera_cut, 0.0, alpha)
    out_y = y_sh + (hist_y_sh - y_sh) * alpha[None]
    out_c = cocg + (hist_cocg - cocg) * alpha[None]
    out_y = jnp.where(jnp.isnan(out_y), 0.0, out_y)
    out_c = jnp.where(jnp.isnan(out_c), 0.0, out_c)
    return out_y, out_c


@jax.named_scope("sdfgi.upscale")
def upscale_half_to_full(y_sh_half, cocg_half, depth_full, depth_half,
                         near, far):
    """indirectLightUpscale.comp — depth-aware 2x upscale: nearest-depth
    half-res texel on edges, bilinear otherwise."""
    from .shadow import linearize_depth

    lin_full = linearize_depth(depth_full, near, far)
    lin_half = linearize_depth(depth_half, near, far)
    h2, w2 = depth_half.shape
    up = lambda p: jnp.repeat(jnp.repeat(p, 2, axis=-2), 2, axis=-1)

    # the 2x2 half-res neighborhood of each full-res pixel
    cands = []
    for dy in (0, 1):
        for dx in (0, 1):
            cands.append((_shift(lin_half, dy, dx),
                          _shift(y_sh_half, dy, dx),
                          _shift(cocg_half, dy, dx)))
    lin_up = [up(c[0]) for c in cands]
    full = lin_full
    diffs = [jnp.abs(l[:full.shape[0], :full.shape[1]] - full) for l in lin_up]
    is_edge = jnp.zeros_like(full, bool)
    for d in diffs:
        is_edge = is_edge | (d > 0.5)
    # nearest-depth candidate
    best = jnp.argmin(jnp.stack(diffs), axis=0)
    near_y = jnp.zeros((4,) + full.shape, jnp.float32)
    near_c = jnp.zeros((2,) + full.shape, jnp.float32)
    for i, (_, ys, cs) in enumerate(cands):
        sel = (best == i)[None]
        ys_up = up(ys)[:, :full.shape[0], :full.shape[1]]
        cs_up = up(cs)[:, :full.shape[0], :full.shape[1]]
        near_y = jnp.where(sel, ys_up, near_y)
        near_c = jnp.where(sel, cs_up, near_c)
    # bilinear path
    bil_y = jax.image.resize(y_sh_half, (4,) + full.shape, method="bilinear")
    bil_c = jax.image.resize(cocg_half, (2,) + full.shape, method="bilinear")
    out_y = jnp.where(is_edge[None], near_y, bil_y)
    out_c = jnp.where(is_edge[None], near_c, bil_c)
    return out_y, out_c
