"""Froxel volumetric lighting.

Parity (froxel grid screen/8 x screen/8 x 64 slices, exponential depth
distribution k=3 — Volumetrics.cpp:8-16, volumetricFroxelLighting.inc:22-41):
  - froxelVolumeMaterial.comp — density = base + noiseRange*(perlin-0.5) at
    worldPos*0.5 + windOffset; scattering/absorption coefficients per froxel;
  - froxelLightScattering.comp — sun shadow (cascade 2) x Henyey-Greenstein
    phase + constant ambient -> inscattering; extinction luminance ->
    transmittance coefficient;
  - volumeLightingReprojection.comp — EMA alpha 0.95 with full
    previous-frustum reprojection;
  - volumetricLightingIntegration.comp — front-to-back analytic per-segment
    integration over the 64 slices;
  - per-pixel apply with noise jitter (triangle.frag:131-144, sky.frag).

TPU adaptations (all gather-avoidance, same math):
  - every volume is CHANNEL-PLANAR (C, D, Hf, Wf): at screen/8 the froxel
    count matches the pixel count / 64, and channel-minor (..., 3/4) layouts
    put a 3-wide axis on the 128-lane minor dimension (~10x VPU waste);
  - the 3D Perlin noise texture becomes ANALYTIC hash-gradient noise
    evaluated per froxel (pure ALU; the texture fetch would be a 2M-point
    gather);
  - the per-froxel shadow-map tap and the reprojected history fetch run on a
    4x-coarser grid (gathers drop to ~30k) and are trilinearly upsampled —
    fog is low-frequency, the error is far below the reference's own
    half-texel jitter;
  - integration is an exclusive-cumsum scan along the slice axis;
  - the final per-pixel LUT lookup happens at quarter resolution with
    depth-aware upsampling (fog varies smoothly except across depth edges).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.stencil import point_downsample

K_EXP = 3.0  # volumetricFroxelLighting.inc:22


def froxel_uv_to_depth(uv_z, max_distance):
    """volumetricFroxelLighting.inc:25-33."""
    return (jnp.exp(K_EXP * uv_z) - 1.0) / (jnp.exp(K_EXP) - 1.0) * max_distance


def depth_to_froxel_uvz(depth, max_distance):
    """volumetricFroxelLighting.inc:35-41."""
    linear = depth / max_distance
    return jnp.log(linear * (jnp.exp(K_EXP) - 1.0) + 1.0) / K_EXP


def _hash3(ix, iy, iz):
    """wang_hash-style integer hash of 3D cell coords -> uint32."""
    s = (ix.astype(jnp.uint32) * jnp.uint32(73856093)
         ^ iy.astype(jnp.uint32) * jnp.uint32(19349663)
         ^ iz.astype(jnp.uint32) * jnp.uint32(83492791))
    s = (s ^ jnp.uint32(61)) ^ (s >> 16)
    s = s * jnp.uint32(9)
    s = s ^ (s >> 4)
    s = s * jnp.uint32(0x27D4EB2D)
    s = s ^ (s >> 15)
    return s


def analytic_perlin_3d_planar(px, py, pz):
    """Gradient noise in [0,1] at world positions given as three planes.

    Replaces the reference's 3D Perlin texture sample (same character:
    smooth gradient noise with ~1-unit features) with pure ALU."""
    ix = jnp.floor(px).astype(jnp.int32)
    iy = jnp.floor(py).astype(jnp.int32)
    iz = jnp.floor(pz).astype(jnp.int32)
    fx = px - ix.astype(jnp.float32)
    fy = py - iy.astype(jnp.float32)
    fz = pz - iz.astype(jnp.float32)

    def fade(f):
        return f * f * f * (f * (f * 6.0 - 15.0) + 10.0)

    wx, wy, wz = fade(fx), fade(fy), fade(fz)

    def grad_dot(ox, oy, oz):
        h = _hash3(ix + ox, iy + oy, iz + oz)
        gx = ((h & jnp.uint32(0x3FF)).astype(jnp.float32) / 511.5) - 1.0
        gy = (((h >> 10) & jnp.uint32(0x3FF)).astype(jnp.float32) / 511.5) - 1.0
        gz = (((h >> 20) & jnp.uint32(0x3FF)).astype(jnp.float32) / 511.5) - 1.0
        inv = jax.lax.rsqrt(gx * gx + gy * gy + gz * gz + 1e-6)
        return (gx * (fx - ox) + gy * (fy - oy) + gz * (fz - oz)) * inv

    def lerp(a, b, t):
        return a + (b - a) * t

    c00 = lerp(grad_dot(0, 0, 0), grad_dot(1, 0, 0), wx)
    c10 = lerp(grad_dot(0, 1, 0), grad_dot(1, 1, 0), wx)
    c01 = lerp(grad_dot(0, 0, 1), grad_dot(1, 0, 1), wx)
    c11 = lerp(grad_dot(0, 1, 1), grad_dot(1, 1, 1), wx)
    c0 = lerp(c00, c10, wy)
    c1 = lerp(c01, c11, wy)
    n = lerp(c0, c1, wz)
    return jnp.clip(n / (jnp.sqrt(3.0) / 2.0) * 0.5 + 0.5, 0.0, 1.0)


@jax.named_scope("volumetrics.positions")
def froxel_world_positions(res_xyz, cam, tan_fov_half, aspect, max_distance,
                           sample_offset=0.5):
    """Froxel centers in world space, CHANNEL-PLANAR (3, D, Hf, Wf).

    Mirrors froxelVolumeMaterial.comp:24-30: ndc from froxel uv, view ray
    through the pixel, world = cam + ray/dot(ray, fwd) * sliceDepth.
    In split-frame band mode (cam carries ndc_y_scale/offset) the grid spans
    only the band's sub-frustum so band froxels tile the full volume.
    """
    wf, hf, d = res_xyz
    xs = (jnp.arange(wf, dtype=jnp.float32) + sample_offset) / wf * 2.0 - 1.0
    if "ndc_y_scale" in cam:
        # band mode: compute rows in GLOBAL froxel index space so band
        # froxel centers are BIT-EXACT equal to the single-device ones.
        # Algebraically `(ys_band - offset) / scale` is the same value, but
        # its different float op order flips low bits — and the full-res
        # density noise (material_volume) is effectively white at far
        # slices, so 1-ulp world-pos differences became visible band seams.
        nsc = cam["ndc_y_scale"]
        band = jnp.round((-cam["ndc_y_offset"] / nsc + 1.0) * nsc * 0.5
                         - 0.5)
        g = band * hf + jnp.arange(hf, dtype=jnp.float32) + sample_offset
        ys = g / (hf * nsc) * 2.0 - 1.0
    else:
        ys = (jnp.arange(hf, dtype=jnp.float32) + sample_offset) / hf \
            * 2.0 - 1.0
    zs = (jnp.arange(d, dtype=jnp.float32) + sample_offset) / d
    depth = froxel_uv_to_depth(zs, max_distance)  # (D,)

    f = cam["forward"]
    u = cam["up"]
    r = cam["right"]
    ndc_x = jnp.broadcast_to(xs[None, :], (hf, wf))
    ndc_y = jnp.broadcast_to(ys[:, None], (hf, wf))
    # -y: matches the projection's row mapping (see sky.view_directions)
    return jnp.stack([
        cam["position"][c]
        + (f[c] + tan_fov_half * aspect * ndc_x * r[c]
           - tan_fov_half * ndc_y * u[c])[None] * depth[:, None, None]
        for c in range(3)])  # ray is unnormalized; dot(ray, f) == 1


@jax.named_scope("volumetrics.material")
def material_volume(world_pos, settings, wind_offset, noise_stride: int = 1):
    """froxelVolumeMaterial.comp — (4, D, Hf, Wf): scatter rgb + absorption.

    The density noise is evaluated ANALYTICALLY per froxel: the gradient
    noise costs ~60 VPU ops/point — ~0.1 ms for the whole 2M-froxel grid,
    pure elementwise planar ALU. The coarse-grid + trilinear-resize variant
    (noise_stride > 1) looks cheaper but lowers to axis-contracting
    dot_generals in TRANSPOSED layouts (minor dim = D = 64, half-empty
    lanes, relayout copies on both sides) — measured 11.6 ms/frame at
    1080p, ~6x the direct evaluation. (The reference samples a prebaked 3D
    texture, froxelVolumeMaterial.comp; an analytic band-limited field is
    the gather-free TPU equivalent.)"""
    s = noise_stride
    d, hf, wf = world_pos.shape[1:]
    if s > 1:
        # depth-axis stride via reshape+contiguous-slice, screen axes via
        # the conv-based point_downsample (strided slices canonicalize into
        # index-vector gathers; see utils/stencil.point_downsample)
        wp_c = point_downsample(
            world_pos.reshape(3, d // s, s, hf, wf)[:, :, 0], s, s)
    else:
        wp_c = world_pos
    noise_c = analytic_perlin_3d_planar(
        wp_c[0] * 0.5 + wind_offset[0],
        wp_c[1] * 0.5 + wind_offset[1],
        wp_c[2] * 0.5 + wind_offset[2])
    noise = jax.image.resize(noise_c, (d, hf, wf), method="trilinear") \
        if s > 1 else noise_c
    density = settings.base_density + settings.noise_density * (noise - 0.5)
    density = jnp.maximum(density, 0.0)
    # materialize ONCE: without the barrier XLA fuses the whole noise+resize
    # chain into each downstream consumer channel and recomputes it 3x
    # (measured 3x 3.8 ms identical fusions at 1080p)
    density = jax.lax.optimization_barrier(density)
    scatter = settings.scattering_coefficient * density
    absorption = settings.absorption_coefficient * density
    return jnp.stack([scatter, scatter, scatter, absorption])


@jax.named_scope("volumetrics.scattering")
def light_scattering(material, world_pos, shadow_coarse, cam, sun_dir,
                     sun_color, sun_strength, phase_g, ambient: float = 0.02,
                     halo_fn=None):
    """froxelLightScattering.comp — per-froxel inscattering + transmittance.

    material/world_pos channel-planar; shadow_coarse (Dc, Hc, Wc) shadow
    factors on a coarse froxel grid, upsampled here (replaces the per-froxel
    shadow-map tap). ambient: VolumetricsSettings.ambient
    (froxelLightScattering.comp constant-ambient term). halo_fn (band
    mode): exchanges one coarse row with the neighbor bands so the
    upsample interpolates across band borders."""
    _, d, hf, wf = material.shape
    shadow = _resize_coarse(shadow_coarse, (d, hf, wf), halo_fn)
    vx = world_pos[0] - cam["position"][0]
    vy = world_pos[1] - cam["position"][1]
    vz = world_pos[2] - cam["position"][2]
    inv_len = jax.lax.rsqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-18))
    vol = -(vx * sun_dir[0] + vy * sun_dir[1] + vz * sun_dir[2]) * inv_len
    phase = (1.0 - phase_g ** 2) / (
        4.0 * jnp.pi * jnp.power(
            1.0 + phase_g ** 2 - 2.0 * phase_g * vol, 1.5))
    # barrier: keeps the shadow upsample + phase evaluated once instead of
    # refused (and recomputed) into each of the 3 inscatter channels
    sun_base = jax.lax.optimization_barrier(shadow * sun_strength * phase)
    scatter = material[0]  # rgb scatter channels are identical
    inscatter = jnp.stack([
        (sun_base * sun_color[c] + ambient) * scatter for c in range(3)])
    extinction_rgb = scatter + material[3]
    # transmittance coefficient = luminance of extinction
    # (froxelLightScattering.comp:59-61); extinction is gray here
    trans = (0.21 + 0.72 + 0.07) * extinction_rgb
    return jnp.concatenate([inscatter, trans[None]], axis=0)


@jax.named_scope("volumetrics.upsample")
def _resize_coarse(x, fine_shape, halo_fn=None):
    """Trilinear coarse->fine froxel upsample; with halo_fn the coarse rows
    are extended by one neighbor-band row (and the fine result cropped) so
    band-border interpolation matches the single-device volume."""
    *lead, d, hf, wf = (*x.shape[:-3], *fine_shape)
    ratio = fine_shape[-2] // x.shape[-2]
    if halo_fn is None:
        return jax.image.resize(x, tuple(lead) + tuple(fine_shape),
                                method="trilinear")
    ext = halo_fn(x)  # (+1 coarse row each side)
    out = jax.image.resize(
        ext, tuple(lead) + (d, hf + 2 * ratio, wf), method="trilinear")
    return out[..., ratio:-ratio, :]


@jax.named_scope("volumetrics.reprojection")
def temporal_reprojection(current, history, world_pos_coarse, prev_view_proj,
                          prev_cam_pos, prev_cam_forward, max_distance,
                          camera_cut, halo_fn=None):
    """volumeLightingReprojection.comp — EMA alpha 0.95 with previous-frustum
    reprojection, evaluated on a coarse grid and upsampled.

    current/history (4, D, Hf, Wf); world_pos_coarse (3, Dc, Hc, Wc)."""
    _, d, hf, wf = current.shape
    _, dc, hc, wc = world_pos_coarse.shape
    p = world_pos_coarse.reshape(3, -1).T  # (N, 3) — N ~ 30k, fine
    clip = p @ prev_view_proj[:3, :3].T + prev_view_proj[:3, 3]
    w = p @ prev_view_proj[3, :3] + prev_view_proj[3, 3]
    ndc = clip[:, :2] / jnp.where(jnp.abs(w[:, None]) > 1e-9, w[:, None], 1.0)
    to_p = p - prev_cam_pos
    dist = jnp.linalg.norm(to_p, axis=-1)
    vh = to_p / jnp.maximum(dist[:, None], 1e-9)
    hist_depth = dist * jnp.sum(vh * prev_cam_forward, axis=-1)
    uvw = jnp.stack([
        ndc[:, 0] * 0.5 + 0.5,
        ndc[:, 1] * 0.5 + 0.5,
        depth_to_froxel_uvz(jnp.maximum(hist_depth, 1e-4), max_distance),
    ], axis=-1)
    ok = jnp.all((uvw >= 0.0) & (uvw <= 1.0), axis=-1) & (w > 0)

    # TRILINEAR history fetch at coarse points (~30k points x 8 taps), as
    # the reference's linear sampler (volumeLightingReprojection.comp).
    # Nearest-texel was unstable here: coarse centers land EXACTLY on fine
    # texel boundaries (u*wf == 4i+2), so band vs single-device float paths
    # rounded to different texels and fog diverged at a few LSB per frame.
    def axis_coords(c, n):
        c = jnp.clip(c - 0.5, 0.0, n - 1.0)
        i0 = jnp.floor(c).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, n - 1)
        return i0, i1, c - i0

    x0, x1, fx = axis_coords(uvw[:, 0] * wf, wf)
    y0, y1, fy = axis_coords(uvw[:, 1] * hf, hf)
    z0, z1, fz = axis_coords(uvw[:, 2] * d, d)
    # ONE flat gather for all 8 trilinear corners: eight separate
    # advanced-index gathers each paid XLA's per-gather fixed cost
    # (8 x 0.30 ms/frame measured on-chip at bench sizes)
    histf = history.reshape(4, -1)

    def flat(z, y, x):
        return (z * hf + y) * wf + x

    corners = jnp.concatenate([
        flat(z0, y0, x0), flat(z0, y0, x1), flat(z0, y1, x0),
        flat(z0, y1, x1), flat(z1, y0, x0), flat(z1, y0, x1),
        flat(z1, y1, x0), flat(z1, y1, x1)])
    n = x0.shape[0]
    g = histf[:, corners].reshape(4, 8, n)
    c00 = g[:, 0] * (1 - fx) + g[:, 1] * fx
    c01 = g[:, 2] * (1 - fx) + g[:, 3] * fx
    c10 = g[:, 4] * (1 - fx) + g[:, 5] * fx
    c11 = g[:, 6] * (1 - fx) + g[:, 7] * fx
    c0 = c00 + (c01 - c00) * fy
    c1 = c10 + (c11 - c10) * fy
    hist = c0 + (c1 - c0) * fz  # (4, N)
    hist = jnp.where(ok[None], hist, 0.0)
    alpha_c = jnp.where(ok, 0.95, 0.0).reshape(dc, hc, wc)
    hist_c = hist.reshape(4, dc, hc, wc)

    alpha = _resize_coarse(alpha_c, (d, hf, wf), halo_fn)
    hist_full = _resize_coarse(hist_c, (d, hf, wf), halo_fn)
    alpha = jnp.where(camera_cut, 0.0, alpha)
    out = current + (hist_full - current) * alpha[None]
    return jnp.where(jnp.isnan(out), current, out)


@jax.named_scope("volumetrics.integrate")
def integrate_froxels(scattering, max_distance):
    """volumetricLightingIntegration.comp — front-to-back accumulation.

    scattering (4, D, Hf, Wf) -> integrated (4, D, Hf, Wf):
    rgb = accumulated inscattering, a = transmittance to the slice end.
    """
    d = scattering.shape[1]
    zs = jnp.arange(d + 1, dtype=jnp.float32) / d
    depths = froxel_uv_to_depth(zs, max_distance)
    seg_len = (depths[1:] - depths[:-1]).reshape(d, 1, 1)

    sigma = scattering[3]
    od = sigma * seg_len
    od_cum = jnp.cumsum(od, axis=0)
    trans_before = jnp.exp(-(od_cum - od))
    inv_sigma = 1.0 / jnp.maximum(sigma, 1e-5)
    decay = 1.0 - jnp.exp(-od)
    acc = jnp.stack([
        jnp.cumsum(scattering[c] * decay * inv_sigma * trans_before, axis=0)
        for c in range(3)])
    trans_total = jnp.exp(-od_cum)
    return jnp.concatenate([acc, trans_total[None]], axis=0)


@jax.named_scope("volumetrics.apply_fog")
def apply_froxel_fog(color, pixel_depth, integrated, max_distance, noise,
                     quarter: int = 4, halo_fn=None):
    """Per-pixel fog apply (triangle.frag:131-144): color*T + inscatter.

    integrated (4, D, Hf, Wf); evaluated at 1/quarter resolution with a
    depth-aware upsample; noise (H, W) in [0,1) jitters the slice lookup
    like the reference's screen-UV jitter. In split-frame band mode halo_fn
    exchanges one quarter-res row with the neighbor bands so the bilinear
    upsample interpolates across the band border instead of clamping."""
    _, h, w = color.shape
    _, d, hf, wf = integrated.shape
    q = quarter
    depth_q = point_downsample(pixel_depth, q, q)
    noise_q = point_downsample(noise, q, q)
    hq, wq = depth_q.shape
    uvz = depth_to_froxel_uvz(jnp.maximum(depth_q, 1e-4), max_distance)
    z_idx = jnp.clip(((uvz + (noise_q - 0.5) * 0.013) * d).astype(jnp.int32),
                     0, d - 1)
    # froxel xy for each quarter-res pixel
    fx = jnp.clip((jnp.arange(wq) * q // (w // wf)), 0, wf - 1)
    fy = jnp.clip((jnp.arange(hq) * q // (h // hf)), 0, hf - 1)
    fog_q = integrated[:, z_idx, fy[:, None], fx[None, :]]  # (4, hq, wq)
    if halo_fn is not None:
        fog_q = halo_fn(fog_q)  # (4, hq + 2, wq)
        fog = jax.image.resize(fog_q, (4, h + 2 * q, w), method="bilinear")
        fog = fog[:, q:-q]
    else:
        fog = jax.image.resize(fog_q, (4, h, w), method="bilinear")
    # barrier: one full-res upsample, not one per consumer channel
    fog = jax.lax.optimization_barrier(fog)
    return color * fog[3][None] + fog[0:3]
