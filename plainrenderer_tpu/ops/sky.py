"""Physically based sky (Hillaire 2020), TPU-native.

Parity targets:
  - resources/shaders/sky.inc (atmosphere profile: Rayleigh/Mie/ozone height
    factors, earth/atmosphere ray intersections, octahedral-ish sky LUT
    mapping toSkyLut/fromSkyLut)
  - skyTransmissionLut.comp (40-sample transmittance march, 128^2)
  - skyMultiscatterLut.comp (8x8 directions x 20 steps 2nd-order scattering
    with earth albedo 0.3, 32^2)
  - skyLut.comp (30-step single-scatter march with Rayleigh + Cornette-Shanks
    Mie phase + analytic earth-shadow ray + multiscatter term, 200x100)
  - sky.frag / sunSprite.frag (LUT sample per sky pixel + limb-darkened disc)
  - volumeShading.inc (phase functions, analytic inscattering integration)

TPU redesign notes (math identical, evaluation strategy not):
  - the reference's inner transmission-LUT lookups inside the marches become
    direct quadrature (_sun_transmittance): dense FLOPs are nearly free on
    the VPU while per-element gathers cost ~8 cycles each;
  - per-pixel sky application samples the LUT on a coarse screen grid with
    XLA gathers (a few k, cheap) and bilinearly upsamples — the sky is smooth
    in view direction except the sun disc, which is added analytically at
    full resolution (sunSprite.frag parity). Banding is hidden by the same
    dither the reference uses (sky.frag:24-28).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

TRANSMISSION_LUT_SIZE = (128, 128)  # Sky.cpp:5
MULTISCATTER_LUT_SIZE = (32, 32)
SKY_LUT_SIZE = (100, 200)  # (height=y, width=x); Sky.cpp sky LUT 200x100


@dataclasses.dataclass(frozen=True)
class AtmosphereSettings:
    """Techniques/Sky.h:6-15 (everything in km)."""

    scattering_rayleigh_ground: tuple = (0.0058, 0.0135, 0.0331)
    earth_radius: float = 6371.0
    atmosphere_height: float = 100.0
    ozone_extinction: tuple = (0.000650, 0.001881, 0.000085)
    scattering_mie_ground: float = 0.006
    extinction_mie_factor: float = 1.11
    mie_scattering_exponent: float = 0.76

    @property
    def extinction_mie_ground(self):
        return self.extinction_mie_factor * self.scattering_mie_ground


def _coefficients(height, s: AtmosphereSettings):
    """sky.inc:12-42 — per-height scatter/extinction coefficients.

    height (...,) -> (scatter_rayleigh (...,3), scatter_mie (...,1),
    extinction (...,3)).
    """
    rayleigh = jnp.exp(-height / 8.0)[..., None]
    mie = jnp.exp(-height / 1.2)[..., None]
    ozone = jnp.maximum(0.0, 1.0 - jnp.abs(height - 25.0) / 15.0)[..., None]
    sr = jnp.asarray(s.scattering_rayleigh_ground, jnp.float32)
    oz = jnp.asarray(s.ozone_extinction, jnp.float32)
    scatter_r = rayleigh * sr
    scatter_m = mie * s.scattering_mie_ground
    extinction = rayleigh * sr + mie * s.extinction_mie_ground + ozone * oz
    return scatter_r, scatter_m, extinction


def _ray_earth_intersection(p, d, s: AtmosphereSettings):
    """sky.inc:60-82 — distance to earth or atmosphere-top along ray.

    p (..., 3) origin, d (..., 3) unit dir, earth center at origin.
    Returns (distance (...,), hit_earth (...,) bool).
    """
    l = -p
    t_ca = jnp.sum(l * d, axis=-1)
    d2 = jnp.maximum(jnp.sum(l * l, axis=-1) - t_ca * t_ca, 0.0)
    er = s.earth_radius
    under = er * er - d2
    t_hc_earth = jnp.sqrt(jnp.maximum(under, 0.0))
    t_earth = t_ca - t_hc_earth
    hit_earth = (under >= 0.0) & (t_earth >= 0.0)
    r = er + s.atmosphere_height
    t_hc_atm = jnp.sqrt(jnp.maximum(r * r - d2, 0.0))
    t_atm = t_ca + jnp.abs(t_hc_atm)
    return jnp.where(hit_earth, t_earth, t_atm), hit_earth


def _phase_rayleigh(vol):
    """volumeShading.inc:14-16."""
    return 3.0 / (16.0 * jnp.pi) * (1.0 + vol * vol)


def phase_greenstein(vol, g):
    """volumeShading.inc:4-6 — Henyey-Greenstein."""
    return (1.0 - g * g) / (
        4.0 * jnp.pi * jnp.power(1.0 + g * g - 2.0 * g * vol, 1.5))


def _phase_cornette_shanks(vol, g):
    """volumeShading.inc:18-22."""
    nom = 3.0 / (8.0 * jnp.pi) * (1.0 - g * g) * (1.0 + vol * vol)
    den = (2.0 + g * g) * jnp.power(1.0 + g * g - 2.0 * g * vol, 1.5)
    return nom / den


def integrate_inscattering(inscattering, extinction, length):
    """volumeShading.inc:25-28 — analytic per-segment integration."""
    return (inscattering - inscattering * jnp.exp(-extinction * length)) / (
        jnp.maximum(extinction, 1e-5))


def _sun_transmittance(pos, sun_dir, s: AtmosphereSettings, samples: int = 16):
    """Transmittance from pos (..., 3) towards the sun, by direct quadrature
    (replaces the reference's transmission-LUT lookups inside marches).
    sun_dir is (3,) or broadcastable to pos's shape."""
    sun_dir = jnp.broadcast_to(jnp.asarray(sun_dir, jnp.float32), pos.shape)
    dist, hit_earth = _ray_earth_intersection(pos, sun_dir, s)
    step = dist / samples
    ts = (jnp.arange(samples, dtype=jnp.float32) + 0.5)
    sample_pos = pos[..., None, :] + (
        sun_dir[..., None, :] * (ts[:, None] * step[..., None, None]))
    height = jnp.maximum(
        jnp.linalg.norm(sample_pos, axis=-1) - s.earth_radius, 0.0)
    _, _, extinction = _coefficients(height, s)
    optical_depth = jnp.sum(extinction * step[..., None, None], axis=-2)
    trans = jnp.exp(-optical_depth)
    return jnp.where(hit_earth[..., None], 0.0, trans)


@functools.partial(jax.jit, static_argnames=("settings", "size", "samples"))
def bake_transmission_lut(settings: AtmosphereSettings = AtmosphereSettings(),
                          size=TRANSMISSION_LUT_SIZE, samples: int = 40):
    """skyTransmissionLut.comp — (3, H, W) transmittance LUT.

    uv.x = height/atmosphereHeight, uv.y = updot*0.5+0.5 (computeLutUV).
    """
    h_count, w_count = size
    s = settings
    x = jnp.arange(w_count, dtype=jnp.float32) / (w_count - 1)
    y = jnp.arange(h_count, dtype=jnp.float32) / (h_count - 1)
    xg, yg = jnp.meshgrid(x, y, indexing="xy")
    height = xg * s.atmosphere_height
    updot = jnp.maximum(yg * 2.0 - 1.0, -0.999)
    # the reference's y-down world: up = (0,-1,0); V = (0, -updot, sqrt(...))
    v = jnp.stack(
        [jnp.zeros_like(updot), -updot,
         jnp.sqrt(jnp.maximum(1.0 - updot * updot, 0.0))], axis=-1)
    p = jnp.stack(
        [jnp.zeros_like(height), -(height + s.earth_radius),
         jnp.zeros_like(height)], axis=-1)
    dist, hit_earth = _ray_earth_intersection(p - 0.01, v, s)
    path = jnp.maximum(dist, 0.01)
    step = path / samples
    ts = jnp.arange(samples, dtype=jnp.float32) + 0.5
    sample_pos = p[..., None, :] + v[..., None, :] * (
        ts[:, None] * step[..., None, None])
    hgt = jnp.maximum(jnp.linalg.norm(sample_pos, axis=-1) - s.earth_radius, 0.0)
    _, _, extinction = _coefficients(hgt, s)
    od = jnp.sum(extinction * step[..., None, None], axis=-2)
    trans = jnp.where(hit_earth[..., None], 0.0, jnp.exp(-od))
    return jnp.moveaxis(trans, -1, 0)  # (3, H, W)


@functools.partial(jax.jit, static_argnames=("settings", "size"))
def bake_multiscatter_lut(settings: AtmosphereSettings = AtmosphereSettings(),
                          size=MULTISCATTER_LUT_SIZE):
    """skyMultiscatterLut.comp — 2nd-order scattering factor (3, H, W).

    uv.x = height fraction, uv.y = sun updot. 8x8 directions x 20 steps,
    earth albedo 0.3, isotropic phase, F_ms = 1/(1-f_ms) geometric series.
    """
    s = settings
    h_count, w_count = size
    x = jnp.arange(w_count, dtype=jnp.float32) / w_count
    y = jnp.arange(h_count, dtype=jnp.float32) / h_count
    xg, yg = jnp.meshgrid(x, y, indexing="xy")
    height = xg * s.atmosphere_height
    updot = yg * 2.0 - 1.0
    sun_l = jnp.stack(
        [jnp.zeros_like(updot), -updot,
         jnp.sqrt(jnp.maximum(1.0 - updot * updot, 0.0))], axis=-1)
    p = jnp.stack(
        [jnp.zeros_like(height), -(height + s.earth_radius),
         jnp.zeros_like(height)], axis=-1)

    n_sqrt = 8
    inner = 20
    iso_phase = 1.0 / (4.0 * jnp.pi)

    li = jnp.arange(n_sqrt, dtype=jnp.float32)
    theta = jnp.pi * li / n_sqrt
    phi = 2.0 * jnp.pi * li / n_sqrt
    tt, pp = jnp.meshgrid(theta, phi, indexing="ij")
    sin_t = jnp.sin(tt)
    cos_t = jnp.cos(tt)
    # direction set matches skyMultiscatterLut.comp:49 (its quirky
    # sinTheta*sinTheta z component included for parity)
    dirs = jnp.stack([sin_t * cos_t, -cos_t, sin_t * sin_t], axis=-1)
    dirs = dirs.reshape(-1, 3)
    sin_weights = sin_t.reshape(-1)

    def per_direction(carry, idx):
        l2nd_acc, fms_acc = carry
        v = dirs[idx]
        sinw = sin_weights[idx]
        dist, hit_earth = _ray_earth_intersection(
            p, jnp.broadcast_to(v, p.shape), s)
        step = dist / inner
        hit_pos = p + dist[..., None] * v
        earth_n = hit_pos / jnp.maximum(
            jnp.linalg.norm(hit_pos, axis=-1, keepdims=True), 1e-6)
        earth_nol = jnp.clip(jnp.sum(earth_n * sun_l, axis=-1), 0.0, 1.0)
        ground = jnp.broadcast_to(
            jnp.asarray([0.0, -s.earth_radius, 0.0], jnp.float32), p.shape)
        t_to_ground = _sun_transmittance(ground, sun_l, s, samples=12)
        earth_lit = 0.3 / jnp.pi * t_to_ground * earth_nol[..., None]
        direct = jnp.where(hit_earth[..., None], earth_lit, 0.0)

        def march(i, state):
            transmission, inscattered, l_f = state
            pos = p + v * ((i + 1.0) * step[..., None])
            hgt = jnp.maximum(
                jnp.linalg.norm(pos, axis=-1) - s.earth_radius, 0.0)
            scat_r, scat_m, ext = _coefficients(hgt, s)
            scat = scat_r + scat_m
            t_sun = _sun_transmittance(pos, sun_l, s, samples=8)
            ci = integrate_inscattering(scat, ext, step[..., None])
            l_f = l_f + ci * transmission
            inscattered = inscattered + ci * t_sun * iso_phase * transmission
            transmission = transmission * jnp.exp(-ext * step[..., None])
            return transmission, inscattered, l_f

        init = (jnp.ones_like(p), jnp.zeros_like(p), jnp.zeros_like(p))
        transmission, inscattered, l_f = jax.lax.fori_loop(0, inner, march, init)
        l2nd_acc = l2nd_acc + (direct * transmission + inscattered) * sinw
        fms_acc = fms_acc + l_f * sinw
        return (l2nd_acc, fms_acc), None

    init = (jnp.zeros_like(p), jnp.zeros_like(p))
    (l2nd, fms), _ = jax.lax.scan(
        per_direction, init, jnp.arange(n_sqrt * n_sqrt))
    inv = 1.0 / (n_sqrt * n_sqrt)
    fms = fms * inv
    l2nd = l2nd * inv
    multi = l2nd / jnp.maximum(1.0 - fms, 1e-4)
    return jnp.moveaxis(multi, -1, 0)


def _to_sky_lut_uv(v):
    """sky.inc:85-93 toSkyLut — direction (..., 3) -> uv (..., 2)."""
    theta = jnp.arccos(jnp.clip(-v[..., 1], -1.0, 1.0))
    y = theta / jnp.pi
    y_low = y * 2.0 - 1.0
    y = jnp.sign(y_low) * jnp.sqrt(jnp.abs(y_low)) * 0.5 + 0.5
    phi = -jnp.arctan2(v[..., 2], v[..., 0])
    return jnp.stack([phi / (2.0 * jnp.pi) + 0.5, y], axis=-1)


def _from_sky_lut_uv(uv):
    """sky.inc:95-103 fromSkyLut — uv (..., 2) -> direction (..., 3)."""
    theta = (1.0 - uv[..., 1]) - 0.5
    theta = jnp.sign(theta) * theta * theta * 2.0 * jnp.pi + jnp.pi * 0.5
    phi = (-uv[..., 0] + 0.5) * 2.0 * jnp.pi
    return jnp.stack(
        [jnp.sin(theta) * jnp.cos(phi), jnp.cos(theta),
         jnp.sin(theta) * jnp.sin(phi)], axis=-1)


def bilinear_lookup_matmul(lut, u, v):
    """Bilinear lookup of MANY points from a SMALL LUT without gathers.

    lut (3, H, W); u, v in [0, 1] arbitrary-shaped. Implemented as two
    one-hot weight contractions on the MXU (cost P*H + P*W MACs per channel),
    which beats XLA's ~8-cycle-per-element gather for P in the hundreds of
    thousands when H, W <= ~64.
    """
    _, h, w = lut.shape
    shape = u.shape
    up = u.reshape(-1) * (w - 1)
    vp = v.reshape(-1) * (h - 1)

    def hat_weights(coord, n):
        grid = jnp.arange(n, dtype=jnp.float32)[None, :]
        return jnp.maximum(1.0 - jnp.abs(grid - coord[:, None]), 0.0)

    wx = hat_weights(jnp.clip(up, 0.0, w - 1), w)  # (P, W)
    wy = hat_weights(jnp.clip(vp, 0.0, h - 1), h)  # (P, H)
    # A[p, y*3+c] = sum_x lut[c, y, x] * wx[p, x]
    lut_flat = lut.transpose(1, 0, 2).reshape(h * 3, w)  # (H*3, W)
    a = wx @ lut_flat.T  # (P, H*3)
    a = a.reshape(-1, h, 3)
    out = jnp.sum(a * wy[:, :, None], axis=1)  # (P, 3)
    return out.reshape(shape + (3,))


@functools.partial(jax.jit, static_argnames=("settings", "size", "samples"))
@jax.named_scope("sky.lut")
def bake_sky_lut(sun_direction, sun_strength_exposed, multiscatter_lut,
                 settings: AtmosphereSettings = AtmosphereSettings(),
                 size=SKY_LUT_SIZE, samples: int = 30):
    """skyLut.comp — per-frame sky radiance LUT (3, H, W).

    Single-scatter march with Rayleigh + Cornette-Shanks Mie phases, analytic
    earth-shadow, plus the multiscatter LUT contribution. TPU-shaped: the
    march is fully vectorized over (texel, step) with exclusive-cumsum
    optical depth replacing the sequential absorption recurrence, sun
    transmittance by quadrature, and the multiscatter lookup via
    bilinear_lookup_matmul — zero per-element gathers anywhere.
    """
    s = settings
    h_count, w_count = size
    x = (jnp.arange(w_count, dtype=jnp.float32)) / w_count
    y = (jnp.arange(h_count, dtype=jnp.float32)) / h_count
    xg, yg = jnp.meshgrid(x, y, indexing="xy")
    v = _from_sky_lut_uv(jnp.stack([xg, yg], axis=-1))  # (H, W, 3)

    bias = 0.002
    p0 = jnp.asarray([0.0, -s.earth_radius - bias, 0.0], jnp.float32)
    p = jnp.broadcast_to(p0, v.shape)
    dist, _ = _ray_earth_intersection(p, v, s)
    step = dist / samples  # (H, W)

    sun_l = jnp.asarray(sun_direction, jnp.float32)
    vol = jnp.sum(v * sun_l, axis=-1)
    ph_r = _phase_rayleigh(vol)[..., None, None]
    ph_m = _phase_cornette_shanks(
        vol, s.mie_scattering_exponent)[..., None, None]

    # all march positions at once: (H, W, S, 3)
    ts = jnp.arange(1, samples + 1, dtype=jnp.float32)
    pos = p[..., None, :] + v[..., None, :] * (
        ts[None, None, :, None] * step[..., None, None])
    height = jnp.maximum(jnp.linalg.norm(pos, axis=-1) - s.earth_radius, 0.0)
    up = pos / jnp.maximum(jnp.linalg.norm(pos, axis=-1, keepdims=True), 1e-6)

    transmission = _sun_transmittance(pos, sun_l, s, samples=10)  # (H,W,S,3)
    # analytic earth-shadow ray (skyLut.comp:25-35)
    lp = -pos
    t_ca = jnp.sum(lp * sun_l, axis=-1)
    d2 = jnp.sum(lp * lp, axis=-1) - t_ca * t_ca
    under = s.earth_radius ** 2 - d2
    t_earth = t_ca - jnp.sqrt(jnp.maximum(under, 0.0))
    lit = jnp.where((under >= 0) & (t_earth > 0), 0.0, 1.0)[..., None]
    incoming = sun_strength_exposed * transmission * lit

    scat_r, scat_m, ext = _coefficients(height, s)
    step_e = step[..., None, None]
    # exclusive prefix of optical depth == absorption before each segment
    od = ext * step_e
    od_before = jnp.cumsum(od, axis=-2) - od
    absorption = jnp.exp(-od_before)

    inscatter = scat_r * incoming * ph_r + scat_m * incoming * ph_m
    integral = integrate_inscattering(inscatter, ext, step_e)

    up_dot_l = jnp.sum(up * sun_l, axis=-1)
    ms = bilinear_lookup_matmul(
        multiscatter_lut,
        jnp.clip(height / s.atmosphere_height, 0.0, 1.0),
        jnp.clip(up_dot_l * 0.5 + 0.5, 0.0, 1.0),
    )
    # NOTE: the reference multiplies the multiscatter term by the SUN
    # transmittance, not the view-path absorption (skyLut.comp:96); kept
    # as-is for image parity.
    color = jnp.sum(
        integral * absorption
        + ms * incoming * (scat_r + scat_m) * step_e * transmission,
        axis=-2,
    )
    return jnp.moveaxis(color, -1, 0)


def sample_transmission_towards_sun(transmission_lut, sun_direction):
    """preExposeLights.comp:88-89 — sun color = transmission at ground level
    towards the sun: lutUV = (0, -sunDir.y * 0.5 + 0.5)."""
    h = transmission_lut.shape[1]
    uy = jnp.clip((-sun_direction[1] * 0.5 + 0.5), 0.0, 1.0) * (h - 1)
    y0 = jnp.floor(uy).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    f = uy - y0
    return transmission_lut[:, y0, 0] * (1 - f) + transmission_lut[:, y1, 0] * f


def view_directions(width, height, cam_forward, cam_up, cam_right,
                    tan_fov_half, aspect, grid_w=None, grid_h=None,
                    ndc_y_scale=None, ndc_y_offset=None):
    """screenToWorld.inc:4-9 — per-pixel (or coarse-grid) view directions.

    Note the reference's sign conventions: V = -forward + tanFov*(ndc.y*up -
    aspect*ndc.x*right), i.e. V points from the scene TOWARDS the camera; the
    sky pass uses the opposite (pixel ray). Here we return the pixel ray
    direction (camera -> scene): d = forward + tanFov*(aspect*ndc.x*right -
    ndc.y*up)... adjusted for the y-down NDC.

    Returns CHANNEL-PLANAR (3, H, W) — channel-minor layouts are ~10x
    slower on the TPU VPU (3-wide minor axis wastes the 128-lane registers).
    """
    gw = grid_w or width
    gh = grid_h or height
    xs = (jnp.arange(gw, dtype=jnp.float32) + 0.5) / gw * 2.0 - 1.0
    ys = (jnp.arange(gh, dtype=jnp.float32) + 0.5) / gh * 2.0 - 1.0
    if ndc_y_scale is not None:
        # split-frame band: map band-local ndc y to the full-frame frustum
        ys = (ys - ndc_y_offset) / ndc_y_scale
    ndc_x = jnp.broadcast_to(xs[None, :], (gh, gw))
    ndc_y = jnp.broadcast_to(ys[:, None], (gh, gw))
    f = jnp.asarray(cam_forward, jnp.float32)
    u = jnp.asarray(cam_up, jnp.float32)
    r = jnp.asarray(cam_right, jnp.float32)
    # NOTE the -y: ray = forward + tan*(aspect*x*right - y*up)
    # (screenToWorld.inc:4-9). Verified against the projection matrix: a
    # ray built for screen row r must project back to that row's ndc_y
    # (with +y the sky/fog grids were vertically mirrored vs the raster).
    d = jnp.stack([
        f[c] + tan_fov_half * aspect * ndc_x * r[c]
        - tan_fov_half * ndc_y * u[c]
        for c in range(3)])
    return d * jax.lax.rsqrt(
        jnp.sum(d * d, axis=0, keepdims=True))


SUN_DIAMETER_DEG = 0.535  # Sky.cpp:243


@jax.named_scope("sky.apply")
def apply_sky(color, depth_valid, sky_lut, transmission_lut, view_dirs_full,
              sun_direction, sun_strength_exposed, coarse_factor: int = 8):
    """Composite sky radiance + sun disc into sky pixels.

    color (3, H, W); depth_valid (H, W) bool (geometry coverage);
    view_dirs_full (3, H, W) CHANNEL-PLANAR (an (H, W, 3) layout puts the
    3-wide axis on the 128-lane minor dim and runs ~10x slower on TPU).
    Sky LUT is sampled at 1/coarse_factor resolution and bilinearly
    upsampled (smooth in direction); the sun disc is analytic at full
    resolution (sunSprite.frag parity).
    """
    _, h, w = color.shape
    from ..utils.stencil import point_downsample

    # point_downsample, not a strided slice: XLA canonicalizes fused strided
    # slices into index-vector gathers inside the frame program
    dirs_coarse = jnp.moveaxis(
        point_downsample(view_dirs_full, coarse_factor, coarse_factor),
        0, -1)
    uv = _to_sky_lut_uv(dirs_coarse)
    # wrap-pad the LUT in x so the gather-free bilinear handles the seam
    # wrapped width lw+1 makes u*(W-1) == u*lw: u=1 lands on the seam copy
    lut_wrapped = jnp.concatenate([sky_lut, sky_lut[:, :, :1]], axis=2)
    sky_coarse = bilinear_lookup_matmul(
        lut_wrapped,
        jnp.mod(uv[..., 0], 1.0),
        jnp.clip(uv[..., 1], 0.005, 0.995),
    )
    sky_full = jax.image.resize(jnp.moveaxis(sky_coarse, -1, 0), (3, h, w),
                                method="bilinear")

    # analytic sun disc with limb darkening (sunSprite.frag), all planar
    sun_l = jnp.asarray(sun_direction, jnp.float32)
    cos_to_sun = (view_dirs_full[0] * sun_l[0] + view_dirs_full[1] * sun_l[1]
                  + view_dirs_full[2] * sun_l[2])
    sun_radius = jnp.deg2rad(SUN_DIAMETER_DEG) * 0.5
    angle = jnp.arccos(jnp.clip(cos_to_sun, -1.0, 1.0))
    dist2 = jnp.clip((angle / sun_radius) ** 2, 0.0, 1.0)
    in_disc = (angle < sun_radius) & (view_dirs_full[1] < 0.35)
    sun_color = sample_transmission_towards_sun(transmission_lut, sun_l)
    mu = jnp.sqrt(jnp.maximum(1.0 - dist2, 0.0))
    limb_coeff = (0.482, 0.511, 0.643)  # sunSprite.frag:23-31
    alpha = (1.0 - dist2) ** 2
    mu_safe = jnp.maximum(mu, 1e-6)
    sun_contrib = jnp.stack([
        jnp.power(mu_safe, limb_coeff[c]) * sun_color[c]
        * sun_strength_exposed * alpha
        for c in range(3)])
    sky_full = sky_full + jnp.where(in_disc[None], sun_contrib, 0.0)

    return jnp.where(depth_valid[None], color, sky_full)
