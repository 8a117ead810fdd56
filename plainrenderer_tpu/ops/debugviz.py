"""Debug visualizations (sdfDebugVisualisation.comp + cascade colors).

Parity with the reference's debug tooling:
  - SDF visualisation modes (SDFGI.h:9, sdfDebugVisualisation.comp:104-133):
      1 = lit SDF (albedo * (ambient 0.15 + sun * NoL)), sky on miss
      2 = trace-window occupancy — the reference shows per-tile culled
          instance counts (sdfCulling); this architecture has no instance
          lists (global composited volume, ops/sdf_scene.py), so mode 2
          shows the fraction of each 16x128 tile's rays that LEFT the 32^3
          brick trace window — the quantity that bounds the GI kernel's
          window approximation (red = whole tile escapes)
      3 = hit normals * 0.5 + 0.5
      4 = raymarch step count / 128 (sdfDebugVisualisation.comp:126)
  - sun-cascade debug colors (sunShadowCascades.inc:23-31): red/green/
    blue/yellow tint by per-pixel cascade index.

The debug tracer is plain XLA at quarter resolution (gather-based point
sampling of the dense SDF volume) — it is a tool, not a hot path; the dense
volume is decoded from the brick pools on the fly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .sdfgi import BRICK, _SDF_SCALE


def unpack_sdf_volume(bricks, dims):
    """Inverse of sdfgi.quantize_sdf_volume: (NB, 8, 128) i32 -> (D, H, W)
    voxel-unit distances (multiply by voxel_size for world units)."""
    d, h, w = (int(x) for x in dims)
    nbz, nby, nbx = d // BRICK, h // BRICK, w // BRICK
    b = bricks.reshape(nbz, nby, nbx, BRICK, BRICK, BRICK // 4)
    b = b.transpose(0, 3, 1, 4, 2, 5)  # (nbz, lz, nby, ly, nbx, wx)
    words = b.reshape(d, h, w // 4)
    vals = jnp.stack([(words >> (8 * i)) & 0xFF for i in range(4)], axis=-1)
    vals = jnp.where(vals > 127, vals - 256, vals).astype(jnp.float32)
    return vals.reshape(d, h, w) / _SDF_SCALE


def unpack_albedo_volume(bricks, dims):
    """Inverse of sdfgi.pack_albedo_volume -> (3, D, H, W) f32."""
    d, h, w = (int(x) for x in dims)
    nbz, nby, nbx = d // BRICK, h // BRICK, w // BRICK
    b = bricks.reshape(nbz, nby, nbx, BRICK, BRICK, BRICK)
    words = b.transpose(0, 3, 1, 4, 2, 5).reshape(d, h, w)
    return jnp.stack([
        ((words >> (8 * c)) & 0xFF).astype(jnp.float32) / 255.0
        for c in range(3)])


def _sample(volume, x, y, z):
    """Point-sample (D, H, W) at voxel coords (clamped); x/y/z any shape."""
    d, h, w = volume.shape
    xi = jnp.clip(x.astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(y.astype(jnp.int32), 0, h - 1)
    zi = jnp.clip(z.astype(jnp.int32), 0, d - 1)
    return volume[zi, yi, xi]


def trace_primary(volume, origin_world, dirs, volume_origin, voxel,
                  steps: int = 96, t_max: float = 100.0):
    """Sphere-trace camera rays through the dense SDF volume.

    dirs (3, H, W) unit; returns dict with t, hit (bool), steps (f32),
    hit position (3, H, W) and normal (3, H, W)."""
    ox = (origin_world[0] - volume_origin[0]) / voxel
    oy = (origin_world[1] - volume_origin[1]) / voxel
    oz = (origin_world[2] - volume_origin[2]) / voxel

    shape = dirs.shape[1:]
    t = jnp.zeros(shape, jnp.float32)
    hit = jnp.zeros(shape, jnp.bool_)
    nsteps = jnp.zeros(shape, jnp.float32)
    threshold = 0.43  # voxel units (SDF.inc:131 analog)
    t_max_vox = t_max / voxel

    def body(i, carry):
        t, hit, nsteps = carry
        px = ox + dirs[0] * t
        py = oy + dirs[1] * t
        pz = oz + dirs[2] * t
        dist = _sample(volume, px, py, pz)
        new_hit = ~hit & (dist < threshold) & (t > 0)
        hit = hit | new_hit
        alive = ~hit & (t < t_max_vox)
        t = jnp.where(alive, t + jnp.maximum(jnp.abs(dist), 0.5), t)
        nsteps = nsteps + alive.astype(jnp.float32)
        return t, hit, nsteps

    t, hit, nsteps = jax.lax.fori_loop(0, steps, body, (t, hit, nsteps))

    hx = ox + dirs[0] * t
    hy = oy + dirs[1] * t
    hz = oz + dirs[2] * t
    eps = 1.0
    nx = _sample(volume, hx + eps, hy, hz) - _sample(volume, hx - eps, hy, hz)
    ny = _sample(volume, hx, hy + eps, hz) - _sample(volume, hx, hy - eps, hz)
    nz = _sample(volume, hx, hy, hz + eps) - _sample(volume, hx, hy, hz - eps)
    inv = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-12))
    normal = jnp.stack([nx * inv, ny * inv, nz * inv])
    hit_pos = jnp.stack([hx, hy, hz])  # voxel coords
    return {"t": t * voxel, "hit": hit, "steps": nsteps,
            "hit_voxel": hit_pos, "normal": normal}


def sdf_debug_image(mode: int, scene: dict, cam, sky_lut, transmission_lut,
                    sun_dir, sun_color, sun_strength,
                    width: int, height: int,
                    tan_fov_half: float, aspect: float,
                    quarter: int = 2, steps: int = 96):
    """(3, H, W) debug color in [0, ~1] for SDF visualisation modes 1-4."""
    from . import sky as sky_ops

    dims = scene["sdf_shape"].shape[:3]  # static (the zero-byte token)
    volume = unpack_sdf_volume(scene["sdf_volume"], dims)
    albedo = unpack_albedo_volume(scene["sdf_albedo"], dims)
    voxel = scene["sdf_voxel_size"]
    origin = scene["sdf_origin"]

    h, w = height // quarter, width // quarter
    dirs = sky_ops.view_directions(w, h, cam["forward"], cam["up"],
                                   cam["right"], tan_fov_half, aspect)
    res = trace_primary(volume, cam["position"], dirs, origin, voxel,
                        steps=steps)
    hit = res["hit"]

    if mode == 3:
        color = jnp.where(hit[None], res["normal"] * 0.5 + 0.5, 0.0)
    elif mode == 4:
        color = jnp.broadcast_to((res["steps"] / 128.0)[None], (3, h, w))
    elif mode == 2:
        # per-16x128-tile fraction of rays escaping one 32^3 trace window
        # around the tile-mean hit point (GI window-approximation monitor)
        from .raster import TILE_H, TILE_W

        th, tw = max(h // TILE_H, 1), max(w // TILE_W, 1)
        hv = res["hit_voxel"][:, :th * TILE_H, :tw * TILE_W]
        hit_c = hit[:th * TILE_H, :tw * TILE_W]
        tiles = hv.reshape(3, th, TILE_H, tw, TILE_W)
        mask = hit_c.reshape(th, TILE_H, tw, TILE_W).astype(jnp.float32)
        cnt = jnp.maximum(mask.sum(axis=(1, 3)), 1.0)
        mean = (tiles * mask[None]).sum(axis=(2, 4)) / cnt[None]
        span = jnp.abs(tiles - mean[:, :, None, :, None])
        escaped = (jnp.max(span, axis=0) > 16.0).astype(jnp.float32) * mask
        frac = escaped.sum(axis=(1, 3)) / cnt  # (th, tw)
        fimg = jnp.repeat(jnp.repeat(frac, TILE_H, 0), TILE_W, 1)
        fimg = jnp.pad(fimg, ((0, h - fimg.shape[0]), (0, w - fimg.shape[1])))
        red = (fimg >= 1.0).astype(jnp.float32)
        color = jnp.stack([jnp.maximum(fimg, red), fimg * (1 - red),
                           fimg * (1 - red)])
    else:  # mode 1: lit SDF
        alb = jnp.stack([
            _sample(albedo[c], res["hit_voxel"][0], res["hit_voxel"][1],
                    res["hit_voxel"][2]) for c in range(3)])
        nol = jnp.clip(
            res["normal"][0] * sun_dir[0] + res["normal"][1] * sun_dir[1]
            + res["normal"][2] * sun_dir[2], 0.0, 1.0)
        lit = alb * (0.15 + nol[None] * sun_strength
                     * jnp.reshape(sun_color, (3, 1, 1)))
        color = jnp.where(hit[None], lit, 0.0)

    # sky on miss (modes 1, 3, 4; mode 2 draws everywhere like the ref)
    if mode != 2:
        sky_col = sky_ops.apply_sky(
            jnp.zeros((3, h, w)), hit, sky_lut,
            transmission_lut, dirs, sun_dir, sun_strength)
        color = jnp.where(hit[None], color, sky_col)

    return jax.image.resize(color, (3, height, width), method="nearest")


CASCADE_DEBUG_COLORS = ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0),
                        (0.0, 0.0, 1.0), (1.0, 1.0, 0.0))


def cascade_debug_tint(hdr, cascade_idx, cascade_count: int):
    """sunShadowCascades.inc:23-31 — tint lit color by cascade index."""
    tint = jnp.zeros_like(hdr)
    for c in range(cascade_count):
        col = jnp.asarray(CASCADE_DEBUG_COLORS[c], jnp.float32)
        sel = (cascade_idx == c)[None]
        tint = jnp.where(sel, col.reshape(3, 1, 1), tint)
    return hdr * (0.5 + 0.5 * tint)


@jax.named_scope("debug.aabb_lines")
def aabb_line_overlay(image_u8, bb_min, bb_max, view_proj,
                      width: int, height: int,
                      color=(255, 255, 0), samples_per_edge: int = 256):
    """Draw object AABB wireframes over the tonemapped image.

    Parity: debug geometry pass (resources/shaders/debug.vert +
    RenderFrontend.cpp:947-956 drawBoundingBoxes) — the reference renders
    GL_LINES through a dedicated pipeline; fixed-function line raster has no
    TPU analog, so each of the 12 box edges is point-sampled at
    `samples_per_edge` positions, projected, and scattered into the frame
    (a debug tool, not a hot path — scatters are acceptable here).

    image_u8 (H, W, 3) u8; bb_min/bb_max (O, 3); view_proj (4, 4).
    """
    o = bb_min.shape[0]
    lo, hi = bb_min, bb_max
    # 8 corners per object: bit c selects min/max per axis
    corners = jnp.stack([
        jnp.stack([jnp.where((c >> a) & 1, hi[:, a], lo[:, a])
                   for a in range(3)], axis=-1)
        for c in range(8)], axis=1)  # (O, 8, 3)
    edge_ids = jnp.asarray(
        [(0, 1), (0, 2), (0, 4), (1, 3), (1, 5), (2, 3), (2, 6), (3, 7),
         (4, 5), (4, 6), (5, 7), (6, 7)], jnp.int32)  # cube edge corner ids
    p0 = corners[:, edge_ids[:, 0]].reshape(-1, 3)  # (O*12, 3)
    p1 = corners[:, edge_ids[:, 1]].reshape(-1, 3)
    t = (jnp.arange(samples_per_edge, dtype=jnp.float32) + 0.5) \
        / samples_per_edge
    pts = p0[:, None] + (p1 - p0)[:, None] * t[:, None]  # (E, S, 3)
    pts = pts.reshape(-1, 3)
    clip = pts @ view_proj[:3, :3].T + view_proj[:3, 3]
    w = pts @ view_proj[3, :3] + view_proj[3, 3]
    okw = w > 1e-6
    ndc = clip[:, :2] / jnp.where(okw[:, None], w[:, None], 1.0)
    px = ((ndc[:, 0] * 0.5 + 0.5) * width).astype(jnp.int32)
    py = ((ndc[:, 1] * 0.5 + 0.5) * height).astype(jnp.int32)
    ok = (okw & (px >= 0) & (px < width) & (py >= 0) & (py < height))
    # clamp & redirect rejected points to pixel (0,0) with a zero write
    px = jnp.where(ok, px, 0)
    py = jnp.where(ok, py, 0)
    col = jnp.asarray(color, jnp.uint8)
    mask = jnp.zeros((height, width), jnp.uint8)
    mask = mask.at[py, px].max(jnp.where(ok, jnp.uint8(1), jnp.uint8(0)))
    return jnp.where(mask[..., None] > 0, col, image_u8)
