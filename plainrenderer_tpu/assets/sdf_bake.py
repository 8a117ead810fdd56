"""Per-mesh signed-distance-field baking.

Capability parity with AssetPipeline/SceneSDF.cpp, redesigned for dense
vector hardware:

  reference (CPU, per voxel):  225 spherical rays x uniform-grid DDA; sign =
      backface-hit majority (SceneSDF.cpp:345-499); no-hit fallback = exact
      point-triangle distance (:55-95, :501-504).
  this implementation:         exact point-to-triangle distance for EVERY
      voxel (the quantity the ray casting approximates), sign via the
      generalized winding number (van Oosterom-Strackee solid angles),
      thresholded at 0.5 like the reference's backface-majority heuristic.
      Both are dense voxel x triangle computations -> regular, vectorizable,
      and runnable on the TPU itself via jit (the asset pipeline offloads to
      the same chip the renderer uses).

Output contract matches the reference exactly:
  - resolution per axis: nextPow2(extent / 0.25m) clamped to [16, 64]
    (SceneSDF.cpp:120-131), computed from the UNPADDED mesh AABB;
  - volume domain: AABB padded by 7.5% / min 0.5m (sdfUtilities.cpp:5-18);
  - voxel centers: ((idx + 0.5)/res - 0.5) * extent + center
    (SceneSDF.cpp volumeIndexToCellCenter);
  - layout: x-fastest ("index = x + y*rx + z*rx*ry"), f16 distances, negative
    inside (SceneSDF.cpp:495-508); array shape here is (rz, ry, rx).
"""

from __future__ import annotations

import numpy as np

from ..scene.aabb import pad_sdf_bounding_box

MAX_SDF_RES = 64
MIN_SDF_RES = 16
TARGET_TEXEL_PER_METER = 0.25


def next_power_of_two(x: int) -> int:
    """SceneSDF.cpp:42-52."""
    if x <= 1:
        return 1
    return 1 << (int(x - 1).bit_length())


def sdf_resolution_for_aabb(bb_min, bb_max) -> tuple[int, int, int]:
    """SceneSDF.cpp:120-131 — per-axis nextPow2(extent/0.25) in [16, 64]."""
    extent = np.asarray(bb_max, np.float64) - np.asarray(bb_min, np.float64)
    res = []
    for component in range(3):
        target = extent[component] / TARGET_TEXEL_PER_METER
        r = next_power_of_two(int(target))
        res.append(int(np.clip(r, MIN_SDF_RES, MAX_SDF_RES)))
    return tuple(res)


def _voxel_centers(resolution, bb_min, bb_max):
    """Voxel centers over the padded volume, shape (rz*ry*rx, 3), x-fastest."""
    rx, ry, rz = resolution
    bb_min = np.asarray(bb_min, np.float32)
    bb_max = np.asarray(bb_max, np.float32)
    extent = bb_max - bb_min
    center = 0.5 * (bb_min + bb_max)
    xs = (np.arange(rx, dtype=np.float32) + 0.5) / rx - 0.5
    ys = (np.arange(ry, dtype=np.float32) + 0.5) / ry - 0.5
    zs = (np.arange(rz, dtype=np.float32) + 0.5) / rz - 0.5
    zz, yy, xx = np.meshgrid(zs, ys, xs, indexing="ij")
    pts = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3)
    return pts * extent + center


def _chunked_sdf(points, v0, v1, v2, jnp):
    """Signed distance of (P, 3) points to the triangle soup, chunked.

    jnp is either numpy or jax.numpy — identical math either way.
    """
    n_tri = v0.shape[0]
    # chunk so the (P_c, T) intermediates stay ~tens of MB
    chunk = max(64, int(2 ** 24 // max(n_tri, 1)))
    outs = []
    for start in range(0, points.shape[0], chunk):
        p = points[start:start + chunk]
        outs.append(_sdf_block(p, v0, v1, v2, jnp))
    return np.concatenate([np.asarray(o) for o in outs], axis=0)


def _dot(a, b):
    return (a * b).sum(-1)


def _sdf_block(p, a, b, c, jnp):
    """Exact signed distance for a block of points (iquilezles distance +
    winding-number sign). p: (P, 3); a/b/c: (T, 3). Returns (P,)."""
    p = p[:, None, :]  # (P, 1, 3)
    a = a[None, :, :]
    b = b[None, :, :]
    c = c[None, :, :]

    ba = b - a
    cb = c - b
    ac = a - c
    pa = p - a
    pb = p - b
    pc = p - c
    nor = jnp.cross(ba, ac)

    # edge-region test (same structure as SceneSDF.cpp:55-95)
    s1 = jnp.sign(_dot(jnp.cross(ba, nor), pa))
    s2 = jnp.sign(_dot(jnp.cross(cb, nor), pb))
    s3 = jnp.sign(_dot(jnp.cross(ac, nor), pc))
    outside_edge = (s1 + s2 + s3) < 2.0

    def seg_dist2(edge, rel):
        t = jnp.clip(_dot(rel, edge) / jnp.maximum(_dot(edge, edge), 1e-20), 0.0, 1.0)
        d = rel - edge * t[..., None]
        return _dot(d, d)

    d_edge = jnp.minimum(
        jnp.minimum(seg_dist2(ba, pa), seg_dist2(cb, pb)), seg_dist2(ac, pc)
    )
    d_face = _dot(nor, pa) ** 2 / jnp.maximum(_dot(nor, nor), 1e-20)
    d2 = jnp.where(outside_edge, d_edge, d_face)  # (P, T)
    unsigned = jnp.sqrt(jnp.maximum(d2.min(axis=1), 0.0))

    # generalized winding number (sign): sum of signed solid angles / 4pi
    ra, rb, rc = a - p, b - p, c - p
    la = jnp.sqrt(jnp.maximum(_dot(ra, ra), 1e-30))
    lb = jnp.sqrt(jnp.maximum(_dot(rb, rb), 1e-30))
    lc = jnp.sqrt(jnp.maximum(_dot(rc, rc), 1e-30))
    num = _dot(ra, jnp.cross(rb, rc))
    den = (
        la * lb * lc
        + _dot(ra, rb) * lc
        + _dot(rb, rc) * la
        + _dot(rc, ra) * lb
    )
    omega = 2.0 * jnp.arctan2(num, den)
    winding = omega.sum(axis=1) / (4.0 * jnp.pi)
    # reference sign rule: majority backface hits -> inside (SceneSDF.cpp:495-499)
    inside = jnp.abs(winding) > 0.5
    return jnp.where(inside, -unsigned, unsigned)


def bake_mesh_sdf(positions: np.ndarray, indices: np.ndarray,
                  bb_min=None, bb_max=None, resolution=None,
                  use_jax: bool = False,
                  use_native: bool | None = None) -> np.ndarray:
    """Bake one mesh's SDF volume. Returns (rz, ry, rx) float32.

    positions: (V, 3) f32; indices: (I,) or (I/3, 3) int. bb_min/bb_max
    default to the mesh AABB (the UNPADDED box, as in SceneSDF.cpp:115-118;
    padding happens internally).

    use_native=None (auto) uses the C++ baker (native/sdf_bake.cc:
    grid-pruned exact distances, hierarchical winding sign) when it builds
    on this machine — it bakes Sponza-class meshes at full resolution,
    which the dense numpy evaluation cannot. The numpy/jax paths remain
    the portable reference implementation. Native distances are clamped
    at the pruning radius (far past the trace/composite s8 clamp, which
    caps at ~16 voxels — see ops/sdfgi._SDF_SCALE).
    """
    positions = np.asarray(positions, np.float32)
    tri = np.asarray(indices).reshape(-1, 3).astype(np.int64)
    if bb_min is None:
        bb_min = positions.min(axis=0)
        bb_max = positions.max(axis=0)
    if resolution is None:
        resolution = sdf_resolution_for_aabb(bb_min, bb_max)
    rx, ry, rz = resolution

    pad_min, pad_max = pad_sdf_bounding_box(bb_min, bb_max)
    pad_min = np.asarray(pad_min, np.float32)
    pad_max = np.asarray(pad_max, np.float32)

    if use_native is None:
        use_native = not use_jax
    if use_native:
        from ..native import bake_sdf_native

        # prune radius: generous multiple of the largest voxel (the s8
        # quantization used by the composite/trace clamps at 15.9 voxels)
        ext = pad_max - pad_min
        vox_max = float((ext / np.asarray([rx, ry, rz])).max())
        out = bake_sdf_native(positions, tri, pad_min, pad_max,
                              (rx, ry, rz), max_dist=32.0 * vox_max)
        if out is not None:
            return out

    points = _voxel_centers(resolution, pad_min, pad_max)
    v0 = positions[tri[:, 0]]
    v1 = positions[tri[:, 1]]
    v2 = positions[tri[:, 2]]

    if use_jax:
        import jax.numpy as jnp_mod
        sd = _chunked_sdf(points, jnp_mod.asarray(v0), jnp_mod.asarray(v1),
                          jnp_mod.asarray(v2), jnp_mod)
    else:
        sd = _chunked_sdf(points, v0, v1, v2, np)
    return np.asarray(sd, np.float32).reshape(rz, ry, rx)
