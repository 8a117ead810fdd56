"""TPU-native triangle rasterization (visibility + G-buffer).

Replaces the reference's Vulkan raster passes (depthPrepass.vert/.frag,
sunShadow.vert/.frag, triangle.vert and the fixed-function rasterizer) with a
three-stage, fully data-parallel design chosen for TPU hardware:

  1. geometry stage (dense jnp, MXU): pre-instanced per-corner arrays are
     transformed by the view-projection matrix; per-triangle edge functions,
     a screen-affine reverse-Z plane and perspective-correct attribute planes
     are computed with zero gathers (corners are stored unindexed).
  2. binning (jnp): per-triangle fine-tile (16x128 px) coverage is expanded
     EXACTLY into (tile, triangle) pairs (sort-based searchsorted over the
     cumulative span counts), ordered by ONE packed-key lax.sort (the TPU
     radix sort; ~2 ms/M keys measured on v5e), then re-gathered into
     GROUP-aligned per-tile segments because the DMA engine requires
     lane-aligned slice offsets. Per-triangle setups are duplicated into
     pair order with a contiguous-row take.
  3. raster kernel (Pallas): one program per 16x128 tile streams its
     contiguous pair-setup slice from HBM with double-buffered DMA, evaluates
     128 triangles x 2048 pixels per jax.lax.dot_general on the MXU
     (edge/depth evaluation IS a matmul: [coeff 4 x 128 pairs]^T [4 x 2048
     pixel basis] per plane), and resolves visibility with a single integer
     max by packing the pair slot into the low mantissa bits of the
     reverse-Z f32 depth. The G-buffer pass then selects each pixel's
     winning attribute plane coefficients with jnp.take_along_axis along
     lanes (the TPU's fast in-register gather) and evaluates them per pixel.

Reverse-Z, GreaterEqual compares, and Vulkan NDC conventions match the
reference exactly (Camera.cpp:14-27; depth tests at RenderFrontend.cpp:1574,
1726). Near-plane-crossing triangles rasterize their visible region exactly
(2D-homogeneous edge setup + the z <= 1 kernel test) — no geometric clipper
needed (fixed-function Vulkan clipping parity without data-dependent
triangle counts).

Alpha test (depthPrepass.frag:28-31, sunShadow.frag): alpha-tested
materials carry a 64x64 binary mask (assets/textures.build_alpha_mask);
when a scene has any, the edge table grows from 4 to 8 planes per triangle
(u/w, v/w, 1/w and the mask-slot id as a constant plane) and the
visibility loop — gated per pair-group on "any alpha-tested pair", so
opaque-only groups pay nothing — evaluates perspective-correct UVs and
cuts coverage where the mask bit is 0. The mask word lookup is ONE
single-vreg lane gather per 128-pixel block (jnp.take_along_axis on a
(GROUP, 128) table — Mosaic's fast in-register shuffle; wider tables hit
'multiple source vregs along gather dimension'), which is why masks are
capped at 64x64 = 128 words. The reference samples the real albedo
alpha with hardware mips; a 64x64 nearest-with-wrap mask is the
documented approximation (binarized at the same 0.5 cutoff).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 16
TILE_W = 128
PX_PER_TILE = TILE_H * TILE_W  # 2048
GROUP = 128  # pairs per DMA + MXU step; 128 satisfies DMA lane alignment
EVAL_WIDTH = 32  # pairs per VPU eval slice (sublane window of a DMA chunk)
SLOT_BITS = 11  # pair-slot bits packed into the depth mantissa
SLOT_MASK = (1 << SLOT_BITS) - 1
MAX_PAIRS_PER_TILE = 1 << SLOT_BITS
NATTR = 30  # attribute-plane rows per triangle (10 planes x 3 coeffs):
#   1/w, u/w, v/w, normal xyz, tangent xyz, material+handedness const.
#   Bitangents are NOT interpolated: B = handedness * cross(N, T) per pixel
#   (the corner bitangent's only degree of freedom vs cross(N, T) is its
#   sign; reconstruction halves the vec3 plane count). Previous-frame clip
#   planes (+9 rows, NATTR_PREV) exist only for dynamic scenes — a static
#   scene's motion vectors come EXACTLY from reprojecting the depth-derived
#   world position with the previous view-projection (same surface point,
#   same matrix; the per-vertex path only differs when objects move).
NATTR_PREV = NATTR + 9

def pad_resolution(width: int, height: int) -> tuple[int, int]:
    """Framebuffer padded so tiles divide it exactly."""
    w = (width + TILE_W - 1) // TILE_W * TILE_W
    h = (height + TILE_H - 1) // TILE_H * TILE_H
    return w, h


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TriangleSetup:
    """Per-triangle raster state (all dense, (T,)-leading)."""

    edges: jnp.ndarray  # (3, 4|8, T) f32: [coeff a/b/c][plane][tri];
    #   planes = e0, e1, e2, z (+ u/w, v/w, 1/w, alpha-slot when the scene
    #   has alpha-tested materials)
    attrs: jnp.ndarray  # (NATTR, T) f32 attr-plane rows (main view only)
    tile_bbox: jnp.ndarray  # (T, 4) i32: ty0, tx0, ty1, tx1 (inclusive)
    valid: jnp.ndarray  # (T,) bool
    fine_y: jnp.ndarray  # (T, 2) i32 FINE (16px) row bbox [fy0, fy1]
    #   inclusive, independent of bin_rows; drives the depth kernels'
    #   per-group sub-block skipping (order_rows binning). (1, 0) invalid.


@jax.named_scope("raster.geometry_setup")
def geometry_setup(
    corners: jnp.ndarray,  # (T, 3, 3) world-space corner positions
    corner_uvs: jnp.ndarray,  # (T, 3, 2)
    corner_normals: jnp.ndarray,  # (T, 3, 3)
    corner_tangents: jnp.ndarray,  # (T, 3, 3)
    corner_bitangents: jnp.ndarray,  # (T, 3, 3)
    tri_material: jnp.ndarray,  # (T,) f32 material id
    tri_visible: jnp.ndarray,  # (T,) bool (object-level culling mask)
    view_proj: jnp.ndarray,  # (4, 4)
    prev_view_proj: jnp.ndarray,  # (4, 4)
    width: int,
    height: int,
    cull: str = "back",  # 'back' | 'front' | 'none'
    with_attrs: bool = True,
    near_w: float = 0.0,  # clip-w of the near plane (z_ndc == 1); 0 = off
    prev_corners: jnp.ndarray | None = None,  # dynamic objects: last frame's
    #   world-space corners for motion vectors (defaults to `corners`)
    tri_alpha_slot: jnp.ndarray | None = None,  # (T,) i32 alpha-mask slot
    #   (0 = opaque); presence turns on the 8-plane alpha-test edge table
    bin_rows: int = 1,  # 16px-rows per raster bin (the kernels' `sub`):
    #   tile_bbox y-indices are emitted in (bin_rows * TILE_H)-px units
) -> TriangleSetup:
    """Dense per-triangle setup. Mirrors the vertex-stage semantics of
    triangle.vert / depthPrepass.vert with reverse-Z viewport transform.

    Edge/attribute planes are built in 2D HOMOGENEOUS viewport space (Olano
    & Greer '97): coefficients come from cross products of (X, Y, W) vertex
    rows, never dividing by w. Triangles crossing the near plane therefore
    rasterize their visible (w > 0, z <= 1) region EXACTLY — the fixed-
    function clipper the reference relies on (Vulkan near-plane clip) has no
    TPU equivalent, and geometric clipping would make triangle count
    data-dependent (hostile to static shapes). Coverage of the clipped
    region falls out of the edge signs plus the z <= 1 test in the kernel;
    the bbox comes from the vertices in front of the near plane plus the
    edge/near-plane intersection points. Precision: plane evaluation error
    is ~f32_eps * |ndc| * width pixels (sub-1e-3 px for on-screen geometry;
    the old projected-space path was only better for geometry that needed
    no clipping at all).

    Internals are STRUCTURE-OF-ARRAYS: every intermediate is a plain (T,)
    vector (lanes-only), never a (T, 3)/(T, 9) array. The original
    tiny-minor-dim formulation made XLA:TPU both compile pathologically
    (61 s for this one function at bench sizes — layout/fusion over
    (T, 3, 3) tensors whose minor dims are all padding) and run ~20x
    slower than the same flop count on clean (T,) vectors (measured 5.5 s
    compile / 0.39 ms run for the SoA core vs 61 s / ~8 ms vmapped)."""
    t_count = corners.shape[0]
    # split to per-vertex per-component (T,) lanes ONCE; everything after
    # is pure lane math
    cx = [corners[:, v, 0] for v in range(3)]
    cy = [corners[:, v, 1] for v in range(3)]
    cz = [corners[:, v, 2] for v in range(3)]
    m = view_proj

    def project(v):
        """Homogeneous viewport coords: X/W is the vertex's screen x.
        Explicit scalar-row FMAs == the HIGHEST-precision matmul this
        replaced (f32 multiply-adds, no bf16 decomposition)."""
        xc = m[0, 0] * cx[v] + m[0, 1] * cy[v] + m[0, 2] * cz[v] + m[0, 3]
        yc = m[1, 0] * cx[v] + m[1, 1] * cy[v] + m[1, 2] * cz[v] + m[1, 3]
        zc = m[2, 0] * cx[v] + m[2, 1] * cy[v] + m[2, 2] * cz[v] + m[2, 3]
        wc = m[3, 0] * cx[v] + m[3, 1] * cy[v] + m[3, 2] * cz[v] + m[3, 3]
        return ((xc * 0.5 + 0.5 * wc) * width,  # Vulkan y-down == screen
                (yc * 0.5 + 0.5 * wc) * height, zc, wc)

    proj = [project(v) for v in range(3)]
    sx_h = [p[0] for p in proj]  # 3 x (T,)
    sy_h = [p[1] for p in proj]
    z_h = [p[2] for p in proj]
    w = [p[3] for p in proj]

    def cross3(i, j):
        a = sy_h[i] * w[j] - sy_h[j] * w[i]
        b = w[i] * sx_h[j] - sx_h[i] * w[j]
        c = sx_h[i] * sy_h[j] - sy_h[i] * sx_h[j]
        return a, b, c

    e0 = cross3(1, 2)
    e1 = cross3(2, 0)
    e2 = cross3(0, 1)
    # det = 2 * signed_screen_area * w0*w1*w2: the clip-space facing test
    # (correct sign even with vertices behind the eye)
    det = e0[0] * sx_h[0] + e0[1] * sy_h[0] + e0[2] * w[0]

    if cull == "back":
        face_ok = det > 0
    elif cull == "front":
        face_ok = det < 0
    else:
        face_ok = jnp.abs(det) > 0

    near_lim = max(near_w, 1e-9)
    # triangles entirely behind the near plane (w linear over the triangle)
    # are fully z-clipped; all-behind-eye is a subset of that
    any_front = ((w[0] >= near_lim) | (w[1] >= near_lim)
                 | (w[2] >= near_lim))
    valid = face_ok & tri_visible & any_front & (jnp.abs(det) > 1e-12)

    # orient edges so inside == all(E >= 0) for either winding (interior
    # pixels evaluate to det / w > 0 for det > 0)
    flip = jnp.where(det < 0, -1.0, 1.0)
    inv_absdet = 1.0 / jnp.where(valid, jnp.abs(det), 1.0)
    e0 = tuple(c * flip for c in e0)
    e1 = tuple(c * flip for c in e1)
    e2 = tuple(c * flip for c in e2)

    def plane(q0, q1, q2):
        """Screen-affine plane of q/w from RAW per-vertex q (M^-1 q)."""
        qa = (q0 * e0[0] + q1 * e1[0] + q2 * e2[0]) * inv_absdet
        qb = (q0 * e0[1] + q1 * e1[1] + q2 * e2[1]) * inv_absdet
        qc = (q0 * e0[2] + q1 * e1[2] + q2 * e2[2]) * inv_absdet
        return qa, qb, qc

    zp = plane(z_h[0], z_h[1], z_h[2])
    never = (jnp.zeros_like(det), jnp.zeros_like(det),
             jnp.full_like(det, -1.0))
    e0 = tuple(jnp.where(valid, c, n) for c, n in zip(e0, never))
    e1 = tuple(jnp.where(valid, c, n) for c, n in zip(e1, never))
    e2 = tuple(jnp.where(valid, c, n) for c, n in zip(e2, never))
    zp = tuple(jnp.where(valid, c, 0.0) for c in zp)

    # edges layout (3 coeffs, n_planes, T); planes 4-7 are the alpha-test
    # extension: perspective-correct UV + the mask slot as a constant plane
    # (a = b = 0) so the atlas y-shift in render/frame.py (c -= b * y_off)
    # applies uniformly to every plane
    plane_sets = [e0, e1, e2, zp]
    if tri_alpha_slot is not None:
        zero = jnp.zeros_like(det)

        def guarded(p):
            return tuple(jnp.where(valid, c, 0.0) for c in p)

        plane_sets.append(guarded(plane(
            corner_uvs[:, 0, 0], corner_uvs[:, 1, 0], corner_uvs[:, 2, 0])))
        plane_sets.append(guarded(plane(
            corner_uvs[:, 0, 1], corner_uvs[:, 1, 1], corner_uvs[:, 2, 1])))
        plane_sets.append(guarded(plane(
            jnp.ones_like(det), jnp.ones_like(det), jnp.ones_like(det))))
        slot_f = tri_alpha_slot.astype(jnp.float32)
        plane_sets.append((zero, zero, jnp.where(valid, slot_f, 0.0)))
    edges = jnp.stack(
        [jnp.stack([p[coeff] for p in plane_sets], axis=0)
         for coeff in range(3)],
        axis=0,
    ).astype(jnp.float32)

    # tile bbox over the projection of the triangle's NON-CLIPPED part:
    # vertices with w >= near_lim plus edge/near-plane intersection points.
    # near_w == 0 (orthographic views: shadow cascades, w === 1) takes the
    # plain vertex min/max — the 9-candidate near-clip machinery is ~20
    # elementwise passes over (T, 9) arrays that ortho projections never
    # need (measured several ms at shadow-atlas triangle counts)
    bin_h = TILE_H * bin_rows
    ntx = width // TILE_W
    nty = height // bin_h
    if near_w <= 0.0:
        # clamp w to tiny-positive: a behind-eye vertex (perspective caller
        # with clipping off) blows its coordinate up to +-1e12 and the
        # clipped bbox degrades to conservative full-screen, never flips
        wd = [jnp.maximum(wv, 1e-9) for wv in w]
        xs = [sx_h[v] / wd[v] for v in range(3)]
        ys = [sy_h[v] / wd[v] for v in range(3)]
        xmin = jnp.minimum(jnp.minimum(xs[0], xs[1]), xs[2])
        xmax = jnp.maximum(jnp.maximum(xs[0], xs[1]), xs[2])
        ymin = jnp.minimum(jnp.minimum(ys[0], ys[1]), ys[2])
        ymax = jnp.maximum(jnp.maximum(ys[0], ys[1]), ys[2])
    else:
        # incremental min/max over the 9 candidates, all (T,) lanes (the
        # old (T, 9) stack was part of the tiny-minor-dim compile blowup)
        big = jnp.float32(1e9)
        xmin = jnp.full_like(det, big)
        xmax = jnp.full_like(det, -big)
        ymin = jnp.full_like(det, big)
        ymax = jnp.full_like(det, -big)

        def fold(ok, px, py):
            nonlocal xmin, xmax, ymin, ymax
            xmin = jnp.minimum(xmin, jnp.where(ok, px, big))
            xmax = jnp.maximum(xmax, jnp.where(ok, px, -big))
            ymin = jnp.minimum(ymin, jnp.where(ok, py, big))
            ymax = jnp.maximum(ymax, jnp.where(ok, py, -big))

        for v in range(3):
            wd = jnp.maximum(w[v], near_lim)  # masked lanes stay finite
            fold(w[v] >= near_lim, sx_h[v] / wd, sy_h[v] / wd)
        inv_near = 1.0 / near_lim
        for i, j in ((0, 1), (1, 2), (2, 0)):
            denom = w[j] - w[i]
            t = (near_lim - w[i]) / jnp.where(
                jnp.abs(denom) > 1e-12, denom, 1.0)
            crossing = ((w[i] - near_lim) * (w[j] - near_lim)
                        < 0.0) & (jnp.abs(denom) > 1e-12)
            fold(crossing,
                 (sx_h[i] + t * (sx_h[j] - sx_h[i])) * inv_near,
                 (sy_h[i] + t * (sy_h[j] - sy_h[i])) * inv_near)
    tx0 = jnp.clip(jnp.floor(xmin / TILE_W), 0, ntx - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(xmax / TILE_W), 0, ntx - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(ymin / bin_h), 0, nty - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(ymax / bin_h), 0, nty - 1).astype(jnp.int32)
    offscreen = (xmax < 0) | (xmin >= width) | (ymax < 0) | (ymin >= height)
    valid = valid & ~offscreen
    tile_bbox = jnp.stack(
        [
            jnp.where(valid, ty0, 1),
            jnp.where(valid, tx0, 1),
            jnp.where(valid, ty1, 0),
            jnp.where(valid, tx1, 0),
        ],
        axis=1,
    )
    # fine 16px-row bbox, independent of the bin grid: the depth kernels'
    # per-group sub-block skip needs the true row extent, not the bin index
    n_fy = height // TILE_H
    fy0 = jnp.clip(jnp.floor(ymin / TILE_H), 0, n_fy - 1).astype(jnp.int32)
    fy1 = jnp.clip(jnp.floor(ymax / TILE_H), 0, n_fy - 1).astype(jnp.int32)
    fine_y = jnp.stack(
        [jnp.where(valid, fy0, 1), jnp.where(valid, fy1, 0)], axis=1)

    if not with_attrs:
        attrs = jnp.zeros((NATTR, 0), jnp.float32)
        return TriangleSetup(edges=edges, attrs=attrs, tile_bbox=tile_bbox,
                             valid=valid, fine_y=fine_y)

    # perspective-correct attribute planes: homogeneous plane() takes RAW
    # per-vertex q and yields the screen-affine q/w function directly
    rows = []

    def add_plane(q0, q1, q2):  # per-vertex (T,) values
        rows.extend(plane(q0, q1, q2))

    ones = jnp.ones_like(det)
    add_plane(ones, ones, ones)  # rows 0-2: 1/w
    add_plane(corner_uvs[:, 0, 0], corner_uvs[:, 1, 0],
              corner_uvs[:, 2, 0])  # 3-5: u/w
    add_plane(corner_uvs[:, 0, 1], corner_uvs[:, 1, 1],
              corner_uvs[:, 2, 1])  # 6-8: v/w
    for comp in range(3):  # 9-17: normal/w
        add_plane(corner_normals[:, 0, comp], corner_normals[:, 1, comp],
                  corner_normals[:, 2, comp])
    for comp in range(3):  # 18-26: tangent/w
        add_plane(corner_tangents[:, 0, comp], corner_tangents[:, 1, comp],
                  corner_tangents[:, 2, comp])
    # 27-29: material id + tangent-frame handedness as a constant plane
    # (a=b=0, c = mat * 2 + (handedness < 0)); the kernel emits it packed
    # and the consumer reconstructs B = handedness * cross(N, T)
    n0 = [corner_normals[:, 0, c] for c in range(3)]
    t0 = [corner_tangents[:, 0, c] for c in range(3)]
    b0 = [corner_bitangents[:, 0, c] for c in range(3)]
    hand_neg = (
        (n0[1] * t0[2] - n0[2] * t0[1]) * b0[0]
        + (n0[2] * t0[0] - n0[0] * t0[2]) * b0[1]
        + (n0[0] * t0[1] - n0[1] * t0[0]) * b0[2]) < 0.0
    rows.append(jnp.zeros_like(det))
    rows.append(jnp.zeros_like(det))
    rows.append(tri_material.astype(jnp.float32) * 2.0
                + hand_neg.astype(jnp.float32))

    if prev_corners is not None:
        # 30-38: previous-frame clip planes — dynamic scenes only (static
        # motion vectors reproject the depth-derived world position instead)
        pm = prev_view_proj
        px = [prev_corners[:, v, 0] for v in range(3)]
        py = [prev_corners[:, v, 1] for v in range(3)]
        pz = [prev_corners[:, v, 2] for v in range(3)]

        def prev_row(r):
            return [pm[r, 0] * px[v] + pm[r, 1] * py[v]
                    + pm[r, 2] * pz[v] + pm[r, 3] for v in range(3)]

        pcx, pcy, pcw = prev_row(0), prev_row(1), prev_row(3)
        add_plane(pcx[0], pcx[1], pcx[2])
        add_plane(pcy[0], pcy[1], pcy[2])
        add_plane(pcw[0], pcw[1], pcw[2])

    attrs = jnp.stack(rows, axis=0).astype(jnp.float32)  # (NATTR[_PREV], T)
    return TriangleSetup(edges=edges, attrs=attrs, tile_bbox=tile_bbox,
                         valid=valid, fine_y=fine_y)


# --------------------------------------------------------------------------
# binning
# --------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PairLists:
    """Sorted (tile, triangle) pair stream + per-tile ranges."""

    pair_tri: jnp.ndarray  # (P,) i32 triangle index per pair (T == dummy)
    tile_start: jnp.ndarray  # (n_tiles,) i32 raw offset into the pair stream
    tile_count: jnp.ndarray  # (n_tiles,) i32 pairs per tile (capped)
    overflow: jnp.ndarray  # () i32 diagnostic: dropped pairs/triangles


# --------------------------------------------------------------------------
# key-expansion kernel: slot -> (tile, triangle) sort key
# --------------------------------------------------------------------------

_EXPAND_CROWS = 16  # triangle-table rows (of 128) streamed per chunk
_EXPAND_SLOTS = 1024  # pair-stream slots resolved per grid step (8 x 128)


def _expand_keys_kernel(meta_ref, cum_hbm, ex_hbm, geom_hbm, key_ref,
                        own_ref, cum_buf, ex_buf, geom_buf, lo_ref, sems, *,
                        n_tiles_x, bin_rows, order_rows, order_alpha, tpv,
                        n_views, sentinel):
    """Map each pair-stream slot to its sort key by STREAMING the
    per-triangle tables through VMEM.

    Replaces the XLA owner/decode stages of build_pairs (a budget-sized
    scatter-add + cumsum + two budget-sized gathers: ~40 cycles/element on
    TPU, 46 ms/frame at bench sizes) with vector work at VMEM speed:

      owner(j) = #{t : cum[t] <= j} = the first index with cum > j, found
      by a 12-step binary search over the chunk of `cum` currently in VMEM
      (each probe is one in-register lane-gather, gatherlib.gather_rows_128).

    Slots are processed in ascending order and owners are nondecreasing in
    the slot index, so ONE forward pass of (CROWS x 128)-triangle chunks
    covers the whole table: the chunk cursor (lo_ref, persistent SMEM
    scratch — TPU grids run sequentially on the core) only ever advances,
    and a block whose remaining slots' owners lie past the current chunk
    loads the next chunk inside its while-loop. Per-slot geometry (the
    packed bbox word) and the run start cum_ex are lane-gathered from the
    same chunk window at the found index.
    """
    from . import gatherlib

    i = pl.program_id(0)
    crows = cum_buf.shape[0]
    c = crows * 128

    def load_chunk(row0):
        cps = [
            pltpu.make_async_copy(
                src.at[pl.ds(row0, crows), :], dst, sems.at[n])
            for n, (src, dst) in enumerate([
                (cum_hbm, cum_buf), (ex_hbm, ex_buf), (geom_hbm, geom_buf)])
        ]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

    @pl.when(i == 0)
    def _init():
        lo_ref[0] = 0
        load_chunk(0)

    total = meta_ref[0]
    row_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    j = i * _EXPAND_SLOTS + row_i * 128 + lane_i

    done0 = (j >= total).astype(jnp.float32)
    key0 = jnp.full((8, 128), sentinel, jnp.int32)
    own0 = jnp.zeros((8, 128), jnp.int32)

    def cond(state):
        return jnp.min(state[0]) < 0.5

    def body(state):
        done_f, key, own = state
        cum_c = cum_buf[...]
        # binary search: first chunk index with cum > j (owner, if inside)
        lo = jnp.zeros((8, 128), jnp.int32)
        hi = jnp.full((8, 128), c, jnp.int32)
        for _ in range(12):  # ceil(log2(c)) + 1 resolves any gap
            # clamp the probe to the chunk: once lo reaches c the raw mid
            # would gather row c (one past the chunk end) — benign only by
            # gather_rows_128's zero-fill; the clamp keeps probes in range
            # and preserves the invariant (cum[c-1] <= j keeps lo at c)
            mid = jnp.minimum((lo + hi) >> 1, c - 1)
            v = gatherlib.gather_rows_128(cum_c, mid)
            le = v <= j
            lo = jnp.where(le, mid + 1, lo)
            hi = jnp.where(le, hi, mid)
        li = jnp.minimum(lo, c - 1)
        resolved = (lo < c) & (done_f < 0.5)

        exv = gatherlib.gather_rows_128(ex_buf[...], li)
        g = gatherlib.gather_rows_128(geom_buf[...], li)
        owner = lo_ref[0] * 128 + li
        k = j - exv

        if order_alpha:
            ia = g & 1
            g = g >> 1
        rel0 = g & 7
        sx = jnp.maximum((g >> 3) & 127, 1)
        x0 = (g >> 10) & 127
        y0 = g >> 17
        # k // sx via f32 divide + EXACT one-step correction: TPU f32
        # divide is reciprocal-based and NOT correctly rounded (measured
        # on hardware: floor(k/sx) lands one low at some exact multiples,
        # e.g. sx=41/61/69 — tools/tpu_smoke.py sweeps this), so the
        # quotient is fixed up with two integer compares.
        kc = jnp.clip(k, 0, (1 << 23) - 1)
        dy = jnp.floor(kc.astype(jnp.float32)
                       / sx.astype(jnp.float32)).astype(jnp.int32)
        r = kc - dy * sx
        dy = dy + (r >= sx).astype(jnp.int32) - (r < 0).astype(jnp.int32)
        dx = kc - dy * sx
        tile = (y0 + dy) * n_tiles_x + x0 + dx
        if n_views > 1:
            # owner % tpv via f32 divide + the same exact fixup
            q = jnp.floor(owner.astype(jnp.float32)
                          / jnp.float32(tpv)).astype(jnp.int32)
            rq = owner - q * tpv
            q = q + (rq >= tpv).astype(jnp.int32) \
                - (rq < 0).astype(jnp.int32)
            tri_local = owner - q * tpv
        else:
            tri_local = owner
        if order_alpha:
            tile = tile * 2 + ia
        if order_rows:
            kymin = jnp.maximum(rel0 - dy * bin_rows, 0)
            key_val = (tile * bin_rows + kymin) * (tpv + 1) + tri_local
        else:
            key_val = tile * (tpv + 1) + tri_local

        key = jnp.where(resolved, key_val, key)
        own = jnp.where(resolved, owner, own)
        done_f = jnp.maximum(done_f, resolved.astype(jnp.float32))

        @pl.when(jnp.min(done_f) < 0.5)
        def _advance():
            nxt = lo_ref[0] + crows
            lo_ref[0] = nxt
            load_chunk(nxt)

        return done_f, key, own

    _, key, own = jax.lax.while_loop(cond, body, (done0, key0, own0))
    key_ref[...] = key
    # global owner per slot (dead tail lanes stay 0 — consumers mask by
    # `total`): feeds the presort row expansion (_expand_rows)
    own_ref[...] = own


def _expand_keys(cum, cum_ex, geom_packed, total, budget, *, n_tiles_x,
                 bin_rows, order_rows, order_alpha, tpv, n_views, sentinel,
                 interpret=False):
    """Pallas-expanded sort keys for build_pairs (see _expand_keys_kernel).

    Returns ((budget,) i32 keys, (budget,) i32 global owners) — keys are
    identical to the XLA owner/decode path (asserted by the
    tests/test_raster.py parity tests on both paths); owners of dead tail
    slots (j >= total) are 0 and must be masked by `total`.
    """
    t_count = cum.shape[0]
    c = _EXPAND_CROWS * 128
    tp = max((t_count + c - 1) // c * c, c) + c  # +c: advance headroom
    big = jnp.int32(0x3FFFFFFF)
    cum_p = jnp.concatenate(
        [cum, jnp.full((tp - t_count,), big, jnp.int32)]).reshape(-1, 128)
    ex_p = jnp.concatenate(
        [cum_ex, jnp.full((tp - t_count,), big, jnp.int32)]).reshape(-1, 128)
    geom_p = jnp.concatenate(
        [geom_packed, jnp.zeros((tp - t_count,), jnp.int32)]).reshape(-1, 128)
    bud = (budget + _EXPAND_SLOTS - 1) // _EXPAND_SLOTS * _EXPAND_SLOTS
    nblocks = bud // _EXPAND_SLOTS
    meta = jnp.reshape(total, (1,)).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 3,
        out_specs=[
            pl.BlockSpec((8, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((_EXPAND_CROWS, 128), jnp.int32),
            pltpu.VMEM((_EXPAND_CROWS, 128), jnp.int32),
            pltpu.VMEM((_EXPAND_CROWS, 128), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    kern = functools.partial(
        _expand_keys_kernel, n_tiles_x=n_tiles_x, bin_rows=bin_rows,
        order_rows=order_rows, order_alpha=order_alpha, tpv=tpv,
        n_views=n_views, sentinel=sentinel)
    key2d, own2d = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bud // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((bud // 128, 128), jnp.int32),
        ],
        interpret=interpret,
    )(meta, cum_p, ex_p, geom_p)
    return key2d.reshape(bud)[:budget], own2d.reshape(bud)[:budget]


_ROWS_WIN = 16  # table rows (of 128 triangles) held in VMEM per step


def _expand_rows_kernel(meta_ref, own_hbm, table_hbm, out_ref,
                        buf, lo_ref, sem, *, n_rows):
    """Presort row expansion: out[:, j] = table[:, owner(j)].

    Streams the (n_rows, T) per-triangle row table through a VMEM window
    of _ROWS_WIN x 128 triangles. Owners are nondecreasing in the slot
    index over LIVE slots (run-length expansion order), so the window only
    ever advances; a slot block whose owners span past the window resolves
    what it can, then jumps the window straight to the first unresolved
    owner's row (empty-span triangles make arbitrary forward jumps, so the
    advance is a seek, not a fixed step). Dead tail slots (j >= total)
    write 0.0 rows — their stream positions sort to the end and the raster
    kernels mask them by segment count anyway.

    This is the payload side of the sort-carried binning path (build_pairs
    carry_table): expanding BEFORE the sort keeps the gather monotone (the
    post-sort order is only piecewise monotone), and the sort then moves
    the rows as extra lax.sort operands — measured ~free at RUN time next
    to the key sort, vs ~6.5 ms/frame for the XLA pair-order row gather it
    replaces (transpose + row-gather + transpose lowering, round-5 op
    profile).

    STATUS — correct but not wired into the frame: XLA:TPU's sort COMPILE
    time scales ~12 s per operand at bench sizes (measured 17.5 s for
    key+1 payload, 96 s for key+8, 195 s for key+16), so carrying the
    frame's 16-64 row tables through its four sorts would add ~30 minutes
    of cold compile for a ~4 ms/frame win. The frame keeps the XLA gather
    (gather_pair_setups); this path stays tested
    (tests/test_raster.py::test_carry_table_matches_gather) for when the
    sort lowering improves.
    """
    from . import gatherlib

    i = pl.program_id(0)

    def load(lo):
        cp = pltpu.make_async_copy(
            table_hbm.at[:, pl.ds(lo, _ROWS_WIN), :], buf, sem)
        cp.start()
        cp.wait()

    @pl.when(i == 0)
    def _init():
        lo_ref[0] = 0
        load(0)

    total = meta_ref[0]
    row_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    j = i * _EXPAND_SLOTS + row_i * 128 + lane_i
    live = j < total
    ow = own_hbm[0]  # (8, 128) block via BlockSpec (leading block dim 1)

    # accumulate straight into the output block (dead lanes stay 0) — a
    # while-loop carrying n_rows (8,128) accumulators instead put Mosaic
    # in a pathological compile regime at the 64-row main-alpha table
    for r in range(n_rows):
        out_ref[r] = jnp.zeros((8, 128), jnp.float32)

    done0 = (~live).astype(jnp.float32)

    def cond(state):
        return jnp.min(state[0]) < 0.5

    def body(state):
        done_f, lo = state
        base = lo * 128
        in_win = (ow >= base) & (ow < base + _ROWS_WIN * 128)
        take = in_win & (done_f < 0.5)
        li = jnp.clip(ow - base, 0, _ROWS_WIN * 128 - 1)
        for r in range(n_rows):
            vals = gatherlib.gather_rows_128(buf[r], li)
            out_ref[r] = jnp.where(take, vals, out_ref[r])
        done_f = jnp.maximum(done_f, take.astype(jnp.float32))

        # seek the window to the first unresolved owner (8-row aligned)
        pending = jnp.min(jnp.where(done_f < 0.5, ow, jnp.int32(2 ** 30)))
        nlo = pl.multiple_of((pending >> 7) & ~7, 8)

        @pl.when(jnp.min(done_f) < 0.5)
        def _():
            lo_ref[0] = nlo
            load(nlo)

        lo_next = jnp.where(jnp.min(done_f) < 0.5, nlo, lo)
        return (done_f, lo_next)

    out = jax.lax.while_loop(cond, body, (done0, lo_ref[0]))
    lo_ref[0] = out[1]


def _expand_rows(slot_owner, table, total, budget, interpret=False):
    """Presort-expanded setup rows (n_rows, budget) — see
    _expand_rows_kernel. table is (n_rows, T+1) f32; slot_owner comes from
    _expand_keys (global triangle index per stream slot)."""
    n_rows, t1 = table.shape
    rows_pad = (-t1) % (_ROWS_WIN * 128) + _ROWS_WIN * 128  # seek headroom
    table_p = jnp.pad(table, ((0, 0), (0, rows_pad))).reshape(
        n_rows, -1, 128)
    bud = (budget + _EXPAND_SLOTS - 1) // _EXPAND_SLOTS * _EXPAND_SLOTS
    own_p = jnp.pad(slot_owner, (0, bud - budget)).reshape(-1, 8, 128)
    nblocks = bud // _EXPAND_SLOTS
    meta = jnp.reshape(total, (1,)).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((n_rows, 8, 128), lambda i, *_: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_rows, _ROWS_WIN, 128), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_expand_rows_kernel, n_rows=n_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, bud // 128, 128),
                                       jnp.float32),
        interpret=interpret,
    )(meta, own_p, table_p)
    return out.reshape(n_rows, bud)[:, :budget]


@jax.named_scope("raster.build_pairs")
def build_pairs(setup: TriangleSetup, n_tiles_y: int, n_tiles_x: int,
                pairs_per_tri: float = 4.0, n_views: int = 1,
                tile_cap: int | None = None,
                pair_budget: int | None = None,
                bin_rows: int = 1,
                order_rows: bool = False,
                tri_alpha=None,
                expand_impl: str = "kernel",
                view_row0=None,
                rows_per_view: int | None = None,
                interpret: bool | None = None,
                carry_table=None):
    """Expand triangles into sorted per-tile pair lists.

    EXACT prefix-sum emission: each live triangle owns exactly span_y *
    span_x slots of the stream, located by a cumulative-sum of spans —
    zero wasted slots, no per-class window tuning (the previous class-
    ladder design needed per-distribution budgets and silently dropped
    pairs whenever a scene/view's span histogram disagreed with them;
    caught three times by the overflow counters). Static shapes come from
    ONE global `pair_budget`:

      1. spans + exclusive cumsum locate each triangle's slot run;
      2. every stream slot is mapped to its owning triangle and sort key —
         by the _expand_keys_kernel Pallas pass (expand_impl="kernel", the
         default: binary search over streamed cum chunks at VMEM speed) or
         by the XLA scatter+gather reference path (expand_impl="xla",
         kept for differential testing; ~40 cycles/element);
      3. slot - run_start enumerates the triangle's tiles row-major;
      4. ONE packed-key lax.sort orders the stream by (tile, tri).

    pair_budget defaults to t_count + 8 * n_tiles (every triangle one
    slot + 8x overdraw per tile; 2-5x the real pair count on measured
    scenes). Total pairs beyond it are DROPPED from the END of the
    triangle array (not screen-correlated) and counted in `overflow` —
    which rides FrameState.debug_counters, is burned into the app stats
    overlay, and is asserted zero in the frame tests.

    Per-tile segments are NOT re-aligned: the raster kernels DMA from the
    group-aligned floor of each segment start and mask the lead-in (the
    DMA engine requires 128-lane-aligned offsets; masking is free,
    re-gathering the stream into aligned segments measured ~6 ms).

    n_views > 1: the setup is a vertical ATLAS of n_views independent views
    (e.g. all shadow cascades in one raster pass, SURVEY 3.2 pass 8) — the
    triangle stream is n_views blocks of t/n_views triangles whose bboxes
    were offset into each view's tile-row band. The sort key then packs the
    VIEW-LOCAL triangle index (a triangle's tiles never cross views), which
    keeps the key in int32 at atlas sizes a global index would overflow.

    view_row0 + rows_per_view (multi-device atlas sharding): the setup's
    tile_bbox rows are LOCAL to a horizontal atlas band whose first bin row
    sits at the TRACED global bin row view_row0 (e.g. axis_index * band
    bins); rows_per_view (static) is the full atlas's bin rows per view.
    The decode then recovers each tile's view as
    (view_row0 + tile_row) // rows_per_view instead of assuming this call
    covers whole views — bands may start/end mid-cascade.

    order_rows (depth-only AND winner-tracking consumers): the key
    additionally packs each pair's FIRST covered 16px sub-row within its
    bin (from setup.fine_y), so a bin's segment comes out y-sorted and the
    raster kernel's per-group [smin, smax] sub-block skip is tight — tiny
    triangles stop paying the whole (bin_rows * 16 x 128) bin. Contract:
    reordering changes winner selection ONLY between EXACTLY-equal
    quantized depths (coplanar ties), which every current consumer accepts
    — the slot packing already made such ties arbitrary. A consumer that
    needs bit-exact triangle-order tie-breaks against reference_rasterize
    must pass order_rows=False.
    """
    del pairs_per_tri
    if interpret is None:
        # tests/CPU meshes run every Pallas kernel in interpret mode; the
        # raster kernels get an explicit flag from their callers, but
        # build_pairs has many thin callers (tests, tools) — resolve here
        interpret = jax.default_backend() != "tpu"
    t_count = setup.valid.shape[0]
    n_tiles = n_tiles_y * n_tiles_x
    assert t_count % n_views == 0
    assert view_row0 is None or rows_per_view is not None
    if view_row0 is None:
        assert n_tiles % n_views == 0
        tiles_per_view = n_tiles // n_views
    tpv = t_count // n_views  # triangles per view
    key_rows = bin_rows if order_rows else 1  # sub-row factor in the key
    # tri_alpha: per-triangle bool — alpha-tested pairs sort to the END of
    # each tile segment (an extra key bit above kymin), clustering them
    # into few groups so the kernels' per-group "any alpha pair" gate
    # actually skips (y-sorted emission otherwise scatters the few alpha
    # casters across most groups; ties between exactly-equal quantized
    # depths move, same class the y-ordering already made arbitrary).
    # Needs a spare key bit: the main view fits; the shadow atlas does not
    # (its pairs use the opaque/alpha stream split instead).
    key_alpha = 2 if tri_alpha is not None else 1
    assert (n_tiles * key_rows * key_alpha + 1) * (tpv + 1) < 2 ** 31, \
        "packed key overflow"
    assert n_tiles_y <= 512 and n_tiles_x <= 128, "bbox packing overflow"
    assert not order_rows or bin_rows <= 8, "rel_fy0 packs in 3 bits"
    ty0, tx0, ty1, tx1 = (setup.tile_bbox[:, i] for i in range(4))
    span_y = jnp.where(setup.valid, ty1 - ty0 + 1, 0)
    span_x = jnp.where(setup.valid, tx1 - tx0 + 1, 0)
    span = span_y * span_x

    if pair_budget is None:
        # headroom term scales with the PRE-BIN tile grid (8 * bin_rows *
        # n_bins == 8 * n_fine_tiles): binning shrinks the bin count but
        # never the per-triangle emission floor, so the budget must not
        # shrink with it (ADVICE r2: dense scenes were near the cliff)
        pair_budget = t_count + 8 * n_tiles * bin_rows
    budget = max(GROUP, (pair_budget + GROUP - 1) // GROUP * GROUP)

    # exclusive prefix sum: triangle t owns stream slots
    # [cum_ex[t], cum_ex[t] + span[t])   (i32: total pairs past 2^31 would
    # wrap, but such a frame is orders of magnitude past any budget)
    with jax.named_scope("bin.spans"):
        from .scanlib import exact_cumsum
        cum = exact_cumsum(span)
        total = cum[-1]
        cum_ex = cum - span
        overflow = jnp.maximum(total - budget, 0)

    # per-triangle packed geometry word:
    # ty0[9b] | tx0[7b] | span_x[7b] | rel_fy0[3b]
    if order_rows:
        rel_fy0 = jnp.clip(setup.fine_y[:, 0] - ty0 * bin_rows,
                           0, bin_rows - 1)
    else:
        rel_fy0 = 0
    geom_packed = ((ty0 * 128 + tx0) * 128 + span_x) * 8 + rel_fy0
    if tri_alpha is not None:
        geom_packed = geom_packed * 2 + tri_alpha.astype(jnp.int32)
    sentinel = n_tiles * key_rows * key_alpha * (tpv + 1)

    if expand_impl == "kernel":
        # Pallas expansion: slot -> owner -> key at VMEM speed (see
        # _expand_keys_kernel; the XLA path below costs ~40 cycles per
        # stream element in scatter/gather lowering — 46 ms/frame at
        # round-3 bench sizes, the largest single frame cost after the
        # round-2 shadow fix)
        with jax.named_scope("bin.expand"):
            key, slot_owner = _expand_keys(
                cum, cum_ex, geom_packed, total, budget,
                n_tiles_x=n_tiles_x, bin_rows=bin_rows,
                order_rows=order_rows, order_alpha=tri_alpha is not None,
                tpv=tpv, n_views=n_views,
                sentinel=sentinel, interpret=interpret)
    else:
        # XLA reference path: EXACT slot ownership owner(j) =
        # #{t : cum[t] <= j} — one bincount scatter-add at the (sorted)
        # run ends + one cumsum. Empty runs have cum == cum_ex and never
        # own a slot; k = j - cum_ex[owner] lands in [0, span) by
        # construction (the earlier scatter-max + cummax + bit-packed
        # span guard silently dropped bins when span_y overran its field).
        with jax.named_scope("bin.owner"):
            counts = jnp.zeros((budget + 1,), jnp.int32).at[
                jnp.minimum(cum, budget)].add(1)
            owner = jnp.cumsum(counts[:budget])
            tri_c = jnp.minimum(owner, t_count - 1)

        with jax.named_scope("bin.decode"):
            g = geom_packed[tri_c]
            if tri_alpha is not None:
                ia = g & 1
                g = g >> 1
            # k = slot index within the owner's run. Runs start exactly
            # where `owner` increases, so the run start is a cummax over
            # positions of owner-change — dense vector ops instead of a
            # second (budget,) gather of cum_ex
            jj = jnp.arange(budget, dtype=jnp.int32)
            owner_prev = jnp.concatenate(
                [jnp.full((1,), -1, jnp.int32), owner[:-1]])
            k = jj - jax.lax.cummax(jnp.where(owner != owner_prev, jj, 0))
            rel0 = g & 7
            sx = jnp.maximum((g >> 3) & 127, 1)
            x0 = (g >> 10) & 127
            y0 = g >> 17
            # k // sx via f32 divide + EXACT one-step correction (see
            # the kernel path: TPU f32 divide is not correctly rounded;
            # integer div lowers to a long VPU software sequence, so
            # divide + fixup is both exact and fast).
            kc = jnp.clip(k, 0, (1 << 23) - 1)
            dy = jnp.floor(kc.astype(jnp.float32)
                           / sx.astype(jnp.float32)).astype(jnp.int32)
            r = kc - dy * sx
            dy = dy + (r >= sx).astype(jnp.int32) \
                - (r < 0).astype(jnp.int32)
            dx = kc - dy * sx
            tile = (y0 + dy) * n_tiles_x + x0 + dx
            if tri_alpha is not None:
                tile = tile * 2 + ia
            tri_local = tri_c % tpv if n_views > 1 else tri_c

            slot_live = jnp.arange(budget, dtype=jnp.int32) < total
            if order_rows:
                # first covered sub-row within THIS bin: nonzero only in
                # the triangle's first bin row
                kymin = jnp.maximum(rel0 - dy * bin_rows, 0)
                key_val = (tile * bin_rows + kymin) * (tpv + 1) + tri_local
            else:
                key_val = tile * (tpv + 1) + tri_local
            key = jnp.where(slot_live, key_val, jnp.int32(sentinel))
            slot_owner = jnp.where(slot_live, tri_c, 0)
    if carry_table is not None:
        # SORT-CARRIED SETUP ROWS: expand the per-triangle rows into
        # presort slot order (monotone owners -> streaming gather at VMEM
        # speed, _expand_rows) and let lax.sort move them as payload
        # operands — measured ~free next to the key sort itself, replacing
        # the XLA pair-order row gather (transpose + row-gather +
        # transpose, ~6.5 ms/frame at bench sizes before this).
        with jax.named_scope("bin.expand_rows"):
            if expand_impl == "kernel":
                rows_pre = _expand_rows(slot_owner, carry_table, total,
                                        budget, interpret=interpret)
            else:
                # XLA differential-testing path: plain pair-order gather
                live = jnp.arange(budget, dtype=jnp.int32) < total
                idx = jnp.where(live, slot_owner, carry_table.shape[1] - 1)
                rows_pre = jnp.where(live[None], carry_table[:, idx], 0.0)
        with jax.named_scope("bin.sort"):
            ops = jax.lax.sort(
                (key, *[rows_pre[r] for r in range(rows_pre.shape[0])]),
                num_keys=1)
            keys_sorted = ops[0]
            # one GROUP of zero tail rows: the kernels' aligned DMAs can
            # read up to GROUP-1 entries past the last tile's segment end
            pair_rows = jnp.pad(jnp.stack(ops[1:], axis=0),
                                ((0, 0), (0, GROUP)))
    else:
        pair_rows = None
        with jax.named_scope("bin.sort"):
            keys_sorted = jax.lax.sort(key)
    # recover the GLOBAL triangle index: the tile determines the view
    # (sentinel keys decode to tile == n_tiles -> view n_views -> index
    # t_count, the degenerate padding row)
    with jax.named_scope("bin.segments"):
        key_span = key_rows * key_alpha * (tpv + 1)
        tile_s = keys_sorted // key_span
        if view_row0 is not None:
            # band-sharded atlas: this call's bin rows start at the traced
            # global row view_row0; a band may cross view boundaries
            # (tile_s is the plain tile index — key_span divides out the
            # alpha doubling)
            view = (view_row0 + tile_s // n_tiles_x) // rows_per_view
        else:
            view = tile_s // tiles_per_view
        tri_glob = view * tpv + keys_sorted % (tpv + 1)
        # one GROUP of degenerate tail pairs: the kernels' aligned DMAs can
        # read up to GROUP-1 entries past the last tile's segment end
        pair_tri = jnp.concatenate([
            jnp.minimum(tri_glob, t_count),
            jnp.full((GROUP,), t_count, jnp.int32)])

        tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
        raw_start = jnp.searchsorted(
            keys_sorted, tile_ids * key_span).astype(jnp.int32)
        raw_end = jnp.searchsorted(
            keys_sorted, (tile_ids + 1) * key_span).astype(jnp.int32)
        n_real = raw_end - raw_start
    # cap leaves room for the group-aligned lead-in masked by the kernel.
    # The default bound comes from the WINNER-tracking kernels (the slot
    # index must fit SLOT_BITS of the depth mantissa); depth-only passes
    # (shadow cascades) have no slot packing and pass a larger tile_cap —
    # far-fitted cascades legitimately exceed 1920 casters per tile
    # (measured 42.8k dropped pairs/frame on the bench scene before this).
    cap = (MAX_PAIRS_PER_TILE - GROUP) if tile_cap is None else tile_cap
    capped = jnp.minimum(n_real, cap)
    import os as _os
    if _os.environ.get("PAIR_DEBUG"):
        jax.debug.print("tilecap drops={d} max_tile={m} class_ovf={o}",
                        d=jnp.sum(n_real - capped), m=jnp.max(n_real),
                        o=overflow)
    overflow = overflow + jnp.sum(n_real - capped)

    pairs = PairLists(
        pair_tri=pair_tri,
        tile_start=raw_start,
        tile_count=capped,
        overflow=overflow,
    )
    if carry_table is not None:
        return pairs, pair_rows
    return pairs


@jax.named_scope("raster.gather_pair_setups")
def gather_pair_setups(setup: TriangleSetup, pairs: PairLists,
                       with_attrs: bool, row_extents: bool = False):
    """Duplicate per-triangle setups into pair order (contiguous-row takes).

    Returns (pair_edges (16, P) f32, pair_attrs (NATTR, P) f32 | None).
    The kernel DMAs contiguous (16, GROUP) / (NATTR, GROUP) slices of these;
    rows are plane-major [a, b, c, 0] x 4 planes so the sublane extent (16)
    and lane offsets (tile_start multiples of GROUP=128) satisfy the DMA
    engine's tile-alignment rules, and the kernel needs no shape cast
    (Mosaic rejects lane-crossing reshapes, the round-1 blocker).

    row_extents: stuff the otherwise-zero pad rows of planes 0 and 1
    (rows 3 and 7) with the triangle's fine 16px-row bbox [fy0, fy1] —
    the depth kernels' per-group sub-block skip reads them. Harmless for
    plane evaluation (the pixel-basis 4th row is zero), but only the
    depth-only consumers request it.

    Layout: the table is built DIRECTLY in (rows, T+1) orientation — rows
    are the major dim, triangles stay in lanes end to end (geometry_setup
    emits (coeff, plane, T) / (NATTR, T) lane vectors), so assembling it is
    pure row concatenation and the duplication is one lane-axis gather with
    the (rows, P) result already in kernel layout. The previous (T+1, rows)
    row-take paid two tiny-minor-dim transposes (in and out) that dominated
    the whole scope on-chip (~5 of 8.3 ms/frame, round-5 op profile).
    """
    rows, n_rows = setup_row_table(setup, with_attrs, row_extents)
    if not with_attrs:
        return rows[:, pairs.pair_tri], None
    pair_rows = rows[:, pairs.pair_tri]  # (n_rows + n_attr', P)
    return pair_rows[:n_rows], pair_rows[n_rows:]


def setup_row_table(setup: TriangleSetup, with_attrs: bool,
                    row_extents: bool = False):
    """The (rows, T+1) per-triangle row table both duplication paths share:
    gather_pair_setups (XLA lane gather, tests/tools) and the sort-carried
    path (build_pairs carry_table -> _expand_rows). Returns (table,
    n_edge_rows); rows beyond n_edge_rows are the (8-padded) attr rows."""
    t_count = setup.valid.shape[0]
    n_planes = setup.edges.shape[1]  # 4, or 8 with the alpha extension
    n_rows = 4 * n_planes
    # pad triangle tables with one degenerate entry at index T (edge plane
    # c = -1 -> never covers; alpha slot c = -1 -> treated opaque)
    never = jnp.zeros((3, n_planes, 1), jnp.float32).at[2, :, 0].set(-1.0)
    e = jnp.concatenate([setup.edges, never], axis=2)  # (3, p, T+1)
    if row_extents:
        # pad rows of planes 0/1 carry [fy0, fy1]; degenerate entry gets
        # the empty range (1, 0) so dead groups skip every sub-block
        fy = jnp.concatenate([
            setup.fine_y.astype(jnp.float32),
            jnp.asarray([[1.0, 0.0]], jnp.float32)], axis=0)  # (T+1, 2)
        pad_rows = jnp.zeros((1, n_planes, t_count + 1), jnp.float32)
        pad_rows = pad_rows.at[0, 0].set(fy[:, 0]).at[0, 1].set(fy[:, 1])
    else:
        pad_rows = jnp.zeros((1, n_planes, t_count + 1), jnp.float32)
    # (4, p, T+1) -> (p, 4, T+1) swaps MAJOR dims only (lanes untouched)
    edges_rows = jnp.concatenate([e, pad_rows], axis=0).transpose(
        1, 0, 2).reshape(n_rows, t_count + 1)

    if not with_attrs:
        return edges_rows, n_rows

    attrs_pad = jnp.concatenate(
        [setup.attrs, jnp.zeros((setup.attrs.shape[0], 1), jnp.float32)],
        axis=1)
    n_attr = attrs_pad.shape[0]
    # Mosaic requires HBM slices sublane-aligned: pad rows to a multiple
    # of 8 (30 -> 32 static, 39 -> 40 dynamic); the kernel's one-hot matmul
    # and coeff evaluation only touch the logical rows
    row_pad = (-n_attr) % 8
    if row_pad:
        attrs_pad = jnp.pad(attrs_pad, ((0, row_pad), (0, 0)))
    return jnp.concatenate([edges_rows, attrs_pad], axis=0), n_rows


# --------------------------------------------------------------------------
# raster kernels
# --------------------------------------------------------------------------

GBUF_CHANNELS = 13  # static scenes; +2 prev-NDC channels when dynamic
_CH_U, _CH_V = 0, 1
_CH_DUDX, _CH_DVDX, _CH_DUDY, _CH_DVDY = 2, 3, 4, 5
_CH_N = 6  # 6-8 normal
_CH_T = 9  # 9-11 tangent
_CH_MAT = 12  # packed material * 2 + (handedness < 0)
_CH_PREV = 13  # 13-14 prev ndc xy (dynamic scenes only)

def _pixel_basis(tile_y, tile_x):
    """(4, PX_PER_TILE) matrix [x; y; 1; 0] at pixel centers for this tile.

    Pixels are laid out lane-linear: lane j = (row j // TILE_W, col j %
    TILE_W) of the tile; the final (1, PX) accumulator reshapes to
    (TILE_H, TILE_W) once per tile. The zero 4th row pairs with the pad
    coefficient row of the (16, P) edge layout.

    tile_y/tile_x are 16x128-block coordinates; multi-row bins (sub > 1)
    pass tile_y = bin_y * sub + s for sub-block s.
    """
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, PX_PER_TILE), 1)
    x_local = (lin % TILE_W).astype(jnp.float32) + 0.5
    y_local = (lin // TILE_W).astype(jnp.float32) + 0.5
    x = x_local + (tile_x * TILE_W).astype(jnp.float32)
    y = y_local + (tile_y * TILE_H).astype(jnp.float32)
    ones = jnp.ones_like(x)
    zeros = jnp.zeros_like(x)
    return jnp.concatenate([x, y, ones, zeros], axis=0)  # (4, PX)


def _vis_encode(acc2d):
    """THE vis-buffer encoding contract, shared by the producer
    (_depth_resolve_loop's winner tracking) and the split-stage consumer
    (_attr_resolve_kernel): covered pixels carry the winner's pair slot
    RELATIVE TO THE GROUP-ALIGNED BASE of the tile's segment (the low
    SLOT_BITS of the packed depth|slot accumulator), uncovered pixels are
    -1. Changing either side without the other corrupts the split alpha
    G-buffer while the fused opaque path keeps working (ADVICE r4) —
    which is why both go through these two helpers."""
    return jnp.where(acc2d != 0, acc2d & SLOT_MASK, -1)


def _vis_decode(vis_flat):
    """Inverse of _vis_encode: (valid mask, slot) — slot >= 0 is the
    group-aligned-relative pair slot; (slot >> k) == sg is never true for
    -1, so invalid pixels select nothing in the attr phase."""
    return vis_flat >= 0, vis_flat


def _kernel_recip(x):
    """1/x for x > 0 without an f32 divide: rsqrt(x)^2 + one Newton step.

    Mosaic's exact f32 divide is a COMPILE-TIME bomb in combination with
    winner tracking / large sub unrolls: the frame's alpha G-buffer kernel
    compiled in 164 s with `1.0 / x` and 3.7 s with this formulation (and
    the r3 alpha-depth sub=8 monster, 302 s, drops to 13 s). The Newton
    refinement r*(2 - x*r) brings rsqrt's approximation back to ~1 ulp, so
    perspective-correct attributes and alpha UVs keep test tolerances."""
    r = jax.lax.rsqrt(x)
    r = r * r
    return r * (2.0 - x * r)


def _depth_resolve_loop(start_ref, count_ref, edges_ref, depth_ref, vis_ref,
                        acc_ref, edge_buf, cols_ref, sems, *, track_winner: bool,
                        depth_clamp: bool = False, masks_ref=None,
                        sub: int = 1,
                        row_skip: bool = False, init_ref=None,
                        eval_width: int | None = None):
    """Shared visibility loop: stream GROUP-sized pair-setup slices, evaluate
    edge+depth planes on the MXU, resolve a packed (depth | slot) max.

    Per-tile segments start at ARBITRARY stream offsets; DMAs read from the
    group-aligned floor (the DMA engine needs 128-lane-aligned offsets) and
    the lead-in/tail rows outside [start, start+count) are masked. Slots are
    tracked relative to the aligned base so the G-buffer attribute refetch
    uses the same aligned DMA grid.

    sub > 1: each program owns a (sub * TILE_H, TILE_W) BIN of sub
    16x128-px sub-blocks sharing ONE pair list (acc_ref is (sub, PX)).
    Bigger bins amortize program overhead and, more importantly, shrink the
    pair stream (every binning-stage cost is O(pairs)); the cost is that a
    pair covering one sub-block is edge-evaluated against all of them
    (MXU time, far from the bottleneck).

    masks_ref (VMEM (MAX_ALPHA_MATERIALS, 128) i32) turns on the
    alpha-test path: requires the 8-plane edge table (see module
    docstring); groups whose pairs are all opaque commit coverage in a
    branch that does none of the UV/mask work (scalar pl.when).

    row_skip (depth-only): pair_edges rows 3/7 carry each pair's fine
    16px-row bbox (gather_pair_setups row_extents=True) and the pair
    stream is y-sorted within each bin (build_pairs order_rows=True);
    each group then evaluates ONLY the sub-blocks inside its live pairs'
    [min fy0, max fy1] — the edge/depth matmuls for a y-coherent group of
    tiny triangles run on 1-2 of the bin's `sub` blocks instead of all.

    EVAL SLICES (round 5): DMA chunks stay GROUP=128 pairs (the DMA
    engine's lane alignment), but evaluation runs in EW=32-pair sublane
    slices of the transposed coefficient block, each gated on overlapping
    the live [lead, lead + count) range. Pair streams are sparse —
    measured mean segment occupancy is ~80/510 bins main view and ~4/510
    for the alpha stream — so fixed (128, PX) evaluation paid ~2x (main)
    to ~30x (alpha) over the live lanes; 32-row slices keep the VPU work
    proportional to live pairs + <=31 lanes of rounding (alpha winner
    stage 5.5 -> 1.9 ms, atlas depth and main G-buffer ~15-30% off,
    measured on-chip via tools/profile_frame)."""
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tile = ty * pl.num_programs(1) + tx
    start = start_ref[tile]
    count = count_ref[tile]
    base = pl.multiple_of(start // GROUP * GROUP, GROUP)
    lead = start - base
    n_groups = jnp.where(count > 0, (lead + count + GROUP - 1) // GROUP, 0)

    bases = [_pixel_basis(ty * sub + s, tx) for s in range(sub)]
    if init_ref is None:
        acc_ref[...] = jnp.zeros_like(acc_ref)
    else:
        # accumulate over a prior pass (opaque/alpha shadow stream split):
        # positive-f32 depth bits compare correctly as i32, and 0.0 (far /
        # uncovered) is the max-identity, so init == bit-pattern copy
        acc_ref[...] = pltpu.bitcast(init_ref[...], jnp.int32).reshape(
            acc_ref.shape)
    def group_dma(slot, g):
        return pltpu.make_async_copy(
            edges_ref.at[:, pl.ds(base + g * GROUP, GROUP)],
            edge_buf.at[slot],
            sems.at[slot],
        )

    @pl.when(n_groups > 0)
    def _():
        group_dma(0, 0).start()

    ew = min(eval_width or EVAL_WIDTH, GROUP)
    n_slices = GROUP // ew
    use_poison = masks_ref is None

    def group_body(g, _):
        slot = jax.lax.rem(g, 2)

        @pl.when(g + 1 < n_groups)
        def _():
            group_dma(1 - slot, g + 1).start()

        group_dma(slot, g).wait()
        mat = edge_buf[slot]  # (n_rows, GROUP): planes x [a, b, c, pad]
        # ALL plane coefficients into sublane space with Mosaic's native
        # sublane<->lane transpose: cols[:, 4p + k] = coefficient k of
        # plane p for the sublane's pair. The per-plane evaluation below is
        # then plain VPU broadcast-FMAs. (History: per-(plane, sub-block)
        # K=4 matmuls ran the MXU at 4/128 utilization; round 3 replaced
        # them with one K=128 identity matmul at HIGHEST precision; the
        # native transpose frees the MXU entirely and skips the 3-pass f32
        # precision decomposition — verified exact on-chip for (16,128) and
        # (40,128) f32 inputs.) Written to scratch so the eval slices below
        # can take DYNAMIC sublane windows of it.
        colsT = mat.T  # (GROUP, n_rows)
        if use_poison:
            # SEGMENT MASK AS COEFFICIENT POISON (round 5): pairs outside
            # this tile's [start, start + count) stream range (the group-
            # aligned lead-in and tail belong to NEIGHBORING tiles) get
            # plane 0's c coefficient set to -3e38, so e0 evaluates hugely
            # negative and coverage is impossible. This replaces the
            # per-pixel seg_ok mask — 3-4 VPU ops over (ew, PX) per eval
            # slice, ~10% of the whole depth pass at bench sizes — with
            # one (GROUP, 1) select per DMA group. b*y + c stays finite
            # (|b*y| bounded by plane magnitudes << 1e33), so the eval
            # never overflows to NaN via inf - inf.
            # ONLY for unmasked kernels: combined with the alpha-test
            # body this select re-arms the Mosaic compile bomb (the
            # production a_sub=4 acc variant went 8 -> 188.6 s, the sub=8
            # one to 713.8 s — tools/compile_bisect.py --stage depth4a/
            # depth8a); the alpha streams are tiny, so their kernels keep
            # the per-pixel seg_ok instead.
            gidx = (jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1), 0)
                    + g * GROUP)
            dead = (gidx < lead) | (gidx >= lead + count)
            cols_ref[...] = jnp.where(
                dead & (jax.lax.broadcasted_iota(
                    jnp.int32, (GROUP, colsT.shape[1]), 1) == 2),
                jnp.float32(-3e38), colsT)
        else:
            cols_ref[...] = colsT

        def slice_body(j, _):
            row0 = g * GROUP + j * ew
            live = (row0 < lead + count) & (row0 + ew > lead)

            @pl.when(live)
            def _():
                eval_slice(g, j)
            return 0

        jax.lax.fori_loop(0, n_slices, slice_body, 0)
        return 0

    def eval_slice(g, j):
        row0 = g * GROUP + j * ew
        cols = cols_ref[pl.ds(j * ew, ew), :]  # (ew, n_rows)

        # rows outside this tile's [start, start+count) segment are dead
        # by coefficient poison in unmasked kernels (see the group_body
        # transpose store); masked (alpha) kernels keep the per-pixel
        # seg_ok mask (poison + the alpha body = Mosaic compile bomb).
        # The winner path additionally needs the per-pair stream index
        # for the slot packing.
        if track_winner or not use_poison:
            row = (jax.lax.broadcasted_iota(
                jnp.int32, (ew, PX_PER_TILE), 0) + row0)
        if not use_poison:
            seg_ok = (row >= lead) & (row < lead + count)

        if masks_ref is not None:
            # alpha test: mask-slot plane is constant per pair -> row 30
            # (plane 7's c coeff) carries the per-pair slot
            slot_col = cols[:, 30:31]  # (ew, 1)
            has_alpha = jnp.max(slot_col) > 0.5
            # per-pair mask row table (ew, 128 words)
            table0 = jnp.full((ew, 128), -1, jnp.int32)  # opaque
            for m in range(masks_ref.shape[0]):
                table0 = jnp.where(
                    jnp.abs(slot_col - (m + 1)) < 0.5,
                    masks_ref[m:m + 1], table0)

        if row_skip:
            # live-lane mask on the PAIR (sublane) axis; rows 3/7 carry
            # each pair's fine-row bbox (see docstring).
            lanei = (jax.lax.broadcasted_iota(jnp.int32, (ew, 1), 0)
                     + row0)
            lane_live = (lanei >= lead) & (lanei < lead + count)
            fy_min = jnp.min(jnp.where(lane_live, cols[:, 3:4],
                                       jnp.float32(1e9)))
            fy_max = jnp.max(jnp.where(lane_live, cols[:, 7:8],
                                       jnp.float32(-1e9)))
            bin_row0 = (ty * sub).astype(jnp.float32)

        def eval_sub(s):
            basis = bases[s]
            x_row = basis[0:1]  # (1, PX)
            y_row = basis[1:2]

            # per plane p: a*x + b*y + c as (ew, 1) x (1, PX) broadcast
            # FMAs on the VPU (coefficients pre-transposed into `cols`)
            def plane_eval(p):
                a = cols[:, 4 * p:4 * p + 1]
                b = cols[:, 4 * p + 1:4 * p + 2]
                c = cols[:, 4 * p + 2:4 * p + 3]
                return a * x_row + (b * y_row + c)

            e0 = plane_eval(0)
            e1 = plane_eval(1)
            e2 = plane_eval(2)
            zz = plane_eval(3)
            # dead (out-of-segment) pairs carry a poisoned plane-0 c, so
            # e0 < 0 excludes them here without a per-pixel segment mask
            # (unmasked kernels); alpha kernels mask explicitly
            cov0 = jnp.minimum(jnp.minimum(e0, e1), e2) >= 0.0
            if not use_poison:
                cov0 = cov0 & seg_ok

            def commit(cov):
                """Depth pack + running max — a ref effect, so it can live
                inside pl.when branches: opaque groups commit cov0 directly
                and pay ZERO alpha cost (the former alpha_scr scratch
                round-trip wrote+read a (GROUP, PX) vreg block per group
                per sub-block even for all-opaque groups: ~6 ms/frame)."""
                if depth_clamp:
                    # sun-shadow semantics: the reference renders cascades
                    # with depth clamping (lightMatrix.comp:62 comment), so
                    # casters outside the fitted z-range still write
                    # clamped depth
                    covz = cov
                    zc = jnp.clip(zz, 1.0 / 16384.0, 1.0)
                else:
                    # far clip (z <= 0) and near clip (z > 1): homogeneous
                    # edge setup cuts the near-plane-crossing region here,
                    # pixel-exact (Vulkan clipper parity)
                    covz = cov & (zz > 0.0) & (zz <= 1.0)
                    zc = jnp.clip(zz, 0.0, 1.0)
                zi = pltpu.bitcast(zc, jnp.int32)
                if track_winner:
                    cand = jnp.where(covz,
                                     (zi & jnp.int32(~SLOT_MASK)) | row, 0)
                else:
                    cand = jnp.where(covz, zi, 0)
                group_max = jnp.max(cand, axis=0, keepdims=True)  # (1, PX)
                acc_ref[s:s + 1] = jnp.maximum(acc_ref[s:s + 1], group_max)

            if masks_ref is None:
                commit(cov0)
            else:
                def alpha_cov():
                    uw = plane_eval(4)
                    vw = plane_eval(5)
                    iw = plane_eval(6)  # screen-affine 1/w (> 0 in view)
                    inv = _kernel_recip(jnp.where(iw > 1e-12, iw, 1.0))
                    u = uw * inv
                    v = vw * inv
                    # wrap addressing, 64x64 nearest
                    ix = jnp.clip((u - jnp.floor(u)) * 64.0, 0.0, 63.0) \
                        .astype(jnp.int32)
                    iy = jnp.clip((v - jnp.floor(v)) * 64.0, 0.0, 63.0) \
                        .astype(jnp.int32)
                    word_idx = iy * 2 + (ix >= 32).astype(jnp.int32)
                    # ONE single-vreg lane gather per 128-px block
                    words = [
                        jnp.take_along_axis(
                            table0, word_idx[:, b * 128:(b + 1) * 128],
                            axis=1)
                        for b in range(PX_PER_TILE // 128)
                    ]
                    word = jnp.concatenate(words, axis=1)  # (GROUP, PX)
                    bit = (word >> (ix & 31)) & 1
                    passes = (slot_col < 0.5) | (bit == 1)
                    return cov0 & passes

                if track_winner:
                    # UNGATED: a pl.when(has_alpha) gate around the alpha
                    # body is the last surviving ingredient of the Mosaic
                    # compile bomb when combined with winner tracking
                    # (147 s gated vs 3.7 s ungated at bench shapes, NR
                    # divide already applied). Since the r3 opaque/alpha
                    # stream split this kernel only ever rasterizes the
                    # alpha-only stream, so the gate saved nothing anyway.
                    commit(alpha_cov())
                else:
                    # depth-only cascades keep the gate: that combination
                    # is compile-stable (3 s) and opaque groups skip the
                    # UV/gather work
                    @pl.when(has_alpha)
                    def _():
                        commit(alpha_cov())

                    @pl.when(~has_alpha)
                    def _():
                        commit(cov0)

        for s in range(sub):
            if row_skip:
                fy_row = bin_row0 + jnp.float32(s)

                @pl.when((fy_min <= fy_row) & (fy_row <= fy_max))
                def _(s=s):
                    eval_sub(s)
            else:
                eval_sub(s)

    jax.lax.fori_loop(0, n_groups, group_body, 0)

    # reshape the i32 accumulator ONCE to (sub * TILE_H, TILE_W); all masks
    # are derived in 2D afterwards (Mosaic rejects i1 lane-crossing
    # reshapes). (sub, PX) -> (sub * 16, 128) is row-order correct: element
    # (s, j) lands at row s * 16 + j // 128, col j % 128.
    acc2d = acc_ref[...].reshape(sub * TILE_H, TILE_W)
    if track_winner:
        depth_bits = acc2d & jnp.int32(~SLOT_MASK)
    else:
        depth_bits = acc2d
    depth_ref[...] = pltpu.bitcast(depth_bits, jnp.float32)
    if vis_ref is not None:
        vis_ref[...] = _vis_encode(acc2d)


def _depth_kernel(start_ref, count_ref, edges_ref, depth_ref,
                  acc_ref, edge_buf, cols_ref, sems, *, sub=1, row_skip=False,
                  eval_width=None):
    _depth_resolve_loop(start_ref, count_ref, edges_ref, depth_ref, None,
                        acc_ref, edge_buf, cols_ref, sems, track_winner=False,
                        depth_clamp=True, sub=sub, row_skip=row_skip,
                        eval_width=eval_width)


def _depth_kernel_alpha(start_ref, count_ref, edges_ref, masks_ref,
                        depth_ref, acc_ref, edge_buf, cols_ref, sems,
                        *, sub=1, row_skip=False, eval_width=None):
    _depth_resolve_loop(start_ref, count_ref, edges_ref, depth_ref, None,
                        acc_ref, edge_buf, cols_ref, sems, track_winner=False,
                        depth_clamp=True, masks_ref=masks_ref,
                        sub=sub, row_skip=row_skip, eval_width=eval_width)


def _depth_kernel_alpha_acc(start_ref, count_ref, edges_ref, masks_ref,
                            init_ref, depth_ref, acc_ref, edge_buf, cols_ref,
                            sems, *, sub=1, row_skip=False, eval_width=None):
    _depth_resolve_loop(start_ref, count_ref, edges_ref, depth_ref, None,
                        acc_ref, edge_buf, cols_ref, sems, track_winner=False,
                        depth_clamp=True, masks_ref=masks_ref,
                        sub=sub, row_skip=row_skip, eval_width=eval_width,
                        init_ref=init_ref)


@jax.named_scope("raster.depth")
def rasterize_depth(pair_edges, pairs: PairLists, n_tiles_y: int,
                    n_tiles_x: int, interpret: bool = False,
                    alpha_masks=None, sub: int = 1,
                    row_skip: bool = False, init_depth=None,
                    eval_width: int | None = None):
    """Depth-only rasterization (sun-shadow cascades, sunShadow.frag parity,
    including its alpha clip when alpha_masks is given).

    n_tiles_y counts BINS of (sub * TILE_H) rows — pairs must come from a
    build_pairs run on the same bin grid.

    row_skip requires pairs from build_pairs(order_rows=True) and
    pair_edges from gather_pair_setups(row_extents=True) — see
    _depth_resolve_loop.

    Returns depth (H, W) f32 reverse-Z (0 = far / no coverage).
    """
    alpha = alpha_masks is not None
    assert init_depth is None or alpha, "accumulation only used post-opaque"
    n_rows = pair_edges.shape[0]
    assert n_rows == (32 if alpha else 16), n_rows
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
    scratch = [
        pltpu.VMEM((sub, PX_PER_TILE), jnp.int32),
        pltpu.VMEM((2, n_rows, GROUP), jnp.float32),
        pltpu.VMEM((GROUP, n_rows), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    inputs = [pairs.tile_start, pairs.tile_count, pair_edges]
    if alpha:
        in_specs.append(pl.BlockSpec(
            alpha_masks.shape, lambda ty, tx, *_: (0, 0),
            memory_space=pltpu.VMEM))
        inputs.append(alpha_masks)
    if init_depth is not None:
        # second pass of the opaque/alpha stream split: start from the
        # prior pass's depth (bit-pattern max merge, see _depth_resolve_loop)
        in_specs.append(pl.BlockSpec((sub * TILE_H, TILE_W),
                                     lambda ty, tx, *_: (ty, tx),
                                     memory_space=pltpu.VMEM))
        inputs.append(init_depth)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles_y, n_tiles_x),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((sub * TILE_H, TILE_W),
                         lambda ty, tx, *_: (ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
    )
    h = n_tiles_y * sub * TILE_H
    w = n_tiles_x * TILE_W
    if init_depth is not None:
        kern = functools.partial(_depth_kernel_alpha_acc, sub=sub,
                                 row_skip=row_skip, eval_width=eval_width)
    else:
        kern = functools.partial(
            _depth_kernel_alpha if alpha else _depth_kernel, sub=sub,
            row_skip=row_skip, eval_width=eval_width)
    (depth,) = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((h, w), jnp.float32)],
        interpret=interpret,
    )(*inputs)
    return depth


def _gbuffer_kernel(start_ref, count_ref, edges_ref, attrs_ref,
                    depth_ref, vis_ref, gbuf_ref,
                    acc_ref, coeff_ref, edge_buf, attr_buf, cols_ref,
                    attr_cols, sems, attr_sem, masks_ref=None, sub=1,
                    row_skip=False):
    """Full visibility + attribute resolve for the main view (fused).

    NOTE: never instantiated with masks_ref — the alpha variant runs the
    SPLIT pipeline (_winner_alpha_kernel + _attr_resolve_kernel below):
    Mosaic's compile time explodes combinatorially when the alpha-test
    gather block and the attribute one-hot matmuls share one kernel
    (885 s measured at bench shapes vs 3.7 s + 5 s split)."""
    _depth_resolve_loop(start_ref, count_ref, edges_ref, depth_ref, vis_ref,
                        acc_ref, edge_buf, cols_ref, sems, track_winner=True,
                        masks_ref=masks_ref, sub=sub,
                        row_skip=row_skip)

    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tile = ty * pl.num_programs(1) + tx
    start = start_ref[tile]
    count = count_ref[tile]
    base = pl.multiple_of(start // GROUP * GROUP, GROUP)
    lead = start - base
    n_groups = jnp.where(count > 0, (lead + count + GROUP - 1) // GROUP, 0)

    # flat (sub, PX) packed depth|slot; per-pixel masks stay flat so the
    # attribute fetch can run as ONE one-hot matmul per slot group per
    # sub-block on the MXU (the per-channel take_along_axis version cost
    # 48 lane gathers + selects per group)
    acc_flat = acc_ref[...]  # (sub, PX)
    valid_flat = acc_flat != 0
    slot_flat = acc_flat & SLOT_MASK  # slot == stream index relative to base
    _attr_phase(attrs_ref, gbuf_ref, coeff_ref, attr_buf, attr_cols,
                attr_sem, base=base, n_groups=n_groups,
                valid_flat=valid_flat, slot_flat=slot_flat, ty=ty, tx=tx,
                sub=sub)


def _attr_phase(attrs_ref, gbuf_ref, coeff_ref, attr_buf, attr_cols,
                attr_sem, *, base, n_groups, valid_flat, slot_flat, ty, tx,
                sub):
    coeff_ref[...] = jnp.zeros_like(coeff_ref)
    ew = min(EVAL_WIDTH, GROUP)
    n_slices = GROUP // ew
    ew_shift = ew.bit_length() - 1
    assert 1 << ew_shift == ew

    def sg_body(sg, _):
        sel_all = valid_flat & ((slot_flat >> 7) == sg)  # (sub, PX)
        hit = jnp.any(sel_all)

        @pl.when(hit)
        def _():
            dma = pltpu.make_async_copy(
                attrs_ref.at[:, pl.ds(base + sg * 128, 128)],
                attr_buf,
                attr_sem,
            )
            dma.start()
            dma.wait()
            # pairs into sublane space (native transpose) so eval slices
            # can take dynamic sublane windows — same trick as the vis loop
            attr_cols[...] = attr_buf[...].T  # (GROUP, n_attr)

            def sl_body(j, _):
                base_sl = sg * GROUP + j * ew
                # one-hot (ew, PX): sublane l of column px is 1 iff pixel
                # px's winner is local slot l in this slice; coeff[c, px]
                # then falls out of attr_slice^T (ew, n_attr) x onehot on
                # the MXU. Winner slots are unique per pixel, so
                # accumulation across slices is exact (disjoint supports).
                # The one-hot side is EXACT in bf16 (0.0/1.0), so a manual
                # hi+lo split of the f32 attr side needs only TWO bf16 MXU
                # passes for ~16-bit-mantissa coefficients (vs 6 under
                # Precision.HIGHEST; worst-case coeff relative error 2^-16
                # -> sub-0.05-texel uv error at 4k textures, far below the
                # bilinear filter's own u8 quantization). Slices keep the
                # one-hot build + matmul proportional to where winners
                # actually live instead of fixed 128-wide.
                sel_sl = sel_all & ((slot_flat >> ew_shift)
                    == (base_sl >> ew_shift))

                @pl.when(jnp.any(sel_sl))
                def _():
                    attr_j = attr_cols[pl.ds(j * ew, ew), :]  # (ew, n_attr)
                    a_hi = attr_j.astype(jnp.bfloat16)
                    a_lo = (attr_j
                            - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, (ew, PX_PER_TILE), 0)
                    for s in range(sub):
                        sel = sel_sl[s:s + 1]

                        @pl.when(jnp.any(sel))
                        def _(s=s):
                            onehot = ((slot_flat[s:s + 1] - base_sl)
                                      == lane) & sel
                            oh = onehot.astype(jnp.bfloat16)
                            dims = (((0,), (0,)), ((), ()))
                            vals = jax.lax.dot_general(
                                a_hi, oh, dims,
                                preferred_element_type=jnp.float32)
                            vals = vals + jax.lax.dot_general(
                                a_lo, oh, dims,
                                preferred_element_type=jnp.float32)
                            coeff_ref[s] = coeff_ref[s] + vals
                return 0

            jax.lax.fori_loop(0, n_slices, sl_body, 0)
        return 0

    jax.lax.fori_loop(0, n_groups, sg_body, 0)

    # evaluate attribute planes per pixel, flat (1, PX) per sub-block;
    # reshape each output channel to (TILE_H, TILE_W) rows once at the end
    for s in range(sub):
        basis = _pixel_basis(ty * sub + s, tx)  # (4, PX): x, y, 1, 0 rows
        x = basis[0:1]
        y = basis[1:2]
        valid = valid_flat[s:s + 1]
        coeff = coeff_ref[s]

        def ev(base):
            return (coeff[base:base + 1] * x + coeff[base + 1:base + 2]
                    * y + coeff[base + 2:base + 3])

        def out2d(ch, val_flat):
            gbuf_ref[ch, s * TILE_H:(s + 1) * TILE_H, :] = \
                val_flat.reshape(TILE_H, TILE_W)

        inv_w = ev(0)
        w = jnp.where(valid, _kernel_recip(jnp.maximum(inv_w, 1e-12)), 0.0)
        u_over_w = ev(3)
        v_over_w = ev(6)
        u = u_over_w * w
        v = v_over_w * w
        # rational derivatives: d(U/W)/dx = (Ua - u * Wa) * w
        ua, ub = coeff[3:4], coeff[4:5]
        va, vb = coeff[6:7], coeff[7:8]
        wa, wb = coeff[0:1], coeff[1:2]
        out2d(_CH_U, u)
        out2d(_CH_V, v)
        out2d(_CH_DUDX, (ua - u * wa) * w)
        out2d(_CH_DVDX, (va - v * wa) * w)
        out2d(_CH_DUDY, (ub - u * wb) * w)
        out2d(_CH_DVDY, (vb - v * wb) * w)

        def vec3(base_row, out_base, normalize):
            cx = ev(base_row) * w
            cy = ev(base_row + 3) * w
            cz = ev(base_row + 6) * w
            if normalize:
                inv_len = jax.lax.rsqrt(
                    jnp.maximum(cx * cx + cy * cy + cz * cz, 1e-20))
                cx, cy, cz = cx * inv_len, cy * inv_len, cz * inv_len
            out2d(out_base, jnp.where(valid, cx, 0.0))
            out2d(out_base + 1, jnp.where(valid, cy, 0.0))
            out2d(out_base + 2, jnp.where(valid, cz, 0.0))

        vec3(9, _CH_N, True)
        vec3(18, _CH_T, True)
        out2d(_CH_MAT, coeff[29:30])

        if coeff_ref.shape[1] >= NATTR_PREV:  # dynamic: prev-clip planes
            prev_x = ev(30) * w
            prev_y = ev(33) * w
            prev_w = ev(36) * w
            # signed reciprocal: NR formula needs x > 0, so factor the sign
            ok_w = jnp.abs(prev_w) > 1e-9
            inv_pw = jnp.where(
                ok_w,
                jnp.sign(prev_w)
                * _kernel_recip(jnp.where(ok_w, jnp.abs(prev_w), 1.0)),
                1.0)
            out2d(_CH_PREV, jnp.where(valid, prev_x * inv_pw, 0.0))
            out2d(_CH_PREV + 1, jnp.where(valid, prev_y * inv_pw, 0.0))


def _winner_alpha_kernel(start_ref, count_ref, edges_ref, masks_ref,
                         depth_ref, vis_ref,
                         acc_ref, edge_buf, cols_ref, sems, *, sub=1,
                         row_skip=False):
    """Stage 1 of the SPLIT alpha G-buffer: alpha-tested visibility with
    winner tracking. Splitting keeps BOTH kernels in Mosaic's fast compile
    class (see _gbuffer_kernel docstring)."""
    _depth_resolve_loop(start_ref, count_ref, edges_ref, depth_ref, vis_ref,
                        acc_ref, edge_buf, cols_ref, sems, track_winner=True,
                        masks_ref=masks_ref, sub=sub, row_skip=row_skip)


def _attr_resolve_kernel(start_ref, count_ref, attrs_ref, vis_ref,
                         gbuf_ref, coeff_ref, attr_buf, attr_cols, attr_sem,
                         *, sub=1):
    """Stage 2 of the split alpha G-buffer: attribute fetch + plane eval.

    The per-pixel winner slots arrive as stage 1's vis output (slot >= 0
    or -1): valid = vis >= 0 and slot == vis reconstruct exactly the
    fused kernel's acc-derived masks ((slot >> 7) == sg is never true for
    vis == -1, so invalid pixels select nothing). Identical math to the
    fused kernel's attribute phase."""
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tile = ty * pl.num_programs(1) + tx
    start = start_ref[tile]
    count = count_ref[tile]
    base = pl.multiple_of(start // GROUP * GROUP, GROUP)
    lead = start - base
    n_groups = jnp.where(count > 0, (lead + count + GROUP - 1) // GROUP, 0)
    vis2d = vis_ref[...]  # (sub * TILE_H, TILE_W)
    # same retiling the fused kernel does in reverse ((sub, PX) ->
    # (sub*16, 128)): row-order-preserving, Mosaic-supported for i32
    vis_flat = vis2d.reshape(sub, PX_PER_TILE)
    valid_flat, slot_flat = _vis_decode(vis_flat)
    _attr_phase(attrs_ref, gbuf_ref, coeff_ref, attr_buf, attr_cols,
                attr_sem, base=base, n_groups=n_groups,
                valid_flat=valid_flat, slot_flat=slot_flat, ty=ty, tx=tx,
                sub=sub)


def _rasterize_gbuffer_split(pair_edges, pair_attrs, pairs: PairLists,
                             n_tiles_y: int, n_tiles_x: int,
                             alpha_masks, sub: int, row_skip: bool,
                             interpret: bool):
    """Alpha-tested G-buffer as two pallas_calls (see _gbuffer_kernel)."""
    n_rows = pair_edges.shape[0]
    assert n_rows == 32, n_rows
    n_attr = pair_attrs.shape[0]
    n_chan = GBUF_CHANNELS + (2 if n_attr >= NATTR_PREV else 0)
    h = n_tiles_y * sub * TILE_H
    w = n_tiles_x * TILE_W

    grid_spec1 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles_y, n_tiles_x),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(alpha_masks.shape, lambda ty, tx, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((sub * TILE_H, TILE_W), lambda ty, tx, *_: (ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub * TILE_H, TILE_W), lambda ty, tx, *_: (ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((sub, PX_PER_TILE), jnp.int32),
            pltpu.VMEM((2, n_rows, GROUP), jnp.float32),
            pltpu.VMEM((GROUP, n_rows), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    depth, vis = pl.pallas_call(
        functools.partial(_winner_alpha_kernel, sub=sub, row_skip=row_skip),
        grid_spec=grid_spec1,
        out_shape=[
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
        ],
        interpret=interpret,
    )(pairs.tile_start, pairs.tile_count, pair_edges, alpha_masks)

    grid_spec2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles_y, n_tiles_x),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((sub * TILE_H, TILE_W), lambda ty, tx, *_: (ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_chan, sub * TILE_H, TILE_W),
                         lambda ty, tx, *_: (0, ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((sub, n_attr, PX_PER_TILE), jnp.float32),
            pltpu.VMEM((n_attr, 128), jnp.float32),
            pltpu.VMEM((GROUP, n_attr), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    (gbuf,) = pl.pallas_call(
        functools.partial(_attr_resolve_kernel, sub=sub),
        grid_spec=grid_spec2,
        out_shape=[jax.ShapeDtypeStruct((n_chan, h, w), jnp.float32)],
        interpret=interpret,
    )(pairs.tile_start, pairs.tile_count, pair_attrs, vis)
    return depth, vis, gbuf


@jax.named_scope("raster.gbuffer")
def rasterize_gbuffer(pair_edges, pair_attrs, pairs: PairLists,
                      n_tiles_y: int, n_tiles_x: int, interpret: bool = False,
                      alpha_masks=None, sub: int = 1,
                      row_skip: bool = False):
    """Main-view rasterization producing depth + visibility + G-buffer.

    G-buffer channels: uv (0-1), uv screen derivatives (2-5), world normal
    (6-8), tangent (9-11), packed material*2+handedness (12), and — only
    for dynamic scenes (pair_attrs has NATTR_PREV rows) — previous-frame
    NDC xy (13-14): the depthPrepass.frag outputs plus what triangle.vert
    would feed the forward pass, resolved visibility-buffer style.
    Bitangent and static-scene motion are reconstructed downstream (see
    the NATTR note at the top of this module).
    """
    if alpha_masks is not None:
        # alpha runs the two-kernel split — fusing the alpha-test gather
        # with the attribute matmuls put Mosaic in a pathological compile
        # regime (885 s at bench shapes; split: ~9 s total)
        return _rasterize_gbuffer_split(
            pair_edges, pair_attrs, pairs, n_tiles_y, n_tiles_x,
            alpha_masks, sub, row_skip, interpret)
    n_rows = pair_edges.shape[0]
    assert n_rows == 16, n_rows
    n_attr = pair_attrs.shape[0]
    n_chan = GBUF_CHANNELS + (2 if n_attr >= NATTR_PREV else 0)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.HBM),
    ]
    scratch = [
        pltpu.VMEM((sub, PX_PER_TILE), jnp.int32),
        pltpu.VMEM((sub, n_attr, PX_PER_TILE), jnp.float32),
        pltpu.VMEM((2, n_rows, GROUP), jnp.float32),
        pltpu.VMEM((n_attr, 128), jnp.float32),
        pltpu.VMEM((GROUP, n_rows), jnp.float32),
        pltpu.VMEM((GROUP, n_attr), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA,
    ]
    inputs = [pairs.tile_start, pairs.tile_count, pair_edges, pair_attrs]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles_y, n_tiles_x),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((sub * TILE_H, TILE_W),
                         lambda ty, tx, *_: (ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub * TILE_H, TILE_W),
                         lambda ty, tx, *_: (ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chan, sub * TILE_H, TILE_W),
                         lambda ty, tx, *_: (0, ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
    )
    h = n_tiles_y * sub * TILE_H
    w = n_tiles_x * TILE_W
    depth, vis, gbuf = pl.pallas_call(
        functools.partial(_gbuffer_kernel, sub=sub, row_skip=row_skip),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
            jax.ShapeDtypeStruct((n_chan, h, w), jnp.float32),
        ],
        interpret=interpret,
    )(*inputs)
    return depth, vis, gbuf


# --------------------------------------------------------------------------
# reference rasterizer (numpy, for tests)
# --------------------------------------------------------------------------

def winner_triangle_ids(vis: jnp.ndarray, pairs: PairLists,
                        n_tiles_x: int, sub: int = 1) -> jnp.ndarray:
    """Map per-pixel tile-local slots back to global triangle ids (tests /
    debug visualization only: uses an XLA gather)."""
    h, w = vis.shape
    ty = jnp.arange(h) // (TILE_H * sub)
    tx = jnp.arange(w) // TILE_W
    tile = ty[:, None] * n_tiles_x + tx[None, :]
    # vis slots are relative to the group-aligned floor of the segment start
    base = pairs.tile_start[tile] // GROUP * GROUP
    idx = base + jnp.maximum(vis, 0)
    tri = pairs.pair_tri[jnp.clip(idx, 0, pairs.pair_tri.shape[0] - 1)]
    return jnp.where(vis >= 0, tri, -1)


def reference_rasterize(setup_edges: np.ndarray, valid: np.ndarray,
                        width: int, height: int,
                        alpha_masks: np.ndarray | None = None):
    """Brute-force numpy rasterizer with identical rules (reverse-Z max,
    inside = all edges >= 0 at pixel centers). setup_edges is (3, 4|8, T);
    with 8 planes + alpha_masks the same 64x64 nearest-with-wrap alpha
    test as the Pallas kernels is applied."""
    xs = np.arange(width) + 0.5
    ys = np.arange(height) + 0.5
    depth = np.zeros((height, width), np.float32)
    winner = np.full((height, width), -1, np.int32)
    a, b, c = setup_edges[0], setup_edges[1], setup_edges[2]  # (planes, T)
    n_planes = setup_edges.shape[1]
    for t in range(setup_edges.shape[2]):
        if not valid[t]:
            continue
        ex = a[:, t][:, None, None] * xs[None, None, :] + \
            b[:, t][:, None, None] * ys[None, :, None] + c[:, t][:, None, None]
        cov = (ex[0] >= 0) & (ex[1] >= 0) & (ex[2] >= 0)
        cov = cov & (ex[3] > 0) & (ex[3] <= 1.0)  # far + near clip
        if n_planes == 8 and alpha_masks is not None:
            slot = int(round(c[7, t]))
            if slot > 0:
                inv = 1.0 / np.where(ex[6] > 1e-12, ex[6], 1.0)
                u = ex[4] * inv
                v = ex[5] * inv
                ix = np.clip((u - np.floor(u)) * 64.0, 0.0, 63.0) \
                    .astype(np.int32)
                iy = np.clip((v - np.floor(v)) * 64.0, 0.0, 63.0) \
                    .astype(np.int32)
                word = alpha_masks[slot - 1][iy * 2 + (ix >= 32)]
                bit = (word >> (ix & 31)) & 1
                cov = cov & (bit == 1)
        z = np.clip(ex[3], 0.0, 1.0)
        upd = cov & (z >= depth)
        depth[upd] = z[upd]
        winner[upd] = t
    return depth, winner
