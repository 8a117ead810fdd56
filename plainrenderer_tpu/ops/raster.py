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
1726). Known v1 limitations (documented, revisited in later rounds):
triangles crossing the near plane are culled rather than clipped, and there
is no alpha-test path in the visibility stage yet.
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
SLOT_BITS = 11  # pair-slot bits packed into the depth mantissa
SLOT_MASK = (1 << SLOT_BITS) - 1
MAX_PAIRS_PER_TILE = 1 << SLOT_BITS
NATTR = 48  # attribute-plane rows per triangle (16 planes x 3 coeffs)

def pad_resolution(width: int, height: int) -> tuple[int, int]:
    """Framebuffer padded so tiles divide it exactly."""
    w = (width + TILE_W - 1) // TILE_W * TILE_W
    h = (height + TILE_H - 1) // TILE_H * TILE_H
    return w, h


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TriangleSetup:
    """Per-triangle raster state (all dense, (T,)-leading)."""

    edges: jnp.ndarray  # (3, 4, T) f32: [coeff a/b/c][e0,e1,e2,z][tri]
    attrs: jnp.ndarray  # (NATTR, T) f32 attr-plane rows (main view only)
    tile_bbox: jnp.ndarray  # (T, 4) i32: ty0, tx0, ty1, tx1 (inclusive)
    valid: jnp.ndarray  # (T,) bool


def _edge_coeffs(xa, ya, xb, yb):
    """Edge function E(x, y) = (x-xa)(yb-ya) - (y-ya)(xb-xa) as (a, b, c)."""
    a = yb - ya
    b = -(xb - xa)
    c = -(xa * a + ya * b)
    return a, b, c


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
) -> TriangleSetup:
    """Dense per-triangle setup. Mirrors the vertex-stage semantics of
    triangle.vert / depthPrepass.vert with reverse-Z viewport transform."""
    t_count = corners.shape[0]
    flat = corners.reshape(-1, 3)
    # full f32 matmuls: the TPU default (bf16 MXU passes) shifts projected
    # coordinates by ~1e-3 relative, enough to flip edge tests per pixel
    _dot = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    clip = _dot(flat, view_proj[:3, :3].T) + view_proj[:3, 3]
    clip_w = _dot(flat, view_proj[3, :3]) + view_proj[3, 3]
    clip = clip.reshape(t_count, 3, 3)
    w = clip_w.reshape(t_count, 3)

    w_ok = jnp.all(w > 1e-6, axis=1)
    inv_w = 1.0 / jnp.where(w_ok[:, None], w, 1.0)
    ndc = clip[..., :2] * inv_w[..., None]
    sx = (ndc[..., 0] * 0.5 + 0.5) * width
    sy = (ndc[..., 1] * 0.5 + 0.5) * height  # Vulkan NDC y-down == screen y
    z = clip[..., 2] * inv_w  # reverse-Z in [0, 1]

    x0, x1, x2 = sx[:, 0], sx[:, 1], sx[:, 2]
    y0, y1, y2 = sy[:, 0], sy[:, 1], sy[:, 2]
    area2 = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)

    if cull == "back":
        face_ok = area2 > 0
    elif cull == "front":
        face_ok = area2 < 0
    else:
        face_ok = jnp.abs(area2) > 0
    valid = w_ok & face_ok & tri_visible & (jnp.abs(area2) > 1e-12)

    # orient edges so inside == all(E >= 0) for either winding
    # (E as defined above is negative inside positive-area triangles)
    flip = jnp.where(area2 < 0, 1.0, -1.0)
    e0 = _edge_coeffs(x0, y0, x1, y1)
    e1 = _edge_coeffs(x1, y1, x2, y2)
    e2 = _edge_coeffs(x2, y2, x0, y0)

    # screen-affine plane through (x_i, y_i, q_i): q(x,y) = a x + b y + c
    inv_area = 1.0 / jnp.where(valid, area2, 1.0)

    def plane(q0, q1, q2):
        qa = ((q1 - q0) * (y2 - y0) - (q2 - q0) * (y1 - y0)) * inv_area
        qb = ((q2 - q0) * (x1 - x0) - (q1 - q0) * (x2 - x0)) * inv_area
        qc = q0 - qa * x0 - qb * y0
        return qa, qb, qc

    zp = plane(z[:, 0], z[:, 1], z[:, 2])
    never = (jnp.zeros_like(x0), jnp.zeros_like(x0), jnp.full_like(x0, -1.0))
    e0 = tuple(jnp.where(valid, c * flip, n) for c, n in zip(e0, never))
    e1 = tuple(jnp.where(valid, c * flip, n) for c, n in zip(e1, never))
    e2 = tuple(jnp.where(valid, c * flip, n) for c, n in zip(e2, never))
    zp = tuple(jnp.where(valid, c, 0.0) for c in zp)

    # edges layout (3 coeffs, 4 planes, T)
    edges = jnp.stack(
        [
            jnp.stack([e0[0], e1[0], e2[0], zp[0]], axis=0),
            jnp.stack([e0[1], e1[1], e2[1], zp[1]], axis=0),
            jnp.stack([e0[2], e1[2], e2[2], zp[2]], axis=0),
        ],
        axis=0,
    ).astype(jnp.float32)

    # tile bbox (clamped); invalid tris get an empty bbox
    ntx = width // TILE_W
    nty = height // TILE_H
    xmin = jnp.minimum(jnp.minimum(x0, x1), x2)
    xmax = jnp.maximum(jnp.maximum(x0, x1), x2)
    ymin = jnp.minimum(jnp.minimum(y0, y1), y2)
    ymax = jnp.maximum(jnp.maximum(y0, y1), y2)
    tx0 = jnp.clip(jnp.floor(xmin / TILE_W), 0, ntx - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(xmax / TILE_W), 0, ntx - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(ymin / TILE_H), 0, nty - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(ymax / TILE_H), 0, nty - 1).astype(jnp.int32)
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

    if not with_attrs:
        attrs = jnp.zeros((NATTR, 0), jnp.float32)
        return TriangleSetup(edges=edges, attrs=attrs, tile_bbox=tile_bbox,
                             valid=valid)

    # perspective-correct attribute planes: interpolate q/w and 1/w affinely
    prev_clip = _dot(flat, prev_view_proj[:3, :3].T) + prev_view_proj[:3, 3]
    prev_w = _dot(flat, prev_view_proj[3, :3]) + prev_view_proj[3, 3]
    prev_clip = prev_clip.reshape(t_count, 3, 3)
    prev_w = prev_w.reshape(t_count, 3)

    rows = []

    def add_plane(q_corners):  # q_corners (T, 3)
        rows.extend(plane(q_corners[:, 0], q_corners[:, 1], q_corners[:, 2]))

    add_plane(inv_w)  # rows 0-2: 1/w
    add_plane(corner_uvs[..., 0] * inv_w)  # 3-5: u/w
    add_plane(corner_uvs[..., 1] * inv_w)  # 6-8: v/w
    for comp in range(3):  # 9-17: normal/w
        add_plane(corner_normals[..., comp] * inv_w)
    for comp in range(3):  # 18-26: tangent/w
        add_plane(corner_tangents[..., comp] * inv_w)
    for comp in range(3):  # 27-35: bitangent/w
        add_plane(corner_bitangents[..., comp] * inv_w)
    add_plane(prev_clip[..., 0] * inv_w)  # 36-38: prev clip x / w
    add_plane(prev_clip[..., 1] * inv_w)  # 39-41: prev clip y / w
    add_plane(prev_w * inv_w)  # 42-44: prev w / w
    # 45-47: material id as a constant plane (a=b=0, c=id)
    rows.append(jnp.zeros_like(x0))
    rows.append(jnp.zeros_like(x0))
    rows.append(tri_material.astype(jnp.float32))

    attrs = jnp.stack(rows, axis=0).astype(jnp.float32)  # (NATTR, T)
    return TriangleSetup(edges=edges, attrs=attrs, tile_bbox=tile_bbox,
                         valid=valid)


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


def _fill_forward(values_per_tri, offsets, p_max):
    """g[j] = values_per_tri[owner(j)] without a (P,)-sized gather.

    owner(j) is non-decreasing (cumsum expansion), so scatter the per-
    triangle DELTA at each triangle's first pair index and inclusive-cumsum:
    deltas telescope, ties (zero-span triangles sharing an offset) resolve
    to the last triangle of the tie group — exactly the owner. Cost: one
    T-sized scatter-add + one P cumsum instead of a P-sized gather (XLA TPU
    gathers cost ~8 cycles/element; the scatter is 4x smaller and cumsum is
    a dense log-pass scan)."""
    deltas = jnp.diff(values_per_tri, prepend=0)
    acc = jnp.zeros((p_max,), jnp.int32).at[offsets].add(
        deltas, mode="drop")
    return jnp.cumsum(acc)


@jax.named_scope("raster.build_pairs")
def build_pairs(setup: TriangleSetup, n_tiles_y: int, n_tiles_x: int,
                pairs_per_tri: float = 4.0, n_views: int = 1) -> PairLists:
    """Expand triangles into sorted per-tile pair lists.

    EXACT per-triangle tile-coverage expansion: the candidate stream is
    ~len(sum of spans), typically ~1.2x the triangle count at 1080p. The
    owner triangle of pair j and its packed tile geometry are recovered with
    scatter+cumsum fill-forward (no large gathers, no searchsorted — both
    measured several ms at this size), then ONE packed-key lax.sort (the
    TPU radix sort) orders the stream by (tile, tri). Per-tile segments are
    NOT re-aligned: the raster kernels DMA from the group-aligned floor of
    each segment start and mask the lead-in (the DMA engine requires
    128-lane-aligned offsets; masking is free, re-gathering the stream into
    aligned segments measured ~6 ms).

    pairs_per_tri bounds the static candidate size; overflow (dropped pairs)
    is counted in the result for observability.

    n_views > 1: the setup is a vertical ATLAS of n_views independent views
    (e.g. all shadow cascades in one raster pass, SURVEY 3.2 pass 8) — the
    triangle stream is n_views blocks of t/n_views triangles whose bboxes
    were offset into each view's tile-row band. The sort key then packs the
    VIEW-LOCAL triangle index (a triangle's tiles never cross views), which
    keeps the key in int32 at atlas sizes a global index would overflow.
    """
    t_count = setup.valid.shape[0]
    n_tiles = n_tiles_y * n_tiles_x
    assert t_count % n_views == 0 and n_tiles % n_views == 0
    tpv = t_count // n_views  # triangles per view
    tiles_per_view = n_tiles // n_views
    assert (n_tiles + 1) * (tpv + 1) < 2 ** 31, "packed key overflow"
    assert n_tiles_y <= 512 and n_tiles_x <= 128, "bbox packing overflow"
    ty0, tx0, ty1, tx1 = (setup.tile_bbox[:, i] for i in range(4))
    span_y = jnp.where(setup.valid, ty1 - ty0 + 1, 0)
    span_x = jnp.where(setup.valid, tx1 - tx0 + 1, 0)
    span = span_y * span_x

    ends = jnp.cumsum(span)  # inclusive prefix counts
    offsets = ends - span
    total = ends[-1]
    # slack scales with BOTH triangle count (small tris) and tile count
    # (a handful of huge floor/wall triangles can each cover the whole
    # grid — at low triangle counts they dominate the pair budget)
    p_max = int(t_count * pairs_per_tri) + 4 * n_tiles
    p_max = max(GROUP, (p_max + GROUP - 1) // GROUP * GROUP)
    overflow = jnp.maximum(total - p_max, 0)

    j = jnp.arange(p_max, dtype=jnp.int32)
    # owner triangle of pair j: #(ends <= j), via an ends-histogram cumsum
    cnt = jnp.zeros((p_max,), jnp.int32).at[ends].add(1, mode="drop")
    tri = jnp.clip(jnp.cumsum(cnt), 0, t_count - 1)
    # packed tile geometry of the owner, fill-forwarded to pair order:
    # ty0[9b] | tx0[7b] | span_x[7b] | span_y[8b]
    geom_packed = (((ty0 * 128 + tx0) * 128 + span_x) * 256
                   + jnp.minimum(span_y, 255))
    g = _fill_forward(geom_packed, offsets, p_max)
    off = _fill_forward(offsets, offsets, p_max)
    g_span_y = g & 255
    g_span_x = (g >> 8) & 127
    g_tx0 = (g >> 15) & 127
    g_ty0 = g >> 22
    local = j - off
    in_use = (j < total) & (local >= 0) & (local < g_span_x * g_span_y)
    sxw = jnp.maximum(g_span_x, 1)
    dy = local // sxw
    dx = local - dy * sxw
    tile = (g_ty0 + dy) * n_tiles_x + (g_tx0 + dx)

    tri_local = tri - (tri // tpv) * tpv
    key = jnp.where(in_use, tile * (tpv + 1) + tri_local,
                    jnp.int32(n_tiles * (tpv + 1)))
    keys_sorted = jax.lax.sort(key)
    # recover the GLOBAL triangle index: the tile determines the view
    # (sentinel keys decode to tile == n_tiles -> view n_views -> index
    # t_count, the degenerate padding row)
    tile_s = keys_sorted // (tpv + 1)
    tri_glob = (tile_s // tiles_per_view) * tpv + keys_sorted % (tpv + 1)
    # one GROUP of degenerate tail pairs: the kernels' aligned DMAs can read
    # up to GROUP-1 entries past the last tile's segment end
    pair_tri = jnp.concatenate([
        jnp.minimum(tri_glob, t_count),
        jnp.full((GROUP,), t_count, jnp.int32)])

    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    raw_start = jnp.searchsorted(
        keys_sorted, tile_ids * (tpv + 1)).astype(jnp.int32)
    raw_end = jnp.searchsorted(
        keys_sorted, (tile_ids + 1) * (tpv + 1)).astype(jnp.int32)
    n_real = raw_end - raw_start
    # cap leaves room for the group-aligned lead-in masked by the kernel
    capped = jnp.minimum(n_real, MAX_PAIRS_PER_TILE - GROUP)
    overflow = overflow + jnp.sum(n_real - capped)

    return PairLists(
        pair_tri=pair_tri,
        tile_start=raw_start,
        tile_count=capped,
        overflow=overflow,
    )


@jax.named_scope("raster.gather_pair_setups")
def gather_pair_setups(setup: TriangleSetup, pairs: PairLists,
                       with_attrs: bool):
    """Duplicate per-triangle setups into pair order (contiguous-row takes).

    Returns (pair_edges (16, P) f32, pair_attrs (NATTR, P) f32 | None).
    The kernel DMAs contiguous (16, GROUP) / (NATTR, GROUP) slices of these;
    rows are plane-major [a, b, c, 0] x 4 planes so the sublane extent (16)
    and lane offsets (tile_start multiples of GROUP=128) satisfy the DMA
    engine's tile-alignment rules, and the kernel needs no shape cast
    (Mosaic rejects lane-crossing reshapes, the round-1 blocker).
    """
    t_count = setup.valid.shape[0]
    # pad triangle tables with one degenerate entry at index T
    never = jnp.zeros((3, 4, 1), jnp.float32).at[2, :, 0].set(-1.0)
    edges_pad = jnp.concatenate([setup.edges, never], axis=2)  # (3,4,T+1)
    # (T+1, 16) rows [plane-major: a, b, c, pad] for the copy-speed take
    e = edges_pad.transpose(2, 1, 0)  # (T+1, 4 planes, 3 coeffs)
    e = jnp.pad(e, ((0, 0), (0, 0), (0, 1)))
    edges_rows = e.reshape(t_count + 1, 16)

    if not with_attrs:
        pair_rows = edges_rows[pairs.pair_tri]  # (P, 16) contiguous-row take
        return pair_rows.T, None

    # ONE combined (T+1, 16+NATTR) row gather: XLA's TPU row gather costs
    # ~per-row, so gathering edges and attrs separately paid twice
    attrs_pad = jnp.concatenate(
        [setup.attrs, jnp.zeros((NATTR, 1), jnp.float32)], axis=1)
    rows = jnp.concatenate([edges_rows, attrs_pad.T], axis=1)
    pair_rows = rows[pairs.pair_tri]  # (P, 16 + NATTR)
    pair_edges = pair_rows[:, :16].T  # (16, P)
    pair_attrs = pair_rows[:, 16:].T  # (NATTR, P)
    return pair_edges, pair_attrs


# --------------------------------------------------------------------------
# raster kernels
# --------------------------------------------------------------------------

GBUF_CHANNELS = 18
_CH_U, _CH_V = 0, 1
_CH_DUDX, _CH_DVDX, _CH_DUDY, _CH_DVDY = 2, 3, 4, 5
_CH_N = 6  # 6-8 normal
_CH_T = 9  # 9-11 tangent
_CH_B = 12  # 12-14 bitangent
_CH_PREV = 15  # 15-16 prev ndc xy
_CH_MAT = 17

def _pixel_basis(tile_y, tile_x):
    """(4, PX_PER_TILE) matrix [x; y; 1; 0] at pixel centers for this tile.

    Pixels are laid out lane-linear: lane j = (row j // TILE_W, col j %
    TILE_W) of the tile; the final (1, PX) accumulator reshapes to
    (TILE_H, TILE_W) once per tile. The zero 4th row pairs with the pad
    coefficient row of the (16, P) edge layout.
    """
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, PX_PER_TILE), 1)
    x_local = (lin % TILE_W).astype(jnp.float32) + 0.5
    y_local = (lin // TILE_W).astype(jnp.float32) + 0.5
    x = x_local + (tile_x * TILE_W).astype(jnp.float32)
    y = y_local + (tile_y * TILE_H).astype(jnp.float32)
    ones = jnp.ones_like(x)
    zeros = jnp.zeros_like(x)
    return jnp.concatenate([x, y, ones, zeros], axis=0)  # (4, PX)


def _depth_resolve_loop(start_ref, count_ref, edges_ref, depth_ref, vis_ref,
                        acc_ref, edge_buf, sems, *, track_winner: bool,
                        depth_clamp: bool = False):
    """Shared visibility loop: stream GROUP-sized pair-setup slices, evaluate
    edge+depth planes on the MXU, resolve a packed (depth | slot) max.

    Per-tile segments start at ARBITRARY stream offsets; DMAs read from the
    group-aligned floor (the DMA engine needs 128-lane-aligned offsets) and
    the lead-in/tail rows outside [start, start+count) are masked. Slots are
    tracked relative to the aligned base so the G-buffer attribute refetch
    uses the same aligned DMA grid."""
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tile = ty * pl.num_programs(1) + tx
    start = start_ref[tile]
    count = count_ref[tile]
    base = pl.multiple_of(start // GROUP * GROUP, GROUP)
    lead = start - base
    n_groups = jnp.where(count > 0, (lead + count + GROUP - 1) // GROUP, 0)

    basis = _pixel_basis(ty, tx)  # (3, PX)
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def group_dma(slot, g):
        return pltpu.make_async_copy(
            edges_ref.at[:, pl.ds(base + g * GROUP, GROUP)],
            edge_buf.at[slot],
            sems.at[slot],
        )

    @pl.when(n_groups > 0)
    def _():
        group_dma(0, 0).start()

    def group_body(g, _):
        slot = jax.lax.rem(g, 2)

        @pl.when(g + 1 < n_groups)
        def _():
            group_dma(1 - slot, g + 1).start()

        group_dma(slot, g).wait()
        mat = edge_buf[slot]  # (16, GROUP): 4 planes x [a, b, c, pad]

        # per plane p: (4, GROUP) coeffs x (4, PX) basis -> (GROUP, PX);
        # value-level sublane slices, no shape cast
        def plane_eval(p):
            return jax.lax.dot_general(
                mat[4 * p:4 * p + 4], basis, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        e0 = plane_eval(0)
        e1 = plane_eval(1)
        e2 = plane_eval(2)
        zz = plane_eval(3)
        cov = jnp.minimum(jnp.minimum(e0, e1), e2) >= 0.0
        # mask rows outside this tile's [start, start+count) segment
        row = (jax.lax.broadcasted_iota(jnp.int32, (GROUP, PX_PER_TILE), 0)
               + g * GROUP)
        cov = cov & (row >= lead) & (row < lead + count)
        if depth_clamp:
            # sun-shadow semantics: the reference renders cascades with
            # depth clamping (lightMatrix.comp:62 comment), so casters
            # outside the fitted z-range still write clamped depth
            zc = jnp.clip(zz, 1.0 / 16384.0, 1.0)
        else:
            cov = cov & (zz > 0.0)
            zc = jnp.clip(zz, 0.0, 1.0)
        zi = pltpu.bitcast(zc, jnp.int32)
        if track_winner:
            cand = jnp.where(cov, (zi & jnp.int32(~SLOT_MASK)) | row, 0)
        else:
            cand = jnp.where(cov, zi, 0)
        group_max = jnp.max(cand, axis=0, keepdims=True)  # (1, PX)
        acc_ref[...] = jnp.maximum(acc_ref[...], group_max)
        return 0

    jax.lax.fori_loop(0, n_groups, group_body, 0)

    # reshape the i32 accumulator ONCE to (TILE_H, TILE_W); all masks are
    # derived in 2D afterwards (Mosaic rejects i1 lane-crossing reshapes)
    acc2d = acc_ref[...].reshape(TILE_H, TILE_W)
    if track_winner:
        depth_bits = acc2d & jnp.int32(~SLOT_MASK)
    else:
        depth_bits = acc2d
    depth_ref[...] = pltpu.bitcast(depth_bits, jnp.float32)
    if vis_ref is not None:
        vis_ref[...] = jnp.where(acc2d != 0, acc2d & SLOT_MASK, -1)


def _depth_kernel(start_ref, count_ref, edges_ref, depth_ref,
                  acc_ref, edge_buf, sems):
    _depth_resolve_loop(start_ref, count_ref, edges_ref, depth_ref, None,
                        acc_ref, edge_buf, sems, track_winner=False,
                        depth_clamp=True)


@jax.named_scope("raster.depth")
def rasterize_depth(pair_edges, pairs: PairLists, n_tiles_y: int,
                    n_tiles_x: int, interpret: bool = False):
    """Depth-only rasterization (sun-shadow cascades, sunShadow.frag parity).

    Returns depth (H, W) f32 reverse-Z (0 = far / no coverage).
    """
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles_y, n_tiles_x),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, *_: (ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, PX_PER_TILE), jnp.int32),
            pltpu.VMEM((2, 16, GROUP), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    h = n_tiles_y * TILE_H
    w = n_tiles_x * TILE_W
    (depth,) = pl.pallas_call(
        _depth_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((h, w), jnp.float32)],
        interpret=interpret,
    )(pairs.tile_start, pairs.tile_count, pair_edges)
    return depth


def _gbuffer_kernel(start_ref, count_ref, edges_ref, attrs_ref,
                    depth_ref, vis_ref, gbuf_ref,
                    acc_ref, coeff_ref, edge_buf, attr_buf, sems, attr_sem):
    """Full visibility + attribute resolve for the main view."""
    _depth_resolve_loop(start_ref, count_ref, edges_ref, depth_ref, vis_ref,
                        acc_ref, edge_buf, sems, track_winner=True)

    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tile = ty * pl.num_programs(1) + tx
    start = start_ref[tile]
    count = count_ref[tile]
    base = pl.multiple_of(start // GROUP * GROUP, GROUP)
    lead = start - base
    n_groups = jnp.where(count > 0, (lead + count + GROUP - 1) // GROUP, 0)

    # i32 reshape once; masks derived in 2D (i1 reshapes are Mosaic-illegal)
    acc2d = acc_ref[...].reshape(TILE_H, TILE_W)  # packed depth|slot
    valid2d = acc2d != 0
    slot2d = acc2d & SLOT_MASK  # slot == stream index relative to base

    coeff_ref[...] = jnp.zeros_like(coeff_ref)
    n_slot_groups = n_groups

    def sg_body(sg, _):
        sel8 = valid2d & ((slot2d >> 7) == sg)
        hit = jnp.any(sel8)

        @pl.when(hit)
        def _():
            dma = pltpu.make_async_copy(
                attrs_ref.at[:, pl.ds(base + sg * 128, 128)],
                attr_buf,
                attr_sem,
            )
            dma.start()
            dma.wait()
            # per-pixel local slot in [0, 128) -> lane-gather indices
            idx8 = jnp.clip(slot2d - sg * 128, 0, 127)
            for c in range(NATTR):
                row = jnp.broadcast_to(attr_buf[c:c + 1, :], (TILE_H, 128))
                val = jnp.take_along_axis(row, idx8, axis=1)
                coeff_ref[c] = jnp.where(sel8, val, coeff_ref[c])
        return 0

    jax.lax.fori_loop(0, n_slot_groups, sg_body, 0)

    # evaluate attribute planes per pixel
    lin = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    x = lin.astype(jnp.float32) + 0.5 + (tx * TILE_W)
    yrow = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    y = yrow.astype(jnp.float32) + 0.5 + (ty * TILE_H)
    valid = valid2d

    def ev(base):
        return coeff_ref[base] * x + coeff_ref[base + 1] * y + coeff_ref[base + 2]

    inv_w = ev(0)
    w = jnp.where(valid, 1.0 / jnp.maximum(inv_w, 1e-12), 0.0)
    u_over_w = ev(3)
    v_over_w = ev(6)
    u = u_over_w * w
    v = v_over_w * w
    # rational derivatives: d(U/W)/dx = (Ua - u * Wa) * w
    ua, ub = coeff_ref[3], coeff_ref[4]
    va, vb = coeff_ref[6], coeff_ref[7]
    wa, wb = coeff_ref[0], coeff_ref[1]
    gbuf_ref[_CH_U] = u
    gbuf_ref[_CH_V] = v
    gbuf_ref[_CH_DUDX] = (ua - u * wa) * w
    gbuf_ref[_CH_DVDX] = (va - v * wa) * w
    gbuf_ref[_CH_DUDY] = (ub - u * wb) * w
    gbuf_ref[_CH_DVDY] = (vb - v * wb) * w

    def vec3(base_row, out_base, normalize):
        cx = ev(base_row) * w
        cy = ev(base_row + 3) * w
        cz = ev(base_row + 6) * w
        if normalize:
            inv_len = jax.lax.rsqrt(jnp.maximum(cx * cx + cy * cy + cz * cz,
                                                1e-20))
            cx, cy, cz = cx * inv_len, cy * inv_len, cz * inv_len
        gbuf_ref[out_base] = jnp.where(valid, cx, 0.0)
        gbuf_ref[out_base + 1] = jnp.where(valid, cy, 0.0)
        gbuf_ref[out_base + 2] = jnp.where(valid, cz, 0.0)

    vec3(9, _CH_N, True)
    vec3(18, _CH_T, True)
    vec3(27, _CH_B, True)

    prev_x = ev(36) * w
    prev_y = ev(39) * w
    prev_w = ev(42) * w
    inv_pw = 1.0 / jnp.where(jnp.abs(prev_w) > 1e-9, prev_w, 1.0)
    gbuf_ref[_CH_PREV] = jnp.where(valid, prev_x * inv_pw, 0.0)
    gbuf_ref[_CH_PREV + 1] = jnp.where(valid, prev_y * inv_pw, 0.0)
    gbuf_ref[_CH_MAT] = coeff_ref[47]


@jax.named_scope("raster.gbuffer")
def rasterize_gbuffer(pair_edges, pair_attrs, pairs: PairLists,
                      n_tiles_y: int, n_tiles_x: int, interpret: bool = False):
    """Main-view rasterization producing depth + visibility + G-buffer.

    G-buffer channels: uv (0-1), uv screen derivatives (2-5), world normal
    (6-8), tangent (9-11), bitangent (12-14), previous-frame NDC xy (15-16),
    material id (17) — the depthPrepass.frag outputs plus what triangle.vert
    would feed the forward pass, resolved visibility-buffer style.
    """
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles_y, n_tiles_x),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, *_: (ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, *_: (ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GBUF_CHANNELS, TILE_H, TILE_W),
                         lambda ty, tx, *_: (0, ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, PX_PER_TILE), jnp.int32),
            pltpu.VMEM((NATTR, TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((2, 16, GROUP), jnp.float32),
            pltpu.VMEM((NATTR, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    h = n_tiles_y * TILE_H
    w = n_tiles_x * TILE_W
    depth, vis, gbuf = pl.pallas_call(
        _gbuffer_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
            jax.ShapeDtypeStruct((GBUF_CHANNELS, h, w), jnp.float32),
        ],
        interpret=interpret,
    )(pairs.tile_start, pairs.tile_count, pair_edges, pair_attrs)
    return depth, vis, gbuf


# --------------------------------------------------------------------------
# reference rasterizer (numpy, for tests)
# --------------------------------------------------------------------------

def winner_triangle_ids(vis: jnp.ndarray, pairs: PairLists,
                        n_tiles_x: int) -> jnp.ndarray:
    """Map per-pixel tile-local slots back to global triangle ids (tests /
    debug visualization only: uses an XLA gather)."""
    h, w = vis.shape
    ty = jnp.arange(h) // TILE_H
    tx = jnp.arange(w) // TILE_W
    tile = ty[:, None] * n_tiles_x + tx[None, :]
    # vis slots are relative to the group-aligned floor of the segment start
    base = pairs.tile_start[tile] // GROUP * GROUP
    idx = base + jnp.maximum(vis, 0)
    tri = pairs.pair_tri[jnp.clip(idx, 0, pairs.pair_tri.shape[0] - 1)]
    return jnp.where(vis >= 0, tri, -1)


def reference_rasterize(setup_edges: np.ndarray, valid: np.ndarray,
                        width: int, height: int):
    """Brute-force numpy rasterizer with identical rules (reverse-Z max,
    inside = all edges >= 0 at pixel centers). setup_edges is (3, 4, T)."""
    xs = np.arange(width) + 0.5
    ys = np.arange(height) + 0.5
    depth = np.zeros((height, width), np.float32)
    winner = np.full((height, width), -1, np.int32)
    a, b, c = setup_edges[0], setup_edges[1], setup_edges[2]  # (4, T)
    for t in range(setup_edges.shape[2]):
        if not valid[t]:
            continue
        ex = a[:, t][:, None, None] * xs[None, None, :] + \
            b[:, t][:, None, None] * ys[None, :, None] + c[:, t][:, None, None]
        cov = (ex[0] >= 0) & (ex[1] >= 0) & (ex[2] >= 0)
        z = np.clip(ex[3], 0.0, 1.0)
        upd = cov & (z > 0) & (z >= depth)
        depth[upd] = z[upd]
        winner[upd] = t
    return depth, winner
