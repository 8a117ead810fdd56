import jax.numpy as jnp
import numpy as np
import pytest

from plainrenderer_tpu.ops import raster
from plainrenderer_tpu.scene import camera as cam

W, H = 256, 64  # 2x4 tiles
NTX, NTY = W // raster.TILE_W, H // raster.TILE_H


def make_setup(tris_world, vp=None, prev_vp=None, cull="none", uvs=None,
               alpha_slots=None, prev_corners=None):
    """tris_world: (T, 3, 3) world corners."""
    t = np.asarray(tris_world, np.float32)
    n = t.shape[0]
    if vp is None:
        # simple orthographic-ish: x,y in [0,1] map to screen, z passthrough
        vp = np.eye(4, dtype=np.float32)
        vp[0, 0] = 2.0
        vp[0, 3] = -1.0
        vp[1, 1] = 2.0
        vp[1, 3] = -1.0
    if prev_vp is None:
        prev_vp = vp
    if uvs is None:
        uvs = np.zeros((n, 3, 2), np.float32)
        uvs[:, 1, 0] = 1.0
        uvs[:, 2, 1] = 1.0
    normals = np.tile(np.asarray([0, 0, 1], np.float32), (n, 3, 1))
    return raster.geometry_setup(
        jnp.asarray(t), jnp.asarray(uvs), jnp.asarray(normals),
        jnp.asarray(normals), jnp.asarray(normals),
        jnp.zeros((n,), jnp.float32), jnp.ones((n,), bool),
        jnp.asarray(vp), jnp.asarray(prev_vp), W, H, cull=cull,
        tri_alpha_slot=None if alpha_slots is None
        else jnp.asarray(alpha_slots, jnp.int32),
        prev_corners=None if prev_corners is None
        else jnp.asarray(prev_corners, jnp.float32),
    )


def unit_tri(cx, cy, size, z):
    """Counter-clockwise-on-screen triangle in [0,1]^2 ortho space."""
    return [
        [cx - size, cy - size, z],
        [cx + size, cy - size, z],
        [cx, cy + size, z],
    ]


def full_raster(setup, interpret=True, alpha_masks=None):
    pairs = raster.build_pairs(setup, NTY, NTX)
    pair_edges, pair_attrs = raster.gather_pair_setups(setup, pairs, True)
    depth, vis, gbuf = raster.rasterize_gbuffer(
        pair_edges, pair_attrs, pairs, NTY, NTX, interpret=interpret,
        alpha_masks=None if alpha_masks is None
        else jnp.asarray(alpha_masks),
    )
    tri_ids = raster.winner_triangle_ids(vis, pairs, NTX)
    return np.asarray(depth), np.asarray(tri_ids), np.asarray(gbuf), pairs


def test_single_triangle_coverage_and_depth():
    setup = make_setup([unit_tri(0.5, 0.5, 0.3, 0.75)])
    depth, ids, gbuf, pairs = full_raster(setup)
    ref_depth, ref_ids = raster.reference_rasterize(
        np.asarray(setup.edges), np.asarray(setup.valid), W, H
    )
    assert (ids >= 0).sum() > 100
    np.testing.assert_array_equal(ids >= 0, ref_ids >= 0)
    # depth quantized to 12-bit mantissa by slot packing
    covered = ids >= 0
    np.testing.assert_allclose(depth[covered], ref_depth[covered], atol=2e-3)
    assert int(pairs.overflow) == 0


def test_depth_test_greater_equal_reverse_z(rng):
    # near triangle (z=0.9) drawn FIRST, far (z=0.4) second, overlapping:
    # reverse-Z max keeps the near one.
    tris = [unit_tri(0.5, 0.5, 0.35, 0.9), unit_tri(0.5, 0.5, 0.35, 0.4)]
    setup = make_setup(tris)
    depth, ids, _, _ = full_raster(setup)
    overlap = ids >= 0
    assert overlap.sum() > 100
    assert (ids[overlap] == 0).all()
    np.testing.assert_allclose(depth[overlap].max(), 0.9, atol=2e-3)


def test_many_random_triangles_match_reference(rng):
    tris = []
    for _ in range(40):
        cx, cy = rng.uniform(0.1, 0.9, 2)
        size = rng.uniform(0.02, 0.2)
        z = rng.uniform(0.1, 0.95)
        tris.append(unit_tri(cx, cy, size, z))
    setup = make_setup(tris)
    depth, ids, _, pairs = full_raster(setup)
    ref_depth, ref_ids = raster.reference_rasterize(
        np.asarray(setup.edges), np.asarray(setup.valid), W, H
    )
    np.testing.assert_array_equal(ids >= 0, ref_ids >= 0)
    covered = ids >= 0
    # winners must match except where quantized depths tie
    diff = ids[covered] != ref_ids[covered]
    assert diff.mean() < 0.01
    np.testing.assert_allclose(depth[covered], ref_depth[covered], atol=2e-3)


def test_binning_covers_all_tiles_of_large_triangle():
    # one triangle covering most of the screen -> fullscreen span class
    setup = make_setup([unit_tri(0.5, 0.5, 1.2, 0.5)])
    depth, ids, _, pairs = full_raster(setup)
    ref_depth, ref_ids = raster.reference_rasterize(
        np.asarray(setup.edges), np.asarray(setup.valid), W, H
    )
    np.testing.assert_array_equal(ids >= 0, ref_ids >= 0)
    assert (ids >= 0).sum() > 0.5 * W * H


@pytest.mark.parametrize("sub", [2, 4])
def test_sub_bin_parity_matches_reference(rng, sub):
    """Pixel parity of the sub>1 bin path (bin_rows=2/4 + sub=2/4), the
    production configuration for the main view (sub=2) and shadow atlas
    (sub=8): depth + winner ids must match reference_rasterize exactly like
    the sub=1 tests do (ADVICE r2: a sub-block indexing bug — pixel-basis
    offset, winner-slot decode, gbuf row slice — would otherwise pass CI)."""
    tris = []
    for _ in range(30):
        cx, cy = rng.uniform(0.05, 0.95, 2)
        size = rng.uniform(0.02, 0.25)
        z = rng.uniform(0.1, 0.95)
        tris.append(unit_tri(cx, cy, size, z))
    t = np.asarray(tris, np.float32)
    n = t.shape[0]
    vp = np.eye(4, dtype=np.float32)
    vp[0, 0] = 2.0
    vp[0, 3] = -1.0
    vp[1, 1] = 2.0
    vp[1, 3] = -1.0
    uvs = np.zeros((n, 3, 2), np.float32)
    uvs[:, 1, 0] = 1.0
    uvs[:, 2, 1] = 1.0
    normals = np.tile(np.asarray([0, 0, 1], np.float32), (n, 3, 1))
    setup = raster.geometry_setup(
        jnp.asarray(t), jnp.asarray(uvs), jnp.asarray(normals),
        jnp.asarray(normals), jnp.asarray(normals),
        jnp.zeros((n,), jnp.float32), jnp.ones((n,), bool),
        jnp.asarray(vp), jnp.asarray(vp), W, H, cull="none",
        bin_rows=sub)
    nty_b = H // (raster.TILE_H * sub)
    pairs = raster.build_pairs(setup, nty_b, NTX)
    pair_edges, pair_attrs = raster.gather_pair_setups(setup, pairs, True)
    depth, vis, gbuf = raster.rasterize_gbuffer(
        pair_edges, pair_attrs, pairs, nty_b, NTX, interpret=True, sub=sub)
    ids = np.asarray(raster.winner_triangle_ids(vis, pairs, NTX, sub=sub))
    depth = np.asarray(depth)
    ref_depth, ref_ids = raster.reference_rasterize(
        np.asarray(setup.edges), np.asarray(setup.valid), W, H)
    np.testing.assert_array_equal(ids >= 0, ref_ids >= 0)
    covered = ids >= 0
    assert covered.sum() > 200
    assert (ids[covered] != ref_ids[covered]).mean() < 0.01
    np.testing.assert_allclose(depth[covered], ref_depth[covered], atol=2e-3)
    assert int(pairs.overflow) == 0
    # depth-only kernel on the same binned pairs (shadow-atlas path);
    # clamps at 1/16384 instead of dropping z <= 0
    edges_d, _ = raster.gather_pair_setups(setup, pairs, False)
    d2 = np.asarray(raster.rasterize_depth(
        edges_d, pairs, nty_b, NTX, interpret=True, sub=sub))
    np.testing.assert_allclose(d2[covered], ref_depth[covered], atol=2e-3)
    # row-skip path (production shadow atlas): y-sorted pair emission +
    # fine-row extents in the pad rows + per-group sub-block skipping must
    # produce the IDENTICAL depth image
    pairs_r = raster.build_pairs(setup, nty_b, NTX, bin_rows=sub,
                                 order_rows=True)
    edges_r, _ = raster.gather_pair_setups(setup, pairs_r, False,
                                           row_extents=True)
    d3 = np.asarray(raster.rasterize_depth(
        edges_r, pairs_r, nty_b, NTX, interpret=True, sub=sub,
        row_skip=True))
    np.testing.assert_array_equal(d3, d2)
    assert int(pairs_r.overflow) == 0
    # gbuffer row-skip (production main view): same coverage and depth;
    # winners may differ only where quantized depths tie exactly
    edges_g, attrs_g = raster.gather_pair_setups(setup, pairs_r, True,
                                                 row_extents=True)
    d4, vis4, gbuf4 = raster.rasterize_gbuffer(
        edges_g, attrs_g, pairs_r, nty_b, NTX, interpret=True, sub=sub,
        row_skip=True)
    ids4 = np.asarray(raster.winner_triangle_ids(vis4, pairs_r, NTX,
                                                 sub=sub))
    np.testing.assert_array_equal(ids4 >= 0, ref_ids >= 0)
    assert (ids4[covered] != ref_ids[covered]).mean() < 0.01
    np.testing.assert_allclose(np.asarray(d4)[covered], ref_depth[covered],
                               atol=2e-3)


def test_gbuffer_uv_interpolation_perspective_correct():
    # right triangle with uv = barycentric mapping; constant z plane =>
    # affine == perspective-correct; check uv at interior pixels
    setup = make_setup([unit_tri(0.5, 0.5, 0.4, 0.6)])
    depth, ids, gbuf, _ = full_raster(setup)
    covered = ids >= 0
    u = gbuf[raster._CH_U]
    v = gbuf[raster._CH_V]
    ys, xs = np.nonzero(covered)
    # corner positions in screen space
    t = np.asarray([[0.1, 0.1], [0.9, 0.1], [0.5, 0.9]]) * [W, H]
    px = xs + 0.5
    py = ys + 0.5
    d = np.stack([px, py], -1)
    m = np.linalg.inv(
        np.asarray([[t[1][0] - t[0][0], t[2][0] - t[0][0]],
                    [t[1][1] - t[0][1], t[2][1] - t[0][1]]])
    )
    bary = (d - t[0]) @ m.T  # (N, 2) = (u, v) since uv1=(1,0), uv2=(0,1)
    np.testing.assert_allclose(u[covered], bary[:, 0], atol=1e-3)
    np.testing.assert_allclose(v[covered], bary[:, 1], atol=1e-3)


def test_gbuffer_normal_and_material():
    setup = make_setup([unit_tri(0.5, 0.5, 0.3, 0.5)])
    _, ids, gbuf, _ = full_raster(setup)
    covered = ids >= 0
    np.testing.assert_allclose(gbuf[raster._CH_N + 2][covered], 1.0, atol=1e-5)
    np.testing.assert_allclose(gbuf[raster._CH_MAT][covered], 0.0, atol=1e-6)


def test_backface_culling():
    tri = unit_tri(0.5, 0.5, 0.3, 0.5)
    tri_flipped = [tri[0], tri[2], tri[1]]
    setup_front = make_setup([tri], cull="back")
    setup_back = make_setup([tri_flipped], cull="back")
    _, ids_f, _, _ = full_raster(setup_front)
    _, ids_b, _, _ = full_raster(setup_back)
    # exactly one of the two windings survives back-face culling
    assert ((ids_f >= 0).sum() > 0) != ((ids_b >= 0).sum() > 0)


def test_perspective_camera_projection_end_to_end():
    c = cam.Camera()
    c.intrinsic.aspect_ratio = W / H
    c.extrinsic.position = np.zeros(3, np.float32)
    vp = np.asarray(cam.view_projection(c))
    # triangle 10m in front of camera (camera looks -z)
    tri = [[-2.0, 1.0, -10.0], [2.0, 1.0, -10.0], [0.0, -2.0, -10.0]]
    # prev_corners turns on the dynamic-scene prev-NDC G-buffer channels
    setup = make_setup([tri], vp=vp, prev_vp=vp, prev_corners=[tri])
    depth, ids, gbuf, _ = full_raster(setup)
    covered = ids >= 0
    assert covered.sum() > 50
    # depth is reverse-Z: 10m is much closer to near than far -> small-ish
    d = depth[covered].mean()
    assert 0.0 < d < 0.2
    # prev ndc == cur ndc for a static camera: motion should be ~0
    ys, xs = np.nonzero(covered)
    ndc_x = (xs + 0.5) / W * 2 - 1
    ndc_y = (ys + 0.5) / H * 2 - 1
    np.testing.assert_allclose(gbuf[raster._CH_PREV][covered], ndc_x, atol=2e-3)
    np.testing.assert_allclose(gbuf[raster._CH_PREV + 1][covered], ndc_y, atol=2e-3)


def test_near_plane_cull():
    c = cam.Camera()
    c.intrinsic.aspect_ratio = W / H
    c.extrinsic.position = np.zeros(3, np.float32)
    vp = np.asarray(cam.view_projection(c))
    # triangle behind the camera must produce nothing
    tri = [[-1.0, 0.0, 10.0], [1.0, 0.0, 10.0], [0.0, -1.0, 10.0]]
    setup = make_setup([tri], vp=vp)
    assert not bool(np.asarray(setup.valid)[0])


def _quad(x0, y0, x1, y1, z):
    """Two CCW triangles covering [x0,x1]x[y0,y1] with uv spanning [0,1]."""
    tris = [
        [[x0, y0, z], [x1, y0, z], [x0, y1, z]],
        [[x1, y1, z], [x0, y1, z], [x1, y0, z]],
    ]
    uvs = [
        [[0, 0], [1, 0], [0, 1]],
        [[1, 1], [0, 1], [1, 0]],
    ]
    return tris, uvs


def test_alpha_test_cuts_front_quad_to_back_quad():
    """Alpha-cut quad over an opaque quad: mask holes reveal the far quad
    in BOTH the Pallas kernel and the numpy reference (VERDICT task 2;
    depthPrepass.frag:28-31 semantics at 64x64 mask resolution)."""
    from plainrenderer_tpu.assets.textures import build_alpha_mask

    f_tris, f_uvs = _quad(0.15, 0.15, 0.85, 0.85, 0.8)  # front, alpha
    b_tris, b_uvs = _quad(0.05, 0.05, 0.95, 0.95, 0.3)  # back, opaque
    # 8x8-texel checkerboard on a 64x64 alpha texture -> mask preserves it
    yy, xx = np.mgrid[0:64, 0:64]
    alpha_img = (((yy // 8) + (xx // 8)) % 2).astype(np.float32)
    masks = np.zeros((8, 128), np.int32)
    masks[0] = build_alpha_mask(alpha_img)
    setup = make_setup(
        f_tris + b_tris, uvs=np.asarray(f_uvs + b_uvs, np.float32),
        alpha_slots=[1, 1, 0, 0])
    depth, ids, _, _ = full_raster(setup, alpha_masks=masks)
    ref_depth, ref_ids = raster.reference_rasterize(
        np.asarray(setup.edges), np.asarray(setup.valid), W, H,
        alpha_masks=masks)
    np.testing.assert_array_equal(ids >= 0, ref_ids >= 0)
    covered = ids >= 0
    assert (ids[covered] != ref_ids[covered]).mean() < 0.01
    np.testing.assert_allclose(depth[covered], ref_depth[covered], atol=2e-3)
    # both quads must be visible: front survives on mask-1 texels, back
    # shows through the holes
    assert (ids[covered] < 2).sum() > 200
    assert (ids[covered] >= 2).sum() > 200
    # and inside the front quad's footprint specifically, some pixels must
    # resolve to the BACK quad (the cut-out revealing what's behind)
    front_region = (ref_depth > 0.79)
    assert front_region.sum() > 200


def test_alpha_mask_build_wordbits():
    from plainrenderer_tpu.assets.textures import build_alpha_mask

    alpha = np.zeros((64, 64), np.float32)
    alpha[10, 3] = 1.0   # row 10, col 3 -> word 20, bit 3
    alpha[20, 40] = 1.0  # row 20, col 40 -> word 41, bit 8
    words = build_alpha_mask(alpha).view(np.uint32)
    assert words[20] == (1 << 3)
    assert words[41] == (1 << 8)
    assert words.sum() == (1 << 3) + (1 << 8)


def test_alpha_opaque_scene_with_slots_matches_no_alpha():
    """A scene with the 8-plane table but all slots 0 must render exactly
    like the 4-plane path (the alpha extension is transparent for opaque
    geometry)."""
    tris = [unit_tri(0.5, 0.5, 0.3, 0.75), unit_tri(0.3, 0.4, 0.2, 0.5)]
    masks = np.zeros((8, 128), np.int32)
    s_plain = make_setup(tris)
    s_alpha = make_setup(tris, alpha_slots=[0, 0])
    d0, i0, _, _ = full_raster(s_plain)
    d1, i1, _, _ = full_raster(s_alpha, alpha_masks=masks)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_array_equal(d0, d1)


@pytest.mark.parametrize("n_views,order_rows,bin_rows,with_alpha",
                         [(1, False, 1, False), (1, True, 2, False),
                          (3, True, 8, False), (1, True, 2, True)])
def test_expand_kernel_matches_xla_path(rng, n_views, order_rows, bin_rows,
                                        with_alpha):
    """The Pallas key-expansion kernel (build_pairs expand_impl='kernel')
    must produce byte-identical PairLists to the XLA owner/decode path
    across views, row ordering, sparse validity, and overflow."""
    tpv = 400
    t = tpv * n_views
    nty_total = 8 * n_views
    ntx = 4
    ty0 = rng.integers(0, nty_total // n_views, t).astype(np.int32)
    sy = rng.integers(1, 4, t).astype(np.int32)
    ty1 = np.minimum(ty0 + sy - 1, nty_total // n_views - 1)
    # shift each view's rows into its band (mirrors shadow_atlas_setup)
    voff = np.repeat(np.arange(n_views, dtype=np.int32),
                     tpv) * (nty_total // n_views)
    tx0 = rng.integers(0, ntx, t).astype(np.int32)
    sx = rng.integers(1, 3, t).astype(np.int32)
    tx1 = np.minimum(tx0 + sx - 1, ntx - 1)
    valid = rng.random(t) > 0.6  # sparse: exercises chunk advancing
    bbox = np.stack([ty0 + voff, tx0, ty1 + voff, tx1], axis=1)
    fine = np.stack([(ty0 + voff) * bin_rows
                     + rng.integers(0, bin_rows, t).astype(np.int32),
                     (ty1 + voff) * bin_rows + bin_rows - 1], axis=1)
    setup = raster.TriangleSetup(
        edges=jnp.zeros((3, 4, t), jnp.float32),
        attrs=jnp.zeros((raster.NATTR, 0), jnp.float32),
        tile_bbox=jnp.asarray(bbox),
        valid=jnp.asarray(valid),
        fine_y=jnp.asarray(np.where(valid[:, None], fine, [1, 0])))
    tri_alpha = jnp.asarray(rng.random(t) < 0.1) if with_alpha else None
    for budget in (None, 256):  # None = ample; 256 forces overflow
        a = raster.build_pairs(setup, nty_total, ntx, n_views=n_views,
                               bin_rows=bin_rows, order_rows=order_rows,
                               pair_budget=budget, tri_alpha=tri_alpha,
                               expand_impl="kernel")
        b = raster.build_pairs(setup, nty_total, ntx, n_views=n_views,
                               bin_rows=bin_rows, order_rows=order_rows,
                               pair_budget=budget, tri_alpha=tri_alpha,
                               expand_impl="xla")
        np.testing.assert_array_equal(np.asarray(a.pair_tri),
                                      np.asarray(b.pair_tri))
        np.testing.assert_array_equal(np.asarray(a.tile_start),
                                      np.asarray(b.tile_start))
        np.testing.assert_array_equal(np.asarray(a.tile_count),
                                      np.asarray(b.tile_count))
        assert int(a.overflow) == int(b.overflow)
    assert int(a.overflow) > 0  # the 256 budget really overflowed


def test_shadow_stream_split_matches_single_stream(rng):
    """The opaque/alpha shadow split (render_frame's two rasterize_depth
    passes with init_depth max-merge) must reproduce the single-stream
    8-plane alpha raster exactly: same planes, pure depth max, no ties."""
    import dataclasses as dc

    from plainrenderer_tpu.assets.textures import build_alpha_mask

    tris, slots = [], []
    for i in range(24):
        cx, cy = rng.uniform(0.1, 0.9, 2)
        tris.append(unit_tri(cx, cy, rng.uniform(0.05, 0.3),
                             rng.uniform(0.1, 0.9)))
        slots.append(1 if i % 3 == 0 else 0)
    yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    alpha_img = (((yy // 8) + (xx // 8)) % 2).astype(np.float32)
    masks = np.zeros((2, 128), np.int32)
    masks[0] = build_alpha_mask(alpha_img)
    masks_j = jnp.asarray(masks)

    setup = make_setup(tris, alpha_slots=slots)
    sub = 2
    nty_b = H // (raster.TILE_H * sub)

    # single stream: all triangles through the 8-plane alpha kernel
    pairs = raster.build_pairs(setup, nty_b, NTX, bin_rows=sub,
                               order_rows=True)
    edges, _ = raster.gather_pair_setups(setup, pairs, False,
                                         row_extents=True)
    d_single = np.asarray(raster.rasterize_depth(
        edges, pairs, nty_b, NTX, interpret=True, alpha_masks=masks_j,
        sub=sub, row_skip=True))

    # split streams: opaque 4-plane pass, then alpha max-merge on top
    is_alpha = jnp.asarray(np.asarray(slots) > 0)
    setup_o = dc.replace(setup, edges=setup.edges[:, :4],
                         valid=setup.valid & ~is_alpha)
    setup_a = dc.replace(setup, valid=setup.valid & is_alpha)
    pairs_o = raster.build_pairs(setup_o, nty_b, NTX, bin_rows=sub,
                                 order_rows=True)
    edges_o, _ = raster.gather_pair_setups(setup_o, pairs_o, False,
                                           row_extents=True)
    d0 = raster.rasterize_depth(edges_o, pairs_o, nty_b, NTX,
                                interpret=True, sub=sub, row_skip=True)
    pairs_a = raster.build_pairs(setup_a, nty_b, NTX, bin_rows=sub,
                                 order_rows=True)
    edges_a, _ = raster.gather_pair_setups(setup_a, pairs_a, False,
                                           row_extents=True)
    d_split = np.asarray(raster.rasterize_depth(
        edges_a, pairs_a, nty_b, NTX, interpret=True, alpha_masks=masks_j,
        sub=sub, row_skip=True, init_depth=d0))

    np.testing.assert_array_equal(d_split, d_single)
    assert (d_split > 0).sum() > 500  # scene actually covers pixels
    # the alpha checkerboard actually cut holes somewhere
    assert int(pairs_a.overflow) == 0 and int(pairs_o.overflow) == 0


@pytest.mark.parametrize("expand_impl", ["kernel", "xla"])
def test_carry_table_matches_gather(rng, expand_impl):
    """build_pairs(carry_table=...) — the sort-carried setup-row path —
    must produce exactly the same per-tile segments AND the same pair-order
    rows as the XLA gather path (gather_pair_setups) for every live slot,
    on both expansion implementations."""
    n = 120
    t = rng.random((n, 3, 3)).astype(np.float32)
    t[:, :, :2] *= 0.9
    setup = make_setup(t)
    table, n_edge = raster.setup_row_table(setup, True, row_extents=True)

    pairs1 = raster.build_pairs(setup, NTY, NTX, order_rows=True,
                                expand_impl=expand_impl, interpret=True)
    pe, pa = raster.gather_pair_setups(setup, pairs1, True,
                                       row_extents=True)
    pairs2, rows = raster.build_pairs(setup, NTY, NTX, order_rows=True,
                                      expand_impl=expand_impl,
                                      carry_table=table, interpret=True)
    np.testing.assert_array_equal(np.asarray(pairs1.tile_start),
                                  np.asarray(pairs2.tile_start))
    np.testing.assert_array_equal(np.asarray(pairs1.tile_count),
                                  np.asarray(pairs2.tile_count))
    # live prefix of the sorted stream: identical rows (tails differ —
    # degenerate entry vs zeros — and are masked by segment counts)
    total = int(np.asarray(pairs1.tile_count).sum())
    got = np.asarray(rows)
    np.testing.assert_array_equal(got[:n_edge, :total],
                                  np.asarray(pe)[:, :total])
    np.testing.assert_array_equal(got[n_edge:, :total],
                                  np.asarray(pa)[:, :total])
