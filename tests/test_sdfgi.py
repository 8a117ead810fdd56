import jax.numpy as jnp
import numpy as np

from plainrenderer_tpu.assets import procedural
from plainrenderer_tpu.assets.sdf_bake import bake_mesh_sdf
from plainrenderer_tpu.ops import sdf_scene, sdfgi


def _box_global_sdf():
    """One 2m box at the origin composited into a world volume."""
    mesh = procedural.box_mesh(2.0, 2.0, 2.0)
    vol = bake_mesh_sdf(mesh.positions, mesh.indices, resolution=(16, 16, 16))
    return sdf_scene.composite_global_sdf(
        [vol],
        instance_bb_min=np.asarray([[-1.0, -1.0, -1.0]], np.float32),
        instance_bb_max=np.asarray([[1.0, 1.0, 1.0]], np.float32),
        instance_matrices=np.eye(4, dtype=np.float32)[None],
        instance_albedo=np.asarray([[0.8, 0.2, 0.1]], np.float32),
        voxel_size=0.25,
        margin=2.0,
    )


def test_composite_matches_analytic_box():
    g = _box_global_sdf()
    d, h, w = g.volume.shape
    zs = g.origin[2] + (np.arange(d) + 0.5) * g.voxel_size
    ys = g.origin[1] + (np.arange(h) + 0.5) * g.voxel_size
    xs = g.origin[0] + (np.arange(w) + 0.5) * g.voxel_size
    zz, yy, xx = np.meshgrid(zs, ys, xs, indexing="ij")
    q = np.stack([np.abs(xx) - 1, np.abs(yy) - 1, np.abs(zz) - 1], -1)
    outside = np.linalg.norm(np.maximum(q, 0), axis=-1)
    inside = np.minimum(q.max(-1), 0)
    analytic = outside + inside
    # exact inside the padded box; conservative (>= analytic-ish) outside
    near = np.abs(analytic) < 1.0
    err = np.abs(g.volume - analytic)[near]
    assert np.median(err) < 0.15
    assert err.mean() < 0.3
    # the safety ring must never report distances below the true distance
    # by more than the compositing error (no overstepping)
    ring = (analytic >= 1.0) & (analytic < 2.5)
    assert (g.volume[ring] > analytic[ring] - 0.3).all()


def _pad16(vol, fill):
    """Pad a volume to brick multiples (>= one 32^3 trace window)."""
    def amount(n):
        return max(32, (n + 15) // 16 * 16) - n

    widths = [(0, amount(n)) for n in vol.shape[:3]]
    widths += [(0, 0)] * (vol.ndim - 3)
    return np.pad(vol, widths, constant_values=fill)


def _unbrick_sdf(packed, dims):
    """Invert quantize_sdf_volume's brick layout back to a (D,H,W) volume
    of quantized distances (in voxel/8 units)."""
    d, h, w = dims
    nbz, nby, nbx = d // 16, h // 16, w // 16
    words = np.asarray(packed).reshape(nbz, nby, nbx, 16, 16, 4)
    words = words.transpose(0, 3, 1, 4, 2, 5).reshape(d, h, w // 4)
    out = np.zeros((d, h, w), np.float32)
    for byte in range(4):
        v = (words >> (8 * byte)) & 0xFF
        v = np.where(v > 127, v - 256, v).astype(np.float32) / 8.0
        out[..., byte::4] = v
    return out


def test_quantize_roundtrip():
    g = _box_global_sdf()
    vol = _pad16(g.volume, 10.0)
    packed = sdfgi.quantize_sdf_volume(jnp.asarray(vol), g.voxel_size)
    assert packed.shape[1:] == (8, 128)
    got = _unbrick_sdf(packed, vol.shape) * g.voxel_size
    want = np.clip(vol, -127 / 8 * g.voxel_size, 127 / 8 * g.voxel_size)
    np.testing.assert_allclose(got, want, atol=g.voxel_size / 8 + 1e-6)


def test_trace_hits_box_and_sky():
    g = _box_global_sdf()
    h, w = 16, 128
    # surfaces on the ground plane y=0 around the box, normals up (-y)
    xs = jnp.linspace(-2.5, 2.5, w)
    zs = jnp.linspace(-2.5, 2.5, h)
    gx, gz = jnp.meshgrid(xs, zs, indexing="xy")
    wpos = jnp.stack([gx, jnp.full_like(gx, 0.99), gz], 0)
    normal = jnp.stack([jnp.zeros_like(gx), -jnp.ones_like(gx),
                        jnp.zeros_like(gx)], 0)
    # rays pointing straight up (-y): those above the box (|x|,|z| < 1 at
    # y=0.99 -> just below the box top? box spans y in [-1,1]...) use rays
    # DOWN onto the box from above instead: origin at y=-3, dir +y
    wpos = jnp.stack([gx, jnp.full_like(gx, -3.0), gz], 0)
    normal = jnp.stack([jnp.zeros_like(gx), jnp.ones_like(gx) * -1.0,
                        jnp.zeros_like(gx)], 0)
    dirs = jnp.stack([jnp.zeros_like(gx), jnp.ones_like(gx),
                      jnp.zeros_like(gx)], 0)
    valid = jnp.ones((h, w), bool)
    sky = jnp.ones((3, 32, 64), jnp.float32) * jnp.asarray(
        [0.2, 0.4, 1.0])[:, None, None]

    vol = _pad16(g.volume, 100.0)
    alb = _pad16(g.albedo, 0.5)
    packed = sdfgi.quantize_sdf_volume(jnp.asarray(vol), g.voxel_size)
    alb_packed = sdfgi.pack_albedo_volume(jnp.asarray(alb))

    y_sh, cocg, _ = sdfgi.trace_gi(
        wpos, normal, dirs, valid, sky, packed, alb_packed,
        jnp.asarray(g.origin), g.voxel_size,
        jnp.asarray(vol.shape, jnp.float32),
        jnp.asarray([0.0, -1.0, 0.0]), jnp.asarray([1.0, 1.0, 1.0]),
        jnp.asarray(10.0), steps=12, influence=8.0, interpret=True)

    y_sh = np.asarray(y_sh)
    cocg = np.asarray(cocg)
    gx_np, gz_np = np.asarray(gx), np.asarray(gz)
    over_box = (np.abs(gx_np) < 0.6) & (np.abs(gz_np) < 0.6)
    open_sky = (np.abs(gx_np) > 1.8) | (np.abs(gz_np) > 1.8)

    # rays over the box hit it: the box underside is sun-shadowed by the box
    # itself OR lit; either way the result should differ strongly from sky
    y = y_sh[0] / float(1.0 / (2 * np.sqrt(np.pi)))  # undo SH c0-ish scale
    sky_y = 0.25 * 0.2 + 0.5 * 0.4 + 0.25 * 1.0
    assert np.isfinite(y_sh).all()
    # open rays return the sky luminance
    got_sky_y = y[open_sky]
    assert np.abs(got_sky_y.mean() - sky_y * 2) / (sky_y * 2) < 0.4
    # box-covered rays must differ from sky rays
    assert abs(y[over_box].mean() - got_sky_y.mean()) > 0.05
    # Co/Cg of sky rays should be bluish (negative Co since blue > red)
    assert cocg[0][open_sky].mean() < 0.0


def test_gi_filters_shapes():
    h, w = 16, 128
    rng = np.random.default_rng(0)
    y_sh = jnp.asarray(rng.random((4, h, w)).astype(np.float32))
    cocg = jnp.asarray(rng.random((2, h, w)).astype(np.float32))
    normal = jnp.zeros((3, h, w)).at[1].set(-1.0)
    depth = jnp.full((h, w), 5.0)
    wpos = jnp.zeros((3, h, w))
    ry, rc = sdfgi.neighborhood_resolve(y_sh, cocg, normal, depth)
    assert ry.shape == y_sh.shape and rc.shape == cocg.shape
    # flat geometry -> pure blur -> reduces variance
    assert np.asarray(ry).std() < np.asarray(y_sh).std()
    sy, sc = sdfgi.spatial_filter(y_sh, cocg, normal, wpos, depth,
                                  jnp.asarray(0), 1.5, 500.0, seed=0)
    assert np.asarray(sy).std() < np.asarray(y_sh).std()
    ty, tc = sdfgi.temporal_filter_gi(
        y_sh, cocg, ry, rc, jnp.ones((h, w), bool), jnp.zeros((h, w)),
        jnp.asarray(False))
    assert np.isfinite(np.asarray(ty)).all()


def test_trace_window_border_no_phantom_hits():
    """Rays that leave the per-tile 32^3 trace window must terminate as
    misses (sky), never as phantom hits: beyond the window the kernel
    samples clamped border distances, which are positive in empty space, so
    the march runs out of influence. A wall INSIDE the window is hit at the
    right distance; the same wall moved OUTSIDE stays invisible."""
    voxel = 0.25
    d = h = w = 96  # 24 m
    origin = np.asarray([0.0, 0.0, 0.0], np.float32)
    xs = (np.arange(w) + 0.5) * voxel
    # wall: solid for x > x_wall (distance = x_wall - x)
    def wall_volume(x_wall):
        dist = (x_wall - xs)[None, None, :]
        return np.broadcast_to(dist, (d, h, w)).astype(np.float32)

    th, tw = 16, 128
    # all surface points clustered at x ~ 2 m so the window centers there
    wpos = jnp.stack([
        jnp.full((th, tw), 2.0),
        jnp.full((th, tw), 12.0),
        jnp.full((th, tw), 12.0)], 0)
    normal = jnp.stack([jnp.ones((th, tw)), jnp.zeros((th, tw)),
                        jnp.zeros((th, tw))], 0)
    dirs = normal  # march straight toward +x
    valid = jnp.ones((th, tw), bool)
    sky = jnp.ones((3, 32, 64), jnp.float32) * 0.5
    sky_y = 0.5  # ycocg luma of (0.5, 0.5, 0.5)

    def run(x_wall):
        vol = wall_volume(x_wall)
        packed = sdfgi.quantize_sdf_volume(jnp.asarray(vol), voxel)
        alb = np.full((d, h, w, 3), 0.9, np.float32)
        alb_packed = sdfgi.pack_albedo_volume(jnp.asarray(alb))
        y_sh, cocg, esc = sdfgi.trace_gi(
            wpos, normal, dirs, valid, sky, packed, alb_packed,
            jnp.asarray(origin), voxel, jnp.asarray([d, h, w], jnp.float32),
            jnp.asarray([0.0, -1.0, 0.0]), jnp.ones(3), jnp.asarray(10.0),
            steps=48, influence=3.5, interpret=True)
        return np.asarray(y_sh)

    # y_sh[0] = y * c0 * norm with norm = 1/(2 c0) for axis-aligned dirs
    # (the SH vector has |sh3| = sqrt(3) c0), so y_sh[0] == y / 2
    inv_scale = 2.0
    expected_sky = sky_y / 2.0

    # wall at x=4: inside the window (2 m away < 3.5 m half-extent): HIT
    y_inside = run(4.0)[0] * inv_scale
    # hits are lit by sun+albedo - must NOT equal the sky luminance
    assert np.abs(y_inside.mean() - sky_y) > 0.1, y_inside.mean()

    # wall at x=9: outside the window and influence: all rays MISS -> sky
    y_outside = run(9.0)[0]
    assert np.abs(y_outside.mean() - expected_sky) / expected_sky < 0.05, \
        y_outside.mean()


def _unbrick_albedo(packed, dims):
    """Invert pack_albedo_volume back to (D, H, W, 3) floats in [0,1]."""
    d, h, w = dims
    nbz, nby, nbx = d // 16, h // 16, w // 16
    words = np.asarray(packed).reshape(nbz, nby, nbx, 16, 16, 16)
    words = words.transpose(0, 3, 1, 4, 2, 5).reshape(d, h, w)
    return np.stack([(words >> (8 * c)) & 0xFF for c in range(3)],
                    -1).astype(np.float32) / 255.0


def test_dynamic_recomposite_matches_host():
    """Device brick recomposite == host composite at the moved pose.

    Parity: SDFGI.cpp:260-313 (per-frame SDFInstance uploads) — here the
    instance -> global min-composite happens on-device in the frame jit."""
    import jax

    from plainrenderer_tpu.scene.aabb import pad_sdf_bounding_box

    voxel = 0.25
    mesh_s = procedural.box_mesh(12.0, 1.0, 12.0)  # slab (floor)
    mesh_d = procedural.box_mesh(2.0, 2.0, 2.0)
    vol_s = bake_mesh_sdf(mesh_s.positions, mesh_s.indices,
                          resolution=(24, 8, 24))
    vol_d = bake_mesh_sdf(mesh_d.positions, mesh_d.indices,
                          resolution=(16, 16, 16))
    bb_min = np.asarray([[-6.0, -0.5, -6.0], [-1.0, -1.0, -1.0]], np.float32)
    bb_max = np.asarray([[6.0, 0.5, 6.0], [1.0, 1.0, 1.0]], np.float32)
    albedos = np.asarray([[0.5, 0.5, 0.5], [0.9, 0.1, 0.1]], np.float32)
    c, s = np.cos(np.deg2rad(30.0)), np.sin(np.deg2rad(30.0))
    # hovering above the slab (y-down world: -y is up), yawed 30 degrees
    moved = np.asarray([
        [c, 0, s, 2.0], [0, 1, 0, -2.5], [-s, 0, c, 1.0], [0, 0, 0, 1]],
        np.float32)
    mats_moved = np.stack([np.eye(4, dtype=np.float32), moved])

    # host reference: both instances at the moved pose. The pristine pass
    # uses the SAME matrices so both composites derive the same grid (the
    # bounds loop reads every instance's bb, volume present or not).
    g_ref = sdf_scene.composite_global_sdf(
        [vol_s, vol_d], bb_min, bb_max, mats_moved, albedos,
        voxel_size=voxel, margin=2.0)
    # device path: static-only pristine + on-device dynamic window update
    g_sta = sdf_scene.composite_global_sdf(
        [vol_s, None], bb_min, bb_max, mats_moved, albedos,
        voxel_size=voxel, margin=2.0)
    assert g_ref.volume.shape == g_sta.volume.shape
    np.testing.assert_allclose(g_ref.origin, g_sta.origin, atol=1e-5)

    vol_p = _pad16(g_sta.volume, 1e4)
    alb_p = _pad16(g_sta.albedo, 0.5)
    packed = sdfgi.quantize_sdf_volume(jnp.asarray(vol_p), voxel)
    apacked = sdfgi.pack_albedo_volume(jnp.asarray(alb_p))

    pmin, pmax = pad_sdf_bounding_box(bb_min[1], bb_max[1])
    diag = float(np.linalg.norm(np.asarray(pmax) - np.asarray(pmin)))
    nvox = int(np.ceil((diag + 4.0) / voxel)) + 16
    nvox = (nvox + 15) // 16 * 16
    grid_pad = [max(32, (n + 15) // 16 * 16) for n in g_sta.volume.shape]
    win = tuple(min(nvox, g) for g in grid_pad)
    token = jnp.zeros(win + (0,), jnp.float32)

    new_vol, new_alb = jax.jit(
        lambda pv, pa, t: sdf_scene.recomposite_dynamic(
            pv, pa, jnp.asarray(g_sta.origin), voxel, vol_p.shape,
            [jnp.asarray(vol_d)], [token],
            jnp.asarray(pmin)[None], jnp.asarray(pmax)[None],
            jnp.asarray(albedos[1:2]), jnp.asarray([1], jnp.int32), t)
    )(packed, apacked, jnp.asarray(mats_moved))

    got = _unbrick_sdf(new_vol, vol_p.shape) * voxel
    d, h, w = g_ref.volume.shape
    want = np.clip(g_ref.volume, -127 / 8 * voxel, 127 / 8 * voxel)
    inside = np.abs(want) < 3.0  # away from the s8 clamp boundary
    err = np.abs(got[:d, :h, :w] - want)[inside]
    assert err.max() < 2.5 * voxel / 8 + 1e-3, err.max()

    # albedo winner: voxels the dynamic box clearly owns turn red
    got_alb = _unbrick_albedo(new_alb, vol_p.shape)[:d, :h, :w]
    owns = (g_ref.volume < g_sta.volume - 0.05) & (np.abs(want) < 1.0)
    assert owns.sum() > 100
    np.testing.assert_allclose(
        got_alb[owns], np.broadcast_to(albedos[1], got_alb[owns].shape),
        atol=2 / 255)

    # moving the instance back to a far corner leaves the old region static
    far = np.asarray(mats_moved).copy()
    far[1][:3, 3] = [-4.0, 0.0, -4.0]
    nv2, _ = jax.jit(
        lambda pv, pa, t: sdf_scene.recomposite_dynamic(
            pv, pa, jnp.asarray(g_sta.origin), voxel, vol_p.shape,
            [jnp.asarray(vol_d)], [token],
            jnp.asarray(pmin)[None], jnp.asarray(pmax)[None],
            jnp.asarray(albedos[1:2]), jnp.asarray([1], jnp.int32), t)
    )(packed, apacked, jnp.asarray(far))
    got2 = _unbrick_sdf(nv2, vol_p.shape) * voxel
    old_region = (g_ref.volume < g_sta.volume - 0.05)
    sta_q = np.clip(g_sta.volume, -127 / 8 * voxel, 127 / 8 * voxel)
    # the old position's voxels read pure static again
    err_old = np.abs(got2[:d, :h, :w] - sta_q)[old_region
                                               & (np.abs(sta_q) < 3.0)]
    assert err_old.max() < 2.5 * voxel / 8 + 1e-3


def test_coarse_fallback_catches_window_escapes():
    """With dims_zyx + coarse_fallback, rays leaving the 32^3 fine window
    continue in the 4x min-pooled whole-scene volume: a wall OUTSIDE the
    window is hit (reference full-volume trace, SDF.inc:103-185), and the
    escape metric reports those rays (VERDICT r1 #8)."""
    voxel = 0.25
    d = h = w = 96  # 24 m
    origin = np.asarray([0.0, 0.0, 0.0], np.float32)
    xs = (np.arange(w) + 0.5) * voxel

    x_wall = 9.0  # ~7 m from the surface: far outside the 8 m window
    dist = (x_wall - xs)[None, None, :]
    vol = np.broadcast_to(dist, (d, h, w)).astype(np.float32)

    th, tw = 16, 128
    wpos = jnp.stack([
        jnp.full((th, tw), 2.0),
        jnp.full((th, tw), 12.0),
        jnp.full((th, tw), 12.0)], 0)
    normal = jnp.stack([jnp.ones((th, tw)), jnp.zeros((th, tw)),
                        jnp.zeros((th, tw))], 0)
    dirs = normal
    valid = jnp.ones((th, tw), bool)
    sky = jnp.ones((3, 32, 64), jnp.float32) * 0.5

    packed = sdfgi.quantize_sdf_volume(jnp.asarray(vol), voxel)
    alb = np.full((d, h, w, 3), 0.9, np.float32)
    alb_packed = sdfgi.pack_albedo_volume(jnp.asarray(alb))

    def run(coarse):
        return sdfgi.trace_gi(
            wpos, normal, dirs, valid, sky, packed, alb_packed,
            jnp.asarray(origin), voxel, jnp.asarray([d, h, w], jnp.float32),
            jnp.asarray([0.0, -1.0, 0.0]), jnp.ones(3), jnp.asarray(10.0),
            steps=48, influence=12.0, dims_zyx=(d, h, w),
            coarse_fallback=coarse, interpret=True)

    y_off, _, esc_off = run(False)
    y_on, _, esc_on = run(True)
    # every ray escapes the fine window in both runs
    assert np.asarray(esc_off).mean() > 0.99
    assert np.asarray(esc_on).mean() > 0.99
    # without fallback: sky (y_sh[0] == sky_y / 2 = 0.25)
    assert np.abs(np.asarray(y_off)[0].mean() - 0.25) < 0.02
    # with fallback: the wall is hit - sun-lit 0.9^2.2 albedo, clearly not
    # the sky value
    assert np.abs(np.asarray(y_on)[0].mean() - 0.25) > 0.1
    assert np.isfinite(np.asarray(y_on)).all()
