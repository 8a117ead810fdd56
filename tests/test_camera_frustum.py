import jax.numpy as jnp
import numpy as np

from plainrenderer_tpu.scene import aabb as aabb_mod
from plainrenderer_tpu.scene import camera as cam
from plainrenderer_tpu.scene import frustum as fr


def default_camera(aspect=16 / 9):
    c = cam.Camera()
    c.intrinsic.aspect_ratio = aspect
    # camera at origin looking down -z, y-down world (reference defaults)
    c.extrinsic.position = np.zeros(3, np.float32)
    return c


def project(vp, p):
    v = np.asarray(vp) @ np.array([p[0], p[1], p[2], 1.0], np.float32)
    return v[:3] / v[3]


def test_reverse_z_depth_mapping():
    c = default_camera()
    vp = cam.view_projection(c)
    near_pt = project(vp, [0, 0, -c.intrinsic.near])
    far_pt = project(vp, [0, 0, -c.intrinsic.far])
    # reverse-Z: near -> 1, far -> 0 (Camera.cpp:19-27 correction matrix)
    np.testing.assert_allclose(near_pt[2], 1.0, atol=1e-5)
    np.testing.assert_allclose(far_pt[2], 0.0, atol=1e-5)
    # on-axis point projects to NDC center
    np.testing.assert_allclose(near_pt[:2], 0.0, atol=1e-6)


def test_depth_monotonic_decreasing_with_distance():
    c = default_camera()
    vp = cam.view_projection(c)
    ds = [project(vp, [0, 0, -z])[2] for z in np.linspace(0.2, 200, 20)]
    assert all(a > b for a, b in zip(ds, ds[1:]))


def test_vulkan_y_flip():
    # y-down world + Vulkan flip: a point with negative world y (up) should
    # land at negative NDC y (top of screen in Vulkan's y-down NDC).
    c = default_camera()
    vp = cam.view_projection(c)
    up_pt = project(vp, [0, -1.0, -10.0])
    assert up_pt[1] < 0


def test_projection_jitter_shifts_ndc():
    c = default_camera()
    vp0 = cam.view_projection(c)
    vp1 = cam.view_projection(c, jitter_ndc=jnp.asarray([0.5, 0.0]))
    p0 = project(vp0, [0, 0, -10.0])
    p1 = project(vp1, [0, 0, -10.0])
    # clip.x += jitter * z_view and w = -z_view, so the NDC shift is -jitter
    np.testing.assert_allclose(p1[0] - p0[0], -0.5, atol=1e-5)
    np.testing.assert_allclose(p1[1], p0[1], atol=1e-6)


def test_frustum_culling_basic():
    c = default_camera()
    f = fr.compute_view_frustum(c)
    mins = jnp.asarray(
        [
            [-1.0, -1.0, -11.0],  # in front (visible)
            [-1.0, -1.0, 9.0],    # behind camera
            [500.0, -1.0, -11.0], # far right
            [-1.0, -1.0, -400.0], # beyond far plane
        ]
    )
    maxs = mins + 2.0
    vis = np.asarray(fr.aabb_intersects_frustum(f, mins, maxs))
    assert vis.tolist() == [True, False, False, False]


def test_frustum_culling_conservative_for_straddling_box():
    c = default_camera()
    f = fr.compute_view_frustum(c)
    # huge box containing the whole frustum must be visible
    vis = fr.aabb_intersects_frustum(
        f, jnp.asarray([[-1000.0, -1000.0, -1000.0]]), jnp.asarray([[1000.0, 1000.0, 1000.0]])
    )
    assert bool(vis[0])


def test_ortho_fit_contains_camera_frustum():
    c = default_camera()
    camera_frustum = fr.compute_view_frustum(c)
    light_dir = jnp.asarray([0.2, 0.9, 0.1])
    light_dir = light_dir / jnp.linalg.norm(light_dir)
    ortho = fr.compute_ortho_frustum_fitted_to_camera(camera_frustum, light_dir)
    # every camera frustum point must be inside the ortho frustum (within eps)
    pts = np.asarray(camera_frustum.points)
    pp = np.asarray(ortho.plane_points)
    pn = np.asarray(ortho.plane_normals)
    for p in pts:
        d = ((p[None, :] - pp) * pn).sum(-1)
        assert (d <= 1e-2).all()


def test_aabb_transform_matches_bruteforce(rng):
    pts = rng.random((50, 3)).astype(np.float32) * 4 - 2
    bb_min, bb_max = aabb_mod.aabb_from_positions(jnp.asarray(pts))
    # rotation + translation
    angle = 0.7
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = np.array(
        [[np.cos(angle), 0, np.sin(angle)], [0, 1, 0], [-np.sin(angle), 0, np.cos(angle)]]
    )
    m[:3, 3] = [1, 2, 3]
    got_min, got_max = aabb_mod.aabb_transformed(bb_min, bb_max, jnp.asarray(m))
    corners = np.asarray(aabb_mod.aabb_corners(bb_min, bb_max))
    world = corners @ m[:3, :3].T + m[:3, 3]
    np.testing.assert_allclose(np.asarray(got_min), world.min(0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_max), world.max(0), atol=1e-5)


def test_sdf_padding_rule():
    bb_min, bb_max = aabb_mod.pad_sdf_bounding_box(
        jnp.zeros(3), jnp.asarray([10.0, 1.0, 10.0])
    )
    # 7.5% of 10 = 0.75 > 0.5 for x/z; y extent 1 -> clamped to 0.5
    np.testing.assert_allclose(np.asarray(bb_min), [-0.75, -0.5, -0.75], atol=1e-6)
    np.testing.assert_allclose(np.asarray(bb_max), [10.75, 1.5, 10.75], atol=1e-6)
