import jax.numpy as jnp
import numpy as np

from plainrenderer_tpu.assets import procedural
from plainrenderer_tpu.ops import raster, shadow


def _corners(meshes_and_offsets):
    out = []
    for mesh, offset in meshes_and_offsets:
        idx = mesh.indices.reshape(-1, 3)
        out.append(mesh.positions[idx] + np.asarray(offset, np.float32))
    c = np.concatenate(out).astype(np.float32)
    pad = (-c.shape[0]) % 64
    if pad:
        c = np.concatenate([c, np.zeros((pad, 3, 3), np.float32)])
    return c


def render_cascade(corners, light_matrix, size):
    t = corners.shape[0]
    d2 = jnp.zeros((t, 3, 2), jnp.float32)
    d3 = jnp.zeros((t, 3, 3), jnp.float32)
    setup = raster.geometry_setup(
        jnp.asarray(corners), d2, d3, d3, d3, jnp.zeros(t), jnp.ones(t, bool),
        light_matrix, light_matrix, size, size, cull="none", with_attrs=False)
    nty, ntx = size // raster.TILE_H, size // raster.TILE_W
    pairs = raster.build_pairs(setup, nty, ntx)
    edges, _ = raster.gather_pair_setups(setup, pairs, False)
    return raster.rasterize_depth(edges, pairs, nty, ntx, interpret=True)


def shadow_scene():
    """Ground plane at y=0 plus a 2m box floating 2m above its center.
    Sun points straight down (towards-sun = (0,-1,0), y-down world)."""
    ground = procedural.box_mesh(20, 0.5, 20, subdiv=1)
    box = procedural.box_mesh(2, 2, 2, subdiv=1)
    return _corners([(ground, [0, 0.25, 0]), (box, [0, -3.0, 0])])


def test_shadow_map_depth_clamped_coverage():
    corners = shadow_scene()
    sun_dir = jnp.asarray([0.0, -1.0, 0.0])
    mats, splits, scales = shadow.compute_cascade_info(
        jnp.asarray(0.01), jnp.asarray(0.9),
        jnp.asarray([0.0, -1.7, -8.0]), jnp.asarray([0.0, 0.0, 1.0]),
        jnp.asarray([0.0, -1.0, 0.0]), jnp.asarray([1.0, 0.0, 0.0]),
        0.3, 16 / 9, 0.1, 300.0, sun_dir, 3, jnp.asarray(3.0),
        jnp.asarray(30.0))
    smap = np.asarray(render_cascade(corners, mats[0], 256))
    # ground extends beyond the cascade everywhere -> full coverage via
    # depth clamping (lightMatrix.comp:62)
    assert (smap > 0).mean() > 0.95


def test_shadow_resolve_box_over_plane():
    corners = shadow_scene()
    sun_dir = jnp.asarray([0.0, -1.0, 0.0])
    cam_pos = jnp.asarray([0.0, -1.7, -8.0])
    mats, splits, scales = shadow.compute_cascade_info(
        jnp.asarray(0.05), jnp.asarray(0.95), cam_pos,
        jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray([0.0, -1.0, 0.0]),
        jnp.asarray([1.0, 0.0, 0.0]),
        0.3, 16 / 9, 0.1, 300.0, sun_dir, 3, jnp.asarray(3.0),
        jnp.asarray(30.0))
    size = 512
    maps = [np.asarray(render_cascade(corners, mats[c], size))
            for c in range(3)]
    maps.append(np.zeros((size, size), np.float32))
    shadow_maps = jnp.asarray(np.stack(maps))

    # receiver grid on the ground plane around the box (world y=0)
    h, w = 16, 128
    xs = jnp.linspace(-4, 4, w)
    zs = jnp.linspace(-4, 4, h)
    wx, wz = jnp.meshgrid(xs, zs, indexing="xy")
    world_pos = jnp.stack([wx, jnp.zeros_like(wx) - 0.01, wz], axis=0)
    # receivers are ~8-12m from the camera -> pick their true linear depth
    to_cam = cam_pos.reshape(3, 1, 1) - world_pos
    lin_depth = -jnp.sum(to_cam * jnp.asarray([0.0, 0.0, 1.0]).reshape(3, 1, 1),
                         axis=0)
    noise = jnp.full((h, w), 0.5, jnp.float32)
    result = np.asarray(shadow.shadow_resolve(
        world_pos, lin_depth, noise, shadow_maps, mats, scales, splits,
        cascade_count=3, taps=8, interpret=True))

    wx_np = np.asarray(wx)
    wz_np = np.asarray(wz)
    under_box = (np.abs(wx_np) < 0.7) & (np.abs(wz_np) < 0.7)
    far_out = (np.abs(wx_np) > 2.0) | (np.abs(wz_np) > 2.0)
    assert result[under_box].mean() < 0.25, "under the box must be shadowed"
    assert result[far_out].mean() > 0.75, "open ground must be lit"
