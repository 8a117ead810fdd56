import jax.numpy as jnp
import numpy as np

from plainrenderer_tpu.assets import textures as tex_mod
from plainrenderer_tpu.ops import texture as tex_ops


def _pool_one(albedo, **kw):
    mt = tex_mod.MaterialTextures(albedo=albedo, **kw)
    return tex_mod.build_texture_pool([mt])


def test_pool_layout_and_mip_chain():
    img = np.zeros((64, 256, 3), np.float32)
    img[:, :128] = [1.0, 0.0, 0.0]
    img[:, 128:] = [0.0, 1.0, 0.0]
    pool = _pool_one(img)
    assert pool.word0.shape[1:] == (8, 128)
    assert pool.info.shape == (pool.n_mips * 1, 4)
    # mip 0: 64x256 -> 8x2 bricks
    base, nbx, lw, lh = pool.info[0]
    assert (nbx, lw, lh) == (2, 256, 64)
    # mip 1: 32x128 -> 4x1 bricks
    _, nbx1, lw1, lh1 = pool.info[1]
    assert (nbx1, lw1, lh1) == (1, 128, 32)
    # decode brick (0,0) texel (0,0): red, gamma-2.0 encoded
    w = int(np.asarray(pool.word0[base, 0, 0]))
    r = (w & 0xFF) / 255.0
    assert abs(r * r - 1.0) < 0.02
    assert ((w >> 8) & 0xFF) == 0


def _sample_plane(pool, uv, duv, mat_id, valid):
    mat_tex = jnp.zeros((1,), jnp.int32)
    return np.asarray(tex_ops.sample_materials(
        uv, duv, mat_id, valid, mat_tex, jnp.asarray(pool.info),
        jnp.asarray(pool.word0), jnp.asarray(pool.word1),
        n_mips=pool.n_mips, interpret=True))


def test_sample_flat_color_and_normals():
    h, w = 16, 128
    img = np.full((64, 256, 3), [0.2, 0.5, 0.8], np.float32)
    nrm = np.full((64, 256, 2), [0.75, 0.5], np.float32)  # nx=0.5, ny=0
    spec = np.zeros((64, 256, 3), np.float32)
    spec[..., 1] = 0.3  # roughness
    spec[..., 2] = 0.9  # metal
    pool = _pool_one(img, normal=nrm, specular=spec)

    # all pixels sample the texture center at mip 0
    uv = jnp.stack([jnp.full((h, w), 0.5), jnp.full((h, w), 0.5)])
    duv = jnp.full((4, h, w), 1.0 / 256.0)
    out = _sample_plane(pool, uv, duv, jnp.zeros((h, w)),
                        jnp.ones((h, w), bool))
    assert (out[8] > 0.5).all()  # everything in-window
    np.testing.assert_allclose(out[0], 0.2, atol=0.02)
    np.testing.assert_allclose(out[1], 0.5, atol=0.02)
    np.testing.assert_allclose(out[2], 0.8, atol=0.02)
    np.testing.assert_allclose(out[4], 0.5, atol=0.03)  # nx
    np.testing.assert_allclose(out[5], 0.0, atol=0.03)  # ny
    np.testing.assert_allclose(out[6], 0.3, atol=0.02)  # rough
    np.testing.assert_allclose(out[7], 0.9, atol=0.02)  # metal


def test_sample_reads_correct_texels():
    """A two-color texture: uv in the left half reads red, right reads
    green — verifies addressing through bricks and the window offset."""
    h, w = 16, 128
    img = np.zeros((64, 256, 3), np.float32)
    img[:, :128] = [1.0, 0.0, 0.0]
    img[:, 128:] = [0.0, 1.0, 0.0]
    pool = _pool_one(img)

    us = jnp.broadcast_to(
        (jnp.arange(w) + 0.5)[None, :] / w, (h, w))  # 0..1 across the tile
    uv = jnp.stack([us, jnp.full((h, w), 0.5)])
    duv = jnp.full((4, h, w), 1.0 / 256.0)
    out = _sample_plane(pool, uv, duv, jnp.zeros((h, w)),
                        jnp.ones((h, w), bool))
    us_np = np.asarray(us)
    ok = out[8] > 0.5
    left = ok & (us_np < 0.45)
    right = ok & (us_np > 0.55)
    assert left.sum() > 100 and right.sum() > 100
    assert (out[0][left] > 0.8).all() and (out[1][left] < 0.1).all()
    assert (out[1][right] > 0.8).all() and (out[0][right] < 0.1).all()


def test_mip_selection_uses_derivatives():
    """Large derivatives select a coarse mip: a checker texture averages to
    grey at high mips."""
    h, w = 16, 128
    img = np.zeros((256, 256, 3), np.float32)
    ys, xs = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
    img[((ys // 2 + xs // 2) % 2).astype(bool)] = 1.0
    pool = _pool_one(img)
    uv = jnp.full((2, h, w), 0.5)
    duv_fine = jnp.full((4, h, w), 1.0 / 256.0)
    duv_coarse = jnp.full((4, h, w), 32.0 / 256.0)
    out_f = _sample_plane(pool, uv, duv_fine, jnp.zeros((h, w)),
                          jnp.ones((h, w), bool))
    out_c = _sample_plane(pool, uv, duv_coarse, jnp.zeros((h, w)),
                          jnp.ones((h, w), bool))
    # coarse mip is the 0.5-grey average (gamma decode of ~0.707^2)
    assert abs(out_c[0].mean() - 0.5) < 0.1
    # fine mip has contrast
    assert out_f[0].std() > 0.2 or abs(out_f[0].mean() - 0.5) > 0.2


def test_untextured_material_falls_back():
    h, w = 16, 128
    pool = _pool_one(np.ones((16, 128, 3), np.float32))
    uv = jnp.full((2, h, w), 0.5)
    duv = jnp.full((4, h, w), 1.0 / 128.0)
    mat_tex = jnp.asarray([-1], jnp.int32)  # material 0 untextured
    out = np.asarray(tex_ops.sample_materials(
        uv, duv, jnp.zeros((h, w)), jnp.ones((h, w), bool), mat_tex,
        jnp.asarray(pool.info), jnp.asarray(pool.word0),
        jnp.asarray(pool.word1), n_mips=pool.n_mips, interpret=True))
    assert (out[8] < 0.5).all()  # ok-mask off everywhere -> fallback


def test_trilinear_blends_between_mips():
    """texture_filter=1: per-pixel lod fraction lerps two mip windows
    (RenderFrontend.cpp:1300-1397 trilinear sampler analog)."""
    h, w = 16, 128
    # mip 0 is a 1-texel checker: its 2x2 box mips average to flat 0.5,
    # so the trilinear blend sits between sharp checker and flat gray
    img = np.zeros((64, 256, 3), np.float32)
    img[::2, ::2] = 1.0
    img[1::2, 1::2] = 1.0
    pool = _pool_one(img)
    mat_tex = jnp.zeros((1,), jnp.int32)
    uv = jnp.stack([
        jnp.broadcast_to((jnp.arange(w) + 0.5) / w * 0.25, (h, w)),
        jnp.broadcast_to(((jnp.arange(h) + 0.5) / h * 0.25)[:, None],
                         (h, w))])

    def run(rho_texels, trilinear):
        duv = jnp.full((4, h, w), rho_texels / 256.0)
        return np.asarray(tex_ops.sample_materials(
            uv, duv, jnp.zeros((h, w)), jnp.ones((h, w), bool), mat_tex,
            jnp.asarray(pool.info), jnp.asarray(pool.word0),
            jnp.asarray(pool.word1), n_mips=pool.n_mips,
            trilinear=trilinear, interpret=True))

    # footprint exactly 1.414 texels -> lod 0.5: bilinear stays at sharp
    # mip 0 (variance high); trilinear mixes in half of the flat mip 1
    bi = run(2.0 ** 0.5, False)
    tri = run(2.0 ** 0.5, True)
    assert (tri[8] > 0.5).mean() > 0.9
    var_bi = bi[0][bi[8] > 0.5].std()
    var_tri = tri[0][tri[8] > 0.5].std()
    assert var_tri < var_bi * 0.75, (var_bi, var_tri)
    # at an integral lod (1 texel -> lod 0) both filters agree
    bi0 = run(1.0, False)
    tri0 = run(1.0, True)
    m = (bi0[8] > 0.5) & (tri0[8] > 0.5)
    np.testing.assert_allclose(tri0[0][m], bi0[0][m], atol=1e-3)


def test_aniso_sharper_than_isotropic_on_stretched_footprint():
    """texture_filter=2: with a strongly anisotropic footprint (glancing
    ground plane), the minor-axis mip keeps detail the isotropic max-axis
    rule blurs away (samplerAniso analog, RenderFrontend.cpp:1300-1397)."""
    h, w = 16, 128
    # vertical stripes, 4 texels wide: visible at mip <= 1, gray at mip 3+
    img = np.zeros((64, 256, 3), np.float32)
    img[:, (np.arange(256) // 4) % 2 == 0] = 1.0
    pool = _pool_one(img)
    mat_tex = jnp.zeros((1,), jnp.int32)
    uv = jnp.stack([
        jnp.broadcast_to((jnp.arange(w) + 0.5) / w * 0.5, (h, w)),
        jnp.broadcast_to(((jnp.arange(h) + 0.5) / h * 0.5)[:, None],
                         (h, w))])
    # footprint: 1 texel in x, 8 texels in y (dv/dy large) — glancing view
    duv = jnp.stack([
        jnp.full((h, w), 1.0 / 256.0), jnp.zeros((h, w)),
        jnp.zeros((h, w)), jnp.full((h, w), 8.0 / 64.0)])

    def run(aniso):
        return np.asarray(tex_ops.sample_materials(
            uv, duv, jnp.zeros((h, w)), jnp.ones((h, w), bool), mat_tex,
            jnp.asarray(pool.info), jnp.asarray(pool.word0),
            jnp.asarray(pool.word1), n_mips=pool.n_mips,
            aniso=aniso, interpret=True))

    iso = run(False)
    ani = run(True)
    m = (iso[8] > 0.5) & (ani[8] > 0.5)
    assert m.mean() > 0.8
    # isotropic picks mip 3 (rho=8): stripes average to flat ~0.5^2;
    # aniso picks from the minor axis (rho ~ 8/3 cap) and keeps contrast
    assert ani[0][m].std() > iso[0][m].std() * 1.5, \
        (iso[0][m].std(), ani[0][m].std())
