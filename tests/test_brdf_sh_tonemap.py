import jax.numpy as jnp
import numpy as np

from plainrenderer_tpu.ops import brdf
from plainrenderer_tpu.utils import sh, tonemap


def test_d_ggx_peak_at_noh_1():
    r = jnp.asarray(0.5)
    d_peak = float(brdf.d_ggx(jnp.asarray(1.0), r))
    d_off = float(brdf.d_ggx(jnp.asarray(0.7), r))
    assert d_peak > d_off > 0.0
    # analytic: D(1, r) = 1 / (pi r^2)
    np.testing.assert_allclose(d_peak, 1.0 / (np.pi * 0.25), rtol=1e-5)


def test_ggx_white_furnace_rough_loses_energy():
    # single-scatter GGX loses energy at high roughness: integral < 1.
    # Monte-Carlo integrate the BRDF * NoL over the hemisphere for NoV=1.
    rng = np.random.default_rng(1)
    n = 4096
    xi = rng.random((n, 2)).astype(np.float32)
    cos_t = np.sqrt(1.0 - xi[:, 0])
    sin_t = np.sqrt(xi[:, 0])
    phi = 2 * np.pi * xi[:, 1]
    l = np.stack([np.cos(phi) * sin_t, np.sin(phi) * sin_t, cos_t], -1)
    v = np.asarray([0.0, 0.0, 1.0])
    h = l + v
    h = h / np.linalg.norm(h, axis=-1, keepdims=True)
    nol = np.clip(l[:, 2], 1e-4, 1)
    noh = np.clip(h[:, 2], 0, 1)
    voh = np.clip((v * h).sum(-1), 0, 1)
    spec = np.asarray(
        brdf.ggx_single_scattering(
            jnp.asarray(0.9), jnp.asarray(1.0), jnp.asarray(noh),
            jnp.asarray(1.0), jnp.asarray(voh), jnp.asarray(nol),
        )
    )
    # pdf of cosine sampling = NoL / pi -> estimator = spec * pi
    integral = (spec * np.pi).mean()
    assert 0.25 < integral < 1.0  # loses energy but is not degenerate


def test_diffuse_models_close_to_lambert_at_zero_roughness():
    albedo = jnp.asarray(0.5)
    nol = jnp.asarray(1.0)
    nov = jnp.asarray(1.0)
    voh = jnp.asarray(1.0)
    noh = jnp.asarray(1.0)
    lov = jnp.asarray(1.0)
    lam = float(brdf.lambert_diffuse(albedo))
    dis = float(brdf.disney_diffuse(albedo, nol, voh, nov, jnp.asarray(0.0)))
    tf2 = float(brdf.titanfall2_diffuse(albedo, nol, lov, nov, noh, jnp.asarray(0.0)))
    np.testing.assert_allclose(dis, lam, rtol=0.02)
    np.testing.assert_allclose(tf2, lam, rtol=0.06)


def test_sh_l1_roundtrip_dominant_direction():
    dirs = jnp.asarray(
        [[0.0, 1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, -1.0],
         [0.577350, 0.577350, 0.577350]]
    )
    c = sh.direction_to_sh_l1(dirs)
    d = np.asarray(sh.dominant_direction_from_sh_l1(c))
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    np.testing.assert_allclose(d, np.asarray(dirs), atol=1e-5)


def test_sh_l1_is_normalized():
    dirs = jnp.asarray([[0.0, 1.0, 0.0], [0.707107, 0.0, 0.707107]])
    c = np.asarray(sh.direction_to_sh_l1(dirs))
    np.testing.assert_allclose(np.linalg.norm(c, axis=-1), 1.0, atol=1e-6)


def test_aces_fitted_properties():
    black = np.asarray(tonemap.aces_fitted(jnp.zeros((3,))))
    np.testing.assert_allclose(black, 0.0, atol=1e-4)
    bright = np.asarray(tonemap.aces_fitted(jnp.full((3,), 100.0)))
    assert (bright > 0.99).all()
    # monotone in exposure for grey (non-strict at the clipped top end)
    greys = np.asarray(
        tonemap.aces_fitted(jnp.linspace(0.01, 10.0, 32)[:, None] * jnp.ones((1, 3)))
    )
    assert (np.diff(greys[:, 1]) >= -1e-6).all()
    assert (np.diff(greys[:8, 1]) > 0).all()


def test_aces_approx_matches_shape():
    x = jnp.linspace(0.0, 4.0, 64)
    y = np.asarray(tonemap.aces_film_approximate(x))
    assert y.min() >= 0 and y.max() <= 1
    assert (np.diff(y) >= -1e-6).all()
