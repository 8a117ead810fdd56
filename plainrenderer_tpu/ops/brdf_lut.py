"""BRDF lookup table bake.

Parity: resources/shaders/brdfLut.comp — 1024-sample GGX importance-sampled
specular split-sum terms (x = Fc*k, y = k) plus the numerically integrated
diffuse BRDF with in/out Fresnel (z), over a (roughness, NoV) grid.

The reference bakes a 512x512 RGBA16F LUT once at startup in a headless
frame (RenderFrontend.cpp:188-191); here it's one jitted jnp expression
(vectorized over all texels and samples at once) producing an (3, N, N) f32
array kept in the frame state.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils import sampling
from . import brdf, env_brdf_fit

DEFAULT_LUT_SIZE = 512
DEFAULT_SAMPLES = 1024


@functools.partial(jax.jit, static_argnames=("size", "samples", "diffuse_brdf"))
def bake_brdf_lut(size: int = DEFAULT_LUT_SIZE, samples: int = DEFAULT_SAMPLES,
                  diffuse_brdf: int = 0) -> jnp.ndarray:
    """Returns (3, size, size): [Fc*k, k, diffuse integral] indexed [., NoV
    row, roughness column] (brdfLut.comp texel layout: x=roughness, y=NoV).
    """
    r = jnp.maximum(jnp.arange(size, dtype=jnp.float32) / size, 1e-4)
    nov = jnp.maximum(jnp.arange(size, dtype=jnp.float32), 0.1) / size
    r_grid, nov_grid = jnp.meshgrid(r, nov, indexing="xy")  # (size, size)
    r_grid = r_grid.reshape(-1, 1)  # (N^2, 1)
    nov_grid = nov_grid.reshape(-1, 1)

    i = jnp.arange(samples, dtype=jnp.uint32)
    xi = sampling.hammersley_2d_shader(i, samples)[None, :, :]  # (1, S, 2)

    v = jnp.concatenate(
        [jnp.sqrt(jnp.maximum(1.0 - nov_grid * nov_grid, 0.0)),
         jnp.zeros_like(nov_grid), nov_grid], axis=-1
    )[:, None, :]  # (N^2, 1, 3)
    n = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)

    # --- specular term (brdfLut.comp:38-57) ---
    h = sampling.importance_sample_ggx(
        jnp.broadcast_to(xi, (r_grid.shape[0], samples, 2)),
        jnp.broadcast_to(r_grid, (r_grid.shape[0], samples)),
        jnp.broadcast_to(n, (r_grid.shape[0], samples, 3)),
    )  # (N^2, S, 3)
    voh_raw = jnp.sum(v * h, axis=-1)
    l = 2.0 * voh_raw[..., None] * h - v
    voh = jnp.maximum(voh_raw, 0.0)
    noh = jnp.maximum(h[..., 2], 0.0)
    nol = jnp.maximum(l[..., 2], 0.0)
    vis = brdf.visibility_smith_ggx_height_correlated(nov_grid, nol, r_grid)
    k = vis * voh * nol / jnp.maximum(noh, 1e-8)
    k = jnp.where(nol > 0.0, k, 0.0)
    fc = jnp.power(1.0 - voh, 5.0)
    lut_x = jnp.mean(fc * k, axis=1) * 4.0
    lut_y = jnp.mean(k, axis=1) * 4.0

    # --- diffuse term (brdfLut.comp:59-96) ---
    ld = sampling.importance_sample_cosine(
        jnp.broadcast_to(xi, (r_grid.shape[0], samples, 2)),
        jnp.broadcast_to(n, (r_grid.shape[0], samples, 3)),
    )
    hd = v + ld
    hd = hd / jnp.maximum(jnp.linalg.norm(hd, axis=-1, keepdims=True), 1e-12)
    voh_d = jnp.clip(jnp.sum(v * hd, axis=-1), 0.0, 1.0)
    nol_d = jnp.maximum(ld[..., 2], 0.0)
    noh_d = jnp.maximum(hd[..., 2], 0.0)
    f0d = 0.04
    fresnel_in_out = (1.0 - brdf.f_schlick(f0d, 1.0, nov_grid)) * (
        1.0 - brdf.f_schlick(f0d, 1.0, nol_d)
    )
    if diffuse_brdf == 0:
        term = jnp.full_like(nol_d, 1.0 / jnp.pi)
    elif diffuse_brdf == 1:
        term = brdf.disney_diffuse(1.0, nol_d, voh_d, nov_grid, r_grid)
    elif diffuse_brdf == 2:
        term = brdf.cod_wwii_diffuse(1.0, nol_d, voh_d, nov_grid, noh_d, r_grid)
    else:
        lov = jnp.clip(jnp.sum(ld * v, axis=-1), 0.0, 1.0)
        term = brdf.titanfall2_diffuse_single(nol_d, lov, nov_grid, noh_d, r_grid)
    lut_z = jnp.mean(term * fresnel_in_out, axis=1)

    lut = jnp.stack([lut_x, lut_y, lut_z], axis=0)
    return lut.reshape(3, size, size)


def sample_brdf_lut(lut: jnp.ndarray, roughness: jnp.ndarray,
                    nov: jnp.ndarray) -> jnp.ndarray:
    """Bilinear LUT sample at (roughness, NoV) -> (3, ...).

    Reference/test/parity helper only: this uses XLA gathers, which are far
    too slow for the per-pixel hot path on TPU (~8 cycles/element). The
    production frame shades with env_brdf_fitted / diffuse_integral_fitted
    below (polynomials fitted TO this bake); the fit error against the
    exact bake is bounded by PARITY.md rows (tools/parity_report.py).
    """
    n = lut.shape[1]
    shape = roughness.shape
    rr = jnp.clip(roughness.reshape(-1) * n - 0.5, 0.0, n - 1.0)
    vv = jnp.clip(nov.reshape(-1) * n - 0.5, 0.0, n - 1.0)
    x0 = jnp.floor(rr).astype(jnp.int32)
    y0 = jnp.floor(vv).astype(jnp.int32)
    fx = rr - x0
    fy = vv - y0
    x1 = jnp.minimum(x0 + 1, n - 1)
    y1 = jnp.minimum(y0 + 1, n - 1)
    v00 = lut[:, y0, x0]
    v01 = lut[:, y0, x1]
    v10 = lut[:, y1, x0]
    v11 = lut[:, y1, x1]
    out = (
        v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy + v11 * fx * fy
    )
    return out.reshape((3,) + shape)


def _poly6(coef, u, v):
    """Total-degree-6 bivariate polynomial sum c[i,j] u^i v^j (i+j <= 6),
    nested Horner: ~27 VPU FMAs, zero gathers. coef is the (7, 7)
    upper-left-triangular numpy matrix from env_brdf_fit."""
    res = None
    for i in range(6, -1, -1):
        acc = float(coef[i, 6 - i])
        for j in range(6 - i - 1, -1, -1):
            acc = acc * v + float(coef[i, j])
        res = acc if res is None else res * u + acc
    return res


def env_brdf_fitted(roughness: jnp.ndarray, nov: jnp.ndarray):
    """Production split-sum terms (fc_k "bias", k "energy") — polynomials
    fitted TO the exact 1024-sample bake above (tools/fit_env_brdf.py), in
    the cliff-aligned coordinate s = NoV / (r + NoV) where the bake is
    smooth. |fit - bake| is bounded in PARITY.md (mean ~0.002/0.003, max
    ~0.09/0.015 for x/y); the published Karis polynomial (env_brdf_approx)
    was fitted against UE4's Visibility convention and misses THIS
    reference's bake by up to 0.63, so it is not used for shading.

    Matches brdfLut.comp channels x/y as consumed by triangle.frag:241
    (texture(brdfLutTexture, vec2(r, NoV)).xy).
    """
    s = nov / (roughness + nov + 1e-6)
    bias = jnp.clip(_poly6(env_brdf_fit.BIAS_SV, s, nov), 0.0, 1.0)
    k = jnp.clip(_poly6(env_brdf_fit.K_RS, roughness, s), 1e-4, 1.0)
    return bias, k


_Z_COEFS = (env_brdf_fit.Z_RN_0, env_brdf_fit.Z_RN_1,
            env_brdf_fit.Z_RN_2, env_brdf_fit.Z_RN_3)


def diffuse_integral_fitted(roughness: jnp.ndarray, nov: jnp.ndarray,
                            diffuse_brdf: int) -> jnp.ndarray:
    """Production diffuse split-sum integral — the LUT z channel
    (brdfLut.comp:59-96, one bake variant per diffuse mode) as a fitted
    poly6(r, NoV). Consumed exactly like triangle.frag:251-281
    diffuseBRDFIntegral = brdfLut.z (the mode-3 albedo-dependent
    multi-scatter part stays analytic in the caller, as in the reference).
    """
    z = _poly6(_Z_COEFS[diffuse_brdf], roughness, nov)
    return jnp.clip(z, 0.0, 1.0)


def env_brdf_approx(roughness: jnp.ndarray, nov: jnp.ndarray):
    """Analytic split-sum approximation (Karis, "Physically Based Material
    on Mobile") returning (fc_k, k) matching the LUT's x/y channels.

    NOT the production path: the Karis fit targets UE4's Visibility
    convention (alpha = r^2) and deviates from this reference's bake by up
    to 0.63 at grazing rough metals — kept only as the published baseline
    that PARITY.md quantifies against env_brdf_fitted.
    """
    x = 1.0 - roughness
    y = nov
    b1, b2, b3, b4, b5 = -0.1688, 1.895, 0.9903, -4.853, 8.404
    b6 = -5.069
    bias = jnp.clip(jnp.minimum(b1 * x + b2 * x * x,
                                b3 + b4 * y + b5 * y * y + b6 * y * y * y),
                    0.0, 1.0)
    d0, d1, d2, d3 = 0.6045, 1.699, -0.5228, -3.603
    d4, d5, d6 = 1.404, 0.1939, 2.661
    delta = jnp.clip(
        d0 + d1 * x + d2 * y + d3 * x * x + d4 * x * y + d5 * y * y
        + d6 * x * x * x, 0.0, 1.0)
    scale = delta - bias
    # LUT channels: x = Fc*k (bias), y = k (scale + bias)
    return bias, jnp.clip(scale + bias, 1e-4, 1.0)
