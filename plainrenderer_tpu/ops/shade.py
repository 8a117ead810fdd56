"""Forward PBR shading (triangle.frag parity) over planar framebuffers.

Pure per-pixel math on (..., H, W) planes: all texture fetches (material
textures, shadow maps, GI buffers) happen in earlier passes / kernels and
arrive here as planar inputs, so this whole pass is elementwise VPU work that
XLA fuses freely. Mirrors triangle.frag:146-321:

  - normal mapping through the interpolated TBN (triangle.frag:188-200,
    including the NaN-guard fallback to the geometric normal);
  - roughness remap r = max(r*r, 0.0045) (triangle.frag:184);
  - 4 diffuse BRDFs + in/out Fresnel correction (:243-282);
  - GGX single scatter + 4 multiscatter modes (:131-175 helpers, :284-287);
  - SH-L1 indirect irradiance decode + dominant-direction indirect specular
    (:295-321) or constant-ambient fallback (:322-333);
  - sun radiance = NoL * shadow * sunColor * sunStrengthExposed (:229-241).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..utils import sh
from ..utils.color import ycocg_to_linear
from . import brdf
from .brdf_lut import diffuse_integral_fitted, env_brdf_fitted

PI = jnp.pi


@dataclasses.dataclass(frozen=True)
class ShadingConfig:
    """RenderFrontend.h:32-38 — the main-pass shading switches."""

    diffuse_brdf: int = 2  # 0 lambert, 1 disney, 2 CoD-WWII (default), 3 titanfall2
    direct_multiscatter_brdf: int = 0  # 0 McAuley, 1 simplified, 2 scaled-GGX, 3 none
    use_indirect_multiscatter: bool = True
    use_geometric_aa: bool = True
    indirect_lighting_tech: int = 0  # 0 SDF-traced, 1 constant ambient
    # material texture filter: 0 bilinear within the tile mip, 1 per-pixel
    # trilinear across two mips, 2 trilinear + 3-tap anisotropic (analog of
    # the reference's trilinear/aniso samplers,
    # RenderFrontend.cpp:1300-1397; each level costs extra window taps)
    texture_filter: int = 0
    # window the tile's SECOND material too (texture.py two_mat:
    # scalar-gated per tile, so single-material tiles pay nothing) —
    # per-pixel sampling coverage on <= 2-material tiles. Ignored when
    # texture_filter >= 1 (trilinear reuses the second window pair for
    # the higher mip).
    texture_two_mat: bool = True


def reflected_energy_average(roughness):
    """triangle.frag:121-129 — fitted average reflected energy E_avg(r)."""
    smoothness = 1.0 - jnp.sqrt(roughness)
    r = -0.0761947 - 0.383026 * smoothness
    r = 1.04997 + smoothness * r
    r = 0.409255 + smoothness * r
    return jnp.minimum(0.999, r)


def specular_multiscatter_lobe(mode: int, r, nol, f0, single_lobe,
                               lut_y_outgoing, lut_y_incoming):
    """triangle.frag:146-175 — the four selectable multiscatter modes.

    lut_y_outgoing = E_o at (r, NoV), lut_y_incoming = E_i at (r, NoL).
    f0/single_lobe carry a leading 3-channel axis; scalars broadcast.
    """
    energy_outgoing = lut_y_outgoing
    fresnel_avg = f0 + (1.0 - f0) / 21.0
    if mode == 0:
        energy_avg = reflected_energy_average(r)
        unscaled = (1.0 - lut_y_incoming) * (1.0 - energy_outgoing) / (
            3.1415 * (1.0 - energy_avg))
        scaling = (fresnel_avg * fresnel_avg * energy_avg) / (
            1.0 - fresnel_avg * (1.0 - energy_avg))
        return unscaled * scaling
    if mode == 1:
        lobe = (1.0 - energy_outgoing) / PI
        scaling = (fresnel_avg * fresnel_avg * energy_outgoing) / (
            1.0 - fresnel_avg * (1.0 - energy_outgoing))
        return lobe * scaling
    if mode == 2:
        return f0 * (1.0 / jnp.maximum(energy_outgoing, 1e-4) - 1.0) * single_lobe
    return jnp.zeros_like(single_lobe)


def geometric_aa_roughness(normal, r, kappa=0.18, pixel_variance=0.5):
    """GeometricAA.inc:4-21 — Kaplanyan specular AA via screen-space normal
    derivatives; normal is (3, H, W), derivatives via one-pixel diffs."""
    n_u = jnp.diff(normal, axis=2, append=normal[:, :, -1:])
    n_v = jnp.diff(normal, axis=1, append=normal[:, -1:, :])
    variance = pixel_variance ** 2 * (
        jnp.sum(n_u * n_u, axis=0) + jnp.sum(n_v * n_v, axis=0))
    kernel_r2 = jnp.minimum(2.0 * variance, kappa)
    return jnp.clip(jnp.sqrt(r * r + kernel_r2), 0.0, 1.0)


def _dot(a, b):
    return jnp.sum(a * b, axis=0)


def _normalize(v):
    return v / jnp.maximum(jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True)), 1e-12)


@jax.named_scope("shade.forward")
def shade_forward(
    *,
    config: ShadingConfig,
    # G-buffer planes (H, W)-shaped unless noted
    world_pos,  # (3, H, W) reconstructed from depth
    geo_normal,  # (3, H, W) interpolated vertex normal
    tangent,  # (3, H, W)
    bitangent,  # (3, H, W)
    valid,  # (H, W) bool coverage
    # material samples (already texture-fetched)
    albedo_srgb_linear,  # (3, H, W) linear albedo
    normal_ts,  # (2, H, W) tangent-space normal xy in [-1, 1]
    specular,  # (3, H, W) [microAO, roughness, metalic] (gltf MR layout)
    # lighting inputs
    sun_direction,  # (3,) unit, pointing TOWARDS the sun
    sun_color,  # (3,) transmission-tinted sun color
    sun_strength_exposed,  # () pre-exposed sun strength
    sun_shadow,  # (H, W) in [0, 1]
    camera_position,  # (3,)
    indirect_y_sh=None,  # (4, H, W) Y irradiance as SH-L1
    indirect_cocg=None,  # (2, H, W)
):
    """Returns linear HDR color (3, H, W). Fog is applied by the caller
    (triangle.frag:133-144 applies the froxel LUT as the last step)."""
    # --- material decode (triangle.frag:177-201) ---
    metalic = specular[2]
    r = specular[1]
    r = jnp.maximum(r * r, 0.0045)
    diffuse_color = (1.0 - metalic)[None] * albedo_srgb_linear

    nz = jnp.sqrt(jnp.maximum(
        1.0 - normal_ts[0] * normal_ts[0] - normal_ts[1] * normal_ts[1], 0.0))
    n_ts = jnp.stack([normal_ts[0], normal_ts[1], nz], axis=0)
    n = (tangent * n_ts[0][None] + bitangent * n_ts[1][None]
         + geo_normal * n_ts[2][None])
    n_len = jnp.sqrt(jnp.sum(n * n, axis=0, keepdims=True))
    # NaN/degenerate-TBN fallback to the geometric normal (triangle.frag:198-200)
    n = jnp.where(n_len > 1e-6, n / jnp.maximum(n_len, 1e-12), geo_normal)

    l = jnp.asarray(sun_direction, jnp.float32).reshape(3, 1, 1)
    v = camera_position.reshape(3, 1, 1) - world_pos
    v = _normalize(v)
    h = _normalize(v + l)

    if config.use_geometric_aa:
        r = geometric_aa_roughness(n, r)

    noh = jnp.maximum(_dot(n, h), 0.0)
    nol = jnp.clip(_dot(n, l), 0.0, 1.0)
    voh = jnp.abs(_dot(v, h))
    lov = jnp.maximum(_dot(l, v), 0.0)
    nov = jnp.maximum(jnp.abs(_dot(n, v)), 1e-4)

    f0 = 0.04 + (albedo_srgb_linear - 0.04) * metalic[None]

    sun_radiance = (nol * sun_shadow)[None] * jnp.asarray(
        sun_color, jnp.float32).reshape(3, 1, 1)

    # split-sum terms: polynomials fitted to the exact brdfLut.comp bake
    # (brdf_lut.env_brdf_fitted docstring; triangle.frag:241 samples the
    # LUT at (r, NoV))
    lut_x, lut_y = env_brdf_fitted(r, nov)
    _, lut_y_in = env_brdf_fitted(r, nol)
    # diffuseBRDFIntegral = brdfLut.z (triangle.frag:251-281); mode 3 adds
    # the analytic albedo-dependent multiscatter part the LUT can't hold
    diffuse_integral = diffuse_integral_fitted(
        r, nov, config.diffuse_brdf)[None]
    if config.diffuse_brdf == 3:
        multi_integral = (0.1159 * r * (2.0 * PI)
                          * (1.0 - brdf.f_schlick(0.04, 1.0, nov)) * 0.94291)
        diffuse_integral = jnp.minimum(
            diffuse_integral + diffuse_color * multi_integral[None], 1.0)

    # --- direct diffuse (triangle.frag:243-282) ---
    if config.diffuse_brdf == 0:
        diffuse = brdf.lambert_diffuse(diffuse_color)
    elif config.diffuse_brdf == 1:
        diffuse = brdf.disney_diffuse(diffuse_color, nol, voh, nov, r)
    elif config.diffuse_brdf == 2:
        diffuse = brdf.cod_wwii_diffuse(diffuse_color, nol, voh, nov, noh, r)
    else:
        diffuse = brdf.titanfall2_diffuse(diffuse_color, nol, lov, nov, noh, r)
    diffuse_direct = diffuse * sun_radiance
    # in/out fresnel correction (triangle.frag:283-285)
    diffuse_direct = diffuse_direct * (
        (1.0 - brdf.f_schlick(f0, 1.0, nov[None]))
        * (1.0 - brdf.f_schlick(f0, 1.0, nol[None])))

    # --- direct specular ---
    single = brdf.ggx_single_scattering(r, f0, noh, nov, voh, nol)
    multi = specular_multiscatter_lobe(
        config.direct_multiscatter_brdf, r, nol, f0, single, lut_y, lut_y_in)
    specular_direct = sun_radiance * (single + multi)

    # --- indirect (triangle.frag:289-333) ---
    if config.indirect_lighting_tech == 0 and indirect_y_sh is not None:
        sh_n = sh.direction_to_sh_l1(jnp.moveaxis(n, 0, -1))
        irr_y = jnp.maximum(
            jnp.sum(jnp.moveaxis(indirect_y_sh, 0, -1) * sh_n, axis=-1), 0.0)
        irradiance = jnp.moveaxis(
            ycocg_to_linear(jnp.stack(
                [irr_y, indirect_cocg[0], indirect_cocg[1]], axis=-1)), -1, 0)
        irradiance = jnp.maximum(irradiance, 0.0)
        diffuse_indirect = irradiance * diffuse_color * diffuse_integral

        dom = sh.dominant_direction_from_sh_l1(jnp.moveaxis(indirect_y_sh, 0, -1))
        dom = jnp.moveaxis(dom, -1, 0)
        dom_len = jnp.clip(jnp.sqrt(jnp.sum(dom * dom, axis=0)), 0.01, 1.0)
        r_ind = 1.0 + (r - 1.0) * jnp.sqrt(dom_len)
        l_ind = dom / jnp.maximum(dom_len[None], 1e-9)
        h_ind = _normalize(l_ind + v)
        noh_i = jnp.maximum(_dot(n, h_ind), 0.0)
        nol_i = jnp.maximum(_dot(n, l_ind), 0.0)
        voh_i = jnp.maximum(_dot(v, h_ind), 0.0)
        single_i = brdf.ggx_single_scattering(r_ind, f0, noh_i, nov, voh_i, nol_i)
        lut_xi, lut_yi = env_brdf_fitted(r_ind, nov)
        _, lut_yi_in = env_brdf_fitted(r_ind, nol_i)
        multi_i = specular_multiscatter_lobe(
            config.direct_multiscatter_brdf if config.use_indirect_multiscatter
            else 3, r_ind, nol_i, f0, single_i, lut_yi, lut_yi_in)
        radiance_ind = jnp.moveaxis(
            ycocg_to_linear(jnp.stack(
                [jnp.maximum(indirect_y_sh[0], 0.0), indirect_cocg[0],
                 indirect_cocg[1]], axis=-1)), -1, 0)
        radiance_ind = jnp.maximum(radiance_ind, 0.0)
        specular_indirect = (single_i + multi_i) * radiance_ind
        lighting_indirect = diffuse_indirect + specular_indirect
    else:
        ambient = 0.003 * sun_strength_exposed
        single_amb = lut_x + (lut_y - lut_x) * f0
        lighting_indirect = (
            ambient * diffuse_color * diffuse_integral
            + single_amb * ambient)

    color = (diffuse_direct + specular_direct) * sun_strength_exposed \
        + lighting_indirect
    return jnp.where(valid[None], color, 0.0)


def reconstruct_world_position(depth, inv_view_proj, width, height):
    """screenToWorld semantics: reverse-Z depth + pixel NDC -> world position.

    depth (H, W) reverse-Z; returns (3, H, W). Sky pixels (depth == 0) get
    positions on the far plane (harmless; shading masks by coverage).
    """
    h, w = depth.shape
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / height * 2.0 - 1.0
    ndc_x = jnp.broadcast_to(xs[None, :], (h, w))
    ndc_y = jnp.broadcast_to(ys[:, None], (h, w))
    z = jnp.maximum(depth, 1e-9)
    m = inv_view_proj
    wpos = (
        m[:3, 0:1, None] * ndc_x[None]
        + m[:3, 1:2, None] * ndc_y[None]
        + m[:3, 2:3, None] * z[None]
        + m[:3, 3:4, None]
    )
    wdiv = (
        m[3, 0] * ndc_x + m[3, 1] * ndc_y + m[3, 2] * z + m[3, 3]
    )
    return wpos / jnp.where(jnp.abs(wdiv) > 1e-12, wdiv, 1.0)[None]
