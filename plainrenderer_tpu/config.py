"""User-facing render settings (the reference's ImGui-mutable structs).

Parity: ShadingConfig (RenderFrontend.h:32-38), TAASettings (TAA.h:8-17),
SDFTraceSettings/SDFDebugSettings (SDFGI.h:11-29), VolumetricsSettings +
WindSettings (Volumetrics.h:5-18), BloomSettings (Bloom.h:5-9),
AtmosphereSettings (Sky.h:6-15) and the GlobalShaderInfo scalar knobs
(sun illuminance, exposure offset/adaption speed, ResourceDescriptions.h:
174-201).

All dataclasses are frozen/hashable: they are passed as static jit arguments,
so changing one triggers a recompile — the TPU analog of the reference's
specialization-constant -> pipeline-rebuild staleness path
(RenderFrontend.cpp:233-264).
"""

from __future__ import annotations

import dataclasses

from .ops.shade import ShadingConfig  # re-export (defined next to its use)
from .ops.sky import AtmosphereSettings  # re-export


@dataclasses.dataclass(frozen=True)
class TAASettings:
    """TAA.h:8-17."""

    enabled: bool = True
    use_separate_supersampling: bool = False
    use_clipping: bool = True
    use_motion_vector_dilation: bool = True
    history_sampling_tech: int = 4  # 0 bilinear, 1..4 bicubic 16/9/5/1-tap
    supersample_use_tonemapping: bool = True
    filter_use_tonemapping: bool = True
    use_mip_bias: bool = True


@dataclasses.dataclass(frozen=True)
class SDFTraceSettings:
    """SDFGI.h:17-29.

    The reference's per-tile instance-culling knobs (useHiZCulling,
    maxInstancesPerTile — sdfCulling.inc:4-5) do not exist here: the
    per-pixel instance loop they bounded is replaced by one composited
    global SDF volume (ops/sdf_scene.py), so there is nothing to cull."""

    enabled: bool = True
    half_resolution: bool = True
    strict_influence_radius_cutoff: bool = False  # SDFGI.h:21
    influence_radius: float = 3.0
    trace_steps: int = 128  # reference trace loop length (SDF.inc:144)
    # rays leaving the per-tile fine window continue in a 4x min-pooled
    # whole-scene volume instead of falling through to sky (the rebuild's
    # analog of the reference's full-volume trace, SDF.inc:103-185)
    coarse_fallback: bool = True


@dataclasses.dataclass(frozen=True)
class VolumetricsSettings:
    """Volumetrics.h:5-18 (incl. wind)."""

    enabled: bool = True
    max_distance: float = 30.0
    base_density: float = 0.005
    noise_density: float = 0.01
    ambient: float = 0.02  # froxelLightScattering.comp:57 constantAmbient
    scattering_coefficient: float = 1.0
    absorption_coefficient: float = 0.1
    phase_g: float = 0.2
    wind_speed: float = 0.5
    wind_direction_deg: float = 45.0


@dataclasses.dataclass(frozen=True)
class BloomSettings:
    """Bloom.h:5-9."""

    enabled: bool = True
    strength: float = 0.02
    blur_radius: float = 1.5
    mip_count: int = 6


@dataclasses.dataclass(frozen=True)
class SDFDebugSettings:
    """SDFGI.h:9-15 — SDF debug visualisation.

    visualisation_mode: 0 none, 1 lit SDF, 2 trace-window occupancy (the
    reference's camera-tile-usage analog), 3 normals, 4 raymarch steps."""

    visualisation_mode: int = 0


@dataclasses.dataclass(frozen=True)
class ShadowSettings:
    """Cascaded sun shadows (RenderFrontend shadow constants + lightMatrix)."""

    cascade_count: int = 3  # ShadingConfig default (RenderFrontend.h:37)
    resolution: int = 2048  # reference shadowMapRes (RenderFrontend.cpp:40)
    pcf_taps: int = 12  # triangle.frag:110
    sample_radius: float = 0.03  # world-space, sunShadowCascades.inc:5
    debug_cascade_colors: bool = False  # sunShadowCascades.inc:23-31 tint


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Top-level bundle; hashable -> usable as a static jit argument."""

    width: int = 1920
    height: int = 1080
    shading: ShadingConfig = ShadingConfig()
    taa: TAASettings = TAASettings()
    sdf_trace: SDFTraceSettings = SDFTraceSettings()
    sdf_debug: SDFDebugSettings = SDFDebugSettings()
    volumetrics: VolumetricsSettings = VolumetricsSettings()
    bloom: BloomSettings = BloomSettings()
    shadows: ShadowSettings = ShadowSettings()
    atmosphere: AtmosphereSettings = AtmosphereSettings()
    # GlobalShaderInfo scalar knobs (ResourceDescriptions.h:174-201)
    sun_illuminance: float = 128000.0  # GlobalShaderInfo default (ResourceDescriptions.h:192)
    exposure_offset: float = 1.0  # ResourceDescriptions.h:193
    exposure_adaption_speed: float = 2.0  # ResourceDescriptions.h:194
    sun_direction_angles: tuple = (0.0, 45.0)  # (phi, theta) deg; ref default (0,0)=zenith (RenderFrontend.h:141)
    # debug AABB wireframes (debug.vert + RenderFrontend.cpp:947-956)
    draw_bounding_boxes: bool = False
    # raster pair-budget multiplier. The default budgets assume typical
    # cull ratios (back-face + frustum leaves < 1/4 of triangles in the
    # main view, < 1/5 per shadow cascade — ~2x the measured bench-scene
    # occupancy); a scene/framing that exceeds them drops pairs — counted
    # in FrameState.debug_counters, shown in the overlay, and the App
    # path AUTO-RAISES this (recompiles; budgets scale O(n)) so the next
    # frame recovers. Raise manually for known-heavy scenes to avoid the
    # one degraded frame + recompile.
    pair_budget_scale: float = 1.0
