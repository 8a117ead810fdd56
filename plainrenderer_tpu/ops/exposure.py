"""Histogram-based auto exposure.

Parity:
  - histogramPerTile/Reset/CombineTiles.comp — 128-bin log-luminance
    histogram of the previous frame's color (bins over [0.001, 200000]
    luminance, RenderFrontend.cpp:46,1063-1072; luma weights 0.2126/0.7152/
    0.0722, histogramPerTile.comp:28-30; luminance un-exposed by the previous
    frame's exposure before binning).
  - preExposeLights.comp — mean of the [50%, 95%] percentile band, scene
    EV100, CoD:AW scene-EV offset curve, adaption-speed-clamped exposure,
    sunStrengthExposed and transmission-tinted sun color.

TPU notes: the GPU shared-memory atomics histogram becomes a dense
comparison-reduction (bin-index equality against iota, summed per bin) — no
scatters. The scalar preExposeLights pass is straight jnp math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

N_BINS = 128  # RenderFrontend.cpp:46
MIN_LUMINANCE = 0.001  # RenderFrontend.cpp:1066
MAX_LUMINANCE = 200000.0  # RenderFrontend.cpp:1067


@jax.named_scope("exposure.histogram")
def compute_histogram(color, previous_exposure, n_bins: int = N_BINS,
                      min_lum: float = MIN_LUMINANCE,
                      max_lum: float = MAX_LUMINANCE,
                      downsample: int = 4):
    """color (3, H, W) -> (n_bins,) f32 counts.

    downsample strides the input (exposure statistics are insensitive to it;
    counts are rescaled so percentages match the full-resolution histogram).
    """
    from ..utils.stencil import point_downsample

    # luminance BEFORE the subsample: one plane through the stride machinery
    # instead of three (and the strided slice would canonicalize into a
    # full index-vector gather inside the frame program — see
    # utils/stencil.point_downsample)
    lum = (0.2126 * color[0] + 0.7152 * color[1] + 0.0722 * color[2])
    lum = point_downsample(lum, downsample, downsample)
    lum = lum / jnp.maximum(previous_exposure, 1e-9)
    log_min = jnp.log(min_lum)
    log_max = jnp.log(max_lum)
    t = jnp.clip((jnp.log(jnp.maximum(lum, 1e-12)) - log_min)
                 / (log_max - log_min), 0.0, 1.0)
    bins = (t * (n_bins - 1)).astype(jnp.int32).reshape(-1)
    # sort-based bincount: one radix sort of the bin ids + 128 binary
    # searches for the bin boundaries. The one-hot comparison-matrix
    # formulation materialized (P, 128) floats (measured 3-5 ms at 1080p);
    # the sort is ~2 ms/M keys on the TPU and P/16 keys are plenty for an
    # auto-exposure histogram.
    bins_sorted = jax.lax.sort(bins)
    edges = jnp.searchsorted(
        bins_sorted, jnp.arange(n_bins + 1, dtype=jnp.int32)).astype(
        jnp.float32)
    counts = edges[1:] - edges[:-1]
    return counts * float(downsample * downsample)


def _offset_from_scene_ev(scene_ev100):
    """preExposeLights.comp:27-38 — CoD:AW scene-EV offset curve."""
    dark_exp, light_exp = 2.84, 12.81
    light_offset, dark_offset = 1.47, -3.17
    t = jnp.clip((scene_ev100 - dark_exp) / (light_exp - dark_offset), 0.0, 1.0)
    return dark_offset + (light_offset - dark_offset) * t


@jax.named_scope("exposure.pre_expose")
def pre_expose_lights(histogram, previous_exposure, sun_strength,
                      exposure_offset, adaption_speed_ev_per_sec, delta_time,
                      pixel_count, n_bins: int = N_BINS,
                      min_lum: float = MIN_LUMINANCE,
                      max_lum: float = MAX_LUMINANCE,
                      camera_cut=False):
    """preExposeLights.comp:40-89 — returns (exposure, sun_strength_exposed).

    Mean over bins within the [50%, 95%] pixel-percentile band, EV100 with
    the CoD offset curve (plus the user exposure_offset), clamped adaption.
    camera_cut snaps directly to the target exposure (no adaption clamp) so
    the first frames aren't black/blown while adapting from the initial
    state — the analog of the reference's history-reset-on-cut semantics.
    """
    log_min = jnp.log(min_lum)
    log_max = jnp.log(max_lum)
    cum = jnp.cumsum(histogram)
    pct = cum / pixel_count
    in_band = (pct < 0.95) & (pct >= 0.5)
    bin_values = jnp.exp(
        log_min + (log_max - log_min)
        * jnp.arange(n_bins, dtype=jnp.float32) / (n_bins - 1.0))
    counted = jnp.sum(jnp.where(in_band, histogram, 0.0))
    mean = jnp.sum(jnp.where(in_band, histogram * bin_values, 0.0)) / (
        jnp.maximum(counted, 1.0))

    scene_ev100 = jnp.log2(jnp.maximum(mean * 100.0 / 12.5, 1e-9))
    offset = _offset_from_scene_ev(scene_ev100) + exposure_offset
    target_ev100 = jnp.maximum(scene_ev100 - offset, 10.0)
    previous_ev100 = jnp.log2(
        1.0 / (jnp.maximum(previous_exposure, 1e-6) * 1.2))
    ev_delta = target_ev100 - previous_ev100
    ev_max_change = adaption_speed_ev_per_sec * delta_time
    ev_change = jnp.sign(ev_delta) * jnp.minimum(
        jnp.abs(ev_delta), jnp.abs(ev_max_change))
    current_ev100 = jnp.where(camera_cut, target_ev100,
                              previous_ev100 + ev_change)
    exposure = 1.0 / (jnp.power(2.0, current_ev100) * 1.2)
    return exposure, sun_strength * exposure
