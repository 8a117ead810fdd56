"""Split-frame SPMD rendering over a device mesh.

The reference is single-GPU; its only parallelism is intra-dispatch SIMT and
a CPU job pool (SURVEY 2.8). The TPU-native scaling model is pixel-space
SPMD: the screen is split into horizontal bands, one per device, and EVERY
device runs the full frame program on its band via shard_map:

  - geometry + main-view binning run per device against the replicated
    scene (the classic split-frame-rendering trade: duplicated triangle
    setup buys zero cross-device fragment traffic);
  - the VIEW-INDEPENDENT work is sharded, not replicated: each device
    bins + rasterizes only a horizontal band of the cascade shadow atlas
    and the full maps are all_gather'd over ICI (render/frame.py
    _atlas_band_slice; ~50 MB of maps, sub-ms on a pod slice) — the mesh
    as a whole renders each cascade once, like the reference's single GPU
    (RenderFrontend.cpp:760-774), instead of once per device;
  - each band renders with an asymmetric sub-frustum (the band rows of the
    full projection), so pixels match a single-device render exactly;
  - cross-band collectives ride ICI: the exposure histogram is psum-ed
    (global auto-exposure), cascade fitting pmin/pmaxes the depth bounds
    (identical light matrices on every band), and the stencil passes
    (TAA + history reprojection, the GI filter chain, bloom) exchange
    16-48 border rows with their neighbors via jax.lax.ppermute before
    filtering (parallel/halo.py) — band output matches single-device
    near-exactly (tests/test_parallel.py asserts <= 2 LSB);
  - temporal state lives sharded: each device keeps its band's history in
    its own HBM; no state ever crosses chips.

Works identically on a real v5e-8 mesh and on the 8-device virtual CPU mesh
used in tests (xla_force_host_platform_device_count).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RenderSettings
from ..render import frame as frame_mod
from ..render.state import FrameState, initial_state


def make_mesh(devices=None, axis: str = "bands") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def band_settings(settings: RenderSettings, n_devices: int) -> RenderSettings:
    """Per-device settings: same width, 1/N of the (tile-aligned) height."""
    from ..ops.raster import TILE_H

    band_h = settings.height // n_devices
    band_h = max(TILE_H, band_h // TILE_H * TILE_H)
    return dataclasses.replace(settings, height=band_h)


def sharded_frame_fn(settings: RenderSettings, n_devices: int,
                     interpret: bool = False, axis: str = "bands"):
    """Build the shard_map-ed frame function.

    Returns f(state_stacked, scene, cam, luts, dt) -> (image_stacked, state')
    where state_stacked leaves have a leading (n_devices,) axis sharded over
    the mesh, and image_stacked is (n_devices, band_h, W, 3).
    """
    bset = band_settings(settings, n_devices)
    full_h = bset.height * n_devices

    def per_band(state, scene, cam, luts, dt):
        state = jax.tree.map(lambda x: x[0], state)
        band = jax.lax.axis_index(axis).astype(jnp.float32)
        # band b covers full NDC y in [b, b+1) / N * 2 - 1; the band
        # projection maps that subrange to [-1, 1]:
        n = float(n_devices)
        center = (band + 0.5) / n * 2.0 - 1.0
        cam = dict(cam)
        cam["ndc_y_scale"] = jnp.asarray(n, jnp.float32)
        cam["ndc_y_offset"] = -center * n
        image, new_state = frame_mod.render_frame(
            state, scene, cam, luts, dt, bset, interpret=interpret,
            axis_name=axis, full_height=full_h)
        return (image[None], jax.tree.map(lambda x: x[None], new_state))

    def run(mesh, state_stacked, scene, cam, luts, dt):
        fn = shard_map(
            per_band, mesh=mesh,
            in_specs=(jax.tree.map(lambda _: P(axis), state_stacked),
                      P(), P(), P(), P()),
            out_specs=(P(axis), jax.tree.map(lambda _: P(axis),
                                             state_stacked)),
            check_vma=False,
        )
        return fn(state_stacked, scene, cam, luts, dt)

    return run, bset


def initial_sharded_state(settings: RenderSettings, n_devices: int):
    bset = band_settings(settings, n_devices)
    one = initial_state(bset.width, bset.height)
    return jax.tree.map(
        lambda x: jnp.stack([x] * n_devices), one)


def assemble_image(image_stacked) -> np.ndarray:
    """(N, band_h, W, 3) device bands -> (N*band_h, W, 3) full frame."""
    img = np.asarray(image_stacked)
    return img.reshape(-1, *img.shape[2:])
