"""Post-processing: tonemap pass (bloom lives in ops/bloom.py).

Parity: tonemapping.comp — ACES fitted RRT+ODT -> sRGB encode -> hash-noise
dither -> RGBA8, as one fused elementwise pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import color as colorlib
from ..utils import tonemap as tonemaplib
from .raster import TILE_H, TILE_W


@jax.named_scope("post.tonemap")
def tonemap_pass(hdr, time, dither: bool = True, row_offset=0):
    """hdr (3, H, W) linear -> (H, W, 3) uint8 sRGB (tonemapping.comp).

    All math runs channel-planar — (H, W, 3) arrays put the 3-wide channel
    axis on the 128-lane minor dimension and waste ~98% of the VPU; the HWC
    interleave happens once, on the final uint8 image. row_offset: the
    band's first GLOBAL row in split-frame mode, so the dither hash matches
    the single-device image."""
    c = tonemaplib.aces_fitted_planar(hdr)
    c = colorlib.linear_to_srgb(c)
    if dither:
        h, w = c.shape[-2:]
        px = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :], (h, w))
        py = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32)[:, None],
                              (h, w)) + row_offset
        noise = colorlib.dither_noise_planar(px, py,
                                             jnp.asarray(time, jnp.float32))
        c = c + noise
    u8 = jnp.clip(jnp.round(c * 255.0), 0, 255).astype(jnp.uint8)
    return jnp.moveaxis(u8, 0, -1)


@jax.named_scope("post.material_lookup")
def material_lookup(material_table, material_ids, valid,
                    interpret: bool = False):
    """Per-pixel material constants without gathers.

    material_table (M, C) f32; material_ids (H, W) f32/int; returns (C, H, W).
    Implemented as a one-hot contraction (M is small), matching the pattern
    used everywhere in this codebase where XLA gathers would be too slow.
    """
    m, c = material_table.shape
    if m <= 128 and material_ids.shape[-2] % TILE_H == 0 \
            and material_ids.shape[-1] % TILE_W == 0:
        return _material_lookup_kernel_call(material_table, material_ids,
                                            valid, interpret)
    ids = material_ids.astype(jnp.int32)
    # fallback: unrolled select-sum, M*C fused (H, W) selects
    out = []
    for ci in range(c):
        acc = jnp.zeros_like(material_ids)
        for mi in range(m):
            acc = jnp.where(ids == mi, material_table[mi, ci], acc)
        out.append(jnp.where(valid, acc, 0.0))
    return jnp.stack(out)


def _material_kernel(table_ref, ids_ref, valid_ref, out_ref, *, c: int):
    ids = jnp.clip(ids_ref[...].astype(jnp.int32), 0, 127)
    valid = valid_ref[...] > 0.0
    for ci in range(c):
        row = jnp.broadcast_to(table_ref[ci:ci + 1, :], (TILE_H, TILE_W))
        val = jnp.take_along_axis(row, ids, axis=1)
        out_ref[ci] = jnp.where(valid, val, 0.0)


def _material_lookup_kernel_call(material_table, material_ids, valid,
                                 interpret: bool = False):
    """Per-pixel material constants as one lane-gather per channel per tile
    (materials live on the 128 lanes of a VMEM-resident table row)."""
    m, c = material_table.shape
    h, w = material_ids.shape
    table = jnp.zeros((c, 128), jnp.float32).at[:, :m].set(material_table.T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(h // TILE_H, w // TILE_W),
        in_specs=[
            pl.BlockSpec((c, 128), lambda ty, tx: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx: (ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx: (ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((c, TILE_H, TILE_W), lambda ty, tx: (0, ty, tx),
                         memory_space=pltpu.VMEM),
        ],
    )
    (out,) = pl.pallas_call(
        functools.partial(_material_kernel, c=c),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((c, h, w), jnp.float32)],
        interpret=interpret,
    )(table, material_ids.astype(jnp.float32),
      valid.astype(jnp.float32))
    return out
