"""R11G11B10 float packing.

The reference stores HDR color targets as R11G11B10_uFloat (TAA history,
scene color — TAA.cpp:28, RenderFrontend image creation). We keep the same
packing for the TAA history: besides matching the reference's quantization,
one packed int32 per texel means the Pallas history-resample kernel pays ONE
lane-gather per tap instead of three.

Encoding is the standard truncation of the f32 bit pattern (5-bit exponent
window shared with f16, 6/6/5-bit mantissas), clamping negatives and NaN to
zero like the Vulkan format does.
"""

from __future__ import annotations

import jax.numpy as jnp


def _to_unsigned_float(x, mantissa_bits):
    bits = jnp.asarray(x, jnp.float32).view(jnp.int32)
    # clamp to [0, 65000] (max representable ~ 6.5e4 like f16)
    x = jnp.clip(jnp.asarray(x, jnp.float32), 0.0, 64512.0)
    x = jnp.where(jnp.isfinite(x), x, 0.0)
    bits = x.view(jnp.int32)
    # f32 exponent bias 127 -> 5-bit bias 15: subtract (127-15) << 23;
    # add half a ULP first for round-to-nearest
    shifted = bits - ((127 - 15) << 23) + (1 << (22 - mantissa_bits))
    shifted = jnp.maximum(shifted, 0)  # flush small values to zero
    out = (shifted >> (23 - mantissa_bits)) & ((1 << (5 + mantissa_bits)) - 1)
    return out


def _from_unsigned_float(u, mantissa_bits):
    u = jnp.asarray(u, jnp.int32) & ((1 << (5 + mantissa_bits)) - 1)
    bits = (u << (23 - mantissa_bits)) + ((127 - 15) << 23)
    val = bits.view(jnp.float32)
    return jnp.where(u == 0, 0.0, val)


def pack_r11g11b10(rgb):
    """rgb (3, ...) f32 -> (...,) int32 packed."""
    r = _to_unsigned_float(rgb[0], 6)
    g = _to_unsigned_float(rgb[1], 6)
    b = _to_unsigned_float(rgb[2], 5)
    return r | (g << 11) | (b << 22)


def unpack_r11g11b10(packed):
    """(...,) int32 -> (3, ...) f32."""
    packed = jnp.asarray(packed, jnp.int32)
    r = _from_unsigned_float(packed & 0x7FF, 6)
    g = _from_unsigned_float((packed >> 11) & 0x7FF, 6)
    b = _from_unsigned_float((packed >> 22) & 0x3FF, 5)
    return jnp.stack([r, g, b], axis=0)
