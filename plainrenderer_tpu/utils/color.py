"""Color space conversions and hash noise.

Parity targets (math identical, vectorized over leading axes):
  - resources/shaders/colorConversion.inc (sRGB <-> linear, YCoCg <-> linear)
  - resources/shaders/luminance.inc:5-7 (Rec.709-ish luma weights 0.21/0.72/0.07)
  - resources/shaders/noise.inc (interleaved gradient noise, hash32, wang_hash,
    xorshift32)
  - resources/shaders/dither.inc (RGB8 dither)

Color arrays use a trailing channel axis of size 3 ("..., 3") — host-side and
small-tensor convention. Framebuffers in the render path are planar (C, H, W);
those call the *_planar variants that broadcast per channel.
"""

from __future__ import annotations

import jax.numpy as jnp

LUMA_WEIGHTS = (0.21, 0.72, 0.07)


def linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    """colorConversion.inc:4-13 — piecewise sRGB OETF."""
    lo = c * 12.92
    hi = jnp.power(jnp.abs(c), 1.0 / 2.4) * 1.055 - 0.055
    return jnp.where(c <= 0.0031308, lo, hi)


def srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    """colorConversion.inc:15-24 — piecewise sRGB EOTF."""
    lo = c / 12.92
    hi = jnp.power(jnp.abs(c + 0.055) / 1.055, 2.4)
    return jnp.where(c <= 0.004045, lo, hi)


def linear_to_ycocg(rgb: jnp.ndarray) -> jnp.ndarray:
    """colorConversion.inc:26-31 — RGB -> (Y, Co, Cg), channel-last."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.25 * r + 0.5 * g + 0.25 * b
    co = 0.5 * r - 0.5 * b
    cg = -0.25 * r + 0.5 * g - 0.25 * b
    return jnp.stack([y, co, cg], axis=-1)


def ycocg_to_linear(ycocg: jnp.ndarray) -> jnp.ndarray:
    """colorConversion.inc:33-38 — (Y, Co, Cg) -> RGB, channel-last."""
    y, co, cg = ycocg[..., 0], ycocg[..., 1], ycocg[..., 2]
    r = y + co - cg
    g = y + cg
    b = y - co - cg
    return jnp.stack([r, g, b], axis=-1)


def luminance(rgb: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """luminance.inc:5-7 — dot(color, (0.21, 0.72, 0.07))."""
    w = jnp.asarray(LUMA_WEIGHTS, dtype=rgb.dtype)
    shape = [1] * rgb.ndim
    shape[axis] = 3
    return jnp.sum(rgb * w.reshape(shape), axis=axis)


def interleaved_gradient_noise(uv: jnp.ndarray) -> jnp.ndarray:
    """noise.inc:5-8 — CoD:AW interleaved gradient noise; uv is (..., 2)."""
    magic = jnp.asarray([0.06711056, 0.00583715], dtype=jnp.float32)
    d = uv[..., 0] * magic[0] + uv[..., 1] * magic[1]
    return jnp.mod(62.9829189 * jnp.mod(d, 1.0), 1.0)


_UI0 = jnp.uint32(1597334673)
_UI1 = jnp.uint32(3812015801)
_UI2 = jnp.uint32(2798796415)
_UIF = 1.0 / 4294967295.0


def hash32(qx: jnp.ndarray, qy: jnp.ndarray) -> jnp.ndarray:
    """noise.inc:16-26 — Hoskins hash32: 2D int coords -> 3 floats in [0,1].

    Returns (..., 3). Inputs are integer pixel coordinates (any int dtype).
    """
    x = qx.astype(jnp.uint32)
    y = qy.astype(jnp.uint32)
    nx = x * _UI0
    ny = y * _UI1
    nz = x * _UI2
    h = nx ^ ny ^ nz
    out = jnp.stack([h * _UI0, h * _UI1, h * _UI2], axis=-1)
    return out.astype(jnp.float32) * _UIF


def wang_hash(seed: jnp.ndarray) -> jnp.ndarray:
    """noise.inc:39-47 — Wang hash on uint32."""
    s = seed.astype(jnp.uint32)
    s = (s ^ jnp.uint32(61)) ^ (s >> 16)
    s = s * jnp.uint32(9)
    s = s ^ (s >> 4)
    s = s * jnp.uint32(0x27D4EB2D)
    s = s ^ (s >> 15)
    return s


def xorshift32(state: jnp.ndarray) -> jnp.ndarray:
    """noise.inc:30-36 — one xorshift32 step; returns the new state."""
    s = state.astype(jnp.uint32)
    s = s ^ (s << 13)
    s = s ^ (s >> 17)
    s = s ^ (s << 5)
    return s


def rand_from_state(state: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """noise.inc:50-54 — xorshift -> float in [0,1]; returns (value, new_state)."""
    s = xorshift32(state)
    # uintBitsToFloat(0x2f800004) == 2**-32 * (1 + 2**-21); clamp like the ref.
    v = jnp.clip(s.astype(jnp.float32) * jnp.float32(2.3283067e-10), 0.0, 1.0)
    return v, s


def dither_rgb8(color: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray,
                time: jnp.ndarray) -> jnp.ndarray:
    """dither.inc:6-12 — +/- 1 LSB triangular-ish dither before RGBA8 quantize.

    color is (..., 3); px/py are integer pixel coords broadcastable to
    color[..., 0]; time is the frame-time scalar (g_time in global.inc).
    """
    t = time.astype(jnp.float32)
    n0 = hash32((px.astype(jnp.float32) * t).astype(jnp.int32),
                (py.astype(jnp.float32) * t).astype(jnp.int32))
    n1 = hash32(((px.astype(jnp.float32) + 165.0) * t).astype(jnp.int32),
                ((py.astype(jnp.float32) + 1292.0) * t).astype(jnp.int32))
    noise = (n0 + n1 - 1.0) / 255.0
    return color + noise


def _hash32_planar(qx: jnp.ndarray, qy: jnp.ndarray):
    """hash32 with the 3 output channels as separate planes (lane-friendly)."""
    x = qx.astype(jnp.uint32)
    y = qy.astype(jnp.uint32)
    h = (x * _UI0) ^ (y * _UI1) ^ (x * _UI2)
    return ((h * _UI0).astype(jnp.float32) * _UIF,
            (h * _UI1).astype(jnp.float32) * _UIF,
            (h * _UI2).astype(jnp.float32) * _UIF)


def dither_noise_planar(px: jnp.ndarray, py: jnp.ndarray,
                        time: jnp.ndarray) -> jnp.ndarray:
    """dither_rgb8's noise term as (3, H, W) planes (same values)."""
    t = time.astype(jnp.float32)
    n0 = _hash32_planar((px.astype(jnp.float32) * t).astype(jnp.int32),
                        (py.astype(jnp.float32) * t).astype(jnp.int32))
    n1 = _hash32_planar(((px.astype(jnp.float32) + 165.0) * t).astype(jnp.int32),
                        ((py.astype(jnp.float32) + 1292.0) * t).astype(jnp.int32))
    return jnp.stack([(a + b - 1.0) / 255.0 for a, b in zip(n0, n1)])
