"""Low-discrepancy sequences and hemisphere importance sampling.

Parity:
  - Plain/src/Common/Utilities/MathUtils.cpp:27-73 (radical inverse base 2/3,
    Hammersley (b2, b3) used for TAA jitter, RenderFrontend.cpp / TAA.cpp)
  - resources/shaders/sampling.inc (GGX + cosine hemisphere importance
    sampling, shader-side hammersley2d = (i/N, radicalInverse_VdC(i)))
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def reverse_bits_32(x: jnp.ndarray) -> jnp.ndarray:
    """MathUtils.cpp:36-44 — bit-reverse a uint32."""
    v = x.astype(jnp.uint32)
    v = (v << 16) | (v >> 16)
    v = ((v & jnp.uint32(0x00FF00FF)) << 8) | ((v & jnp.uint32(0xFF00FF00)) >> 8)
    v = ((v & jnp.uint32(0x0F0F0F0F)) << 4) | ((v & jnp.uint32(0xF0F0F0F0)) >> 4)
    v = ((v & jnp.uint32(0x33333333)) << 2) | ((v & jnp.uint32(0xCCCCCCCC)) >> 2)
    v = ((v & jnp.uint32(0x55555555)) << 1) | ((v & jnp.uint32(0xAAAAAAAA)) >> 1)
    return v


def radical_inverse_base2(i: jnp.ndarray) -> jnp.ndarray:
    """MathUtils.cpp:46-50 / sampling.inc:44-51."""
    return reverse_bits_32(i).astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)


def radical_inverse_base3(i: jnp.ndarray) -> jnp.ndarray:
    """MathUtils.cpp:52-78 — digit-reversal in base 3 (fixed 21 digits >= 2^32)."""
    current = i.astype(jnp.uint32)
    reversed_digits = jnp.zeros_like(current)
    inv_pow = jnp.zeros(jnp.shape(i), jnp.float32)
    scale = jnp.ones(jnp.shape(i), jnp.float32)
    # 3^21 > 2^32, so 21 iterations drain any uint32; extra iterations are
    # no-ops guarded by `current > 0` masks (static trip count for jit).
    for _ in range(21):
        active = current > 0
        nxt = current // 3
        digit = current - nxt * 3
        reversed_digits = jnp.where(active, reversed_digits * 3 + digit, reversed_digits)
        scale = jnp.where(active, scale * (1.0 / 3.0), scale)
        current = nxt
    inv_pow = scale
    return reversed_digits.astype(jnp.float32) * inv_pow


def hammersley_2d(i: jnp.ndarray) -> jnp.ndarray:
    """MathUtils.cpp:31-34 — (radicalInverseBase2(i), radicalInverseBase3(i)).

    This is the CPU-side variant used for the TAA jitter sequence
    (TAA.cpp:168-170 indexes it mod 8).
    """
    return jnp.stack([radical_inverse_base2(i), radical_inverse_base3(i)], axis=-1)


def hammersley_2d_shader(i: jnp.ndarray, n: int) -> jnp.ndarray:
    """sampling.inc:53-55 — (i/N, radicalInverse_VdC(i)); used by brdfLut.comp."""
    return jnp.stack(
        [i.astype(jnp.float32) / jnp.float32(n), radical_inverse_base2(i)], axis=-1
    )


def build_orthonormal_basis(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """sampling.inc:12-15 — tangent/bitangent frame around normal n (..., 3)."""
    up = jnp.where(
        (jnp.abs(n[..., 2:3]) < 0.999),
        jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], n.dtype), n.shape),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], n.dtype), n.shape),
    )
    tangent = jnp.cross(up, n)
    tangent = tangent / jnp.maximum(
        jnp.linalg.norm(tangent, axis=-1, keepdims=True), 1e-20
    )
    bitangent = jnp.cross(n, tangent)
    return tangent, bitangent


def _to_world(sample_hemi: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    tangent, bitangent = build_orthonormal_basis(n)
    return (
        sample_hemi[..., 0:1] * tangent
        + sample_hemi[..., 1:2] * bitangent
        + sample_hemi[..., 2:3] * n
    )


def importance_sample_ggx(xi: jnp.ndarray, roughness: jnp.ndarray,
                          n: jnp.ndarray) -> jnp.ndarray:
    """sampling.inc:4-23 — GGX NDF importance sample around normal n.

    xi is (..., 2) in [0,1); returns a world-space half-vector (..., 3).
    """
    r2 = roughness * roughness
    cos_theta = jnp.sqrt((1.0 - xi[..., 1]) / (1.0 + (r2 * r2 - 1.0) * xi[..., 1]))
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = 2.0 * jnp.pi * xi[..., 0]
    hemi = jnp.stack(
        [jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta], axis=-1
    )
    return _to_world(hemi, n)


def importance_sample_cosine(xi: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """sampling.inc:25-42 — cosine-weighted hemisphere sample around n."""
    phi = 2.0 * jnp.pi * xi[..., 1]
    cos_theta = jnp.sqrt(xi[..., 0])
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - xi[..., 0], 0.0))
    hemi = jnp.stack(
        [jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta], axis=-1
    )
    return _to_world(hemi, n)


def taa_jitter_sequence(length: int = 8) -> np.ndarray:
    """TAA.cpp:168-179 — per-frame subpixel jitter in [-0.5, 0.5)^2.

    Hammersley(b2,b3) shifted by -0.5; the projection matrix gets
    2*jitter/resolution added to the (2,0)/(2,1) entries.
    """
    # pure numpy: this runs at module-import time, and eager jnp ops each
    # pay a device round-trip (tens of seconds over a remote-TPU tunnel)
    idx = np.arange(length, dtype=np.uint64)
    b2 = np.zeros(length)
    b3 = np.zeros(length)
    for k, i in enumerate(idx):
        v, f, r2 = int(i), 0.5, 0.0
        while v:
            r2 += f * (v & 1)
            v >>= 1
            f *= 0.5
        b2[k] = r2
        v, f, r3 = int(i), 1.0 / 3.0, 0.0
        rev = 0
        while v:
            rev = rev * 3 + v % 3
            v //= 3
            f *= 1.0 / 3.0
        # rebuild with the same digit count (matches radical_inverse_base3)
        b3[k] = rev * (f * 3.0) if i else 0.0
    seq = np.stack([b2, b3], axis=-1).astype(np.float32)
    return seq - 0.5
