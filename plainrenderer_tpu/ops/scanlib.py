"""Exact integer prefix sums as MXU triangular matmuls.

XLA's TPU lowering of `jnp.cumsum` over frame-scale 1D arrays is a compile
bomb: 4.5 s of XLA compile at 292k elements and 27 s at 878k (measured,
round 3) — and build_pairs runs four such scans per frame (the pair-stream
prefix sums), plus one per culling view in frustum.expand_object_mask.
The same scan expressed as two levels of (R, 128) @ (128, 128) upper-
triangular matmuls compiles in well under a second and runs in microseconds
on the MXU.

Exactness: the operand is split into four 8-bit limbs. 8-bit integers are
exactly representable in bfloat16, every lane product is a limb x {0, 1},
and every 128-term partial sum stays below 2^24 — so even the MXU's
default single-pass bf16 mode is bit-exact. Limb prefix sums are
recombined with wrapping i32 shifts, which reproduces integer cumsum
semantics modulo 2^32 for ANY i32 input (negatives included: the unsigned
reinterpretation of x is exactly limb0 + limb1*2^8 + limb2*2^16 +
limb3*2^24).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exact_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum of a 1D i32 array, exact modulo 2^32.

    Drop-in for jnp.cumsum(x) with x.ndim == 1 and integer dtype; see
    module docstring for why and the exactness argument. Recurses on the
    row totals (depth log_128(n): twice for n <= 2M).
    """
    n = x.shape[0]
    x = x.astype(jnp.int32)
    if n <= 256:
        return jnp.cumsum(x)
    r = (n + 127) // 128
    x2 = jnp.pad(x, (0, r * 128 - n)).reshape(r, 128)
    # (4, r, 128) limbs stacked into ONE (4r, 128) matmul
    limbs = jnp.stack([(x2 >> s) & 255 for s in (0, 8, 16, 24)])
    tri = jnp.triu(jnp.ones((128, 128), jnp.float32))  # [l', l] = 1, l' <= l
    lane_f = jax.lax.dot_general(
        limbs.reshape(4 * r, 128).astype(jnp.float32), tri,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    lane = lane_f.astype(jnp.int32).reshape(4, r, 128)
    cum = (lane[0] + (lane[1] << 8)) + ((lane[2] << 16) + (lane[3] << 24))
    tot = cum[:, 127]
    base = exact_cumsum(tot) - tot
    return (cum + base[:, None]).reshape(r * 128)[:n]
