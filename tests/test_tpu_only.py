"""Hardware-accuracy checks that only mean anything on a real TPU.

The CI suite runs on CPU (conftest forces the cpu backend), where Pallas
interpret mode uses near-exact library math — e.g. rsqrt is correctly
rounded, so the raster kernels' rsqrt^2+Newton reciprocal is trivially
accurate there. These tests assert the HARDWARE approximations stay within
the tolerances the kernels rely on; they skip on CPU and run with

    PLAIN_TESTS_TPU=1 python -m pytest tests/test_tpu_only.py -q

(ADVICE r4: an on-chip rsqrt precision regression — e.g. a different TPU
generation — would otherwise only show up as visual drift.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


tpu_only = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="hardware-accuracy check; CPU interpret math is near-exact")


@tpu_only
def test_kernel_recip_one_ulp_on_chip():
    """ops.raster._kernel_recip (rsqrt^2 + one Newton step) must stay
    within ~2 ulp of 1/x on the hardware rsqrt across the full positive
    range the raster kernels feed it (1/w and alpha-UV interpolants)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from plainrenderer_tpu.ops.raster import _kernel_recip

    # log-spaced positive f32 covering subnormal-adjacent to huge
    x = np.logspace(-30, 30, 8 * 128 * 61, dtype=np.float64)
    x = x.astype(np.float32).reshape(-1, 8, 128)

    def kern(x_ref, o_ref):
        o_ref[...] = _kernel_recip(x_ref[...])

    def run(blk):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(blk.shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(blk)

    got = np.concatenate([np.asarray(run(jnp.asarray(b))).ravel()
                          for b in x])
    want = 1.0 / x.reshape(-1).astype(np.float64)
    rel = np.abs(got.astype(np.float64) - want) / np.abs(want)
    # 2 ulp of f32 ~ 2.4e-7; allow 4e-7 for the Newton step's rounding
    assert np.nanmax(rel) < 4e-7, float(np.nanmax(rel))


@tpu_only
def test_native_transpose_exact_on_chip():
    """The raster kernels' mat.T (sublane<->lane transpose) must be exact
    for f32 — it replaced an identity matmul whose bf16 decomposition was
    only exact at HIGHEST precision."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    a = rng.normal(size=(48, 128)).astype(np.float32)

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...].T

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((128, 48), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(a))
    assert (np.asarray(out) == a.T).all()
