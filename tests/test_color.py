import jax.numpy as jnp
import numpy as np

from plainrenderer_tpu.utils import color


def test_srgb_roundtrip():
    c = jnp.linspace(0.0, 1.0, 256)
    out = color.srgb_to_linear(color.linear_to_srgb(c))
    np.testing.assert_allclose(np.asarray(out), np.asarray(c), atol=2e-5)


def test_srgb_known_values():
    # 0.5 linear -> ~0.7354 sRGB (standard reference value)
    np.testing.assert_allclose(
        float(color.linear_to_srgb(jnp.asarray(0.5))), 0.735357, atol=1e-5
    )
    # below-threshold linear segment
    np.testing.assert_allclose(
        float(color.linear_to_srgb(jnp.asarray(0.001))), 0.01292, atol=1e-6
    )


def test_ycocg_roundtrip(rng):
    rgb = jnp.asarray(rng.random((64, 3), dtype=np.float32))
    back = color.ycocg_to_linear(color.linear_to_ycocg(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-6)


def test_ycocg_white_maps_to_pure_luma():
    y = color.linear_to_ycocg(jnp.asarray([1.0, 1.0, 1.0]))
    np.testing.assert_allclose(np.asarray(y), [1.0, 0.0, 0.0], atol=1e-7)


def test_luminance_weights():
    assert abs(float(color.luminance(jnp.asarray([1.0, 1.0, 1.0]))) - 1.0) < 1e-6
    assert abs(float(color.luminance(jnp.asarray([0.0, 1.0, 0.0]))) - 0.72) < 1e-6


def test_wang_hash_reference_values():
    # golden values computed from the reference algorithm (noise.inc:39-47)
    def ref(seed):
        seed = np.uint32(seed)
        seed = np.uint32((seed ^ np.uint32(61)) ^ (seed >> np.uint32(16)))
        seed = np.uint32(seed * np.uint32(9))
        seed = np.uint32(seed ^ (seed >> np.uint32(4)))
        seed = np.uint32(seed * np.uint32(0x27D4EB2D))
        seed = np.uint32(seed ^ (seed >> np.uint32(15)))
        return seed

    old = np.seterr(over="ignore")
    try:
        seeds = np.arange(16, dtype=np.uint32)
        expected = np.array([ref(s) for s in seeds], dtype=np.uint32)
    finally:
        np.seterr(**old)
    got = np.asarray(color.wang_hash(jnp.asarray(seeds)))
    np.testing.assert_array_equal(got, expected)


def test_hash32_in_unit_range():
    px = jnp.arange(100, dtype=jnp.int32)
    py = jnp.arange(100, dtype=jnp.int32) * 7
    h = np.asarray(color.hash32(px, py))
    assert h.shape == (100, 3)
    assert (h >= 0).all() and (h <= 1).all()
    # not constant
    assert h.std() > 0.1


def test_interleaved_gradient_noise_range():
    uv = jnp.stack(jnp.meshgrid(jnp.arange(32.0), jnp.arange(32.0)), axis=-1)
    n = np.asarray(color.interleaved_gradient_noise(uv))
    assert (n >= 0).all() and (n <= 1).all()
    assert n.std() > 0.2
