import jax.numpy as jnp
import numpy as np

from plainrenderer_tpu.ops import bloom, taa
from plainrenderer_tpu.ops.color_packing import pack_r11g11b10, unpack_r11g11b10


def test_r11g11b10_roundtrip(rng):
    rgb = jnp.asarray(rng.random((3, 16, 128), dtype=np.float32) * 100.0)
    back = unpack_r11g11b10(pack_r11g11b10(rgb))
    # 5-bit blue mantissa -> up to ~1.6% relative error with rounding
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), rtol=0.02,
                               atol=1e-4)


def test_r11g11b10_clamps_negatives_and_nan():
    bad = jnp.asarray([[-1.0], [jnp.nan], [jnp.inf]])[:, :, None]
    out = np.asarray(unpack_r11g11b10(pack_r11g11b10(bad)))
    assert np.isfinite(out).all()
    assert (out >= 0).all()


def test_resolve_weights_normalized():
    w = np.asarray(taa.resolve_weights(jnp.asarray([0.3, -0.7])))
    assert w.shape == (3, 3)
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-6)
    assert (w > 0).all()


def test_taa_converges_static_camera():
    """With zero motion and a static noisy input, TAA output must move
    towards the temporal mean and reduce variance (jitter convergence)."""
    rng = np.random.default_rng(3)
    h, w = 32, 256
    base = np.ones((3, h, w), np.float32) * 0.5
    history = jnp.zeros((h, w), jnp.int32)
    motion = jnp.zeros((2, h, w), jnp.float32)
    depth = jnp.full((h, w), 0.5, jnp.float32)

    outputs = []
    for i in range(12):
        noisy = jnp.asarray(
            base + rng.normal(0, 0.08, size=base.shape).astype(np.float32))
        out, history = taa.temporal_filter(
            noisy, history, motion, depth, jnp.zeros(2),
            jnp.asarray(i == 0), w, h, interpret=True)
        outputs.append(np.asarray(out))
    # later frames should be much less noisy than the input
    late_std = outputs[-1].std()
    assert late_std < 0.05
    np.testing.assert_allclose(outputs[-1].mean(), 0.5, atol=0.03)


def test_taa_camera_cut_resets():
    h, w = 16, 128
    history = pack_r11g11b10(jnp.ones((3, h, w)) * 9.0)
    color = jnp.ones((3, h, w)) * 0.1
    out, _ = taa.temporal_filter(
        color, history, jnp.zeros((2, h, w)), jnp.full((h, w), 0.5),
        jnp.zeros(2), jnp.asarray(True), w, h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), 0.1, atol=0.02)


def test_bloom_constant_image_exact_energy():
    """The reference chain is additive: on a constant image c each of the
    (mip_count-1) upsample passes contributes exactly c, so
    out = c * (1 + (mip_count - 2) * strength). Borders are clamp-sampled so
    a constant stays constant through every tap."""
    c, s, mips = 0.5, 0.02, 4
    img = jnp.full((3, 64, 256), c, jnp.float32)
    out = np.asarray(bloom.compute_bloom(img, strength=s, blur_radius=1.5,
                                         mip_count=mips))
    expected = c * (1.0 + (mips - 2) * s)
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_bloom_energy_matches_reference_inflation():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((3, 64, 256)).astype(np.float32))
    s, mips = 0.02, 4
    out = np.asarray(bloom.compute_bloom(img, strength=s, blur_radius=1.5,
                                         mip_count=mips))
    assert out.shape == img.shape
    # additive chain: mean inflated by ~(mips-2)*s (border effects aside)
    expected = np.asarray(img).mean() * (1.0 + (mips - 2) * s)
    np.testing.assert_allclose(out.mean(), expected, rtol=0.02)


def test_bloom_spreads_bright_spot():
    img = np.zeros((3, 64, 256), np.float32)
    img[:, 32, 128] = 100.0
    out = np.asarray(bloom.compute_bloom(jnp.asarray(img), strength=0.5,
                                         blur_radius=1.5, mip_count=5))
    # neighborhood pixels must receive energy
    assert out[:, 30, 120].sum() > 0.001
    assert out[:, 32, 128].sum() < img[:, 32, 128].sum()


def test_motion_vector_static_camera_zero():
    h, w = 16, 128
    xs = (jnp.arange(w) + 0.5) / w * 2 - 1
    ys = (jnp.arange(h) + 0.5) / h * 2 - 1
    prev_ndc = jnp.stack([
        jnp.broadcast_to(xs[None, :], (h, w)),
        jnp.broadcast_to(ys[:, None], (h, w))])
    motion = taa.compute_motion(prev_ndc, jnp.ones((h, w), bool),
                                jnp.zeros(2), jnp.zeros(2), w, h)
    np.testing.assert_allclose(np.asarray(motion), 0.0, atol=1e-6)
