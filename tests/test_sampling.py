import jax.numpy as jnp
import numpy as np

from plainrenderer_tpu.utils import sampling


def test_radical_inverse_base2_known():
    i = jnp.asarray([0, 1, 2, 3, 4, 5], dtype=jnp.uint32)
    got = np.asarray(sampling.radical_inverse_base2(i))
    np.testing.assert_allclose(got, [0.0, 0.5, 0.25, 0.75, 0.125, 0.625], atol=1e-7)


def test_radical_inverse_base3_known():
    # base-3 van der Corput: 0, 1/3, 2/3, 1/9, 4/9, 7/9, 2/9, ...
    i = jnp.asarray([0, 1, 2, 3, 4, 5, 6], dtype=jnp.uint32)
    got = np.asarray(sampling.radical_inverse_base3(i))
    exp = [0.0, 1 / 3, 2 / 3, 1 / 9, 4 / 9, 7 / 9, 2 / 9]
    np.testing.assert_allclose(got, exp, atol=1e-6)


def test_taa_jitter_sequence_bounds():
    seq = sampling.taa_jitter_sequence(8)
    assert seq.shape == (8, 2)
    assert (seq >= -0.5).all() and (seq < 0.5).all()
    # sequence is low-discrepancy: mean near 0
    assert np.abs(seq.mean(axis=0)).max() < 0.15


def test_cosine_sampling_is_normalized_and_hemispherical(rng):
    n = jnp.asarray([0.0, 1.0, 0.0])
    xi = jnp.asarray(rng.random((1000, 2), dtype=np.float32))
    d = np.asarray(sampling.importance_sample_cosine(xi, jnp.broadcast_to(n, (1000, 3))))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert (d @ np.asarray(n) >= -1e-6).all()
    # cosine-weighted: mean cos(theta) == 2/3
    assert abs((d @ np.asarray(n)).mean() - 2 / 3) < 0.02


def test_ggx_sampling_concentrates_with_low_roughness(rng):
    n = jnp.asarray([0.0, 0.0, 1.0])
    xi = jnp.asarray(rng.random((2000, 2), dtype=np.float32))
    h_smooth = np.asarray(
        sampling.importance_sample_ggx(xi, 0.05, jnp.broadcast_to(n, (2000, 3)))
    )
    h_rough = np.asarray(
        sampling.importance_sample_ggx(xi, 0.9, jnp.broadcast_to(n, (2000, 3)))
    )
    assert (h_smooth @ np.asarray(n)).mean() > 0.99
    assert (h_rough @ np.asarray(n)).mean() < 0.9
