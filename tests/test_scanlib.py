"""exact_cumsum parity vs numpy (mod 2^32), including negatives."""

import numpy as np
import jax

from plainrenderer_tpu.ops.scanlib import exact_cumsum


def test_exact_cumsum_matches_numpy():
    rng = np.random.default_rng(7)
    for n in (1, 200, 257, 4096, 130000):
        for lo, hi in ((0, 65536), (-3, 4), (-(2 ** 20), 2 ** 20)):
            x = rng.integers(lo, hi, n).astype(np.int32)
            got = np.asarray(jax.jit(exact_cumsum)(x))
            want = np.cumsum(x.astype(np.int64)).astype(np.int32)  # mod 2^32
            assert np.array_equal(got, want), (n, lo, hi)


def test_exact_cumsum_vmapped():
    rng = np.random.default_rng(8)
    x = rng.integers(-5, 6, (3, 20000)).astype(np.int32)
    got = np.asarray(jax.jit(jax.vmap(exact_cumsum))(x))
    want = np.cumsum(x.astype(np.int64), axis=1).astype(np.int32)
    assert np.array_equal(got, want)
