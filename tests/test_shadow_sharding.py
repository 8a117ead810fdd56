"""Sharded shadow-atlas parity (VERDICT r4 task 1).

The multi-device path rasterizes the cascade atlas in horizontal bands
(one per device) and all_gathers the slices (render/frame.py
_atlas_band_slice + the view_row0 build_pairs decode). These tests run the
band slicing SERIALLY (concrete row0 values, no shard_map) against the
full-atlas raster and assert the reassembled maps match — isolating the
slicing/decode logic from the collective plumbing, which
tests/test_parallel.py covers end-to-end.
"""

import jax.numpy as jnp
import numpy as np

from plainrenderer_tpu.ops import raster
from plainrenderer_tpu.render import frame as frame_mod


def _ortho(scale, tx, ty):
    """Simple orthographic clip matrix (w == 1): x' = x*scale + tx."""
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = scale
    m[1, 1] = scale
    m[2, 2] = 0.25  # z into [0, 1)-ish
    m[2, 3] = 0.5
    m[0, 3] = tx
    m[1, 3] = ty
    m[3, 3] = 1.0
    return jnp.asarray(m)


def _atlas_setup(rng, t_count, n_cas, sres):
    """Random triangle soup -> vertical-atlas TriangleSetup via the real
    shadow_atlas_setup (frame.py), one object covering everything."""
    corners = rng.uniform(-0.9, 0.9, size=(t_count, 3, 3)).astype(np.float32)
    scene = {
        "corner_uvs": jnp.zeros((t_count, 3, 2), jnp.float32),
        "tri_material": jnp.zeros((t_count,), jnp.float32),
        "tri_starts": jnp.zeros((1,), jnp.int32),
    }
    cas_mats = jnp.stack([_ortho(1.0, 0.0, 0.0), _ortho(0.7, 0.1, -0.1),
                          _ortho(0.5, -0.2, 0.2)][:n_cas])
    zeros = jnp.zeros((t_count, 3, 3), jnp.float32)
    bb_min = jnp.asarray([[-1.0, -1.0, -1.0]], jnp.float32)
    bb_max = jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32)
    return frame_mod.shadow_atlas_setup(
        scene, jnp.asarray(corners), zeros, zeros, zeros, bb_min, bb_max,
        cas_mats, n_cas, sres, None, t_count)


def _raster_full(setup, n_cas, s_nty, s_ntx, sub, budget):
    pairs = raster.build_pairs(setup, n_cas * s_nty, s_ntx, n_views=n_cas,
                               tile_cap=1 << 15, bin_rows=sub,
                               order_rows=True, pair_budget=budget,
                               interpret=True)
    edges, _ = raster.gather_pair_setups(setup, pairs, False,
                                         row_extents=True)
    atlas = raster.rasterize_depth(edges, pairs, n_cas * s_nty, s_ntx,
                                   interpret=True, sub=sub, row_skip=True)
    return atlas, pairs.overflow


def _raster_banded(setup, n_cas, s_nty, s_ntx, sub, budget, n_dev):
    nb = n_cas * s_nty
    nb_d = -(-nb // n_dev)
    bands = []
    total_ovf = 0
    for d in range(n_dev):
        row0 = jnp.asarray(d * nb_d, jnp.int32)
        stp = frame_mod._atlas_band_slice(setup, row0, nb_d, sub)
        pairs = raster.build_pairs(stp, nb_d, s_ntx, n_views=n_cas,
                                   tile_cap=1 << 15, bin_rows=sub,
                                   order_rows=True,
                                   pair_budget=budget // max(n_dev // 2, 1),
                                   view_row0=row0, rows_per_view=s_nty,
                                   interpret=True)
        edges, _ = raster.gather_pair_setups(stp, pairs, False,
                                             row_extents=True)
        band = raster.rasterize_depth(edges, pairs, nb_d, s_ntx,
                                      interpret=True, sub=sub,
                                      row_skip=True)
        bands.append(np.asarray(band))
        total_ovf += int(pairs.overflow)
    return np.concatenate(bands, axis=0)[:nb * sub * raster.TILE_H], \
        total_ovf


def test_sharded_atlas_matches_full():
    rng = np.random.default_rng(7)
    n_cas, sres = 3, 256
    sub = frame_mod.shadow_bin_sub(sres)  # 8 (matches shadow_atlas_setup)
    t_count = 256
    s_nty = sres // (raster.TILE_H * sub)  # 2 -> nb = 6 bins
    s_ntx = sres // raster.TILE_W
    setup = _atlas_setup(rng, t_count, n_cas, sres)
    budget = n_cas * t_count * 4 + 8 * n_cas * s_nty * sub * s_ntx

    full, ovf_full = _raster_full(setup, n_cas, s_nty, s_ntx, sub, budget)
    full = np.asarray(full)
    assert ovf_full == 0
    assert (full > 0).mean() > 0.2  # scene actually covers the maps

    # 6 bins: 2 dev (bands cross cascade bounds), 3 (aligned), 8 (padded)
    for n_dev in (2, 3, 8):
        banded, ovf = _raster_banded(setup, n_cas, s_nty, s_ntx, sub,
                                     budget, n_dev)
        assert ovf == 0, (n_dev, ovf)
        # coverage must agree except ulp edge flips from the band c-rebase
        cov_diff = (full > 0) != (banded > 0)
        assert cov_diff.mean() < 1e-3, (n_dev, cov_diff.mean())
        both = (full > 0) & (banded > 0)
        assert np.abs(full - banded)[both].max() < 1e-5, n_dev


def test_sharded_atlas_band_views_cross_cascades():
    """nb_d straddling a cascade boundary: the view_row0 decode must
    recover the correct view for tiles on both sides of the boundary."""
    rng = np.random.default_rng(3)
    n_cas, sres = 2, 512
    sub = frame_mod.shadow_bin_sub(sres)  # 8
    t_count = 128
    s_nty = sres // (raster.TILE_H * sub)  # 4 -> nb = 8 bins
    s_ntx = sres // raster.TILE_W
    setup = _atlas_setup(rng, t_count, n_cas, sres)
    budget = n_cas * t_count * 4 + 8 * n_cas * s_nty * sub * s_ntx

    full, _ = _raster_full(setup, n_cas, s_nty, s_ntx, sub, budget)
    full = np.asarray(full)
    # 8 bins over 3 devices -> nb_d = 3: band 1 = bins [3, 6) crosses the
    # cascade boundary at bin 4
    banded, ovf = _raster_banded(setup, n_cas, s_nty, s_ntx, sub, budget, 3)
    assert ovf == 0
    cov_diff = (full > 0) != (banded > 0)
    assert cov_diff.mean() < 1e-3, cov_diff.mean()
    both = (full > 0) & (banded > 0)
    assert np.abs(full - banded)[both].max() < 1e-5
