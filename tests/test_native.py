import numpy as np
import pytest

from plainrenderer_tpu import native
from plainrenderer_tpu.assets import procedural
from plainrenderer_tpu.assets.sdf_bake import bake_mesh_sdf


def _have_native():
    return native.load("sdf_bake") is not None


pytestmark = pytest.mark.skipif(not _have_native(),
                                reason="no C++ toolchain available")


def test_native_bake_matches_numpy_exactly():
    """The C++ baker computes the same exact distances + winding signs as
    the numpy reference (grid pruning and the hierarchical winding
    approximation change evaluation ORDER, not results, within the clamp
    radius)."""
    mesh = procedural.box_mesh(2.0, 1.0, 3.0)
    nat = bake_mesh_sdf(mesh.positions, mesh.indices,
                        resolution=(32, 32, 32), use_native=True)
    ref = bake_mesh_sdf(mesh.positions, mesh.indices,
                        resolution=(32, 32, 32), use_native=False)
    inside_clamp = np.abs(ref) < 2.0
    assert np.abs(nat - ref)[inside_clamp].max() < 1e-3
    assert ((nat < 0) != (ref < 0)).mean() < 1e-3
    assert np.isfinite(nat).all()


def test_native_bake_dense_mesh_full_resolution():
    """Sponza-class density at the FULL 64-voxel cap — the case the dense
    numpy evaluation cannot reach (SceneSDF.cpp bakes these offline)."""
    mesh = procedural.box_mesh(2.0, 3.0, 2.0, subdiv=32)
    n_tris = np.asarray(mesh.indices).reshape(-1, 3).shape[0]
    assert n_tris > 10000
    vol = bake_mesh_sdf(mesh.positions, mesh.indices,
                        resolution=(64, 64, 64), use_native=True)
    assert vol.shape == (64, 64, 64)
    assert np.isfinite(vol).all()
    # inside is negative, far outside positive, zero level near the surface
    assert vol.min() < -0.2 and vol.max() > 0.2


def test_native_bake_open_mesh_no_crash():
    """Non-watertight input (a single quad) must produce finite distances
    with an all-outside sign (|winding| < 0.5 everywhere off the surface),
    like the reference's ray-majority vote on open geometry."""
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]],
                       np.float32)
    tris = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    vol = bake_mesh_sdf(verts, tris, resolution=(16, 16, 16),
                        use_native=True)
    assert np.isfinite(vol).all()
    assert (vol >= 0).mean() > 0.95
