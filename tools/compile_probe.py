#!/usr/bin/env python
"""Probe WHY geometry_setup/build_pairs compile slowly: scale triangle
count and toggle XLA flags, timing fresh compiles (no persistent cache)."""

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=292672)
    ap.add_argument("--what", default="geom")
    ap.add_argument("--alpha", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from plainrenderer_tpu.ops import raster

    T = args.t
    sres = 2048
    sub = 8
    rng = np.random.default_rng(0)
    corners = jnp.asarray(rng.normal(size=(T, 3, 3)), jnp.float32)
    uvs = jnp.zeros((T, 3, 2), jnp.float32)
    nrm = jnp.zeros((T, 3, 3), jnp.float32)
    slots = jnp.zeros((T,), jnp.int32) if args.alpha else None
    m = jnp.eye(4, dtype=jnp.float32)

    if args.what == "geom":
        def f(m, corners, uvs, nrm):
            return raster.geometry_setup(
                corners, uvs, nrm, nrm, nrm,
                jnp.zeros((T,), jnp.float32), jnp.ones((T,), bool),
                m, m, sres, sres, cull="none", with_attrs=False,
                tri_alpha_slot=slots, bin_rows=sub)
        t0 = time.time()
        jax.jit(f).lower(m, corners, uvs, nrm).compile()
        print(f"geom T={T} alpha={args.alpha}: {time.time()-t0:.1f}s",
              flush=True)
    elif args.what == "geom_attrs":
        def f(m, corners, uvs, nrm):
            return raster.geometry_setup(
                corners, uvs, nrm, nrm, nrm,
                jnp.zeros((T,), jnp.float32), jnp.ones((T,), bool),
                m, m, 1920, 1088, cull="back", with_attrs=True,
                near_w=0.1, tri_alpha_slot=slots, bin_rows=2)
        t0 = time.time()
        jax.jit(f).lower(m, corners, uvs, nrm).compile()
        print(f"geom_attrs T={T} alpha={args.alpha}: {time.time()-t0:.1f}s",
              flush=True)
    elif args.what == "pairs":
        s_nty, s_ntx = sres // (raster.TILE_H * sub), sres // raster.TILE_W
        setup = raster.TriangleSetup(
            edges=jnp.zeros((3, 8 if args.alpha else 4, T), jnp.float32),
            attrs=jnp.zeros((raster.NATTR, 0), jnp.float32),
            tile_bbox=jnp.zeros((T, 4), jnp.int32),
            valid=jnp.ones((T,), bool),
            fine_y=jnp.zeros((T, 2), jnp.int32))

        def f(st):
            return raster.build_pairs(st, s_nty, s_ntx, tile_cap=1 << 15,
                                      bin_rows=sub)
        t0 = time.time()
        jax.jit(f).lower(setup).compile()
        print(f"pairs T={T}: {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
