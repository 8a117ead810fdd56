#!/usr/bin/env python
"""Compile-time bisection: time XLA/Mosaic compilation of each frame stage
in isolation (VERDICT r2 weak-point 3: 295.6 s cold whole-frame compile).

Runs each stage's jit with a FRESH compilation (cache disabled) and prints
seconds. Stages are sized to the bench scene (scale 4, 1080p, 3x2048
shadow atlas) without building the scene itself — shapes are what matter
for compile time.

Usage: python tools/compile_bisect.py [--stage all|geom|pairs|gather|
       depth8|depth8a|depth2a|gbuf|gbufa|texture|sdfgi|pcf|taa|matlut]
"""

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def t(name, fn, *a):
    import jax
    t0 = time.time()
    out = jax.block_until_ready(jax.jit(fn).lower(*a).compile())
    print(f"{name:28s} compile {time.time() - t0:7.1f}s", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=str, default="all")
    args = ap.parse_args()
    stages = args.stage.split(",")

    import jax
    import jax.numpy as jnp
    import numpy as np

    # NO persistent cache: we want true compile cost
    from plainrenderer_tpu.ops import raster

    T = 292672 * 3  # atlas triangle count at scale 4
    TPV = T // 3
    sres = 2048
    sub = 8
    s_nty, s_ntx = sres // (raster.TILE_H * sub), sres // raster.TILE_W
    n_tiles = 3 * s_nty * s_ntx
    budget = (T + 8 * n_tiles * sub + raster.GROUP - 1) \
        // raster.GROUP * raster.GROUP

    rng = np.random.default_rng(0)

    def want(s):
        if s == "depth8a":
            # NOT in the current frame (alpha shadow casters raster at
            # sub=4); 302 s Mosaic compile measured — explicit only
            if "all" in stages and s not in stages:
                print("# NOTE: stage depth8a (alpha depth at sub=8, the "
                      "historical 302 s compile bomb) is SKIPPED by 'all' "
                      "— run `--stage depth8a` explicitly to re-check it",
                      flush=True)
            return s in stages
        return "all" in stages or s in stages

    if want("geom"):
        corners = jnp.asarray(rng.normal(size=(TPV, 3, 3)), jnp.float32)
        uvs = jnp.zeros((TPV, 3, 2), jnp.float32)
        nrm = jnp.zeros((TPV, 3, 3), jnp.float32)
        mats = jnp.tile(jnp.eye(4, dtype=jnp.float32), (3, 1, 1))
        slots = jnp.zeros((TPV,), jnp.int32)

        def geom(mats, corners, uvs, nrm, slots):
            return jax.vmap(lambda m: raster.geometry_setup(
                corners, uvs, nrm, nrm, nrm,
                jnp.zeros((TPV,), jnp.float32), jnp.ones((TPV,), bool),
                m, m, sres, sres, cull="none", with_attrs=False,
                tri_alpha_slot=slots, bin_rows=sub))(mats)
        t("geometry_setup x3 (atlas)", geom, mats, corners, uvs, nrm, slots)

    setup = raster.TriangleSetup(
        edges=jnp.zeros((3, 8, T), jnp.float32),
        attrs=jnp.zeros((raster.NATTR, 0), jnp.float32),
        tile_bbox=jnp.zeros((T, 4), jnp.int32),
        valid=jnp.ones((T,), bool),
        fine_y=jnp.zeros((T, 2), jnp.int32))

    if want("pairs"):
        def pairs_fn(st):
            return raster.build_pairs(
                st, 3 * s_nty, s_ntx, n_views=3, tile_cap=1 << 15,
                bin_rows=sub)
        t("build_pairs (atlas)", pairs_fn, setup)
        def pairs_fn_r(st):
            return raster.build_pairs(
                st, 3 * s_nty, s_ntx, n_views=3, tile_cap=1 << 15,
                bin_rows=sub, order_rows=True)
        t("build_pairs order_rows", pairs_fn_r, setup)

    pairs = raster.PairLists(
        pair_tri=jnp.zeros((budget + raster.GROUP,), jnp.int32),
        tile_start=jnp.zeros((n_tiles,), jnp.int32),
        tile_count=jnp.zeros((n_tiles,), jnp.int32),
        overflow=jnp.zeros((), jnp.int32))

    if want("gather"):
        def gather_fn(st, pr):
            return raster.gather_pair_setups(st, pr, False)
        t("gather_pair_setups (atlas)", gather_fn, setup, pairs)

    edges16 = jnp.zeros((16, budget + raster.GROUP), jnp.float32)
    edges32 = jnp.zeros((32, budget + raster.GROUP), jnp.float32)
    masks = jnp.zeros((8, 128), jnp.int32)

    if want("depth8"):
        def depth_plain(e, pr):
            return raster.rasterize_depth(e, pr, 3 * s_nty, s_ntx,
                                          sub=sub)
        t("rasterize_depth sub=8", depth_plain, edges16, pairs)

    if want("depth8w16"):
        # the production opaque-atlas variant: row_skip + eval_width=16
        def depth_w16(e, pr):
            return raster.rasterize_depth(e, pr, 3 * s_nty, s_ntx,
                                          sub=sub, row_skip=True,
                                          eval_width=16)
        t("rasterize_depth sub=8 rs ew16", depth_w16, edges16, pairs)

    if want("depth8a"):
        def depth_alpha(e, pr):
            return raster.rasterize_depth(e, pr, 3 * s_nty, s_ntx,
                                          alpha_masks=masks, sub=sub)
        t("rasterize_depth sub=8 alpha", depth_alpha, edges32, pairs)

    if want("depth4a"):
        # the PRODUCTION alpha shadow variant (frame.py a_sub=4 acc pass)
        a_sub = 4
        a_nty = 3 * (sres // (raster.TILE_H * a_sub))
        init = jnp.zeros((a_nty * a_sub * raster.TILE_H, sres), jnp.float32)
        pairs4 = raster.PairLists(
            pair_tri=jnp.zeros((budget + raster.GROUP,), jnp.int32),
            tile_start=jnp.zeros((a_nty * s_ntx,), jnp.int32),
            tile_count=jnp.zeros((a_nty * s_ntx,), jnp.int32),
            overflow=jnp.zeros((), jnp.int32))

        def depth_alpha4(e, pr, ini):
            return raster.rasterize_depth(e, pr, a_nty, s_ntx,
                                          alpha_masks=masks, sub=a_sub,
                                          init_depth=ini)
        t("rasterize_depth sub=4 alpha acc", depth_alpha4, edges32, pairs4,
          init)

    if want("gbuf") or want("gbufa"):
        pw, ph = raster.pad_resolution(1920, 1080)
        m_sub = 2
        nty, ntx = ph // (raster.TILE_H * m_sub), pw // raster.TILE_W
        Tm = 292672
        mbudget = (Tm + 8 * nty * ntx * m_sub + raster.GROUP - 1) \
            // raster.GROUP * raster.GROUP
        mpairs = raster.PairLists(
            pair_tri=jnp.zeros((mbudget + raster.GROUP,), jnp.int32),
            tile_start=jnp.zeros((nty * ntx,), jnp.int32),
            tile_count=jnp.zeros((nty * ntx,), jnp.int32),
            overflow=jnp.zeros((), jnp.int32))
        attrs = jnp.zeros((32, mbudget + raster.GROUP), jnp.float32)
        me16 = jnp.zeros((16, mbudget + raster.GROUP), jnp.float32)
        me32 = jnp.zeros((32, mbudget + raster.GROUP), jnp.float32)
        if want("gbuf"):
            def gbuf_plain(e, at, pr):
                return raster.rasterize_gbuffer(e, at, pr, nty, ntx,
                                                sub=m_sub)
            t("rasterize_gbuffer sub=2", gbuf_plain, me16, attrs, mpairs)
        if want("gbufa"):
            def gbuf_alpha(e, at, pr):
                return raster.rasterize_gbuffer(e, at, pr, nty, ntx,
                                                alpha_masks=masks, sub=m_sub)
            t("rasterize_gbuffer sub=2 alpha", gbuf_alpha, me32, attrs,
              mpairs)

    if want("texture"):
        from plainrenderer_tpu.assets.textures import MAX_MIPS
        from plainrenderer_tpu.ops import texture as texture_ops
        pw, ph = raster.pad_resolution(1920, 1080)
        uv = jnp.zeros((2, ph, pw), jnp.float32)
        duv = jnp.zeros((4, ph, pw), jnp.float32)
        mid = jnp.zeros((ph, pw), jnp.float32)
        val = jnp.ones((ph, pw), bool)
        mat_tex = jnp.zeros((8,), jnp.int32)
        tex_info = jnp.ones((8 * MAX_MIPS, 4), jnp.int32)
        w0 = jnp.zeros((1 << 14, 8, 128), jnp.int32)
        w1 = jnp.zeros((1 << 14, 8, 128), jnp.int32)

        def tex_fn(uv, duv, mid, val, w0, w1):
            return texture_ops.sample_materials(
                uv, duv, mid, val, mat_tex, tex_info, w0, w1,
                n_mips=MAX_MIPS, mip_bias=-1.0, trilinear=True, aniso=False)
        t("texture.sample_materials", tex_fn, uv, duv, mid, val, w0, w1)

    if want("depth2a"):
        # the frame's ACTUAL alpha shadow raster: sub=2 accumulate pass
        # (frame.py a_sub path), not the long-gone sub=8 variant
        a_sub = 2
        a_nty = 3 * (sres // (raster.TILE_H * a_sub))
        init = jnp.zeros((a_nty * a_sub * raster.TILE_H, sres), jnp.float32)

        def depth_alpha_acc(e, pr, init):
            return raster.rasterize_depth(e, pr, a_nty, sres // raster.TILE_W,
                                          alpha_masks=masks, sub=a_sub,
                                          init_depth=init)
        t("rasterize_depth sub=2 a+acc", depth_alpha_acc, edges32, pairs,
          init)

    if want("sdfgi"):
        from plainrenderer_tpu.ops import sdfgi
        gh, gw = 544, 960
        vol = sdfgi.quantize_sdf_volume(
            jnp.ones((160, 160, 160), jnp.float32), 0.25)
        alb = sdfgi.pack_albedo_volume(
            jnp.zeros((160, 160, 160, 3), jnp.float32))
        wpos = jnp.zeros((3, gh, gw), jnp.float32)
        coarse = sdfgi.build_coarse_tables(vol, alb, (160, 160, 160))

        def gi_fn(wpos, vol, alb, coarse):
            return sdfgi.trace_gi(
                wpos, wpos, wpos, jnp.ones((gh, gw), bool),
                jnp.zeros((3, 32, 64), jnp.float32), vol, alb,
                jnp.zeros(3, jnp.float32), 0.25,
                jnp.asarray([160.0, 160.0, 160.0]),
                jnp.asarray([0.0, -1.0, 0.0]), jnp.ones(3, jnp.float32),
                jnp.asarray(1.0, jnp.float32), steps=128, influence=18.75,
                strict=False, dims_zyx=(160, 160, 160),
                coarse_fallback=True, coarse_tables=coarse)
        t("sdfgi.trace_gi", gi_fn, wpos, vol, alb, coarse)

    if want("pcf"):
        from plainrenderer_tpu.ops import shadow
        pw, ph = raster.pad_resolution(1920, 1080)
        wpos = jnp.zeros((3, ph, pw), jnp.float32)
        ld = jnp.ones((ph, pw), jnp.float32)
        smaps = jnp.zeros((shadow.MAX_CASCADES, sres, sres), jnp.float32)
        cmats = jnp.tile(jnp.eye(4, dtype=jnp.float32),
                         (shadow.MAX_CASCADES, 1, 1))
        cscales = jnp.ones((shadow.MAX_CASCADES, 2), jnp.float32)
        splits = jnp.ones((shadow.MAX_CASCADES,), jnp.float32)

        def pcf_fn(wpos, ld, smaps, cmats, cscales, splits):
            return shadow.shadow_resolve(wpos, ld, ld, smaps, cmats,
                                         cscales, splits, 3, taps=12)
        t("shadow.resolve_pcf", pcf_fn, wpos, ld, smaps, cmats, cscales,
          splits)

    if want("taa"):
        from plainrenderer_tpu.ops import taa as taa_ops
        pw, ph = raster.pad_resolution(1920, 1080)
        hist = jnp.zeros((ph, pw), jnp.int32)  # r11g11b10-packed history
        motion = jnp.zeros((2, ph, pw), jnp.float32)

        def taa_fn(hist, motion):
            return taa_ops.history_resample(hist, motion, 1920, 1080)
        t("taa.history_resample", taa_fn, hist, motion)

        gih, giw = 544, 960
        gih_e = gih + 96
        planes = jnp.zeros((3, gih_e, giw), jnp.int32)
        gmotion = jnp.zeros((2, gih_e, giw), jnp.float32)

        def taa_gi_fn(planes, gmotion):
            return taa_ops.resample_packed_planes(planes, gmotion, giw, gih)
        t("taa.resample_packed_planes", taa_gi_fn, planes, gmotion)

    if want("matlut"):
        from plainrenderer_tpu.ops import post
        pw, ph = raster.pad_resolution(1920, 1080)
        table = jnp.zeros((8, 8), jnp.float32)
        mid = jnp.zeros((ph, pw), jnp.float32)
        val = jnp.ones((ph, pw), bool)

        def mat_fn(table, mid, val):
            return post.material_lookup(table, mid, val)
        t("post.material_lookup", mat_fn, table, mid, val)


if __name__ == "__main__":
    main()
