#!/usr/bin/env python
"""Per-pass timing from ONE whole-frame jit via the JAX profiler.

The analog of the reference's per-pass timestamp table
(Backend/VulkanTimestampQueries.cpp:45-92, shown on-screen at
RenderFrontend.cpp:1858-1879): instead of re-jitting every pass standalone
(slow — tools/perf_passes.py pays one XLA compile per pass), this traces a
few executions of the ALREADY-COMPILED whole-frame program with
jax.profiler and aggregates device time per `jax.named_scope` — so the
numbers reflect real fusion inside the single frame program.

Usage: python tools/profile_frame.py [--width 1920 --height 1080]
       [--scale 2] [--frames 6] [--no-gi] [--json out.json]
"""

import argparse
import glob
import gzip
import hashlib
import json
import os
import re
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CACHE_DIR = REPO / ".cache"


def build_frame(args):
    """Scene + jitted frame closure, mirroring bench.py setup (cached SDF)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", str(CACHE_DIR / "jax"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from plainrenderer_tpu.assets import procedural
    from plainrenderer_tpu.config import RenderSettings, SDFTraceSettings
    from plainrenderer_tpu.render import frame as frame_mod
    from plainrenderer_tpu.render import scenebuild
    from plainrenderer_tpu.render.state import initial_state
    from plainrenderer_tpu.scene import camera as cam_mod

    s = args.scale
    cfg = procedural.AtriumConfig(
        columns_per_row=6, column_segments=16 * s,
        floor_subdiv=16 * s, box_count=12, box_subdiv=4 * s,
        banner_count=4)  # alpha-tested banners: match bench.py exactly
    scene_data = procedural.build_atrium_scene(cfg)
    rs = scenebuild.build_render_scene(scene_data)
    print(f"# triangles: {rs.triangle_count}", file=sys.stderr)

    settings = RenderSettings(
        width=args.width, height=args.height,
        sdf_trace=SDFTraceSettings(enabled=not args.no_gi))
    scene = frame_mod.scene_to_device(rs)
    if not args.no_gi:
        from plainrenderer_tpu.ops import sdf_scene

        key = hashlib.sha1(
            f"{cfg}".encode() + rs.corners.tobytes()[:1024]).hexdigest()[:16]
        sdf_cache = CACHE_DIR / f"sdf_{key}.npz"
        if sdf_cache.exists():
            data = np.load(sdf_cache)
            gsdf = sdf_scene.GlobalSDF(
                volume=data["volume"], albedo=data["albedo"],
                origin=data["origin"], voxel_size=float(data["voxel_size"]))
        else:
            gsdf = sdf_scene.build_scene_sdf(
                rs, scene_data, use_jax_bake=True, bake_resolution_cap=32)
            np.savez_compressed(
                sdf_cache, volume=gsdf.volume, albedo=gsdf.albedo,
                origin=gsdf.origin, voxel_size=gsdf.voxel_size)
        scene = frame_mod.attach_global_sdf(scene, gsdf)

    luts = frame_mod.bake_static_luts(settings)
    state = initial_state(args.width, args.height)
    ext = cam_mod.extrinsic_from_angles([-9.0, -1.8, 0.0], pitch_deg=8.0,
                                        yaw_deg=10.0)
    cam = frame_mod.camera_arrays(ext.position, ext.forward, ext.right,
                                  ext.up)
    dt = jnp.asarray(1.0 / 60.0)

    def step(st):
        return frame_mod.render_frame(st, scene, cam, luts, dt, settings)

    return step, state


_METADATA_RE = re.compile(
    r"%?([\w.-]+) = .*metadata={[^}]*op_name=\"([^\"]+)\"")


def hlo_scope_map(hlo_text):
    """op base name (e.g. 'fusion.15') -> top-level named_scope.

    XLA propagates jax.named_scope into each op's metadata op_name
    ('jit(render_frame)/jit(main)/<scope...>/<prim>'); the trace events only
    carry the bare op name, so this map restores the attribution."""
    scope_by_op = {}
    for m in _METADATA_RE.finditer(hlo_text):
        op, op_name = m.group(1), m.group(2)
        parts = [p for p in op_name.split("/")
                 if p and not p.startswith("jit(")]
        if not parts:
            continue
        # parts = [scope, scope2, ..., primitive]; keep up to two scope
        # levels so sub-scopes (e.g. raster.build_pairs/bin.sort) break out
        head = parts[0] if len(parts) < 3 else "/".join(parts[:2])
        scope_by_op[op] = head
    return scope_by_op


def scope_of(event_name, scope_by_op):
    base = event_name.split(" ")[0].lstrip("%")
    if base in scope_by_op:
        return scope_by_op[base]
    if "." in base:
        # pallas kernels are named '<scope>.N' after their named_scope
        head = base.rsplit(".", 1)[0]
        if not head[0].isdigit() and not head.startswith(
                ("fusion", "while", "cond", "copy", "slice", "bitcast")):
            return head
    return None


def parse_trace(trace_dir, scope_by_op):
    """Aggregate device-time per top-level scope from the perfetto trace."""
    files = glob.glob(str(Path(trace_dir) / "**" / "*.trace.json.gz"),
                      recursive=True)
    if not files:
        raise SystemExit(f"no trace files under {trace_dir}")
    per_scope = defaultdict(float)
    per_op = defaultdict(float)
    total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        # keep only 'XLA Ops' threads on device processes ('XLA Modules'
        # lines would double-count the whole program)
        op_tids = set()
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "thread_name":
                tname = ev.get("args", {}).get("name", "")
                if "XLA Ops" in tname:
                    op_tids.add((ev["pid"], ev["tid"]))
        for ev in data.get("traceEvents", []):
            if (ev.get("ph") != "X"
                    or (ev.get("pid"), ev.get("tid")) not in op_tids):
                continue
            dur = ev.get("dur", 0) / 1e3  # us -> ms
            name = ev.get("name", "")
            scope = scope_of(name, scope_by_op)
            if scope is None:
                scope = "(unscoped:" + name.split(".")[0][:24] + ")"
            per_scope[scope] += dur
            key = name.split(" ")[0].lstrip("%")
            per_op[key] += dur
            total += dur
    return per_scope, per_op, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--scale", type=int, default=2)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--no-gi", action="store_true")
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--ops", type=int, default=0,
                    help="also print the N most expensive individual ops")
    ap.add_argument("--keep-trace", action="store_true")
    args = ap.parse_args()

    import jax

    step, state = build_frame(args)
    step = jax.jit(step, donate_argnames=("st",))

    # implicit call FIRST: the pjit path writes the persistent compile
    # cache (explicit .compile() was observed not to), so reruns are fast
    t0 = time.time()
    image, state = step(state)
    image.block_until_ready()
    print(f"# compile+first frame: {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    compiled = step.lower(state).compile()
    hlo_text = compiled.as_text()
    scope_by_op = hlo_scope_map(hlo_text)
    (CACHE_DIR / "frame_hlo.txt").write_text(hlo_text)
    print(f"# hlo: {time.time()-t0:.1f}s ({len(scope_by_op)} attributed "
          f"ops) -> .cache/frame_hlo.txt", file=sys.stderr)
    for _ in range(3):
        image, state = step(state)
    image.block_until_ready()

    trace_dir = tempfile.mkdtemp(prefix="plaintrace_")
    t0 = time.time()
    with jax.profiler.trace(trace_dir):
        for _ in range(args.frames):
            image, state = step(state)
        image.block_until_ready()
    wall_ms = (time.time() - t0) / args.frames * 1000.0
    print(f"# wall: {wall_ms:.2f} ms/frame", file=sys.stderr)

    per_scope, per_op, total = parse_trace(trace_dir, scope_by_op)
    n = args.frames
    rows = sorted(per_scope.items(), key=lambda kv: -kv[1])
    print(f"{'pass (named_scope)':44s} {'ms/frame':>9s} {'%':>6s}")
    print("-" * 62)
    for name, ms in rows:
        if ms / n < 0.005:
            continue
        print(f"{name:44s} {ms / n:9.3f} {100 * ms / total:5.1f}%")
    print("-" * 62)
    print(f"{'TOTAL device time':44s} {total / n:9.3f}")
    print(f"{'wall clock':44s} {wall_ms:9.3f}")

    if args.ops:
        print(f"\ntop {args.ops} individual ops:")
        for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[
                :args.ops]:
            sc = scope_by_op.get(name, "?")
            print(f"  {name[:40]:40s} {sc[:32]:32s} {ms / n:9.3f}")

    if args.json:
        Path(args.json).write_text(json.dumps({
            "wall_ms_per_frame": wall_ms,
            "device_ms_per_frame": total / n,
            "passes": {k: v / n for k, v in rows},
        }, indent=1))
    if not args.keep_trace:
        import shutil

        shutil.rmtree(trace_dir, ignore_errors=True)
    else:
        print(f"# trace kept at {trace_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
