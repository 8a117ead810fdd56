"""PlainRuntime-equivalent application: scene load + frame loop.

Parity: Runtime/main.cpp:22-94 + App.cpp. CLI args match the reference's
`width height scenePath`; with no display available the frame loop renders a
scripted (or programmatic) camera path and streams frames to disk (PNG
sequence) — the TPU analog of presenting to a swapchain. Embedders can drive
`App.run_frame` interactively with their own InputState per frame.

Usage:
  python -m plainrenderer_tpu.runtime.app 1280 720 scene.plain \
      [--frames 120] [--out frames/] [--no-gi] [--cpu]
  (scenePath 'atrium' renders the built-in procedural scene.)
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from pathlib import Path

import numpy as np

from ..config import RenderSettings, SDFTraceSettings
from ..render import frame as frame_mod
from ..render import scenebuild
from ..render.state import initial_state
from .shell import CameraController, FrameIndex, InputState, Timer


class App:
    """App.cpp — owns the scene and camera; one render_frame per update."""

    def __init__(self, settings: RenderSettings, scene_path: str,
                 with_gi: bool = True, interpret: bool = False,
                 sdf_resolution_cap: int | None = None):
        import jax.numpy as jnp

        self.settings = settings
        self.interpret = interpret
        # auto-raise pair budgets when a frame reports dropped pairs
        # (see _maybe_escalate_budgets)
        self.auto_budget_escalation = True
        self.timer = Timer()
        self.frame_index = FrameIndex()
        self.camera = CameraController()

        if scene_path == "atrium":
            from ..assets import procedural

            scene_data = procedural.build_atrium_scene()
        else:
            from ..assets.plain_format import load_binary_scene

            scene_data = load_binary_scene(scene_path)
        rs = scenebuild.build_render_scene(scene_data)
        print(f"scene: {rs.triangle_count} triangles, "
              f"{rs.object_count} objects", file=sys.stderr)
        self.scene = frame_mod.scene_to_device(rs)

        if with_gi and settings.sdf_trace.enabled:
            from ..ops import sdf_scene

            # prefer baked DDS volumes referenced by the scene; fall back to
            # baking (the reference hard-requires the DDS files, App.cpp)
            gsdf = self._load_or_bake_sdf(rs, scene_data, sdf_resolution_cap)
            self.scene = frame_mod.attach_global_sdf(self.scene, gsdf)

        self.luts = frame_mod.bake_static_luts(settings)
        self.state = initial_state(settings.width, settings.height,
                                   gi_half_res=settings.sdf_trace
                                   .half_resolution)
        self._dt = jnp

    def _load_or_bake_sdf(self, rs, scene_data, resolution_cap):
        from ..assets import dds
        from ..assets.plain_format import Scene
        from ..ops import sdf_scene
        from ..render.scenebuild import _mesh_arrays

        volumes, bb_mins, bb_maxs, mats, albedos = [], [], [], [], []
        any_loaded = False
        for obj in scene_data.objects:
            mesh = scene_data.meshes[obj.mesh_index]
            paths = getattr(mesh, "texture_paths", None)
            sdf_path = paths.sdf if paths else ""
            arrays = _mesh_arrays(mesh)
            bb_min = arrays["positions"].min(0)
            bb_max = arrays["positions"].max(0)
            vol = None
            if sdf_path and Path(sdf_path).exists():
                vol = dds.read_sdf_volume(sdf_path)
                any_loaded = True
            elif sdf_path:
                from ..assets.sdf_bake import bake_mesh_sdf, \
                    sdf_resolution_for_aabb

                res = sdf_resolution_for_aabb(bb_min, bb_max)
                if resolution_cap:
                    res = tuple(min(r, resolution_cap) for r in res)
                vol = bake_mesh_sdf(arrays["positions"], arrays["indices"],
                                    bb_min, bb_max, resolution=res)
            volumes.append(vol)
            bb_mins.append(bb_min)
            bb_maxs.append(bb_max)
            mats.append(np.asarray(obj.model_matrix, np.float32))
            albedos.append(np.asarray(mesh.mean_albedo, np.float32))
        if any_loaded:
            print("loaded baked SDF volumes from DDS", file=sys.stderr)
        return sdf_scene.composite_global_sdf(
            volumes, np.stack(bb_mins), np.stack(bb_maxs), np.stack(mats),
            np.stack(albedos))

    def set_settings(self, settings: RenderSettings):
        """Swap render settings at runtime (the ImGui panel analog). The
        first frame at a new settings hash pays an XLA compile unless it was
        precompiled (precompile_variants) or sits in the persistent cache —
        the staleness-flag analog of RenderFrontend.cpp:233-264."""
        old = self.settings
        if ((settings.width, settings.height,
             settings.sdf_trace.half_resolution)
                != (old.width, old.height,
                    old.sdf_trace.half_resolution)):
            # resolution OR GI-resolution change re-sizes the state
            # buffers (the gi_history plane is sized by the half-res
            # toggle — full-res GI crashed at the pad until round 5)
            self.state = initial_state(
                settings.width, settings.height,
                gi_half_res=settings.sdf_trace.half_resolution)
        self.settings = settings

    def default_toggle_variants(self) -> list:
        """The settings variants a user plausibly toggles at runtime."""
        import dataclasses

        s = self.settings
        return [
            dataclasses.replace(s, sdf_trace=dataclasses.replace(
                s.sdf_trace, enabled=not s.sdf_trace.enabled)),
            dataclasses.replace(s, volumetrics=dataclasses.replace(
                s.volumetrics, enabled=not s.volumetrics.enabled)),
            dataclasses.replace(s, taa=dataclasses.replace(
                s.taa, enabled=not s.taa.enabled)),
            dataclasses.replace(s, draw_bounding_boxes=True),
        ]

    def precompile_variants(self, variants=None):
        """AOT-compile render_frame for alternate settings so runtime
        toggles swap WITHOUT a compile stall (compilations also land in the
        persistent cache). Lowering uses abstract values, so the donated
        state buffers are not consumed."""
        import jax.numpy as jnp

        ext = self.camera.update(InputState(), 0.0)
        cam = frame_mod.camera_arrays(ext.position, ext.forward, ext.right,
                                      ext.up)
        for s in (variants or self.default_toggle_variants()):
            frame_mod.render_frame.lower(
                self.state, self.scene, cam, self.luts,
                jnp.asarray(1 / 60, jnp.float32), s,
                interpret=self.interpret).compile()
            print(f"precompiled settings variant (hash {hash(s) & 0xffff})",
                  file=sys.stderr)

    def run_frame(self, inputs: InputState | None = None):
        """One main-loop iteration (main.cpp:79-90). Returns the u8 frame."""
        import jax.numpy as jnp

        self.timer.mark_new_frame()
        self.frame_index.mark_new_frame()
        ext = self.camera.update(inputs or InputState(),
                                 self.timer.delta_time)
        cam = frame_mod.camera_arrays(ext.position, ext.forward, ext.right,
                                      ext.up)
        image, self.state = frame_mod.render_frame(
            self.state, self.scene, cam, self.luts,
            jnp.asarray(self.timer.delta_time, jnp.float32),
            self.settings, interpret=self.interpret)
        if self.auto_budget_escalation:
            self._maybe_escalate_budgets()
        return image

    def _maybe_escalate_budgets(self):
        """Pair-budget auto-escalation: a nonzero overflow counter means
        the frame DROPPED pairs (missing geometry / shadow casters) —
        double pair_budget_scale so the next frame renders complete, and
        warn. The bump is a static-settings change, so the next frame
        recompiles (cheap relative to silently wrong images; mirrors the
        reference's assert-on-overflow habits, e.g. the drawcall-count
        asserts in RenderBackend.cpp). The check costs one scalar
        device->host fetch; disable via auto_budget_escalation=False for
        pure-throughput drivers that inspect counters themselves."""
        ovf = np.asarray(self.state.debug_counters)
        if ovf.any():
            old = self.settings.pair_budget_scale
            self.settings = dataclasses.replace(
                self.settings, pair_budget_scale=old * 2.0)
            print(f"WARNING: raster pair overflow (main={int(ovf[0])}, "
                  f"shadow={int(ovf[1])}) — pair_budget_scale auto-raised "
                  f"{old:g} -> {old * 2.0:g}; this frame may be missing "
                  "geometry, the next recompiles with headroom",
                  file=sys.stderr)
            return True
        return False


_last_overflow_warn = [0.0]


def _warn_overflow(state, where=sys.stderr):
    """Escalate dropped raster pairs beyond the overlay (ADVICE r3): a
    nonzero debug counter means geometry or shadow casters were silently
    dropped this frame — print an actionable warning (rate-limited)."""
    import time as _time

    ovf = np.asarray(state.debug_counters)
    if ovf.any() and _time.perf_counter() - _last_overflow_warn[0] > 1.0:
        _last_overflow_warn[0] = _time.perf_counter()
        print(f"WARNING: raster pair overflow (main={int(ovf[0])}, "
              f"shadow={int(ovf[1])}) — geometry/shadows may be missing; "
              "raise RenderSettings.pair_budget_scale", file=where)
        return True
    return bool(ovf.any())


def _memory_stats_mb() -> float:
    """Total MB of live device buffers (the allocator-stats analog of the
    reference's memory panel, RenderFrontend.cpp:1990-2011)."""
    import jax

    try:
        return sum(np.prod(b.shape) * b.dtype.itemsize
                   for b in jax.live_arrays()) / 1e6
    except Exception:
        return 0.0


def interactive_loop(app: "App", out_dir: Path, overlay: bool,
                     overlay_scale: int, max_frames: int = 0,
                     command_stream=None):
    """Drive the app from stdin — the InputManager/ImGui-panel analog
    (Runtime/InputManager.cpp; settings panel RenderFrontend.cpp:1829-2011).

    A reader thread turns stdin lines into input/settings events consumed
    by the frame loop; frames stream to <out>/latest.png atomically (point
    any auto-reloading viewer at it). Commands:
      w/a/s/d [m]   move (forward/left/back/right, default 1 m)
      look DX DY    mouse-look degrees
      gi|taa|vol|aabb|cascades   toggle settings (precompiled variants
                    swap without a compile stall; others hit the cache)
      q             quit

    command_stream: any line iterable (tests inject a scripted list);
    defaults to sys.stdin.
    """
    import dataclasses
    import queue
    import threading
    import time as _time

    from ..assets.image_io import save_image
    from .overlay import burn_stats

    cmds: "queue.Queue[str]" = queue.Queue()
    source = command_stream if command_stream is not None else sys.stdin

    def reader():
        for line in source:
            cmds.put(line.strip())

    reader_thread = threading.Thread(target=reader, daemon=True)
    reader_thread.start()
    if command_stream is not None:
        # scripted streams finish instantly; joining makes the first frame
        # see every command deterministically (test determinism)
        reader_thread.join()
    print("interactive: w/a/s/d [m], look DX DY, gi/taa/vol/aabb/cascades, q",
          file=sys.stderr)

    running = True
    frame_no = 0
    while running and (max_frames <= 0 or frame_no < max_frames):
        inputs = InputState(right_mouse_down=True)
        move = np.zeros(3, np.float32)
        while True:
            try:
                line = cmds.get_nowait()
            except queue.Empty:
                break
            parts = line.split()
            if not parts:
                continue
            op = parts[0].lower()
            arg = float(parts[1]) if len(parts) > 1 else 1.0
            s = app.settings
            if op == "q":
                running = False
            elif op in ("w", "a", "s", "d"):
                fwd = app.camera.forward_vector()
                right = app.camera.right_vector()
                move += {"w": fwd, "s": -fwd, "d": right,
                         "a": -right}[op] * arg
            elif op == "look" and len(parts) >= 3:
                inputs.mouse_movement = (float(parts[1]), float(parts[2]))
            elif op == "gi":
                app.set_settings(dataclasses.replace(
                    s, sdf_trace=dataclasses.replace(
                        s.sdf_trace, enabled=not s.sdf_trace.enabled)))
            elif op == "taa":
                app.set_settings(dataclasses.replace(
                    s, taa=dataclasses.replace(
                        s.taa, enabled=not s.taa.enabled)))
            elif op == "vol":
                app.set_settings(dataclasses.replace(
                    s, volumetrics=dataclasses.replace(
                        s.volumetrics, enabled=not s.volumetrics.enabled)))
            elif op == "aabb":
                app.set_settings(dataclasses.replace(
                    s, draw_bounding_boxes=not s.draw_bounding_boxes))
            elif op == "cascades":
                app.set_settings(dataclasses.replace(
                    s, shadows=dataclasses.replace(
                        s.shadows, debug_cascade_colors=not
                        s.shadows.debug_cascade_colors)))
        app.camera.position = app.camera.position + move
        t0 = _time.perf_counter()
        image = app.run_frame(inputs)
        image.block_until_ready()
        frame_ms = (_time.perf_counter() - t0) * 1e3
        frame = np.asarray(image)
        stats = [f"{1e3 / max(frame_ms, 1e-3):6.1f} FPS  {frame_ms:7.2f} MS",
                 f"GI:{'ON' if app.settings.sdf_trace.enabled else 'OFF'}"
                 f" TAA:{'ON' if app.settings.taa.enabled else 'OFF'}"
                 f" VOL:{'ON' if app.settings.volumetrics.enabled else 'OFF'}"]
        if _warn_overflow(app.state):
            ovf = np.asarray(app.state.debug_counters)
            stats.append(f"OVERFLOW MAIN {int(ovf[0])} SHADOW {int(ovf[1])}")
        if overlay:
            frame = burn_stats(frame, stats, scale=overlay_scale)
        tmp = out_dir / ".latest.tmp.png"
        save_image(tmp, frame)
        tmp.replace(out_dir / "latest.png")  # atomic present
        print(" | ".join(stats), file=sys.stderr)
        frame_no += 1


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("width", type=int, nargs="?", default=1280)
    ap.add_argument("height", type=int, nargs="?", default=720)
    ap.add_argument("scene", nargs="?", default="atrium")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--out", default="frames")
    ap.add_argument("--no-gi", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--orbit-speed", type=float, default=20.0)
    ap.add_argument("--live", action="store_true",
                    help="also write <out>/latest.png atomically each frame "
                         "(poll it with any image viewer/browser for a live "
                         "view — the swapchain-present analog)")
    ap.add_argument("--no-overlay", action="store_true",
                    help="disable the on-image stats burn-in")
    ap.add_argument("--overlay-scale", type=int, default=2)
    ap.add_argument("--precompile-toggles", action="store_true",
                    help="AOT-compile common settings toggles up front so "
                         "runtime changes don't stall on XLA compiles")
    ap.add_argument("--cam", type=float, nargs=3,
                    default=[-9.0, -1.8, 0.0],
                    help="camera position x y z (y-down world)")
    ap.add_argument("--yaw", type=float, default=10.0)
    ap.add_argument("--pitch", type=float, default=8.0)
    ap.add_argument("--interactive", action="store_true",
                    help="drive the camera + settings from stdin commands "
                         "(w/a/s/d, look DX DY, gi/taa/vol/aabb/cascades, "
                         "q) while streaming <out>/latest.png — the "
                         "InputManager + ImGui-panel analog")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    settings = RenderSettings(
        width=args.width, height=args.height,
        sdf_trace=SDFTraceSettings(enabled=not args.no_gi))
    app = App(settings, args.scene, with_gi=not args.no_gi,
              interpret=args.cpu, sdf_resolution_cap=32)
    app.camera.position = np.asarray(args.cam, np.float32)
    app.camera.yaw = args.yaw
    app.camera.pitch = args.pitch

    if args.precompile_toggles:
        app.precompile_variants()

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    if args.interactive:
        interactive_loop(app, out_dir, not args.no_overlay,
                         args.overlay_scale, max_frames=args.frames)
        return
    from ..assets.image_io import save_image
    from .overlay import burn_stats

    inputs = InputState(right_mouse_down=True)
    import time as _time

    last_print = 0.0
    fps_smooth = None
    for i in range(args.frames):
        inputs.mouse_movement = (args.orbit_speed * app.timer.delta_time, 0.0)
        t0 = _time.perf_counter()
        image = app.run_frame(inputs)
        image.block_until_ready()
        frame_ms = (_time.perf_counter() - t0) * 1e3
        fps = 1e3 / max(frame_ms, 1e-3)
        fps_smooth = fps if fps_smooth is None else \
            fps_smooth + (fps - fps_smooth) * 0.2
        frame = np.asarray(image)
        stats = [
            f"{fps_smooth:6.1f} FPS  {frame_ms:7.2f} MS",
            f"{app.settings.width}X{app.settings.height}"
            f"  GI:{'ON' if app.settings.sdf_trace.enabled else 'OFF'}",
            f"MEM {_memory_stats_mb():7.1f} MB  EXP"
            f" {float(app.state.exposure):.5f}",
        ]
        if _warn_overflow(app.state):  # dropped pairs = missing geometry
            ovf = np.asarray(app.state.debug_counters)
            stats.append(f"OVERFLOW MAIN {int(ovf[0])} SHADOW {int(ovf[1])}")
        if not args.no_overlay:
            frame = burn_stats(frame, stats, scale=args.overlay_scale)
        save_image(out_dir / f"frame_{i:04d}.png", frame)
        if args.live:
            tmp = out_dir / ".latest.tmp.png"
            save_image(tmp, frame)
            tmp.replace(out_dir / "latest.png")  # atomic present
        now = _time.perf_counter()
        if now - last_print > 0.2:  # the reference's 0.2 s stats cadence
            print(" | ".join(stats), file=sys.stderr)
            last_print = now
    print(f"wrote {args.frames} frames to {out_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
