#!/usr/bin/env python
"""Render one frame of the procedural atrium scene to a PNG.

Usage: python tools/render_still.py [out.png] [--width 512 --height 288]
       [--frames 8] [--cpu] [--full]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="still.png")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=288)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--full", action="store_true", help="full atrium scene")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from plainrenderer_tpu.assets import procedural
    from plainrenderer_tpu.config import RenderSettings
    from plainrenderer_tpu.render import frame as frame_mod
    from plainrenderer_tpu.render import scenebuild
    from plainrenderer_tpu.render.state import initial_state
    from plainrenderer_tpu.scene import camera as cam
    from plainrenderer_tpu.assets.image_io import save_image

    settings = RenderSettings(width=args.width, height=args.height,
                              exposure_adaption_speed=1000.0)
    cfg = (procedural.AtriumConfig() if args.full else
           procedural.AtriumConfig(columns_per_row=3, floor_subdiv=4,
                                   box_count=6, box_subdiv=2,
                                   column_segments=12))
    scene_data = procedural.build_atrium_scene(cfg)
    rs = scenebuild.build_render_scene(scene_data)
    print(f"triangles: {rs.triangle_count}", flush=True)
    scene = frame_mod.scene_to_device(rs)
    luts = frame_mod.bake_static_luts(settings)
    state = initial_state(args.width, args.height)
    ext = cam.extrinsic_from_angles([-9.0, -1.8, 0.0], pitch_deg=8.0,
                                    yaw_deg=10.0)
    camera = frame_mod.camera_arrays(ext.position, ext.forward, ext.right,
                                     ext.up)

    interpret = args.cpu
    image = None
    t0 = time.time()
    for i in range(args.frames):
        image, state = frame_mod.render_frame(
            state, scene, camera, luts, jnp.asarray(0.016), settings,
            interpret=interpret)
    image = np.asarray(image)
    print(f"{args.frames} frames in {time.time()-t0:.1f}s", flush=True)
    save_image(args.out, image)
    print(f"wrote {args.out} mean={image.mean():.1f} std={image.std():.1f}")


if __name__ == "__main__":
    main()
