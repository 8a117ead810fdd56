"""Asset pipeline CLI: glTF -> .plain + per-mesh SDF DDS volumes.

Parity: AssetPipeline/mainPipeline.cpp:29-71 —
  1. loadModelGLTF         (gltf_import.load_model_gltf)
  2. meshesToBinary        (plain_format.scene_to_binary)
  3. saveBinaryScene       (plain_format.save_binary_scene)
  4. computeSceneSDFTextures + writeDDSFile per mesh (sdf_bake + dds),
     parallel over meshes (the reference uses its JobSystem; here a process
     pool, or the TPU itself with --jax).

Usage: python -m plainrenderer_tpu.assets.pipeline model.gltf [out.plain]
"""

from __future__ import annotations

import argparse
import sys
import time
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import numpy as np


def _bake_one(args):
    index, positions, indices, out_path = args
    from . import dds
    from .sdf_bake import bake_mesh_sdf

    volume = bake_mesh_sdf(positions, indices)
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    dds.write_sdf_volume(out_path, volume)
    return index, volume.shape


def run_pipeline(gltf_path: str, out_path: str | None = None,
                 workers: int = 0, use_jax: bool = False) -> str:
    from . import dds
    from .gltf_import import load_model_gltf
    from .plain_format import save_binary_scene, scene_to_binary
    from .sdf_bake import bake_mesh_sdf

    gltf_path = Path(gltf_path)
    if out_path is None:
        out_path = gltf_path.with_suffix(".plain")

    t0 = time.time()
    scene = load_model_gltf(gltf_path)
    print(f"loaded {len(scene.meshes)} meshes, {len(scene.objects)} objects "
          f"({time.time()-t0:.1f}s)", file=sys.stderr)

    binary = scene_to_binary(scene)
    save_binary_scene(out_path, binary)
    print(f"wrote {out_path}", file=sys.stderr)

    # SDF bake per mesh (mainPipeline.cpp:60-69: skipped when path empty)
    jobs = []
    for i, mesh in enumerate(scene.meshes):
        if not mesh.texture_paths.sdf:
            continue
        jobs.append((i, np.asarray(mesh.positions), np.asarray(mesh.indices),
                     mesh.texture_paths.sdf))

    t0 = time.time()
    if use_jax or workers <= 1:
        for job in jobs:
            index, shape = _bake_one_inline(job, use_jax)
            print(f"  sdf {index}: {shape}", file=sys.stderr)
    else:
        with ProcessPoolExecutor(max_workers=workers) as pool:
            for index, shape in pool.map(_bake_one, jobs):
                print(f"  sdf {index}: {shape}", file=sys.stderr)
    print(f"SDF computation time: {time.time()-t0:.1f}s", file=sys.stderr)
    return str(out_path)


def _bake_one_inline(args, use_jax):
    index, positions, indices, out_path = args
    from . import dds
    from .sdf_bake import bake_mesh_sdf

    volume = bake_mesh_sdf(positions, indices, use_jax=use_jax)
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    dds.write_sdf_volume(out_path, volume)
    return index, volume.shape


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("gltf")
    ap.add_argument("out", nargs="?", default=None)
    ap.add_argument("--workers", type=int, default=0,
                    help="process-pool workers (0 = inline)")
    ap.add_argument("--jax", action="store_true",
                    help="bake SDFs on the accelerator")
    args = ap.parse_args()
    run_pipeline(args.gltf, args.out, workers=args.workers, use_jax=args.jax)


if __name__ == "__main__":
    main()
