"""Native (C++) runtime components, built on first use.

The reference keeps its asset pipeline and runtime helpers in C++
(AssetPipeline/, JobSystem.cpp); the TPU rebuild does the same for the
CPU-bound hot paths that numpy cannot express efficiently — currently the
SDF baker (sdf_bake.cc: grid-pruned exact distances + hierarchical winding
numbers, ~O(V log T) instead of the dense O(V*T) numpy fallback).

Shared objects are compiled with the system g++ into .cache/native/ keyed
by source hash; loading falls back gracefully (returns None) when no
compiler is available so the numpy implementations remain the portable
baseline.
"""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
import sys
from pathlib import Path

_SRC_DIR = Path(__file__).resolve().parent
_CACHE = _SRC_DIR.parent.parent / ".cache" / "native"
_LOADED: dict = {}


def _build(name: str) -> Path | None:
    src = _SRC_DIR / f"{name}.cc"
    code = src.read_bytes()
    key = hashlib.sha256(code).hexdigest()[:16]
    out = _CACHE / f"{name}_{key}.so"
    if out.exists():
        return out
    _CACHE.mkdir(parents=True, exist_ok=True)
    tmp = out.with_suffix(".so.tmp")
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
           "-o", str(tmp), str(src)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except Exception as e:  # noqa: BLE001 - fall back to numpy paths
        print(f"[native] build of {name} failed ({e}); using numpy "
              f"fallback", file=sys.stderr)
        return None
    tmp.replace(out)
    return out


def load(name: str):
    """ctypes handle for native module `name` (cached), or None."""
    if name not in _LOADED:
        path = _build(name)
        _LOADED[name] = ctypes.CDLL(str(path)) if path else None
    return _LOADED[name]


def bake_sdf_native(positions, indices, pad_min, pad_max, resolution,
                    max_dist: float):
    """Native SDF bake; returns (rz, ry, rx) f32 or None if unavailable.

    positions (V, 3) f32; indices flat (I,) or (I/3, 3) i32;
    pad_min/pad_max (3,) PADDED bounds; resolution (rx, ry, rz).
    """
    import numpy as np

    lib = load("sdf_bake")
    if lib is None:
        return None
    fn = lib.bake_sdf
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_float),
    ]
    verts = np.ascontiguousarray(positions, np.float32)
    tris = np.ascontiguousarray(np.asarray(indices).reshape(-1), np.int32)
    bb = np.ascontiguousarray(
        np.concatenate([np.asarray(pad_min, np.float32).ravel(),
                        np.asarray(pad_max, np.float32).ravel()]),
        np.float32)
    rx, ry, rz = (int(r) for r in resolution)
    out = np.empty((rz, ry, rx), np.float32)
    rc = fn(verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            verts.shape[0],
            tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            tris.shape[0] // 3,
            bb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rx, ry, rz, ctypes.c_float(float(max_dist)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        return None
    return out
