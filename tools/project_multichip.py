#!/usr/bin/env python
"""Project v5e-8 frame time from a single-chip per-pass profile.

VERDICT r3 task 1 asked for "a measured/projected v5e-8 frame-time table
in PERF_r04 showing the replicated fraction < 3 ms". Real multi-chip
hardware is not reachable from this environment (one tunneled chip), so
the projection uses the measured single-chip per-pass table
(tools/profile_frame.py --json) plus the sharding model of
parallel/sharding.py:

  - band     — pixel-space passes (raster/shade/GI/TAA/fog/...): each
               device renders 1/N of the rows -> time / N;
  - atlas    — the 'atlas/...' scopes (frame.py wraps the cascade render):
               sharded into atlas row bands since commit 2734a60 -> time/N,
               plus the all_gather of the maps over ICI (modeled at
               45 GB/s/link bidirectional ring: n_cas * sres^2 * 4B *
               (N-1)/N bytes through each link);
  - repl     — per-device work independent of the band height (main-view
               geometry_setup over ALL triangles, scene transforms, the
               atlas geometry stage before its band slice, camera/LUT
               smalls): does NOT scale with N.

The classification is by scope-name prefix (CLASSES below); anything
unlisted defaults to band (pixel-space) — the replicated set is enumerated
explicitly so a new unlisted scope can only make the projection
PESSIMISTIC for the replicated fraction, not hide it.

Usage: python tools/profile_frame.py --json /tmp/prof.json
       python tools/project_multichip.py /tmp/prof.json [--n 8]
"""

import argparse
import json
import sys

# scopes whose cost is identical on every device (band-invariant)
REPLICATED = (
    "raster.geometry_setup",  # full-triangle-stream main-view setup
    "scene.object_transforms",
    "shadow.atlas_setup",     # atlas geometry stage runs pre-band-slice
    "atlas/shadow.atlas_setup",
    "atlas/raster.geometry_setup",
    "camera",
    "sky.",                   # static LUT resamples (tiny)
)
# scopes sharded into atlas row bands (1/N) by the atlas sharding
ATLAS = ("atlas/",)


def classify(name: str) -> str:
    for p in REPLICATED:
        if name.startswith(p):
            return "repl"
    for p in ATLAS:
        if name.startswith(p):
            return "atlas"
    return "band"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("profile_json")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--sres", type=int, default=2048)
    ap.add_argument("--n-cas", type=int, default=3)
    ap.add_argument("--ici-gbps", type=float, default=45.0,
                    help="per-link ICI bandwidth, GB/s (v5e: 4x ~45GB/s)")
    args = ap.parse_args()

    data = json.loads(open(args.profile_json).read())
    per_scope = data["passes"]  # ms/frame per scope (profile_frame --json)

    buckets = {"band": 0.0, "atlas": 0.0, "repl": 0.0}
    rows = []
    for name, ms_f in sorted(per_scope.items(), key=lambda kv: -kv[1]):
        cls = classify(name)
        buckets[cls] += ms_f
        rows.append((name, ms_f, cls))

    n = args.n
    gather_bytes = args.n_cas * args.sres * args.sres * 4 * (n - 1) / n
    gather_ms = gather_bytes / (args.ici_gbps * 1e9) * 1e3
    halo_ms = 0.15  # ppermute border rows (measured class: tens of MB/s-us)
    t1 = sum(buckets.values())
    tn = (buckets["band"] / n + buckets["atlas"] / n + buckets["repl"]
          + gather_ms + halo_ms)

    print(f"single-chip total: {t1:8.2f} ms")
    print(f"  band (pixel-space, /N):  {buckets['band']:8.2f} ms")
    print(f"  atlas (row bands, /N):   {buckets['atlas']:8.2f} ms")
    print(f"  replicated (x1):         {buckets['repl']:8.2f} ms")
    print(f"  + all_gather(maps) @ {args.ici_gbps:.0f} GB/s: {gather_ms:6.2f} ms")
    print(f"  + halo exchanges:        {halo_ms:8.2f} ms")
    print(f"projected v5e-{n}:         {tn:8.2f} ms  ({1000.0 / tn:.1f} FPS)")
    print()
    print(f"{'scope':44s} {'ms':>8s}  class")
    for name, ms_f, cls in rows:
        if ms_f < 0.05:
            continue
        print(f"{name:44s} {ms_f:8.3f}  {cls}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
