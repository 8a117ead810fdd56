#!/usr/bin/env python
"""Project v5e-8 frame time from a single-chip per-pass profile.

VERDICT r3/r4 asked for a measured/projected v5e-8 frame-time table with
the replicated fraction quantified. Real multi-chip hardware is not
reachable from this environment (one tunneled chip), so the projection
uses the measured single-chip per-pass table (tools/profile_frame.py
--json) plus the sharding model of parallel/sharding.py:

  - band   — pixel-space passes (raster/shade/GI/TAA/fog/post): each
             device renders 1/N of the screen rows -> time / N;
  - atlas  — everything under the 'atlas/' scope (render/frame.py wraps
             the whole cascade phase in jax.named_scope("atlas")): binned
             and rasterized in atlas row bands -> time / N, EXCEPT the
             scopes listed in REPLICATED (the atlas geometry stage runs on
             the full caster stream before the band slice), plus the
             all_gather of the maps over ICI (modeled at 45 GB/s/link
             bidirectional ring: n_cas * sres^2 * 4B * (N-1)/N bytes
             through each link);
  - budget — the binning machinery (bin.expand/sort/segments +
             gather_pair_setups, main view and atlas): O(static pair
             budget), and in band mode the budgets' triangle-proportional
             terms are sized at 2x the even band share
             (render/frame.py band_share), so the cost scales ~2/N
             (modeled as exactly 2/N; the residual grid-floor term makes
             that slightly optimistic for tiny scenes, irrelevant at
             bench sizes where the triangle term dominates);
  - repl   — per-device work that does NOT scale with N: full-stream
             geometry/setup stages (main-view geometry_setup, the atlas
             geometry stage before its band slice, LUT bakes).

Scopes that match no rule default to band (divided by N) — that makes the
projection OPTIMISTIC for unlisted replicated work, NOT pessimistic, so
every defaulted scope >= 0.2 ms is printed as a WARNING for manual review
(VERDICT r4 weak #6: the old docstring claimed the opposite direction and
the 'atlas/' prefix did not exist in profiles; both fixed, and the
classification below is validated against an actual
`profile_frame --json` dump in PERF_r05.md).

Usage: python tools/profile_frame.py --scale 4 --json /tmp/prof.json
       python tools/project_multichip.py /tmp/prof.json [--n 8]
"""

import argparse
import json
import sys

# scopes whose cost is identical on every device (band-invariant)
REPLICATED = (
    "raster.geometry_setup",   # full-triangle-stream main-view setup
    "scene.object_transforms",
    "atlas/shadow.atlas_setup",  # atlas geometry stage, pre-band-slice
    "shadow.atlas_setup",
    "sky.lut",                 # one bake, same on every device
    # the atlas geometry stage's vmapped concatenate shows up unscoped in
    # profiles (validated against .cache/frame_hlo.txt metadata: its
    # op_name is shadow.atlas_setup/vmap(raster.geometry_setup)/concat)
    "(unscoped:bitcast_dynamic-update-s)",
)
# binning machinery: O(static pair budget); budgets size their
# triangle-proportional term at 2x the even band share -> cost ~ 2/N
BUDGET = (
    "raster.build_pairs",
    "raster.gather_pair_setups",
)
# scopes sharded into atlas row bands (1/N): the whole atlas phase except
# the REPLICATED/BUDGET entries above (checked first)
ATLAS = ("atlas/",)


def classify(name: str) -> str:
    for p in REPLICATED:
        if name.startswith(p):
            return "repl"
    for p in BUDGET:
        if name.startswith(p) or name.startswith("atlas/" + p):
            return "budget"
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

    known_prefixes = (
        "raster.", "atlas/", "shadow.", "sdfgi.", "taa.", "volumetrics.",
        "texture.", "shade.", "sky.", "bloom", "post.", "exposure.",
        "scene.", "st.")
    buckets = {"band": 0.0, "atlas": 0.0, "repl": 0.0,
               "budget": 0.0}
    rows = []
    defaulted = []
    for name, ms_f in sorted(per_scope.items(), key=lambda kv: -kv[1]):
        cls = classify(name)
        buckets[cls] += ms_f
        rows.append((name, ms_f, cls))
        if (cls == "band" and ms_f >= 0.2
                and not name.startswith(known_prefixes)):
            defaulted.append((name, ms_f))

    n = args.n
    gather_bytes = args.n_cas * args.sres * args.sres * 4 * (n - 1) / n
    gather_ms = gather_bytes / (args.ici_gbps * 1e9) * 1e3
    halo_ms = 0.15  # ppermute border rows (measured class: tens of MB, us)
    t1 = sum(buckets.values())
    budget_scale = min(1.0, 2.0 / n)
    tn = (buckets["band"] / n + buckets["atlas"] / n
          + buckets["budget"] * budget_scale + buckets["repl"]
          + gather_ms + halo_ms)

    print(f"single-chip total: {t1:8.2f} ms")
    print(f"  band (pixel-space, /N):  {buckets['band']:8.2f} ms")
    print(f"  atlas (row bands, /N):   {buckets['atlas']:8.2f} ms")
    print(f"  budget-bound (x2/N):     {buckets['budget']:8.2f} ms")
    print(f"  replicated (x1):         {buckets['repl']:8.2f} ms")
    print(f"  + all_gather(maps) @ {args.ici_gbps:.0f} GB/s: {gather_ms:6.2f} ms")
    print(f"  + halo exchanges:        {halo_ms:8.2f} ms")
    print(f"projected v5e-{n}:         {tn:8.2f} ms  ({1000.0 / tn:.1f} FPS)")
    for name, ms_f in defaulted:
        print(f"WARNING: unrecognized scope {name!r} ({ms_f:.2f} ms) "
              "defaulted to band (/N) — verify it really scales with the "
              "band height or add it to REPLICATED")
    print()
    print(f"{'scope':44s} {'ms':>8s}  class")
    for name, ms_f, cls in rows:
        if ms_f < 0.05:
            continue
        print(f"{name:44s} {ms_f:8.3f}  {cls}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
