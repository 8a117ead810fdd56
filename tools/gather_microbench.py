#!/usr/bin/env python
"""Microbenchmark the XLA:TPU primitives the pair-binning pipeline leans
on (VERDICT r3 focus: bin.decode 35.8 ms + bin.owner 10.2 ms +
gather_pair_setups 24.3 ms of a 160 ms frame). Times each primitive at
production sizes so the rewrite targets the real cost, not a guess.

Usage: python tools/gather_microbench.py [--budget 350208] [--t 878016]
"""

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def bench(name, fn, *args, iters=20):
    import jax
    import numpy as _np

    def sync(out):
        # jax.block_until_ready does NOT block over the axon tunnel (see
        # .claude/skills/verify/SKILL.md) — force a tiny transfer instead
        leaf = jax.tree.leaves(out)[0]
        _np.asarray(leaf.ravel()[:1])

    f = jax.jit(fn)
    out = f(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    sync(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {ms:8.3f} ms", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=int, default=350208)
    ap.add_argument("--t", type=int, default=878016)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    B, T = args.budget, args.t
    rng = np.random.default_rng(0)
    # monotone owner indices (the decode gather's real index pattern)
    owner = np.sort(rng.integers(0, T, B)).astype(np.int32)
    owner_j = jnp.asarray(owner)
    rand_j = jnp.asarray(rng.integers(0, T, B).astype(np.int32))
    table = jnp.asarray(rng.integers(0, 1 << 26, T).astype(np.int32))
    rows16 = jnp.asarray(rng.normal(size=(T, 16)).astype(np.float32))
    rows48 = jnp.asarray(rng.normal(size=(T, 48)).astype(np.float32))
    cum = jnp.asarray(np.sort(rng.integers(0, B, T)).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, 1 << 20, B).astype(np.int32))

    print(f"budget={B} t={T}", flush=True)
    bench("gather (B,) <- (T,) monotone idx", lambda i: table[i], owner_j)
    bench("gather (B,) <- (T,) random idx", lambda i: table[i], rand_j)
    bench("gather sorted-flag monotone",
          lambda i: jax.lax.gather(
              table, i[:, None],
              jax.lax.GatherDimensionNumbers(
                  offset_dims=(), collapsed_slice_dims=(0,),
                  start_index_map=(0,)),
              (1,), indices_are_sorted=True, unique_indices=False),
          owner_j)
    bench("row-take (B,16) <- (T,16)", lambda i: rows16[i], rand_j)
    bench("row-take (B,48) <- (T,48)", lambda i: rows48[i], rand_j)
    bench("row-take (B,16) monotone", lambda i: rows16[i], owner_j)
    bench("scatter-add bincount (B+1,) at (T,)",
          lambda c: jnp.zeros((B + 1,), jnp.int32).at[
              jnp.minimum(c, B)].add(1), cum)
    bench("scatter-max (B+1,) at (T,)",
          lambda c: jnp.zeros((B + 1,), jnp.int32).at[
              jnp.minimum(c, B)].max(jnp.arange(T, dtype=jnp.int32)), cum)
    bench("cumsum (B,)", lambda v: jnp.cumsum(v), vals)
    bench("cummax (B,)", lambda v: jax.lax.cummax(v), vals)
    bench("sort (B,) i32", lambda v: jax.lax.sort(v), vals)
    bench("sort (B,) +1 payload",
          lambda v: jax.lax.sort((v, v), num_keys=1), vals)
    bench("sort (B,) +4 payload",
          lambda v: jax.lax.sort((v, v, v, v, v), num_keys=1), vals)
    bench("searchsorted (B,) queries in (T,)",
          lambda q: jnp.searchsorted(cum, q), vals)
    bench("f32 div+floor (B,)",
          lambda v: (v.astype(jnp.float32)
                     / jnp.maximum(v, 1).astype(jnp.float32)).astype(
                         jnp.int32), vals)
    # one-hot matmul gather, blocked: (B,) <- (T,) via (128, T') @ chunks
    # is infeasible at T=878k; measure the repeat-style alternative instead
    bench("jnp.repeat total_repeat_length",
          lambda: jnp.repeat(table, jnp.ones((T,), jnp.int32),
                             total_repeat_length=B))


if __name__ == "__main__":
    main()
