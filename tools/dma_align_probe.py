#!/usr/bin/env python
"""Probe: does a Pallas HBM->VMEM DMA accept a dynamic row offset that is
only provably a multiple of 4 (not 8)?

Decides the even/odd row-split gather layout for the TAA/texture window
kernels (halves gatherlib.gather_rows_128 row counts): splitting a
(H, W) plane into (2, H/2, W) turns the window's 8-aligned row origin
into a 4-aligned one in split space. ops/shadow.py's packed-row DMA
comment suggests Mosaic wants provable 8-alignment — this measures the
actual behavior on the current toolchain: compile error / wrong data /
slow / fine.
"""

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(off_ref, src_ref, out_ref, buf, sem):
        off = pl.multiple_of(off_ref[0], 4)
        cp = pltpu.make_async_copy(
            src_ref.at[pl.ds(off, 8), :], buf, sem)
        cp.start()
        cp.wait()
        out_ref[...] = buf[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    src = jnp.arange(64 * 128, dtype=jnp.int32).reshape(64, 128)

    @jax.jit
    def run(off, src):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))(off, src)

    for off in (0, 4, 12, 20):
        try:
            t0 = time.time()
            out = np.asarray(run(jnp.asarray([off], jnp.int32), src))
            ok = np.array_equal(out, np.asarray(src)[off:off + 8])
            print(f"off={off}: {'OK' if ok else 'WRONG DATA'} "
                  f"({time.time() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001
            print(f"off={off}: FAILED — {type(e).__name__}: {e}"[:300])

    # part 2: strided sublane read (in-kernel even/odd deinterleave of a
    # DMA'd window — the alternative split-gather enabler)
    def deint_kernel(src_ref, even_ref, odd_ref):
        w = src_ref[...]
        even_ref[...] = w[0::2]
        odd_ref[...] = w[1::2]

    @jax.jit
    def run2(src):
        return pl.pallas_call(
            deint_kernel,
            out_shape=[jax.ShapeDtypeStruct((16, 128), jnp.int32),
                       jax.ShapeDtypeStruct((16, 128), jnp.int32)],
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        )(src)

    try:
        t0 = time.time()
        e, o = (np.asarray(v) for v in run2(src[:32]))
        s = np.asarray(src[:32])
        ok = (np.array_equal(e, s[0::2]) and np.array_equal(o, s[1::2]))
        print(f"strided sublane read: {'OK' if ok else 'WRONG DATA'} "
              f"({time.time() - t0:.1f}s)")
    except Exception as ex:  # noqa: BLE001
        print(f"strided sublane read: FAILED — "
              f"{type(ex).__name__}: {ex}"[:300])


if __name__ == "__main__":
    main()
