"""Measure the new compact reduce_by_key pipeline on TPU (VERDICT r2 #1).

Stages measured separately and end-to-end (chained, static-M assembly as
the library achieves after its one count sync):
  A. tails pre-pass + segscan (existing, ~21.7 Gelem/s)
  B. pallas_compact_positions (the new kernel)
  C. assembly gather at M = n/seg
  D. end-to-end chain
Also records the kernel's Mosaic compile time.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import slope_seconds

N = 1 << 24
SEG = 64


def main():
    from vexcl_tpu.ops.pallas_compact import (
        BLOCK_R, LANE, pallas_compact_positions)
    from vexcl_tpu.ops.pallas_segscan import pallas_segmented_cumsum

    block = BLOCK_R * LANE
    rng = np.random.default_rng(0)
    keys0 = jnp.asarray((np.arange(N) // SEG).astype(np.int32))
    v0 = jnp.asarray(rng.random(N, dtype=np.float32))
    tails0 = jnp.asarray(
        np.concatenate([(np.arange(1, N) % SEG == 0),
                        [True]]).astype(np.int8))

    # -- B: compaction kernel alone (compile time + throughput) ----------
    t0 = time.time()
    f = jax.jit(lambda t: pallas_compact_positions(t)[0])
    f(tails0)[0].block_until_ready()
    print(f"compact kernel compile: {time.time()-t0:.0f}s", flush=True)

    def stepB(t):
        pos, cnt = pallas_compact_positions(t)
        # feed flags back (bit-flip a dependency to keep the chain honest)
        return (t ^ (cnt[0] * 0).astype(jnp.int8)).astype(jnp.int8)

    t = slope_seconds(stepB, tails0, lo=8, hi=48)
    print(f"B compact kernel: {N/t/1e9:.2f} Gelem/s ({t*1e3:.2f} ms)",
          flush=True)

    # -- D: end-to-end (tails + segscan + compact + assembly at M) -------
    M = N // SEG
    nblocks = -(-N // block)

    def pipeline(keys_in, vals_in):
        tails = jnp.concatenate(
            [(keys_in[1:] != keys_in[:-1]).astype(jnp.int8),
             jnp.ones((1,), jnp.int8)])
        incl = pallas_segmented_cumsum(keys_in, vals_in)
        pos, counts = pallas_compact_positions(tails)
        offs = jnp.concatenate(
            [jnp.zeros((1,), jnp.float32), jnp.cumsum(counts)])[:-1]
        j = jnp.arange(M, dtype=jnp.float32)
        b = jnp.searchsorted(offs, j, side="right") - 1
        r = jnp.clip((j - jnp.take(offs, b, axis=0)).astype(jnp.int32),
                     0, block - 1)
        gpos = b * block + jnp.take(pos.reshape(-1), b * block + r,
                                    axis=0).astype(jnp.int32)
        gpos = jnp.clip(gpos, 0, N - 1)
        return jnp.take(incl, gpos, axis=0), jnp.take(keys_in, gpos, axis=0)

    def stepD(v, keys):
        sums, _ = pipeline(keys, v)
        # fold compacted sums back into the value stream (bounded)
        return (v + jnp.pad(sums, (0, N - M)) * 1e-7) % 1.0

    t0 = time.time()
    jitD = {}
    t = slope_seconds(stepD, v0, lo=8, hi=48, extra=(keys0,))
    print(f"D end-to-end seg=64: {N/t/1e9:.2f} Gelem/s ({t*1e3:.2f} ms)",
          flush=True)

    # -- C: assembly alone (gather at M) ---------------------------------
    incl0 = jax.jit(pallas_segmented_cumsum)(keys0, v0)
    pos0, cnt0 = jax.jit(pallas_compact_positions)(tails0)

    def stepC(v, pos, counts, incl, keys):
        offs = jnp.concatenate(
            [jnp.zeros((1,), jnp.float32), jnp.cumsum(counts)])[:-1]
        j = jnp.arange(M, dtype=jnp.float32)
        b = jnp.searchsorted(offs, j, side="right") - 1
        r = jnp.clip((j - jnp.take(offs, b, axis=0)).astype(jnp.int32),
                     0, block - 1)
        gpos = b * block + jnp.take(pos.reshape(-1), b * block + r,
                                    axis=0).astype(jnp.int32)
        out = jnp.take(incl, jnp.clip(gpos, 0, N - 1), axis=0)
        return (v + jnp.pad(out, (0, N - M)) * 1e-7) % 1.0

    t = slope_seconds(stepC, v0, lo=8, hi=48,
                      extra=(pos0, cnt0, incl0, keys0))
    print(f"C assembly (M={M}): {N/t/1e9:.2f} Gelem/s eq ({t*1e3:.2f} ms)",
          flush=True)

    # correctness spot check on device
    sums, okeys = jax.jit(pipeline)(keys0, v0)
    hv = np.asarray(v0, dtype=np.float64)
    want = hv.reshape(-1, SEG).sum(axis=1)
    got = np.asarray(sums)
    err = np.max(np.abs(got - want) / np.maximum(1, np.abs(want)))
    print(f"correctness: max rel err {err:.2e} "
          f"keys ok={bool(np.array_equal(np.asarray(okeys), np.arange(M)*1))}",
          flush=True)


if __name__ == "__main__":
    main()
