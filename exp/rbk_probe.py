"""Probe the primitive costs for a fast reduce_by_key (VERDICT r2 item 1).

Current: segscan (0.77 ms at 21.7 Gelem/s) + ONE global 16M lax.sort for
compaction (~47 ms) => 0.31 Gelem/s.  Candidate designs:

A. Pallas block-compaction in/after the segscan, then XLA assembly:
   scatter(128 block offsets) + cumsum + ascending take of m elements.
   Needs: ascending-take throughput.
B. Batched row sort (nblocks, B) for block compaction in pure XLA,
   then the same assembly.  Needs: batched-sort throughput vs global.
C. Slimmer global sort (fewer payload operands).

This probe measures each primitive with the two-point-slope methodology
(docs/benchmarking.md) in ONE process so variants are comparable.
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


def report(name, t, n=N, unit="Gelem/s"):
    print(f"{name:42s} {n/t/1e9:8.2f} {unit}  ({t*1e3:.2f} ms)", flush=True)


def main():
    rng = np.random.default_rng(0)
    v0 = jnp.asarray(rng.random(N, dtype=np.float32))
    k0 = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))

    # -- 1. global sorts of varying width -------------------------------
    def mix(k):
        return (k * np.int32(-1640531535)) ^ (k >> 7)

    def s1(k):
        return jax.lax.sort(mix(k))

    t = slope_seconds(s1, k0, lo=4, hi=24)
    report("sort 1xi32 (16M)", t)

    def s2(kv):
        k, v = kv
        k, v = jax.lax.sort((mix(k), v), num_keys=1)
        return k, v

    t = slope_seconds(s2, (k0, v0), lo=4, hi=24)
    report("sort i32+f32 payload", t)

    def s3(kvv):
        k, v, w = kvv
        k, v, w = jax.lax.sort((mix(k), v, w), num_keys=1)
        return k, v, w

    t = slope_seconds(s3, (k0, v0, k0), lo=4, hi=24)
    report("sort i32+f32+i32 (current rbk)", t)

    # -- 2. batched row sort (block compaction candidate) ----------------
    for B in (128, 1 << 10, 1 << 14, 1 << 17):
        rows = N // B
        kb = k0.reshape(rows, B)

        def sb(k):
            return jax.lax.sort(mix(k), dimension=1)

        t = slope_seconds(sb, kb, lo=4, hi=24)
        report(f"row sort ({rows}x{B}) i32", t)

    # -- 3. take: ascending vs random indices ----------------------------
    asc = jnp.asarray(np.sort(rng.integers(0, N, N)).astype(np.int32))
    rnd = jnp.asarray(rng.integers(0, N, N).astype(np.int32))

    def tk(v, idx):
        out = jnp.take(v, idx, axis=0)
        return (v + out * 1e-7) % 1.0

    t = slope_seconds(tk, v0, lo=4, hi=24, extra=(asc,))
    report("take 16M ascending idx", t)
    t = slope_seconds(tk, v0, lo=4, hi=24, extra=(rnd,))
    report("take 16M random idx", t)

    m = 1 << 18
    asc_m = jnp.asarray(np.sort(rng.integers(0, N, m)).astype(np.int32))

    def tkm(v, idx):
        out = jnp.take(v, idx, axis=0)
        return v.at[:m].set((out * 1e-7) % 1.0)

    t = slope_seconds(tkm, v0, lo=8, hi=48, extra=(asc_m,))
    report("take 256K ascending idx (of 16M)", t, n=m)

    # -- 4. cumsum i32 (seg_id pass) and f32 ------------------------------
    hv = jnp.asarray((rng.random(N) < 1 / 64).astype(np.int32))

    def cs(h):
        c = jnp.cumsum(h)
        return (h + c[-1] * 0).astype(jnp.int32)

    t = slope_seconds(cs, hv, lo=8, hi=48)
    report("cumsum 16M i32", t)

    # -- 5. tiny-table gather: O[b] for 16M b -----------------------------
    O = jnp.asarray(np.arange(128, dtype=np.int32) * 1000)
    bidx = jnp.asarray(rng.integers(0, 128, N).astype(np.int32))

    def tg(b, O_):
        out = jnp.take(O_, b, axis=0)
        return (b + out * 0).astype(jnp.int32)

    t = slope_seconds(tg, bidx, lo=8, hi=48, extra=(O,))
    report("take from 128-entry table x16M", t)


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"total {time.time()-t0:.0f}s")
