#!/usr/bin/env python
"""Reconcile the speed-of-light headline (VERDICT r3 weak #1).

The r1-r3 fused-elementwise row reported >100% of HBM_SOL=819 GB/s for
three rounds.  Hypothesis: the chain step `(v + b + c*d) % 1` parses as
`(v + b) + (c*d)`, so `c*d` is a LOOP-INVARIANT subtree of the
fori_loop body — XLA hoists it, each iteration really streams 4 arrays
(read v, b, e=c*d; write v), and the 5-array byte count flatters by
5/4 = 1.25x (907.4 / 1.25 = 726 GB/s = 88.6% of 819 — right in line
with saxpy 690 and reduction 693).

Probe rows (one process, interleaved by slope_seconds):
  copy2     (v*a)%1                1r+1w   the achievable-GB/s anchor
  copy2_donate same via library donation (x[:] = expr on itself)
  triad3    (v+0.5*b)%1            2r+1w
  fused5_raw    (v+b+c*d)%1        counted as 5 passes (current bench)
  fused5_barrier same with lax.optimization_barrier on (b,c,d) inside
                the body — LICM-proof, honest 5 passes
  fused4_hoisted (v+b+e)%1, e precomputed — what the hoisted loop runs

If fused5_raw GB/s ~= fused4_hoisted * 5/4 and fused5_barrier lands
near saxpy-level GB/s, the flattery is confirmed and bench.py gets the
barrier.  copy2 bounds the chip's real streaming rate.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import slope_seconds  # noqa: E402

N = 1 << 26


def main():
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.random(N, dtype=np.float32))
    c = jnp.asarray(rng.random(N, dtype=np.float32))
    d = jnp.asarray(rng.random(N, dtype=np.float32))
    x0 = jnp.asarray(rng.random(N, dtype=np.float32))
    e = jax.jit(lambda c_, d_: c_ * d_)(c, d)

    rows = {}

    # 1. pure streaming copy bound: 1 read + 1 write
    t = slope_seconds(lambda v: (v * np.float32(1.0000001)) % 1.0, x0,
                      lo=8, hi=48)
    rows["copy2_GBs"] = 2 * N * 4 / t / 1e9

    # 2. triad: 2 reads + 1 write
    t = slope_seconds(lambda v, b_: (v + 0.5 * b_) % 1.0, x0,
                      lo=8, hi=48, extra=(b,))
    rows["triad3_GBs"] = 3 * N * 4 / t / 1e9

    # 3. the current bench form (LICM-exposed)
    t = slope_seconds(lambda v, b_, c_, d_: (v + b_ + c_ * d_) % 1.0, x0,
                      lo=8, hi=48, extra=(b, c, d))
    rows["fused5_raw_GBs"] = 5 * N * 4 / t / 1e9
    rows["fused5_raw_as4_GBs"] = 4 * N * 4 / t / 1e9

    # 4. LICM-proof: barrier the invariants inside the body
    def step_barrier(v, b_, c_, d_):
        b_, c_, d_ = jax.lax.optimization_barrier((b_, c_, d_))
        return (v + b_ + c_ * d_) % 1.0

    t = slope_seconds(step_barrier, x0, lo=8, hi=48, extra=(b, c, d))
    rows["fused5_barrier_GBs"] = 5 * N * 4 / t / 1e9

    # 5. what the hoisted loop actually runs: 3 reads + 1 write
    t = slope_seconds(lambda v, b_, e_: (v + b_ + e_) % 1.0, x0,
                      lo=8, hi=48, extra=(b, e))
    rows["fused4_hoisted_GBs"] = 4 * N * 4 / t / 1e9

    # 6. saxpy for cross-reference (3 passes, nothing hoistable)
    t = slope_seconds(lambda v, b_: (2.0 * v + b_) % 1.0, x0,
                      lo=8, hi=48, extra=(b,))
    rows["saxpy3_GBs"] = 3 * N * 4 / t / 1e9

    for k, v in rows.items():
        print(f"{k:>24}: {v:8.1f}")
    print("\nratio fused5_raw / fused4_hoisted:",
          round(rows["fused5_raw_GBs"] / rows["fused4_hoisted_GBs"], 3),
          "(1.25 == perfect LICM flattery)")


if __name__ == "__main__":
    main()
