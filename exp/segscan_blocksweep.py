"""Segscan BLOCK_R sweep: the kernel still Mosaic-compiles in 70-180 s
at BLOCK_R=1024 while the structurally-similar compact kernel (R=256)
compiles in 4 s.  If R=256/512 compiles fast with comparable throughput,
the bench/UX cost of the segscan drops an order of magnitude."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib

import jax
import jax.numpy as jnp
import numpy as np

from bench import slope_seconds

S = importlib.import_module("vexcl_tpu.ops.pallas_segscan")
N = 1 << 24
SEG = 64


def main():
    keys0 = jnp.asarray((np.arange(N) // SEG).astype(np.int32))
    v0 = jnp.asarray(np.random.default_rng(0).random(N, dtype=np.float32))

    for R in (256, 512, 1024):
        S.BLOCK_R = R
        t0 = time.time()
        f = jax.jit(lambda k, v: S.pallas_segmented_cumsum(k, v))
        out = f(keys0, v0)
        out.block_until_ready()
        ct = time.time() - t0
        # correctness spot check
        got = float(out[SEG - 1])
        want = float(np.asarray(v0[:SEG]).sum())
        ok = abs(got - want) < 1e-3
        t = slope_seconds(lambda v, k: S.pallas_segmented_cumsum(k, v)
                          * (1.0 / SEG), v0, lo=16, hi=128, extra=(keys0,))
        print(f"R={R:5d}: compile {ct:6.0f}s  {N/t/1e9:6.2f} Gelem/s "
              f"({t*1e3:.2f} ms)  ok={ok}", flush=True)


if __name__ == "__main__":
    main()
