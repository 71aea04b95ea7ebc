#!/usr/bin/env python
"""MBA scattered-interpolation benchmark, the analog of the reference's
examples/mba_benchmark.cpp: fit a multilevel B-spline to scattered 2-D
samples of a test function, then time device evaluation at N query points
through the expression engine (the lattice lookups fuse into one kernel).

Usage: python examples/mba_benchmark.py [N_log2] [n_samples]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import vexcl_tpu as vex  # noqa: E402


def f(x, y):
    return np.sin(7 * x) * np.cos(5 * y) + 0.3 * np.exp(-8 * ((x - 0.5) ** 2 + (y - 0.5) ** 2))


def main():
    nlog2 = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    nsamp = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    n = 1 << nlog2
    rng = np.random.default_rng(0)

    # scattered samples of f on [0,1]^2
    sx, sy = rng.random(nsamp), rng.random(nsamp)
    sv = f(sx, sy)

    t0 = time.perf_counter()
    surf = vex.mba(
        lo=(-0.01, -0.01), hi=(1.01, 1.01),
        coords=(sx, sy), values=sv, grid=(8, 8), levels=7,
    )
    t_fit = time.perf_counter() - t0
    print(f"fit: {len(surf.fit_grids)} levels flattened onto "
          f"{surf.grids[0]}, residual {surf.residual:.2e}, "
          f"{t_fit * 1e3:.1f} ms (host)")

    # device evaluation at N query points inside an expression
    qx = vex.vector(data=rng.random(n))
    qy = vex.vector(data=rng.random(n))
    out = vex.vector(n, dtype=np.float64)

    def run():
        out[:] = 2.0 * surf(qx, qy) + 1.0   # fused: spline taps + axpb
        return out.array

    run()  # compile
    float(out.array[0])  # drain the compile/first-exec queue
    # sync EVERY iteration: queueing many async applies through the
    # tunnel serializes with huge per-dispatch overhead and reported
    # ~37 s/apply where a synced apply measures ~1.1 s
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        arr = run()
        float(arr[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"eval: {n} points in {dt * 1e3:.2f} ms -> "
          f"{n / dt / 1e6:.1f} Mpoints/s (XLA gather-bound; see docs/tpu_kernel_notes.md)")

    # accuracy vs the true function at the queries
    got = np.asarray(out)
    ref = 2.0 * f(np.asarray(qx), np.asarray(qy)) + 1.0
    print(f"max deviation from f: {np.max(np.abs(got - ref)):.3e}")


if __name__ == "__main__":
    main()
