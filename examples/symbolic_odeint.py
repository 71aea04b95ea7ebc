#!/usr/bin/env python
"""Lorenz-attractor parameter sweep via the symbolic kernel generator —
the flagship demo of the reference (examples/symbolic.cpp: Boost.odeint
RK4 recorded over vex::symbolic into ONE device kernel).

Here a generic Python RK4 stepper runs once over symbolic state; the
recorded expression trees compile to a single fused TPU kernel applied to
the whole parameter ensemble per step.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import vexcl_tpu as vex  # noqa: E402
from vexcl_tpu import generator  # noqa: E402

SIGMA, B = 10.0, 8.0 / 3.0
DT = 0.01
STEPS = 100
N = 1 << 14  # ensemble size


def lorenz(state, R):
    x, y, z = state
    return (SIGMA * (y - x), R * x - y - x * z, x * y - B * z)


def rk4_step(sys_fn, state, R, dt):
    """Generic RK4 over any state type — host floats or symbolics."""
    k1 = sys_fn(state, R)
    s2 = tuple(s + 0.5 * dt * k for s, k in zip(state, k1))
    k2 = sys_fn(s2, R)
    s3 = tuple(s + 0.5 * dt * k for s, k in zip(state, k2))
    k3 = sys_fn(s3, R)
    s4 = tuple(s + dt * k for s, k in zip(state, k3))
    k4 = sys_fn(s4, R)
    return tuple(
        s + dt / 6.0 * (a + 2 * b + 2 * c + d)
        for s, a, b, c, d in zip(state, k1, k2, k3, k4)
    )


def main():
    ctx = vex.Context(vex.Filter.Env)
    print(ctx)

    # record one RK4 step over symbolic state
    sx, sy, sz, sR = (generator.symbolic() for _ in range(4))
    nx, ny, nz = rk4_step(lorenz, (sx, sy, sz), sR, DT)
    sx.assign(nx)
    sy.assign(ny)
    sz.assign(nz)
    step = generator.build_kernel("lorenz_rk4", [sx, sy, sz],
                                  params=[sx, sy, sz, sR])

    rng = np.random.default_rng(0)
    X = vex.vector(data=rng.random(N) * 10, dtype=np.float32, context=ctx)
    Y = vex.vector(data=rng.random(N) * 10, dtype=np.float32, context=ctx)
    Z = vex.vector(data=rng.random(N) * 10, dtype=np.float32, context=ctx)
    R = vex.vector(data=np.linspace(0.1, 50, N), dtype=np.float32, context=ctx)

    t0 = time.perf_counter()
    for _ in range(STEPS):
        step(X, Y, Z, R)
    stats = vex.Reductor(vex.MIN_MAX)(X)
    dt_total = time.perf_counter() - t0
    print(f"{STEPS} RK4 steps x {N} ensemble members: {dt_total:.3f} s "
          f"({STEPS * N / dt_total / 1e6:.1f} M steps/s)")
    print(f"final x range: [{stats[0]:.3f}, {stats[1]:.3f}]")


if __name__ == "__main__":
    main()
