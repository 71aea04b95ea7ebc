#!/usr/bin/env python
"""FFT benchmark mirroring examples/fft_benchmark.cpp of the reference:
1-D/2-D, power-of-two and Bluestein sizes, GFLOPS = 5 N log2 N / t."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vexcl_tpu.ops.fft import Plan  # noqa: E402


def slope_time(run, x0, lo=2, hi=8):
    def make(inner):
        @jax.jit
        def f(v):
            return jax.lax.fori_loop(0, inner, lambda i, a: run(a), v)

        return f

    out = {}
    for inner in (lo, hi):
        f = make(inner)
        float(jnp.real(f(x0).ravel()[0]))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = f(x0)
            float(jnp.real(o.ravel()[0]))
            ts.append(time.perf_counter() - t0)
        out[inner] = min(ts)
    return max((out[hi] - out[lo]) / (hi - lo), 1e-9)


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    print(f"{'size':>12} {'time':>10} {'GFLOPS':>8}")
    for n in [1 << k for k in (10, 14, 18, 20, 22)] + [3 * 5 * 7 * 1024, 1000000]:
        plan = Plan((n,), None, False, np.complex64)
        x0 = jnp.ones(n, jnp.float32)
        t = slope_time(lambda v: jnp.abs(plan(v)) * 1e-3, x0)
        gflops = 5 * n * np.log2(n) / t / 1e9
        print(f"{n:>12} {t*1e6:>8.0f}us {gflops:>8.1f}")
    # 2-D
    for shape in ((1024, 1024), (2048, 2048)):
        plan = Plan(shape, None, False, np.complex64)
        x0 = jnp.ones(shape, jnp.float32)
        t = slope_time(lambda v: jnp.abs(plan(v)) * 1e-3, x0)
        n = np.prod(shape)
        gflops = 5 * n * np.log2(n) / t / 1e9
        print(f"{str(shape):>12} {t*1e6:>8.0f}us {gflops:>8.1f}")


if __name__ == "__main__":
    main()
