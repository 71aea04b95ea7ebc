#!/usr/bin/env python
"""Library-level benchmark mirroring examples/benchmark.cpp of the
reference: every measurement goes through the PUBLIC vexcl_tpu API
(vectors + expressions), not raw jnp — so it includes the dispatch path a
user sees.  bench.py at the repo root measures kernel-level throughput.

Usage: python examples/benchmark.py [N_log2]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import vexcl_tpu as vex  # noqa: E402


def timeit(fn, iters=20, warmup=3):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    if hasattr(out, "block_until_ready"):
        out.block_until_ready()
    elif out is not None:
        import jax

        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    n = 1 << int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    ctx = vex.Context(vex.Filter.Env)
    print(ctx)
    dt = np.float32
    rng = np.random.default_rng(0)

    a = vex.vector(data=rng.random(n).astype(dt), context=ctx)
    b = vex.vector(data=rng.random(n).astype(dt), context=ctx)
    c = vex.vector(data=rng.random(n).astype(dt), context=ctx)
    d = vex.vector(data=rng.random(n).astype(dt), context=ctx)

    # SAXPY a = 2*a + b (benchmark.cpp:84-148)
    t = timeit(lambda: a.assign(2.0 * vex.tag(1, a) + b).array)
    print(f"saxpy       : {3*n*4/t/1e9:8.1f} GB/s   ({t*1e6:.0f} us)")

    # fused a += b + c*d (benchmark.cpp:153-216)
    t = timeit(lambda: a.assign(b + c * d, "+=").array)
    print(f"fused expr  : {5*n*4/t/1e9:8.1f} GB/s   ({t*1e6:.0f} us)")

    # reduction sum(a*b) (benchmark.cpp:220-280)
    Sum = vex.Reductor(vex.SUM)
    t = timeit(lambda: Sum(a * b))
    print(f"reduction   : {2*n*4/t/1e9:8.1f} GB/s   ({t*1e6:.0f} us)")

    # RNG (benchmark.cpp:610-666)
    rnd = vex.Random(dt, "philox")
    idx = vex.element_index(0, n)
    t = timeit(lambda: a.assign(rnd(idx, 42)).array)
    print(f"philox      : {n/t/1e9:8.2f} Grand/s ({t*1e6:.0f} us)")

    # sort (benchmark.cpp:669-760)
    k = vex.vector(data=rng.integers(0, 1 << 30, n).astype(np.int32), context=ctx)
    t = timeit(lambda: (vex.sort(k), k.array)[1], iters=5)
    print(f"sort        : {n/t/1e6:8.1f} Mkeys/s ({t*1e3:.1f} ms)")

    # scan
    t = timeit(lambda: vex.inclusive_scan(a).array, iters=5)
    print(f"scan        : {n/t/1e9:8.2f} Gelem/s ({t*1e6:.0f} us)")


if __name__ == "__main__":
    main()
