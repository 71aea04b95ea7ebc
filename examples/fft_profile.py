"""FFT profiling (examples/fft_profile.cpp analog): plan init vs apply
cost for a pow2 and a prime (Bluestein) 2-D size, under the hierarchical
profiler."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import vexcl_tpu as vex

RUNS = 20
REPEATS = 3


def profile(ctx, size):
    n = int(np.prod(size))
    a = vex.vector(n, dtype=np.complex64, context=ctx)
    b = vex.vector(n, dtype=np.complex64, context=ctx)
    a[:] = vex.element_index() * (1.0 / n)

    prof = vex.profiler(name=f"fft {size}", context=ctx)
    for _ in range(REPEATS):
        prof.tic_cl("init")
        f = vex.FFT(tuple(size), context=ctx)
        prof.toc("init")
        prof.tic_cl("apply")
        for _ in range(RUNS):
            b[:] = f(a)
        prof.toc("apply")
    print(prof)


def main():
    ctx = vex.Context(vex.Filter.Env, set_current=True)
    print(ctx)
    profile(ctx, (512, 512))
    profile(ctx, (521, 521))  # prime -> Bluestein plan


if __name__ == "__main__":
    main()
