"""ct (own MXU planner) vs xla engine across the reference sweep sizes
(fft_benchmark.cpp:29-231): 1-D pow2 2^10..2^24, 2-D 1024^2, prime
Bluestein.  Decides whether impl='auto' should prefer ct anywhere beyond
2^20 (where ct measured 690-734 vs 487-966 GFLOP/s)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib

import jax
import jax.numpy as jnp
import numpy as np

from bench import slope_seconds

F = importlib.import_module("vexcl_tpu.ops.fft")


def rnd_c64(shape):
    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.random(shape, dtype=np.float32))
    im = jnp.asarray(rng.random(shape, dtype=np.float32))
    return jax.jit(jax.lax.complex)(re, im)


def run(tag, shape, lo, hi, dims=None):
    if dims is None:
        n = int(np.prod(shape))
        gf = 5 * n * np.log2(n) / 1e9
    else:
        tn = int(np.prod([shape[d] for d in dims]))
        batch = int(np.prod(shape)) // tn
        gf = 5 * batch * tn * np.log2(tn) / 1e9
    x0 = rnd_c64(shape)
    for impl in ("xla", "ct"):
        plan = F.Plan(shape, dims, False, np.complex64, impl=impl)
        t = slope_seconds(lambda v: plan(v) * 1e-7, x0, lo=lo, hi=hi)
        print(f"{tag:18s} {impl:4s} {gf/t:8.1f} GFLOP/s ({t*1e3:.3f} ms)",
              flush=True)


def main():
    run("1d 2^10", (1 << 10,), 2048, 16384)
    run("1d 2^14", (1 << 14,), 512, 4096)
    run("1d 2^16", (1 << 16,), 256, 2048)
    run("1d 2^20", (1 << 20,), 16, 128)
    run("1d 2^24", (1 << 24,), 4, 24)
    run("2d 1024^2", (1 << 10, 1 << 10), 16, 128)
    run("bluestein 999983", (999983,), 8, 48)
    run("batched 512x2^14", (512, 1 << 14), 8, 48, dims=(1,))


if __name__ == "__main__":
    main()
