"""Radix-256 first stages for the own CT engine at 2^22..2^24.

The ct engine collapses at >=2^22 (156-200 GF/s vs 540-740 below) exactly
where the balanced radix-128 plan grows from 3 to 4 stages.  A radix-256
codelet costs TWO full-rate MXU passes (contraction 256 = 2x128) but
keeps the plan at 3 stages: same MXU work, one fewer full-array HBM pass
+ transpose.  Interleaved A/B in one process (CLAUDE.md rules)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib

import jax
import jax.numpy as jnp
import numpy as np

from bench import slope_seconds

F = importlib.import_module("vexcl_tpu.ops.fft")


def measure(tag, plan, x0, gf, ref_abs, nref):
    got = np.abs(np.asarray(jax.jit(lambda v: jnp.abs(plan(v)))(x0)))
    err = np.linalg.norm(got - ref_abs) / nref
    t = slope_seconds(lambda v: plan(v) * 1e-7, x0, lo=4, hi=28)
    print(f"{tag:22s} {gf/t:7.1f} GFLOP/s  err~{err:.2e} "
          f"({t*1e3:.3f} ms)", flush=True)


def main():
    rng = np.random.default_rng(0)
    for logn in (22, 23, 24):
        n = 1 << logn
        gf = 5 * n * np.log2(n) / 1e9
        hx = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            np.complex64)
        ref_abs = np.abs(np.fft.fft(hx))
        nref = np.linalg.norm(ref_abs)
        x0 = jax.jit(jax.lax.complex)(
            jnp.asarray(hx.real.copy()), jnp.asarray(hx.imag.copy()))
        print(f"-- n = 2^{logn} --", flush=True)
        measure("xla", F.Plan((n,), None, False, np.complex64), x0, gf,
                ref_abs, nref)
        for radix in (128, 256):
            F._MAX_CODELET = radix
            plan = F.Plan((n,), None, False, np.complex64, impl="ct")
            print(f"   plan {F._radix_plan(n, radix)}", flush=True)
            measure(f"ct r{radix}", plan, x0, gf, ref_abs, nref)
        F._MAX_CODELET = 128
        measure("xla (drift check)", F.Plan((n,), None, False, np.complex64),
                x0, gf, ref_abs, nref)
        del x0


if __name__ == "__main__":
    main()
