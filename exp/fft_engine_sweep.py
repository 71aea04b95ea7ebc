"""Own-FFT-engine sweep on TPU (VERDICT r2 item 3: 2^20 c64 >= ~380
GFLOP/s, rel err <= 3e-7).  Interleaved in one process: radix cap
{128, 64, 32} x algorithm {X6, X3}, against the XLA engine."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib

import jax
import jax.numpy as jnp
import numpy as np

from bench import slope_seconds

F = importlib.import_module("vexcl_tpu.ops.fft")
N = 1 << 20
GF = 5 * N * np.log2(N) / 1e9


def main():
    rng = np.random.default_rng(0)
    hx = (rng.standard_normal(N) + 1j * rng.standard_normal(N)).astype(
        np.complex64)
    ref = np.fft.fft(hx)
    nref = np.linalg.norm(ref)
    x0 = jax.jit(lambda r, i: jax.lax.complex(r, i))(
        jnp.asarray(hx.real.copy()), jnp.asarray(hx.imag.copy()))

    def measure(tag, plan):
        got = np.abs(np.asarray(jax.jit(lambda v: jnp.abs(plan(v)))(x0)))
        err = np.linalg.norm(got - np.abs(ref)) / nref
        t = slope_seconds(lambda v: plan(v) * 1e-7, x0, lo=8, hi=96)
        print(f"{tag:24s} {GF/t:7.1f} GFLOP/s  err~{err:.2e} "
              f"({t*1e3:.3f} ms)", flush=True)

    # XLA engine reference
    measure("xla", F.Plan((N,), None, False, np.complex64))

    for radix in (128, 64, 32):
        F._MAX_CODELET = radix
        for alg in ("X6", "X3"):
            os.environ["VEXTPU_FFT_X3"] = "1" if alg == "X3" else "0"
            plan = F.Plan((N,), None, False, np.complex64, impl="ct")
            measure(f"ct r{radix} {alg}", plan)

    os.environ["VEXTPU_FFT_X3"] = "0"
    F._MAX_CODELET = 64
    # re-measure XLA at the end (drift check)
    measure("xla (again)", F.Plan((N,), None, False, np.complex64))


if __name__ == "__main__":
    main()
