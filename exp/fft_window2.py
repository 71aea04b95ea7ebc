"""Auto-route window re-measure after the one-pass stage form
(exp/fft_blockstage): xla vs ct interleaved TWICE per size in one
process, 2^20..2^24.  Decides the upper edge of Plan._auto_ct."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib

import jax
import jax.numpy as jnp
import numpy as np

from bench import slope_seconds

F = importlib.import_module("vexcl_tpu.ops.fft")


def main():
    rng = np.random.default_rng(0)
    for logn in (20, 21, 22, 23, 24):
        n = 1 << logn
        gf = 5 * n * np.log2(n) / 1e9
        re = jnp.asarray(rng.random(n, dtype=np.float32))
        im = jnp.asarray(rng.random(n, dtype=np.float32))
        x0 = jax.jit(jax.lax.complex)(re, im)
        lo, hi = (4, 28) if logn >= 23 else (8, 64)
        vals = {}
        for rep in ("", "2"):
            for impl in ("xla", "ct"):
                plan = F.Plan((n,), None, False, np.complex64, impl=impl)
                t = slope_seconds(lambda v: plan(v) * 1e-7, x0, lo=lo, hi=hi)
                vals[impl + rep] = gf / t
        print(f"2^{logn}  " + "  ".join(
            f"{k}: {v:7.1f}" for k, v in vals.items()), flush=True)
        del x0


if __name__ == "__main__":
    main()
