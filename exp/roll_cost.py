#!/usr/bin/env python
"""Isolate VPU op costs inside a Pallas kernel: roll / select / mod / fma.

Auto-pipelined (R,128) blocks, compute varies; effective 2-pass GB/s tells
us the per-op cost by differences.
"""
import functools
import sys
import os

import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import slope_seconds  # noqa: E402

N = 1 << 26
R = 1024
ROWS = N // 128


def run_variant(name, body):
    def kern(x_ref, o_ref):
        o_ref[...] = body(x_ref[...])

    @jax.jit
    def step(x):
        y = pl.pallas_call(
            kern,
            grid=(ROWS // R,),
            in_specs=[pl.BlockSpec((R, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
        )(x.reshape(ROWS, 128))
        return y.reshape(-1)

    x0 = jnp.asarray(np.random.default_rng(0).random(N, dtype=np.float32))
    t = slope_seconds(step, x0, lo=8, hi=48)
    print(f"{name:24s} {2 * N * 4 / t / 1e9:7.1f} GB/s (2-pass)")


def main():
    lane = None

    def mk_lane(z):
        return jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)

    run_variant("copy+mod", lambda z: (z + 0.318) % 1.0)
    run_variant("copy only", lambda z: z + 0.318)

    def fma5(z):
        acc = 0.1 * z
        for c in (0.2, 0.3, 0.4, 0.5):
            acc = acc + c * z
        return (acc + 0.318) % 1.0
    run_variant("5fma+mod", fma5)

    def rolls4(z):
        acc = 0.1 * z
        for k, c in ((1, 0.2), (2, 0.3), (126, 0.4), (127, 0.5)):
            acc = acc + c * pltpu.roll(z, k, axis=1)
        return (acc + 0.318) % 1.0
    run_variant("4roll+5fma+mod", rolls4)

    def rollsel4(z):
        ln = mk_lane(z)
        acc = 0.1 * z
        for k, c in ((1, 0.2), (2, 0.3), (126, 0.4), (127, 0.5)):
            r = pltpu.roll(z, k, axis=1)
            acc = acc + c * jnp.where(ln < k, r, r)
        return (acc + 0.318) % 1.0
    run_variant("4(roll+sel)+5fma+mod", rollsel4)

    def sublane4(z):
        acc = 0.1 * z
        for k, c in ((1, 0.2), (2, 0.3), (6, 0.4), (7, 0.5)):
            acc = acc + c * pltpu.roll(z, k, axis=0)
        return (acc + 0.318) % 1.0
    run_variant("4subroll+5fma+mod", sublane4)


if __name__ == "__main__":
    main()
