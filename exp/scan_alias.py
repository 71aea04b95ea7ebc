#!/usr/bin/env python
"""Does input_output_aliases lift the Pallas scan like it lifted the
stencil (325 -> 650 GB/s aggregate)?  Compare pallas_cumsum as-is vs an
aliased variant on the real TPU."""
import os
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import slope_seconds  # noqa: E402
from vexcl_tpu.ops.pallas_scan import (  # noqa: E402
    BLOCK_R, LANE, BLOCK, _scan_kernel, pallas_cumsum,
)

N = 1 << 24


def cumsum_aliased(x):
    n = x.shape[0]
    nblocks = n // BLOCK
    x2 = x.reshape(nblocks * BLOCK_R, LANE)
    out = pl.pallas_call(
        partial(_scan_kernel, acc_dtype=jnp.float32, post=lambda v: v),
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((BLOCK_R, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLOCK_R, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks * BLOCK_R, LANE), x.dtype),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        input_output_aliases={0: 0},
    )(x2)
    return out.reshape(n)


def main():
    x0 = jnp.ones(N, jnp.float32) * 1e-6

    for name, fn in [("current", lambda v: pallas_cumsum(v) * 1e-7),
                     ("aliased", lambda v: cumsum_aliased(v) * 1e-7)]:
        t = slope_seconds(fn, x0, lo=16, hi=64)
        print(f"{name}: {N / t / 1e9:.2f} Gelem/s")


if __name__ == "__main__":
    main()
