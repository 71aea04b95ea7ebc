"""Prototype: Pallas in-VMEM bitonic block sort (VERDICT r2 item 5).

docs/tpu_kernel_notes.md ("Why sort stays on XLA") *argues* a Pallas sort
loses; the VERDICT asks for a measured prototype either way.  This is the
dominant-cost building block of any Pallas mergesort on TPU: a bitonic
sort of each (BLOCK_R*128)-element block entirely in VMEM (roll+select
compare-exchange, no scatter).  The full-sort projection from it:

    T_full ~ T_presort + (log2(nb)*(log2(nb)+1)/2) cross-block
             elementwise passes at streaming bandwidth
             + log2(nb) in-VMEM merge passes (~log2(B) stages each)

Compare-exchange pairing is XOR (p ^ d): within lanes, lane^d = lane+d
when bit_j(lane)=0 else lane-d — both available from two circular lane
rolls; rows likewise with sublane rolls.  f32 keys (an i32 in-kernel
compare path costs 100x Mosaic compile time — segscan bisection).

Run on TPU: python exp/pallas_bitonic_proto.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128
BLOCK_R = 128    # 16K elements/block -> 14*15/2 = 105 stages


def _partner(x, j: int, R: int):
    """x[p ^ 2^j] for flat row-major (R, LANE) blocks."""
    from jax.experimental.pallas import tpu as pltpu

    d = 1 << j
    if d < LANE:
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
        fwd = pltpu.roll(x, LANE - d, axis=1)   # lane + d (mod 128)
        bwd = pltpu.roll(x, d, axis=1)          # lane - d (mod 128)
        return jnp.where((lane & d) == 0, fwd, bwd)
    q = d // LANE
    row = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 0)
    fwd = pltpu.roll(x, R - q, axis=0)
    bwd = pltpu.roll(x, q, axis=0)
    return jnp.where((row & q) == 0, fwd, bwd)


def _bitonic_kernel(x_ref, o_ref):
    R = x_ref.shape[0]
    v = x_ref[...]
    flat = (jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 0) * LANE
            + jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1))
    n = R * LANE
    nbits = int(np.log2(n))
    for k in range(1, nbits + 1):
        for j in range(k - 1, -1, -1):
            d = 1 << j
            p = _partner(v, j, R)
            # ascending iff bit k of flat index is 0; keep the low element
            # when we are the low index of the pair (bit j unset)
            up = (flat & (1 << k)) == 0 if k < nbits else jnp.full(
                (R, LANE), True)
            low = (flat & d) == 0
            lo, hi = jnp.minimum(v, p), jnp.maximum(v, p)
            v = jnp.where(up == low, lo, hi)
    o_ref[...] = v


def block_bitonic_sort(x: jnp.ndarray):
    """Sort each BLOCK_R*128 block of flat f32 x independently."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    BLOCK = BLOCK_R * LANE
    nblocks = n // BLOCK
    x2 = x.reshape(nblocks * BLOCK_R, LANE)
    out = pl.pallas_call(
        _bitonic_kernel,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((BLOCK_R, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLOCK_R, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks * BLOCK_R, LANE),
                                       jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(x2)
    return out.reshape(n)


def main():
    from bench import slope_seconds

    N = 1 << 24
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random(N, dtype=np.float32))

    # correctness on one block first (cheap compile canary + oracle)
    t0 = time.time()
    small = jnp.asarray(rng.random(BLOCK_R * LANE, dtype=np.float32))
    got = np.asarray(jax.jit(block_bitonic_sort)(small))
    print(f"compile+run 1 block: {time.time()-t0:.0f}s "
          f"sorted={bool(np.all(np.diff(got)>=0))}", flush=True)

    t0 = time.time()
    step = lambda v: block_bitonic_sort((v * 1.0000001) % 1.0)
    jax.jit(step)(x0)[0].block_until_ready()
    print(f"compile 16M: {time.time()-t0:.0f}s", flush=True)

    t = slope_seconds(step, x0, lo=4, hi=24)
    print(f"block presort 16M: {N/t/1e6:.0f} Melem/s ({t*1e3:.2f} ms)",
          flush=True)

    # XLA full-sort reference in the same process
    def xstep(k):
        return jax.lax.sort((k * 1.0000001) % 1.0)

    t2 = slope_seconds(xstep, x0, lo=4, hi=24)
    print(f"XLA full sort 16M:  {N/t2/1e6:.0f} Mkeys/s ({t2*1e3:.2f} ms)",
          flush=True)

    nb = N // (BLOCK_R * LANE)
    lb = int(np.log2(nb))
    cross = lb * (lb + 1) // 2
    # projection: cross-block passes at the measured r+w streaming rate
    pass_t = 2 * N * 4 / 400e9
    proj = t + cross * pass_t + lb * t  # merge tails ~ a presort each
    print(f"projection full Pallas sort: {N/proj/1e6:.0f} Mkeys/s "
          f"({cross} cross passes + {lb} merge passes)", flush=True)


if __name__ == "__main__":
    main()
