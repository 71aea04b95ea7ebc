"""Decompose the rbk assembly cost (exp/rbk_measure.py showed 29.8 ms for
M=262K — the compact kernel itself is 1.57 ms).  Suspects: searchsorted's
binary-search gathers, the big-table takes, the tiny-table take."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import slope_seconds

N = 1 << 24
M = 1 << 18
NB = 512


def report(name, t):
    print(f"{name:40s} {M/t/1e6:9.1f} Melem/s ({t*1e3:.3f} ms)", flush=True)


def main():
    rng = np.random.default_rng(0)
    offs = jnp.asarray(np.arange(NB, dtype=np.float32) * (M / NB))
    big = jnp.asarray(rng.random(N, dtype=np.float32))
    asc = jnp.asarray(np.sort(rng.integers(0, N, M)).astype(np.int32))
    v0 = jnp.asarray(rng.random(M, dtype=np.float32))

    def chain(out, v):
        return (v + out * 1e-7) % 1.0

    # searchsorted over the tiny offsets table
    def s1(v, offs_):
        j = jnp.arange(M, dtype=jnp.float32) + v[0] * 0
        b = jnp.searchsorted(offs_, j, side="right") - 1
        return chain(b.astype(jnp.float32), v)

    report("searchsorted 512-table x M", slope_seconds(s1, v0, lo=8, hi=48, extra=(offs,)))

    # compare-reduce alternative: b = sum(j >= offs) - 1
    def s2(v, offs_):
        j = jnp.arange(M, dtype=jnp.float32) + v[0] * 0
        b = jnp.sum((j[:, None] >= offs_[None, :]).astype(jnp.float32),
                    axis=1) - 1.0
        return chain(b, v)

    report("compare-reduce 512 x M", slope_seconds(s2, v0, lo=8, hi=48, extra=(offs,)))

    # tiny-table take
    bidx = jnp.asarray(rng.integers(0, NB, M).astype(np.int32))

    def s3(v, offs_, b):
        return chain(jnp.take(offs_, b + (v[0]*0).astype(b.dtype), axis=0), v)

    report("take 512-table x M", slope_seconds(s3, v0, lo=8, hi=48, extra=(offs, bidx)))

    # big-table take, ascending indices
    def s4(v, big_, idx):
        return chain(jnp.take(big_, idx + (v[0]*0).astype(idx.dtype), axis=0), v)

    report("take 16M-table x M ascending", slope_seconds(s4, v0, lo=8, hi=48, extra=(big, asc)))

    rnd = jnp.asarray(rng.integers(0, N, M).astype(np.int32))
    report("take 16M-table x M random", slope_seconds(s4, v0, lo=8, hi=48, extra=(big, rnd)))

    # one-hot matmul gather from tiny table: onehot(b, NB) @ offs
    def s5(v, offs_, b):
        bb = b + (v[0] * 0).astype(b.dtype)
        oh = jax.nn.one_hot(bb, NB, dtype=jnp.bfloat16)
        val = oh @ offs_.astype(jnp.bfloat16)
        return chain(val.astype(jnp.float32), v)

    report("one-hot matmul 512-table x M", slope_seconds(s5, v0, lo=8, hi=48, extra=(offs, bidx)))


if __name__ == "__main__":
    main()
