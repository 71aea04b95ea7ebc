"""Philox throughput probe (VERDICT r2 item 7).

Measured r1: philox 18.6 Grand/s vs threefry 51.3.  Op-count model:
philox round = 2 mulhilo (~16 u32 ops each incl. 4 multiplies) + mixing,
x10 rounds ~ 90 ops/output-word; threefry ~ 50/word — if all u32 ops cost
the same the gap should be ~2x, measured 2.75x, suggesting u32 MULTIPLY
costs more than add/shift on the VPU.  This probe:
  1. raw op costs: chained u32 add / shift / multiply / f32 multiply
  2. mulhilo variants: current vs Karatsuba-3-mul (constant operand
     S=Ahi+Alo fits 16 bits for both Philox multipliers) vs no-carry
     (WRONG results, bounds the carry chain's cost)
All interleaved in one process (docs/benchmarking.md rule 8).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import slope_seconds

N = 1 << 24
_u32 = jnp.uint32


def report(name, t, words=1):
    print(f"{name:34s} {N*words/t/1e9:8.2f} G/s ({t*1e3:.2f} ms)", flush=True)


def main():
    x0 = jnp.arange(N, dtype=_u32)

    # -- 1. raw op costs (64 chained ops of each kind per link) ----------
    def chain(op):
        def step(v):
            for _ in range(64):
                v = op(v)
            return v
        return step

    t_add = slope_seconds(chain(lambda v: v + np.uint32(0x9E3779B9)),
                          x0, lo=16, hi=96)
    report("64x u32 add", t_add, 64)
    t_shift = slope_seconds(chain(lambda v: (v >> 16) | (v << 16)),
                            x0, lo=16, hi=96)
    report("64x u32 rot(shift+or)", t_shift, 64)
    t_mul = slope_seconds(chain(lambda v: v * np.uint32(0xD2511F53)),
                          x0, lo=16, hi=96)
    report("64x u32 mul", t_mul, 64)
    t_xor = slope_seconds(chain(lambda v: v ^ np.uint32(0x85EBCA6B)),
                          x0, lo=16, hi=96)
    report("64x u32 xor", t_xor, 64)

    # -- 2. philox variants ---------------------------------------------
    from vexcl_tpu.ops.random import philox4x32

    def stepA(idx):
        z = jnp.zeros_like(idx)
        return philox4x32(idx, z, z, z, np.uint32(42), np.uint32(0))[0]

    tA = slope_seconds(stepA, x0, lo=16, hi=96)
    report("philox current (per ctr)", tA)

    # Karatsuba mulhilo: 3 muls (t, H, P) using S = Ahi+Alo < 2^16
    def mulhilo_k(Av, b):
        A = int(Av)
        Ahi, Alo = A >> 16, A & 0xFFFF
        S = np.uint32(Ahi + Alo)
        bhi, blo = b >> 16, b & 0xFFFF
        t = np.uint32(Alo) * blo
        H = np.uint32(Ahi) * bhi
        bs = bhi + blo                       # <= 2^17-2
        P = S * bs                           # mod 2^32; may wrap once
        ov = (bs > np.uint32((0xFFFFFFFF) // int(S))).astype(_u32)
        m12 = P - H - t                      # m1+m2 mod 2^32
        # carry into bit 32 of lo-sum: ((m12 & 0xffff) ... needs m1,m2
        # split; with only the SUM we use the 33-bit value m12 + ov<<32:
        # hi = H + (m12_full + (t >> 16)) >> 16 where m12_full has 33 bits
        lo = Av * b
        s = (m12 & np.uint32(0xFFFF)) + (t >> 16)
        hi = H + (m12 >> 16) + (ov << np.uint32(16)) + (s >> 16)
        return hi, lo

    M0, M1 = np.uint32(0xD2511F53), np.uint32(0xCD9E8D57)
    W0, W1 = np.uint32(0x9E3779B9), np.uint32(0xBB67AE85)

    def philox_k(c0, c1, c2, c3, k0, k1):
        k0 = jnp.asarray(k0, _u32); k1 = jnp.asarray(k1, _u32)
        for _ in range(10):
            hi0, lo0 = mulhilo_k(M0, c0)
            hi1, lo1 = mulhilo_k(M1, c2)
            c0, c1, c2, c3 = hi1 ^ c1 ^ k0, lo1, hi0 ^ c3 ^ k1, lo0
            k0 = k0 + W0; k1 = k1 + W1
        return c0, c1, c2, c3

    # correctness vs current first
    z = jnp.zeros(1024, _u32)
    idx = jnp.arange(1024, dtype=_u32)
    ref = jax.jit(lambda i: philox4x32(i, z, z, z, np.uint32(42), np.uint32(0)))(idx)
    got = jax.jit(lambda i: philox_k(i, z, z, z, np.uint32(42), np.uint32(0)))(idx)
    same = all(bool(jnp.array_equal(a, b)) for a, b in zip(ref, got))
    print("karatsuba bit-exact:", same, flush=True)

    def stepK(idx):
        zz = jnp.zeros_like(idx)
        return philox_k(idx, zz, zz, zz, np.uint32(42), np.uint32(0))[0]

    tK = slope_seconds(stepK, x0, lo=16, hi=96)
    report("philox karatsuba", tK)

    # no-carry (WRONG, bounds the carry-chain cost)
    def mulhilo_nc(Av, b):
        A = int(Av)
        Ahi, Alo = np.uint32(A >> 16), np.uint32(A & 0xFFFF)
        bhi, blo = b >> 16, b & 0xFFFF
        return Ahi * bhi + ((Ahi * blo) >> 16) + ((Alo * bhi) >> 16), Av * b

    def philox_nc(c0, c1, c2, c3, k0, k1):
        k0 = jnp.asarray(k0, _u32); k1 = jnp.asarray(k1, _u32)
        for _ in range(10):
            hi0, lo0 = mulhilo_nc(M0, c0)
            hi1, lo1 = mulhilo_nc(M1, c2)
            c0, c1, c2, c3 = hi1 ^ c1 ^ k0, lo1, hi0 ^ c3 ^ k1, lo0
            k0 = k0 + W0; k1 = k1 + W1
        return c0, c1, c2, c3

    def stepNC(idx):
        zz = jnp.zeros_like(idx)
        return philox_nc(idx, zz, zz, zz, np.uint32(42), np.uint32(0))[0]

    tNC = slope_seconds(stepNC, x0, lo=16, hi=96)
    report("philox NO-carry (lower bound)", tNC)


if __name__ == "__main__":
    main()
