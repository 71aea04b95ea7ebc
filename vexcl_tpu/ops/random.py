"""Counter-based RNG: Philox4x32-10 and Threefry2x32-20 as stateless
expression terminals.

Analog of vexcl/random.hpp:62-157 (Random / RandomNormal) and the
Random123 ports (vexcl/random/philox.hpp:50-187, threefry.hpp).

The reference generates the generator body as device source; here the
rounds are expressed in vectorized uint32 jnp ops (VPU-friendly: shifts,
xors, 16x16 partial-product multiplies), traced into the fused expression
kernel.  Usage mirrors the reference::

    rnd = vex.Random(np.float64, "philox")
    x[:] = rnd(vex.element_index(), seed)

A third generator, "pltpu", uses the TPU's hardware PRNG via a Pallas
kernel for maximum throughput (not bit-compatible with Random123).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..expr.node import Expr, FuncCall, as_expr
from ..types import dtype_of

__all__ = ["Random", "RandomNormal", "philox4x32", "threefry2x32"]

_u32 = jnp.uint32


def _mulhilo(a, b):
    """32x32 -> (hi, lo) in pure uint32 (TPU has no u64 without x64)."""
    a = a.astype(_u32)
    b = b.astype(_u32)
    lo = a * b
    ahi, alo = a >> 16, a & 0xFFFF
    bhi, blo = b >> 16, b & 0xFFFF
    m1 = ahi * blo
    m2 = alo * bhi
    t = alo * blo
    carry = ((t >> 16) + (m1 & 0xFFFF) + (m2 & 0xFFFF)) >> 16
    hi = ahi * bhi + (m1 >> 16) + (m2 >> 16) + carry
    return hi, lo


_PHILOX_M0 = np.uint32(0xD2511F53)
_PHILOX_M1 = np.uint32(0xCD9E8D57)
_PHILOX_W0 = np.uint32(0x9E3779B9)
_PHILOX_W1 = np.uint32(0xBB67AE85)


def philox4x32(c0, c1, c2, c3, k0, k1, rounds: int = 10):
    """Philox4x32 (random/philox.hpp:50-187): returns 4 u32 streams."""
    c0, c1, c2, c3 = (x.astype(_u32) for x in (c0, c1, c2, c3))
    k0 = jnp.asarray(k0, _u32)
    k1 = jnp.asarray(k1, _u32)
    for _ in range(rounds):
        hi0, lo0 = _mulhilo(_PHILOX_M0, c0)
        hi1, lo1 = _mulhilo(_PHILOX_M1, c2)
        c0, c1, c2, c3 = (
            hi1 ^ c1 ^ k0,
            lo1,
            hi0 ^ c3 ^ k1,
            lo0,
        )
        k0 = k0 + _PHILOX_W0
        k1 = k1 + _PHILOX_W1
    return c0, c1, c2, c3


_THREEFRY_ROT = (13, 15, 26, 6, 17, 29, 16, 24)
_THREEFRY_PARITY = np.uint32(0x1BD11BDA)


def _rotl(x, d):
    return (x << np.uint32(d)) | (x >> np.uint32(32 - d))


def threefry2x32(c0, c1, k0, k1, rounds: int = 20):
    """Threefry2x32 (random/threefry.hpp): returns 2 u32 streams."""
    x0 = c0.astype(_u32) + jnp.asarray(k0, _u32)
    x1 = c1.astype(_u32) + jnp.asarray(k1, _u32)
    ks = (jnp.asarray(k0, _u32), jnp.asarray(k1, _u32),
          jnp.asarray(k0, _u32) ^ jnp.asarray(k1, _u32) ^ _THREEFRY_PARITY)
    for r in range(rounds):
        x0 = x0 + x1
        x1 = _rotl(x1, _THREEFRY_ROT[r % 8])
        x1 = x1 ^ x0
        if (r + 1) % 4 == 0:
            j = (r + 1) // 4
            x0 = x0 + ks[j % 3]
            x1 = x1 + ks[(j + 1) % 3] + np.uint32(j)
    return x0, x1


def _uniform_from_bits(bits, dtype):
    """Map u32 words to uniform [0,1) of the requested float dtype."""
    dtype = np.dtype(dtype)
    if dtype == np.float64:
        hi, lo = bits[0], bits[1]
        val = (hi >> 5).astype(jnp.float64) * float(1 << 26) + (
            lo >> 6
        ).astype(jnp.float64)
        return val * (1.0 / (1 << 53))
    if dtype == np.float32 or dtype == np.dtype(jnp.bfloat16) or dtype == np.float16:
        return ((bits[0] >> 8).astype(jnp.float32) * (1.0 / (1 << 24))).astype(dtype)
    # integer outputs: raw bits
    return bits[0].astype(dtype)


def _normal_from_uniform(u1, u2, dtype):
    """Box-Muller (random.hpp RandomNormal :159-)."""
    eps = jnp.finfo(jnp.float32).tiny
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, eps)))
    theta = 2.0 * np.pi * u2
    return (r * jnp.cos(theta)).astype(dtype)


def _pltpu_uniform_bits(n: int, seed):
    """Uniform u32 stream from the TPU's hardware PRNG (Pallas kernel).

    Deterministic per (seed, n) but NOT a counter-based Random123 stream:
    the index expression only supplies the length.  Use for maximum
    throughput when bit-compatibility with the reference doesn't matter.
    """
    import functools

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..config import config

    LANE, BR = 128, 2048
    block = BR * LANE
    nblocks = max(1, -(-n // block))

    def kern(seed_ref, o_ref):
        i = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + i)
        o_ref[...] = pltpu.bitcast(
            pltpu.prng_random_bits((BR, LANE)), jnp.uint32
        )

    out = pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((BR, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks * BR, LANE), jnp.uint32),
        interpret=config.pallas_interpret(),
    )(jnp.asarray(seed, jnp.int32).reshape(1))
    return out.reshape(-1)[:n]


class _CBRNG:
    """Callable generator object usable inside expressions."""

    def __init__(self, dtype, generator: str, normal: bool):
        self.dtype = dtype_of(dtype)
        self.generator = generator
        self.normal = normal
        self.name = f"{'randn' if normal else 'rand'}_{generator}_{self.dtype}"

    def _bits(self, idx, seed):
        idx = idx.astype(_u32)
        # second word decorrelates streams with the same low 32 bits
        hi = (idx.astype(jnp.int64) >> 32).astype(_u32) if idx.dtype == jnp.int64 else jnp.zeros_like(idx)
        seed = jnp.asarray(seed)
        s0 = seed.astype(_u32)
        s1 = (seed.astype(jnp.int64) >> 32).astype(_u32) if seed.dtype in (jnp.int64, jnp.uint64) else jnp.zeros((), _u32)
        if self.generator == "philox":
            return philox4x32(idx, hi, jnp.zeros_like(idx), jnp.zeros_like(idx), s0, s1)
        if self.generator == "threefry":
            b0, b1 = threefry2x32(idx, hi, s0, s1)
            b2, b3 = threefry2x32(idx ^ np.uint32(0xDEADBEEF), hi, s0, s1)
            return b0, b1, b2, b3
        if self.generator in ("pltpu", "hw"):
            from ..config import config

            n = idx.shape[0]
            if config.pallas_interpret():
                # CPU fallback: philox (hardware PRNG needs a TPU)
                return philox4x32(idx, hi, jnp.zeros_like(idx),
                                  jnp.zeros_like(idx), s0, s1)
            b0 = _pltpu_uniform_bits(n, s0)
            b1 = _pltpu_uniform_bits(n, s0 ^ np.uint32(0x85EBCA6B))
            b2 = _pltpu_uniform_bits(n, s0 ^ np.uint32(0xC2B2AE35))
            b3 = _pltpu_uniform_bits(n, s0 ^ np.uint32(0x27D4EB2F))
            return b0, b1, b2, b3
        raise ValueError(f"unknown generator {self.generator!r}")

    def _impl(self, idx, seed):
        bits = self._bits(idx, seed)
        if not self.normal:
            return _uniform_from_bits(bits, self.dtype)
        if self.dtype == np.float64:
            u1 = _uniform_from_bits((bits[0], bits[1]), np.float64)
            u2 = _uniform_from_bits((bits[2], bits[3]), np.float64)
        else:
            u1 = _uniform_from_bits((bits[0],), np.float32)
            u2 = _uniform_from_bits((bits[1],), np.float32)
        return _normal_from_uniform(u1, u2, self.dtype)

    def __call__(self, idx: Any, seed: Any = 0) -> Expr:
        return FuncCall(self.name, self._impl, [as_expr(idx), as_expr(seed)])


def Random(dtype=np.float32, generator: str = "philox") -> _CBRNG:
    """Uniform [0,1) counter-based generator terminal (random.hpp:62-157)."""
    return _CBRNG(dtype, generator, normal=False)


def RandomNormal(dtype=np.float32, generator: str = "philox") -> _CBRNG:
    """Standard-normal generator terminal via Box-Muller."""
    return _CBRNG(dtype, generator, normal=True)
