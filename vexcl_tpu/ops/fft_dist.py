"""Distributed single large 1-D FFT over the device mesh (four-step).

The reference's FFT is explicitly single-device (fft/plan.hpp:218-220
throws for multi-device contexts).  On a TPU mesh the classic four-step
decomposition maps naturally onto ICI collectives, so a mesh-sharded
vector transforms WITHOUT ever gathering the signal on one device:

    n = n1*n2, x[j] = x[j1*n2 + j2] viewed as the (n1, n2) cube:
      X[k1 + n1*k2] = sum_{j2} W_n^{j2 k1} W_{n2}^{j2 k2}
                        * [ sum_{j1} x[j1, j2] W_{n1}^{j1 k1} ]

    step 1  all_to_all   row-shard -> column-shard  (transpose)
    step 2  local FFT    length n1 over the resident axis (MXU stages)
    step 3  twiddle      W_n^{j2 k1}, built in-trace from iota
    step 4  all_to_all   column-shard -> k1-shard    (transpose)
    step 5  local FFT    length n2
    step 6  all_to_all   k1-shard -> natural-order block shard

Each all_to_all moves n/D elements per device per plane over ICI — the
textbook communication volume for a distributed transpose; every compute
stage is the library's planar MXU engine (ops/fft.py).  SPMD-compiling
``jnp.fft.fft`` over a sharded array instead all-gathers the WHOLE
signal onto every device (D x the memory and DCN-class traffic).

Activated automatically by ``vex.FFT`` for 1-D transforms of sharded
vectors when the geometry allows (n divisible by D^2 with smooth
factors); ``VEXTPU_FFT_DIST=0`` disables.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

import sys

# the ops package rebinds its `fft` attribute to the fft() function,
# so import the engine module through sys.modules
from . import fft as _fft_name  # noqa: F401  (ensures the module is loaded)
_fft = sys.modules["vexcl_tpu.ops.fft"]


def split_1d(n: int, d: int) -> Optional[Tuple[int, int]]:
    """Balanced n = n1*n2 with d | n1, d | n2 and both factors smooth
    (every prime <= the codelet family); None when no such split exists."""
    if d < 2 or n % (d * d) != 0:
        return None
    m = n // (d * d)
    best = None
    a = 1
    while a * a <= m:
        if m % a == 0:
            for aa in (a, m // a):
                n1 = d * aa
                n2 = n // n1
                if (max(_fft.prime_factors(n1), default=1) <= _fft._MAX_CODELET
                        and max(_fft.prime_factors(n2),
                                default=1) <= _fft._MAX_CODELET):
                    score = abs(n1 - n2)
                    if best is None or score < best[0]:
                        best = (score, n1, n2)
        a += 1
    return (best[1], best[2]) if best else None


def _twiddle_chunk(n: int, n1: int, l2: int, dev, sign: float, dtype):
    """W_n^{j2*k1} planes for the LOCAL j2 chunk (l2 rows starting at
    dev*l2), k1 along the minor axis — iota-built, no host constants."""
    j2 = (dev * l2
          + jax.lax.broadcasted_iota(jnp.int32, (l2, n1), 0))
    k1 = jax.lax.broadcasted_iota(jnp.int32, (l2, n1), 1)
    # j2*k1 < n2*n1 = n: exact in i32 for n < 2^31, exact in f32 below
    # 2^24 (same caveat as fft._twiddle_planar above that)
    frac = (j2 * k1).astype(dtype) * (1.0 / n)
    c, s = _fft._sincos_2pi(frac)
    return c, (s if sign > 0 else -s)


def _make_a2a(axis: str):
    """Distributed-transpose step: split the minor axis into D tiles
    (tile i -> device i along ``axis``), stack received tiles along the
    major axis in source order."""

    def a2a(t):
        return jax.lax.all_to_all(t, axis, split_axis=1, concat_axis=0,
                                  tiled=True)

    return a2a


def make_distributed_1d(n: int, mesh, axis: str, sign: float,
                        real_dtype) -> Optional[object]:
    """shard_map four-step FFT: planar (re, im) global arrays sharded as
    P(axis) -> planar result in natural order, same sharding.  None when
    the geometry does not decompose."""
    d = int(mesh.shape[axis])
    split = split_1d(n, d)
    if split is None:
        return None
    n1, n2 = split
    l1, l2 = n1 // d, n2 // d
    plan1 = _fft._radix_plan(n1, _fft._MAX_CODELET)
    plan2 = _fft._radix_plan(n2, _fft._MAX_CODELET)
    rdt = np.dtype(real_dtype)
    a2a = _make_a2a(axis)

    def local(xr, xi):
        # resident block: rows j1 in [dev*l1, (dev+1)*l1), all j2
        xr = xr.reshape(l1, n2)
        xi = xi.reshape(l1, n2)
        xr, xi = a2a(xr), a2a(xi)            # (n1, l2): all j1, local j2
        xr, xi = xr.T, xi.T                  # (l2, n1)
        xr, xi = _fft._fft_planar(xr, xi, sign, plan1)   # over k1
        dev = jax.lax.axis_index(axis)
        c, s = _twiddle_chunk(n, n1, l2, dev, sign, rdt)
        xr, xi = xr * c - xi * s, xr * s + xi * c
        xr, xi = a2a(xr), a2a(xi)            # (n2, l1): all j2, local k1
        xr, xi = xr.T, xi.T                  # (l1, n2)
        xr, xi = _fft._fft_planar(xr, xi, sign, plan2)   # over k2
        # natural order: X[k1 + n1*k2] -> k2-major blocks of n/D
        xr, xi = a2a(xr), a2a(xi)            # (n1, l2): all k1, local k2
        return xr.T.reshape(-1), xi.T.reshape(-1)

    return jax.shard_map(local, mesh=mesh, in_specs=(P(axis), P(axis)),
                     out_specs=(P(axis), P(axis)))


def splittable_2d(r: int, c: int, d: int) -> bool:
    """Full 2-D transform decomposes when both extents divide by D and
    are smooth (row blocks stay rectangular under the flat block shard)."""
    return (
        d > 1 and r % d == 0 and c % d == 0
        and max(_fft.prime_factors(r), default=1) <= _fft._MAX_CODELET
        and max(_fft.prime_factors(c), default=1) <= _fft._MAX_CODELET
    )


def make_distributed_2d(r: int, c: int, mesh, axis: str, sign: float,
                        real_dtype) -> Optional[object]:
    """shard_map 2-D FFT: the transform is separable, so it is two local
    batched stage sets around two all_to_all transposes — NO twiddle
    step (unlike the 1-D four-step).  Input/output: flat row-major
    planar arrays sharded as P(axis) (row blocks)."""
    d = int(mesh.shape[axis])
    if not splittable_2d(r, c, d):
        return None
    plan_r = _fft._radix_plan(r, _fft._MAX_CODELET)
    plan_c = _fft._radix_plan(c, _fft._MAX_CODELET)
    a2a = _make_a2a(axis)

    def local(xr, xi):
        xr = xr.reshape(r // d, c)
        xi = xi.reshape(r // d, c)
        xr, xi = _fft._fft_planar(xr, xi, sign, plan_c)  # rows, local
        xr, xi = a2a(xr), a2a(xi)                        # (r, c/d)
        xr, xi = xr.T, xi.T                              # (c/d, r)
        xr, xi = _fft._fft_planar(xr, xi, sign, plan_r)  # cols, local
        xr, xi = a2a(xr), a2a(xi)                        # (c, r/d)
        return (xr.T.reshape(-1), xi.T.reshape(-1))      # (r/d, c) flat

    return jax.shard_map(local, mesh=mesh, in_specs=(P(axis), P(axis)),
                     out_specs=(P(axis), P(axis)))
