"""FFT: mixed-radix Cooley-Tukey with matmul codelets + Bluestein.

Analog of vexcl/fft/* (FFT terminal fft.hpp:40-, planner plan.hpp:112-145,
prime_factors :81, radix codelets kernels.hpp:213 / unrolled_dft.hpp,
Bluestein :344-520).

TPU-native design: the radix-codelet butterflies of the reference become
small dense DFT matrices applied as *batched complex matmuls* — exactly
what the MXU is built for — glued by the Cooley-Tukey reshape/twiddle
recursion (all static shapes, fully traced).  Arbitrary (prime) sizes use
Bluestein's chirp-z through a padded power-of-two convolution, like the
reference.  Unlike the reference (single-device only, fft/plan.hpp:218-220)
batched transforms shard over the mesh on the batch axis.

    f = vex.FFT(n)                      # 1-D complex, forward
    y[:] = f(x)                         # expression terminal
    fi = vex.FFT(n, inverse=True)       # scaled by 1/n like the reference
    f2 = vex.FFT((rows, cols))          # 2-D
    fb = vex.FFT((batch, n), dims=(1,)) # batched 1-D (fft::none analog)
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..cache import ObjectCache
from ..expr.node import EmitEnv, Expr, as_expr

__all__ = ["FFT", "fft", "ifft", "prime_factors", "plan_cache"]

#: largest direct-DFT codelet (reference: radix 2-11 unrolled codelets;
#: the MXU contracts 128-deep natively, so radix-128 codelets are
#: full-rate matmul stages — 32 was the r1 choice and measured 2.4x off
#: the XLA engine).  Measured on v5e at 2^20 c64 (exp/fft_engine_sweep):
#: plan [128,128,64] + X6 = 690-734 GFLOP/s at complex rel err 1.39e-7 —
#: faster AND more accurate than the XLA FFT engine (487-966 drift-span,
#: err 4.2e-7); smaller radixes lose a full stage of bandwidth for no
#: accuracy need.  Cap 256 (two chained full-rate MXU passes per stage,
#: same MXU work as two radix-128 stages but one fewer full-array HBM
#: pass) keeps plans <= 3 stages through 2^24 and leaves all plans
#: <= 2^21 unchanged; measured (exp/fft_radix256) it doubles the engine
#: at 2^22/2^23/2^24 at BETTER err ~1.26e-7.  With the one-pass stage
#: form (exp/fft_blockstage) the engine lands at 583-707/443-453/
#: 338-353 GF/s there (from 160/197/173) vs XLA's 610-695/524-532/
#: 437-454 (exp/fft_window2, interleaved) — XLA keeps a 5-25% lead
#: >= 2^21, so the auto-route window below stays 2^17..2^20.
_MAX_CODELET = int(__import__("os").environ.get("VEXTPU_FFT_RADIX", "256"))


def _dot_alg(dtype=np.float32):
    """Matmul algorithm for the DFT stages, per operand REAL dtype.

    f32 on TPU: BF16_BF16_F32_X6 — 6 bf16 passes reproducing f32 accuracy
    (what Precision.HIGHEST uses) but expressed as an explicit algorithm
    so the twiddle/codelet matmuls stay on the native bf16 MXU path;
    measured 2^20 c64 complex rel err 1.39e-7 on v5e.  Set
    VEXTPU_FFT_X3=1 for the 3-pass variant: measured ~2.4e-5 rel err
    (dropped lo*lo term), up to several x faster — for bf16-tolerant
    pipelines only.  X9 is NOT supported by the v5e libtpu (AOT:
    "ALG_DOT_BF16_BF16_F32_X9 is not supported").

    f64 (c128 plans under x64) and CPU: Precision.HIGHEST — the bf16
    presets only accept f32 operands and would SILENTLY downcast f64 to
    f32 accuracy (~5e-7 rel err instead of ~1e-15; code-review r2
    finding, reproduced)."""
    import os

    if np.dtype(dtype) != np.float32 or jax.default_backend() == "cpu":
        return jax.lax.Precision.HIGHEST
    if os.environ.get("VEXTPU_FFT_X3") == "1":
        return jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3
    return jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X6

plan_cache = ObjectCache("fft_plans")


def prime_factors(n: int) -> Tuple[int, ...]:
    """fft/plan.hpp prime_factors :81."""
    out = []
    d = 2
    while d * d <= n:
        while n % d == 0:
            out.append(d)
            n //= d
        d += 1
    if n > 1:
        out.append(n)
    return tuple(out)


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


@lru_cache(maxsize=None)
def _radix_plan(n: int, maxc: int) -> Tuple[int, ...]:
    """Balanced stage plan: pack n's prime factors into the fewest groups
    each <= maxc, sizes as equal as the factorization allows (planner
    policy of fft/plan.hpp:112-145, re-targeted at MXU stage shapes).
    Greedy largest-radix-first left degenerate tails (2^20 at maxc=64 ->
    [64,64,64,4], a contract-4 matmul stage); packing gives [32]*4."""
    primes = sorted(prime_factors(n), reverse=True)
    if primes and primes[0] > maxc:
        raise ValueError(f"{n} has a prime factor > {maxc}")
    k = 1
    while True:
        groups = [1] * k
        for p in primes:
            groups.sort()
            if groups[0] * p <= maxc:
                groups[0] *= p
            else:
                break
        else:
            return tuple(sorted(groups, reverse=True))
        k += 1


@lru_cache(maxsize=None)
def _codelet_planar_np(n: int, sign: float, real_dtype: str):
    """DFT_n as (re, im) f32/f64 planes (planar split-complex)."""
    k = np.arange(n)
    w = np.exp(sign * 2j * np.pi * np.outer(k, k) / n)
    return (w.real.astype(real_dtype).copy(),
            w.imag.astype(real_dtype).copy())


_OCT_C = np.cos(np.arange(8) * np.pi / 4)
_OCT_S = np.sin(np.arange(8) * np.pi / 4)


def _sincos_2pi(frac: jnp.ndarray):
    """(cos, sin) of 2*pi*frac for frac in [0, 1), octant-reduced.

    A plain f32 ``cos(2*pi*frac)`` quantizes the ANGLE at ~1e-7*|angle|
    (up to 7.5e-7 rad near 2*pi), which alone exceeded the 3e-7 FFT
    accuracy budget.  Reducing to the octant keeps |angle| <= pi/4 so the
    quantization shrinks ~8x; the octant rotation constants are exact or
    1-ulp (0, +-1, +-sqrt(2)/2)."""
    if frac.dtype == jnp.float64:
        ang = 2.0 * np.pi * frac
        return jnp.cos(ang), jnp.sin(ang)
    o = jnp.floor(frac * 8.0)
    a = (2.0 * np.pi) * (frac - o * 0.125)  # |a| <= pi/4, 9e-8 abs err
    ca, sa = jnp.cos(a), jnp.sin(a)
    oi = o.astype(jnp.int32)
    ch = jnp.zeros_like(frac)
    sh = jnp.zeros_like(frac)
    for k in range(8):
        ch = jnp.where(oi == k, np.float32(_OCT_C[k]), ch)
        sh = jnp.where(oi == k, np.float32(_OCT_S[k]), sh)
    return ch * ca - sh * sa, sh * ca + ch * sa


def _twiddle_planar(r: int, m: int, sign: float, dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """In-trace twiddle planes W_{rm}^{k1*j2}, exact for r*m <= 2^24.

    Computed from iota so the tables are never embedded as program
    constants (an r1 weakness: per-level host-constant twiddles bloat the
    compile payload — a 2^24 plan would embed ~256 MB).  The integer
    product k1*j2 < r*m is exact in i32, its f32 conversion exact below
    2^24 (and off by <4 ulp of phase beyond — ~4e-7 rad at 2^26)."""
    k1 = jax.lax.broadcasted_iota(jnp.int32, (r, m), 0)
    j2 = jax.lax.broadcasted_iota(jnp.int32, (r, m), 1)
    frac = (k1 * j2).astype(dtype) * (1.0 / (r * m))
    c, s = _sincos_2pi(frac)
    return c, s if sign > 0 else -s


def _cmatmul_radix(wr, wi, xr, xi):
    """Complex codelet application over the RADIX axis: W @ X with
    W = (wr + i wi) constant (r, r) and X = (..., r, m) planar.

    ONE-PASS form (exp/fft_blockstage): both output planes come from two
    accumulated matmuls with (2r, r) stacked codelets,

        [Yr; Yi] = [wr; wi] @ Xr + [-wi; wr] @ Xi,

    so each stage reads every input plane once and writes every output
    plane once.  The r1 form (minor-axis stack + separate wr/wi einsums)
    read the working set twice per stage and paid a concat pass — the
    stages are HBM-bound, and this lifted 2^22 from 547 to 708 GFLOP/s
    (2^24: 294 -> 317) at identical error.
    """
    alg = _dot_alg(xr.dtype)
    r = wr.shape[0]
    wa = jnp.concatenate([wr, wi], axis=0)            # (2r, r)
    wb = jnp.concatenate([-wi, wr], axis=0)           # (2r, r)
    y2 = (jnp.einsum("ij,...jm->...im", wa, xr, precision=alg)
          + jnp.einsum("ij,...jm->...im", wb, xi, precision=alg))
    # (wr + i wi)(xr + i xi): re = wr xr - wi xi, im = wr xi + wi xr
    return y2[..., :r, :], y2[..., r:, :]


def _cmatmul_last(xr, xi, wr, wi):
    """Base-case codelet: X @ W contracting the LAST axis (n <= codelet).

    Same one-pass accumulated form as `_cmatmul_radix`, output planes
    stacked along the minor axis:  [Yr | Yi] = Xr @ [wr | wi] +
    Xi @ [-wi | wr]  — each input plane is read once."""
    alg = _dot_alg(xr.dtype)
    k = wr.shape[1]
    wa = jnp.concatenate([wr, wi], axis=1)            # (k, 2k)
    wb = jnp.concatenate([-wi, wr], axis=1)           # (k, 2k)
    if xr.ndim == 1:
        y2 = (jnp.einsum("j,jk->k", xr, wa, precision=alg)
              + jnp.einsum("j,jk->k", xi, wb, precision=alg))
        return y2[:k], y2[k:]
    y2 = (jnp.einsum("...jk,kl->...jl", xr, wa, precision=alg)
          + jnp.einsum("...jk,kl->...jl", xi, wb, precision=alg))
    return y2[..., :k], y2[..., k:]


def _fft_planar(xr: jnp.ndarray, xi: jnp.ndarray, sign: float,
                plan: Tuple[int, ...]):
    """Mixed-radix planar CT over the last axis following the balanced
    stage plan; big-radix stages feed the MXU near its native contraction
    depth (fft/plan.hpp:112-145 planner analog, re-planned for the
    128x128 systolic array)."""
    n = xr.shape[-1]
    rt = str(np.dtype(xr.dtype))
    if n == 1:
        return xr, xi
    if len(plan) == 1:
        assert plan[0] == n
        cr, ci = _codelet_planar_np(n, sign, rt)
        return _cmatmul_last(xr, xi, jnp.asarray(cr), jnp.asarray(ci))
    r = plan[0]
    m = n // r
    batch = xr.shape[:-1]
    cr, ci = _codelet_planar_np(r, sign, rt)
    ar, ai = _cmatmul_radix(
        jnp.asarray(cr), jnp.asarray(ci),
        xr.reshape(batch + (r, m)), xi.reshape(batch + (r, m)))
    tr, ti = _twiddle_planar(r, m, sign, xr.dtype)
    br = ar * tr - ai * ti
    bi = ar * ti + ai * tr
    br, bi = _fft_planar(br, bi, sign, plan[1:])  # batched recursion on m
    # output index is r*k2 + k1 -> swap (k1, k2) before ravel
    return (jnp.swapaxes(br, -1, -2).reshape(batch + (n,)),
            jnp.swapaxes(bi, -1, -2).reshape(batch + (n,)))


def _fft_planar_flat(xr: jnp.ndarray, xi: jnp.ndarray, sign: float,
                     plan: Tuple[int, ...]):
    """Flat-cube form of the mixed-radix CT: view the signal as the
    (r1, ..., rk) cube, contract successive axes against the stage
    codelets with `dot_general` (which contracts ANY axis without a
    materialized transpose op), apply in-trace twiddles between stages,
    and pay ONE axis-reversal transpose at the end — vs the recursive
    form's swapaxes pass at every recursion pop.  Same math, same
    twiddles, identical numerics; an A/B candidate for the
    transpose-bound large sizes (exp/fft_flat.py)."""
    n = xr.shape[-1]
    batch = xr.shape[:-1]
    rt = str(np.dtype(xr.dtype))
    k = len(plan)
    if k == 1:
        cr, ci = _codelet_planar_np(n, sign, rt)
        return _cmatmul_last(xr, xi, jnp.asarray(cr), jnp.asarray(ci))
    cube = batch + tuple(plan)
    xr = xr.reshape(cube)
    xi = xi.reshape(cube)
    alg = _dot_alg(xr.dtype)
    nb = len(batch)
    rest = n
    for i, r in enumerate(plan):
        rest //= r
        cr, ci = _codelet_planar_np(r, sign, rt)
        cr = jnp.asarray(cr)
        ci = jnp.asarray(ci)
        wa = jnp.concatenate([cr, ci], axis=0)   # (2r, r) one-pass form
        wb = jnp.concatenate([-ci, cr], axis=0)
        dn = (((nb + i,), (1,)), ((), ()))
        y2 = (jax.lax.dot_general(xr, wa, dn, precision=alg)
              + jax.lax.dot_general(xi, wb, dn, precision=alg))
        # dot_general puts the codelet's output axis LAST; restore it
        y2 = jnp.moveaxis(y2, -1, nb + i)
        sl_r = [slice(None)] * y2.ndim
        sl_i = [slice(None)] * y2.ndim
        sl_r[nb + i] = slice(0, r)
        sl_i[nb + i] = slice(r, 2 * r)
        xr, xi = y2[tuple(sl_r)], y2[tuple(sl_i)]
        if rest > 1:
            tc, ts = _twiddle_planar(r, rest, sign, xr.dtype)
            shape = (1,) * (nb + i) + (r,) + tuple(plan[i + 1:])
            tc = tc.reshape(shape)
            ts = ts.reshape(shape)
            xr, xi = xr * tc - xi * ts, xr * ts + xi * tc
    # output digits come out LSD-first: reverse the plan axes, ravel
    perm = tuple(range(nb)) + tuple(nb + k - 1 - i for i in range(k))
    out = batch + (n,)
    return (jnp.transpose(xr, perm).reshape(out),
            jnp.transpose(xi, perm).reshape(out))


def _planar_engine():
    """Stage-engine selector: the recursive form is the measured default;
    ``VEXTPU_FFT_FORM=flat`` switches every CT transform (plain, dist
    local phases, Bluestein inner transforms) to the flat-cube form."""
    import os

    return (_fft_planar_flat if os.environ.get("VEXTPU_FFT_FORM") == "flat"
            else _fft_planar)


def _fft_1d(x: jnp.ndarray, sign: float) -> jnp.ndarray:
    """FFT along the last axis (static length), batched over leading axes."""
    n = x.shape[-1]
    cdtype = x.dtype
    if n == 1:
        return x
    if prime_factors(n) and max(prime_factors(n)) > _MAX_CODELET:
        # a prime factor exceeds the codelet family -> chirp-z the whole
        # transform (the reference Bluesteins unsupported factors too)
        return _bluestein(x, sign)
    xr, xi = jnp.real(x), jnp.imag(x)
    yr, yi = _planar_engine()(xr, xi, sign, _radix_plan(n, _MAX_CODELET))
    return jax.lax.complex(yr, yi).astype(cdtype)


def _bluestein(x: jnp.ndarray, sign: float) -> jnp.ndarray:
    """Chirp-z for arbitrary/prime n (fft/kernels.hpp bluestein_* :344-520)."""
    n = x.shape[-1]
    cdtype = x.dtype
    m = _next_pow2(2 * n - 1)
    k = np.arange(n)
    chirp_np = np.exp(sign * 1j * np.pi * (k * k % (2 * n)) / n).astype(
        str(np.dtype(cdtype))
    )
    chirp = jnp.asarray(chirp_np)
    b_np = np.zeros(m, dtype=str(np.dtype(cdtype)))
    b_np[:n] = np.conj(chirp_np)
    b_np[m - n + 1 :] = np.conj(chirp_np[1:][::-1])
    bf = jnp.asarray(np.fft.fft(b_np).astype(str(np.dtype(cdtype))))

    a = x * chirp
    a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, m - n)])
    af = _fft_1d(a, -1.0)
    cf = af * bf
    c = _fft_1d(cf, +1.0) / m
    return c[..., :n] * chirp


class Plan:
    """FFT plan over an N-D logical shape (fft/plan.hpp planner).

    Two engines:

    * ``impl="xla"`` (default) — XLA's native FFT HLO, the TPU backend's
      tuned implementation (measured ~2.8x the CT path at better
      accuracy, all sizes incl. primes).  The analog of the reference
      delegating to clFFT/cuFFT where available.
    * ``impl="ct"`` — the in-library mixed-radix Cooley-Tukey/Bluestein
      planner built from MXU matmul codelets (the from-scratch analog of
      the reference's own kernels, and the fallback if an XLA backend
      lacks the FFT HLO).
    * ``impl="dist"`` — four-step over the device mesh (ops/fft_dist.py):
      a single large 1-D transform of a SHARDED vector computed with
      all_to_all transposes + local MXU stages, never gathering the
      signal on one device.  Auto-selected by ``FFT.__call__`` for
      sharded 1-D inputs when the geometry decomposes (the reference
      forbids multi-device FFT outright, fft/plan.hpp:218-220).
    """

    def __init__(
        self,
        shape: Tuple[int, ...],
        dims: Optional[Tuple[int, ...]],
        inverse: bool,
        dtype,
        impl: str = "xla",
        dist_ctx=None,
    ):
        self.shape = shape
        self.dims = tuple(dims) if dims is not None else tuple(range(len(shape)))
        self.inverse = inverse
        self.dtype = np.dtype(dtype)
        self.sign = +1.0 if inverse else -1.0
        self.scale = 1.0 / np.prod([shape[d] for d in self.dims]) if inverse else 1.0
        # Large-prime transform lengths must NOT reach the XLA FFT HLO:
        # the TPU backend lowers them as a DIRECT n x n DFT matmul — a
        # 999983-point FFT tried to allocate an f32[999983, 999983]
        # (~4 TB) and AOT-rejected (exp/fft_size_sweep.py).  Route such
        # axes to the own engine, whose Bluestein pads to a pow2.
        self._route_ct = impl == "xla" and any(
            max(prime_factors(shape[d]), default=1) > 4096 for d in self.dims
        )
        # Auto-route the sizes where the own MXU engine beats the XLA FFT
        # (exp/ fft crossover sweep, both engines twice per size in one
        # process): 1-D c64 smooth lengths 2^17..2^20 — ct measured
        # 404-1452 vs xla 199-523 GFLOP/s there; XLA keeps a 5-25%
        # lead at >=2^21 even with the radix-256 one-pass stages
        # (exp/fft_window2: ct 769-800/584-635/443-453/338-353 vs xla
        # 816-840/611-695/524-533/437-454 at 2^21/22/23/24).
        # VEXTPU_FFT_AUTO=0 disables.
        import os

        n0 = shape[self.dims[0]] if len(self.dims) == 1 else 0
        self._auto_ct = (
            impl == "xla" and not self._route_ct
            and os.environ.get("VEXTPU_FFT_AUTO", "1") != "0"
            and len(shape) == 1 and len(self.dims) == 1
            and self.dtype == np.complex64
            and (1 << 17) <= n0 <= (1 << 20)
            and max(prime_factors(n0), default=1) <= _MAX_CODELET
        )
        self.impl = impl
        self._dist_fn = None
        self._dist_d = 0
        if impl == "dist":
            from .fft_dist import make_distributed_1d, make_distributed_2d

            rdt = np.float64 if self.dtype == np.complex128 else np.float32
            if dist_ctx is None:
                raise ValueError("impl='dist' needs a context")
            if len(shape) == 1 and len(self.dims) == 1:
                self._dist_fn = make_distributed_1d(
                    shape[0], dist_ctx.mesh, dist_ctx.axis, self.sign, rdt)
            elif len(shape) == 2 and tuple(sorted(self.dims)) == (0, 1):
                self._dist_fn = make_distributed_2d(
                    shape[0], shape[1], dist_ctx.mesh, dist_ctx.axis,
                    self.sign, rdt)
            else:
                raise ValueError("impl='dist' supports 1-D and full 2-D")
            if self._dist_fn is None:
                raise ValueError(
                    f"shape {shape} does not decompose over "
                    f"{dist_ctx.axis_size} shards")
            self._dist_d = dist_ctx.axis_size
            self._rdt = rdt

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.impl == "dist":
            x = x.astype(self.dtype)
            yr, yi = self._dist_fn(
                jnp.real(x).astype(self._rdt), jnp.imag(x).astype(self._rdt))
            out = jax.lax.complex(yr, yi).astype(self.dtype)
            if self.scale != 1.0:
                out = out * jnp.asarray(self.scale, dtype=out.dtype)
            return out
        flat_in = x.ndim == 1 and len(self.shape) > 1
        if flat_in:
            x = x.reshape(self.shape)
        x = x.astype(self.dtype)
        if self.impl == "xla" and not self._route_ct and not self._auto_ct:
            fn = jnp.fft.ifftn if self.inverse else jnp.fft.fftn
            # jnp.fft applies its own 1/n scaling for ifftn (matches the
            # reference's inverse scaling); no extra scale needed
            out = fn(x, axes=self.dims).astype(self.dtype)
            return out.reshape(-1) if flat_in else out
        for d in self.dims:
            x = jnp.moveaxis(x, d, -1)
            x = _fft_1d(x, self.sign)
            x = jnp.moveaxis(x, -1, d)
        if self.scale != 1.0:
            x = x * jnp.asarray(self.scale, dtype=x.dtype)
        return x.reshape(-1) if flat_in else x


class FFTExpr(Expr):
    _opname = "fft"

    def __init__(self, plan: Plan, x: Any, base: Optional[Plan] = None):
        self.plan = plan
        #: placement-neutral plan (same geometry, no shard_map): used
        #: when an enqueue() redirect makes the dist plan's mesh wrong
        self.base_plan = base if base is not None else plan
        self.children = (as_expr(x),)

    def extra_sig(self) -> str:
        # impl + routing flags are part of the structure: an xla-engine
        # and a ct-engine plan of the same geometry must not share a
        # cached kernel (code-review r2 finding)
        p = self.plan
        # dist plans additionally key on the shard-mapped closure (one
        # per (geometry, mesh)): same-shape plans over DIFFERENT meshes
        # must not share a cached kernel
        dist = f":dist{p._dist_d}:{id(p._dist_fn)}" if p._dist_fn else ""
        return (f"{p.shape}:{p.dims}:{p.inverse}:{p.dtype}:{p.impl}"
                f":{int(p._route_ct)}{int(p._auto_ct)}{dist}")

    def emit(self, env: EmitEnv):
        plan = self.plan
        if plan._dist_fn is not None and not env.placement_known:
            # enqueue() redirected this assignment: the dist plan's
            # shard_map is pinned to the SOURCE mesh and would crash
            # inside the redirected jit (code-review r3 finding); the
            # geometry-identical whole-array plan follows the traced
            # leaves anywhere
            plan = self.base_plan
        return plan(self.children[0].emit_cached(env))

    def size_hint(self) -> Optional[int]:
        return int(np.prod(self.plan.shape))


class FFT:
    """vex::FFT<T> (fft.hpp:40): an expression-terminal transform.

    ``dims`` selects transformed axes; un-listed axes are batch axes (the
    reference's ``fft::none`` marking).  Vectors are treated as the
    flattened row-major N-D array of ``shape``.
    """

    def __init__(
        self,
        shape: Union[int, Sequence[int]],
        *,
        dims: Optional[Sequence[int]] = None,
        inverse: bool = False,
        dtype: Any = None,
        impl: str = "xla",
        context=None,
    ):
        if isinstance(shape, (int, np.integer)):
            shape = (int(shape),)
        shape = tuple(int(s) for s in shape)
        if dtype is None:
            dtype = (
                np.complex128 if jax.config.jax_enable_x64 else np.complex64
            )
        key = (shape, tuple(dims) if dims is not None else None, inverse,
               str(dtype), impl)
        self.plan = plan_cache.get_or_create(
            key, lambda: Plan(shape, dims, inverse, dtype, impl)
        )

    def __call__(self, x) -> FFTExpr:
        return FFTExpr(self._route(x), x, base=self.plan)

    def _route(self, x) -> Plan:
        """Swap in the mesh-distributed four-step plan for a 1-D
        transform of a sharded vector (fft_dist.py): the SPMD
        alternative all-gathers the whole signal onto every device.
        ``VEXTPU_FFT_DIST=0`` disables."""
        import os

        p = self.plan
        ctx = getattr(x, "context", None)
        if (
            p.impl in ("xla", "ct") and not p._route_ct
            and ctx is not None and getattr(x, "nparts", 1) > 1
            and getattr(x, "size", None) == int(np.prod(p.shape))
            and os.environ.get("VEXTPU_FFT_DIST", "1") != "0"
        ):
            from .fft_dist import split_1d, splittable_2d

            d = ctx.axis_size  # vectors shard over the first mesh axis
            ok = d > 1 and (
                split_1d(p.shape[0], d) is not None
                if len(p.shape) == 1 and len(p.dims) == 1
                else splittable_2d(p.shape[0], p.shape[1], d)
                if len(p.shape) == 2 and tuple(sorted(p.dims)) == (0, 1)
                else False
            )
            if ok:
                # id(mesh) is safe here for the same reason as
                # scan_by_key's id(key_eq): the cached Plan's shard_map
                # closure pins the mesh alive, so the id cannot be
                # recycled while the entry exists
                key = (p.shape, p.dims, p.inverse, str(p.dtype), "dist",
                       id(ctx.mesh))
                return plan_cache.get_or_create(
                    key, lambda: Plan(p.shape, p.dims, p.inverse, p.dtype,
                                      impl="dist", dist_ctx=ctx))
        return p


def fft(x, **kwargs) -> FFTExpr:
    """One-shot ``y[:] = vex.fft(x)`` convenience (1-D forward)."""
    n = x.size if hasattr(x, "size") else len(x)
    return FFT(n, **kwargs)(x)


def ifft(x, **kwargs) -> FFTExpr:
    n = x.size if hasattr(x, "size") else len(x)
    return FFT(n, inverse=True, **kwargs)(x)
