"""Expression-fused reductions: SUM / MIN / MAX / Kahan / combined.

Analog of vexcl/reductor.hpp (reduction ops :47-128, CombineReductors
:133-280, Reductor::operator() :302-439, Kahan codegen :537-564).

The reference emits a grid-stride partial-sum kernel + shared-memory tree
per device and combines partials on the host.  On TPU the whole pipeline —
expression map, block partials, tree combine, cross-device psum — is one
XLA reduction over the fused expression: XLA fuses elementwise producers
into reduction kernels natively and inserts ICI collectives for sharded
inputs, so no host staging occurs.  Kahan summation (which XLA cannot
express as a plain reduction) is implemented as chunk partial sums + a
compensated `lax.scan` over the partials — the same structure as the
reference's per-thread Kahan accumulation + tree combine.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..cache import kernel_cache
from ..config import config
from ..expr.compile import _env_from  # shared trace plumbing
from ..expr.node import Expr, analyze, as_expr, expression_properties
from ..types import dtype_of
from ..utils.util import ExpressionError

__all__ = [
    "SUM",
    "MIN",
    "MAX",
    "SUM_Kahan",
    "MIN_MAX",
    "CombineReductors",
    "Reductor",
]


class ReductionKind:
    """One reduction operation (reductor.hpp:47-128)."""

    def __init__(self, name: str):
        self.name = name

    def __repr__(self):
        return f"<reduction {self.name}>"


SUM = ReductionKind("SUM")
MIN = ReductionKind("MIN")
MAX = ReductionKind("MAX")
SUM_Kahan = ReductionKind("SUM_Kahan")


def CombineReductors(*kinds: ReductionKind) -> Tuple[ReductionKind, ...]:
    """Run several reductions over one data pass (reductor.hpp:133-280).
    Under XLA the fused kernel reads the expression once and feeds both
    accumulators, matching the reference's combined kernel."""
    return tuple(kinds)


MIN_MAX = CombineReductors(MIN, MAX)


def _kahan_sum(x: jnp.ndarray, chunk: int = 4096):
    """Compensated summation: chunk partials + Kahan scan over partials."""
    n = x.shape[0]
    nchunks = max(1, -(-n // chunk))
    pad = nchunks * chunk - n
    if pad:
        x = jnp.concatenate([x, jnp.zeros(pad, dtype=x.dtype)])
    partials = jnp.sum(x.reshape(nchunks, chunk), axis=1)

    def body(carry, p):
        s, c = carry
        y = p - c
        t = s + y
        c = (t - s) - y
        return (t, c), None

    (s, _), _ = jax.lax.scan(body, (jnp.zeros((), x.dtype), jnp.zeros((), x.dtype)), partials)
    return s


def _apply_kind(kind: ReductionKind, val: jnp.ndarray):
    if kind is SUM:
        return jnp.sum(val)
    if kind is MIN:
        return jnp.min(val)
    if kind is MAX:
        return jnp.max(val)
    if kind is SUM_Kahan:
        return _kahan_sum(val)
    raise ValueError(f"unknown reduction kind {kind!r}")


class Reductor:
    """``Reductor(SUM)`` / ``Reductor(np.float64, SUM)`` /
    ``Reductor(np.float64, MIN_MAX)``; call it on any expression::

        Sum = vex.Reductor(vex.SUM)
        s = Sum(x * y)            # fused multiply + reduce, one kernel
    """

    def __init__(self, arg0: Any = None, arg1: Any = None, *, context=None):
        if isinstance(arg0, (ReductionKind, tuple)):
            self.kinds = arg0
            self.dtype = dtype_of(arg1) if arg1 is not None else None
        else:
            self.dtype = dtype_of(arg0) if arg0 is not None else None
            self.kinds = arg1 if arg1 is not None else SUM
        self.context = context
        self._combined = isinstance(self.kinds, tuple)

    def __call__(self, expr: Any) -> Union[float, Tuple[float, ...]]:
        # multivector expressions reduce per component, like the reference
        # (Reductor over a multivector returns std::array<T,N>,
        # reductor.hpp:302-439 + multivector grammar)
        if hasattr(expr, "_as_multi"):
            expr = expr._as_multi()
        if hasattr(expr, "components"):
            return tuple(self(c) for c in expr.components)
        expr = as_expr(expr)
        n, _ctx = expression_properties(expr)
        analysis = analyze(expr)
        if n is None:
            # a scalar-only tree would silently reduce ONE broadcast element
            # (the reference can't size such an expression either:
            # reductor.hpp:302-340 takes the range from a vector terminal)
            detail = ("include a vector or give element_index an explicit "
                      "length")
            if _ctx is None:
                detail += " (no active context: sizes from a size_hint " \
                          "need one — vex.Context(..., set_current=True))"
            raise ExpressionError(
                analysis.sig,
                ValueError(
                    f"Reductor: expression has no sized terminal — {detail}"))
        kinds = self.kinds if self._combined else (self.kinds,)

        # Pallas fast path: single SUM/MIN/MAX over a large elementwise f32
        # expression — one-pass blocked map-reduce (reductor.hpp analog)
        from .pallas_reduce import (
            pallas_map_reduce, reducible_with_pallas,
            reducible_with_pallas_dist)

        # mesh-sharded inputs: run the SAME kernel as the shard_map LOCAL
        # phase (each shard is single-device inside shard_map) + a psum /
        # pmax / pmin of the per-shard scalars over ICI — the reference's
        # per-device partials + cross-device combine (reductor.hpp:412-438)
        # with the host combine replaced by a collective
        dist = (reducible_with_pallas_dist(expr, kinds, n)
                if self.dtype in (None, np.dtype(np.float32)) else None)
        if dist is not None:
            import jax.numpy as _jnp  # noqa: F401
            from jax.sharding import PartitionSpec as P

            mesh, axis = dist
            is_arr = [getattr(p, "ndim", 0) == 1 for p in analysis.leaves]
            kind = kinds[0].name
            key = ("pallas_reduce_dist", analysis.sig, kind, n,
                   id(mesh), axis)

            def factory():
                comb = {"SUM": jax.lax.psum, "MIN": jax.lax.pmin,
                        "MAX": jax.lax.pmax}[kind]

                def local(*leaves):
                    arrays = [l for l, f in zip(leaves, is_arr) if f]
                    scalars = [l for l, f in zip(leaves, is_arr) if not f]

                    def emit(blocks, scalar_vals):
                        bi = iter(blocks)
                        si = iter(scalar_vals)
                        full = [next(bi) if f else next(si) for f in is_arr]
                        env = _env_from(analysis, (expr,), full, None)
                        return expr.emit_cached(env)

                    part = pallas_map_reduce(arrays, scalars, emit, kind)
                    return comb(part, axis)

                specs = tuple(P(axis) if f else P() for f in is_arr)
                # check_vma=False: pallas_call inside shard_map cannot
                # annotate varying mesh axes (same as ops/scan.py)
                sm = jax.shard_map(local, mesh=mesh, in_specs=specs,
                                   out_specs=P(), check_vma=False)

                # under jit every leaf (incl. Python scalars) is already
                # a tracer, so shard_map sees rank-0 P() operands
                return jax.jit(lambda *leaves: sm(*leaves))

            jfn = (
                kernel_cache.get_or_create(key, factory)
                if config.cache_kernels
                else factory()
            )
            return float(jfn(*analysis.leaves))

        if (
            self.dtype in (None, np.dtype(np.float32))
            and reducible_with_pallas(expr, kinds, n)
        ):
            is_arr = [getattr(p, "ndim", 0) == 1 for p in analysis.leaves]
            kind = kinds[0].name
            key = ("pallas_reduce", analysis.sig, kind, n)

            def factory():
                def run(*leaves):
                    arrays = [l for l, f in zip(leaves, is_arr) if f]
                    scalars = [l for l, f in zip(leaves, is_arr) if not f]

                    def emit(blocks, scalar_vals):
                        bi = iter(blocks)
                        si = iter(scalar_vals)
                        full = [
                            next(bi) if f else next(si) for f in is_arr
                        ]
                        env = _env_from(analysis, (expr,), full, None)
                        return expr.emit_cached(env)

                    return pallas_map_reduce(arrays, scalars, emit, kind)

                return jax.jit(run)

            jfn = (
                kernel_cache.get_or_create(key, factory)
                if config.cache_kernels
                else factory()
            )
            return float(jfn(*analysis.leaves))

        from ..expr.compile import _placement_sig

        key = (
            "reduce",
            analysis.sig,
            tuple(k.name for k in kinds),
            n,
            str(self.dtype),
            # placement-dependent terminals (e.g. a stencil inside the
            # reduced expression) bake dispatch into the closure — key
            # on leaf placement like expr/compile.evaluate (r3 review)
            _placement_sig(analysis.leaves),
        )

        def factory():
            def run(*leaves):
                env = _env_from(analysis, (expr,), leaves, n)
                val = expr.emit_cached(env)
                if self.dtype is not None:
                    val = val.astype(self.dtype)
                if jnp.ndim(val) == 0 and n is not None:
                    val = jnp.broadcast_to(val, (n,))
                return tuple(_apply_kind(k, val) for k in kinds)

            return jax.jit(run)

        jfn = (
            kernel_cache.get_or_create(key, factory)
            if config.cache_kernels
            else factory()
        )
        out = jfn(*analysis.leaves)
        res = tuple(o.item() for o in out)
        return res if self._combined else res[0]
