"""Generalized tensor contraction as an expression terminal.

Analog of vexcl/tensordot.hpp:54- (tensordot_expr + codegen).

The reference generates nested index loops; on TPU the contraction IS the
native operation — `jnp.tensordot` lowers straight onto the MXU — so this
terminal simply shapes its (view-)operands and emits a dot_general.
Restricted to single-device vectors in the reference
(docs/expressions.rst:813-819); here sharded operands are repartitioned by
XLA automatically.

    A = vex.slicer((n, m))
    B = vex.slicer((m, k))
    c[:] = vex.tensordot(A[:, :](x), B[:, :](y), vex.axes_pairs(1, 0))
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..expr.node import EmitEnv, Expr, as_expr

__all__ = ["tensordot", "axes_pairs"]


def axes_pairs(*idx: int) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
    """vex::axes_pairs(a1, b1, a2, b2, ...) -> ((a1, a2, ...), (b1, b2, ...))."""
    if len(idx) % 2:
        raise ValueError("axes_pairs takes an even number of indices")
    return tuple(idx[0::2]), tuple(idx[1::2])


class TensordotExpr(Expr):
    _size_transparent = False
    _opname = "tdot"

    def __init__(self, a: Any, b: Any, axes):
        self.axes = axes
        self.children = (as_expr(a), as_expr(b))

    def extra_sig(self) -> str:
        return repr(self.axes)

    def emit(self, env: EmitEnv):
        a = self.children[0].emit_cached(env)
        b = self.children[1].emit_cached(env)
        out = jnp.tensordot(a, b, axes=self.axes)
        return out.reshape(-1)

    def size_hint(self) -> Optional[int]:
        return None


def tensordot(a: Any, b: Any, axes) -> TensordotExpr:
    return TensordotExpr(a, b, axes)
