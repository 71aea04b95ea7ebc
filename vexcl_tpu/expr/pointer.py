"""Raw-pointer terminals: arbitrary random access inside expressions.

Analog of vexcl/vector_pointer.hpp:40-140 (`raw_pointer(x)` — pass a
vector as a bare pointer so kernels can index it at arbitrary computed
positions; the N-body pattern) and constant_address_space.hpp:54-120.

On TPU the "pointer dereference at computed index" is a fused gather:
``p[idx_expr]`` emits ``jnp.take(x, idx)`` inside the expression kernel.
``constant_pointer`` is the same terminal — the OpenCL __constant address
space has no TPU analog (XLA already keeps small hot buffers in VMEM/SMEM
as it sees fit).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp

from .node import EmitEnv, Expr, as_expr

__all__ = ["raw_pointer", "constant_pointer", "RawPointer"]


class PointerDeref(Expr):
    _size_transparent = False
    _opname = "deref"

    def __init__(self, base: Expr, index: Any):
        self.children = (base, as_expr(index))

    def emit(self, env: EmitEnv):
        x = self.children[0].emit_cached(env)
        idx = self.children[1].emit_cached(env)
        return jnp.take(x, idx.astype(jnp.int32), axis=0)

    def size_hint(self) -> Optional[int]:
        return self.children[1].size_hint()


class RawPointer:
    """``p = vex.raw_pointer(x); y[:] = p[i + shift]``."""

    def __init__(self, vec):
        self._term = vec._as_terminal() if hasattr(vec, "_as_terminal") else as_expr(vec)

    def __getitem__(self, index: Any) -> PointerDeref:
        return PointerDeref(self._term, index)

    def __call__(self, index: Any) -> PointerDeref:
        return PointerDeref(self._term, index)


def raw_pointer(vec) -> RawPointer:
    return RawPointer(vec)


def constant_pointer(vec) -> RawPointer:
    """constant_address_space analog: identical semantics on TPU."""
    return RawPointer(vec)
