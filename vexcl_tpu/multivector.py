"""multivector<T,N> and vex::tie — fused multi-expression assignment.

Analog of vexcl/multivector.hpp:120-565 and the multiexpression machinery
(operations.hpp:2081-2185, tie :2251).  N equally-sized components are
treated as one SoA container; assigning a multivector expression traces
ALL component expressions into one jitted function, so XLA emits a single
fused kernel touching each input once — the reference's fused multivector
kernel (GPU path, operations.hpp:2131-2173).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import numpy as np

from .context import Context, current_context
from .expr.compile import evaluate_multi
from .expr.node import Expr, as_expr
from .types import dtype_of
from .vector import _ExprOpsMixin, vector

__all__ = ["multivector", "MultiExpr", "tie"]


class MultiExpr:
    """Tuple of per-component expression trees."""

    def __init__(self, components: Sequence[Expr]):
        self.components = tuple(components)

    @property
    def nparts(self) -> int:
        return len(self.components)

    def _zip(self, other, fn):
        if isinstance(other, (MultiExpr, multivector)):
            oc = other.components if isinstance(other, MultiExpr) else [
                other(i)._as_terminal() for i in range(other.nparts)
            ]
            if len(oc) != len(self.components):
                raise ValueError("multivector component count mismatch")
            return MultiExpr([fn(a, b) for a, b in zip(self.components, oc)])
        o = as_expr(other)
        return MultiExpr([fn(a, o) for a in self.components])

    def __add__(self, o):
        return self._zip(o, lambda a, b: a + b)

    def __radd__(self, o):
        return self._zip(o, lambda a, b: b + a)

    def __sub__(self, o):
        return self._zip(o, lambda a, b: a - b)

    def __rsub__(self, o):
        return self._zip(o, lambda a, b: b - a)

    def __mul__(self, o):
        return self._zip(o, lambda a, b: a * b)

    def __rmul__(self, o):
        return self._zip(o, lambda a, b: b * a)

    def __truediv__(self, o):
        return self._zip(o, lambda a, b: a / b)

    def __rtruediv__(self, o):
        return self._zip(o, lambda a, b: b / a)

    def __pow__(self, o):
        return self._zip(o, lambda a, b: a ** b)

    def __neg__(self):
        return MultiExpr([-a for a in self.components])

    def map(self, fn) -> "MultiExpr":
        return MultiExpr([fn(a) for a in self.components])


def _lift(fn):
    """Make a builtin apply componentwise to MultiExpr/multivector."""

    def wrapped(*args):
        counts = [
            a.nparts
            for a in args
            if isinstance(a, (MultiExpr, multivector))
        ]
        if not counts:
            return fn(*args)
        n = counts[0]

        def comp(a, i):
            if isinstance(a, MultiExpr):
                return a.components[i]
            if isinstance(a, multivector):
                return a(i)._as_terminal()
            return a

        return MultiExpr([fn(*[comp(a, i) for a in args]) for i in range(n)])

    return wrapped


class multivector:
    """N equally-partitioned component vectors (multivector.hpp:120-565)."""

    def __init__(
        self,
        n: Optional[int] = None,
        m: int = 1,
        dtype: Any = None,
        *,
        context: Optional[Context] = None,
        data: Any = None,
        components: Optional[Sequence[vector]] = None,
    ) -> None:
        self.context = context or current_context()
        if dtype is None:
            # infer from host data like vector() does; f32 default
            dtype = (np.asarray(data).dtype if data is not None
                     else np.float32)
        if components is not None:
            self._comps = list(components)
        elif data is not None:
            host = np.asarray(data)
            if host.ndim == 1:  # interleaved layout like the reference ctor
                host = host.reshape(m, -1) if m > 1 else host[None, :]
            self._comps = [
                vector(data=host[i], dtype=dtype, context=self.context)
                for i in range(host.shape[0])
            ]
        else:
            self._comps = [
                vector(n, dtype=dtype, context=self.context) for _ in range(m)
            ]

    # -- component access (operator(), multivector.hpp:292) -----------------
    def __call__(self, i: int) -> vector:
        return self._comps[i]

    @property
    def components(self) -> Tuple[vector, ...]:
        return tuple(self._comps)

    @property
    def nparts(self) -> int:
        return len(self._comps)

    @property
    def size(self) -> int:
        return self._comps[0].size if self._comps else 0

    def __len__(self) -> int:
        return self.size

    @property
    def dtype(self):
        return self._comps[0].dtype

    # -- element access: mv[j] -> tuple of scalars ---------------------------
    def __getitem__(self, j):
        if isinstance(j, (int, np.integer)):
            return tuple(c[int(j)] for c in self._comps)
        raise TypeError("multivector indexing takes an int element index")

    def __setitem__(self, key, value) -> None:
        if isinstance(key, slice) and key == slice(None):
            self.assign(value)
        elif isinstance(key, (int, np.integer)):
            for c, v in zip(self._comps, value):
                c[int(key)] = v
        else:
            raise TypeError("unsupported multivector assignment key")

    # -- expression protocol -------------------------------------------------
    def _as_multi(self) -> MultiExpr:
        return MultiExpr([c._as_terminal() for c in self._comps])

    def __add__(self, o):
        return self._as_multi() + o

    def __radd__(self, o):
        return self._as_multi().__radd__(o)

    def __sub__(self, o):
        return self._as_multi() - o

    def __rsub__(self, o):
        return self._as_multi().__rsub__(o)

    def __mul__(self, o):
        return self._as_multi() * o

    def __rmul__(self, o):
        return self._as_multi().__rmul__(o)

    def __truediv__(self, o):
        return self._as_multi() / o

    def __rtruediv__(self, o):
        return self._as_multi().__rtruediv__(o)

    def __pow__(self, o):
        return self._as_multi() ** o

    def __neg__(self):
        return -self._as_multi()

    # -- fused assignment ----------------------------------------------------
    def assign(self, value: Any, op: str = "=") -> "multivector":
        if isinstance(value, multivector):
            value = value._as_multi()
        if isinstance(value, (tuple, list)):
            value = MultiExpr([as_expr(v) for v in value])
        if (
            isinstance(value, Expr)
            or np.isscalar(value)
            or hasattr(value, "_as_terminal")
        ):
            value = MultiExpr([as_expr(value)] * self.nparts)
        if not isinstance(value, MultiExpr):
            raise TypeError(f"cannot assign {type(value)!r} to multivector")
        if value.nparts != self.nparts:
            raise ValueError("multivector component count mismatch")
        outs = evaluate_multi(
            value.components,
            ns=[c.size for c in self._comps],
            ops=[op] * self.nparts,
            olds=[c.array for c in self._comps],
            out_dtypes=[c.dtype for c in self._comps],
            donate_buffers=[
                c.storage
                if op == "=" and not c._pad and not c._borrowed else None
                for c in self._comps
            ],
            olds_donatable=[not c._borrowed for c in self._comps],
        )
        for c, arr in zip(self._comps, outs):
            c._set_array(arr)
        return self

    def __iadd__(self, o):
        return self.assign(o, "+=")

    def __isub__(self, o):
        return self.assign(o, "-=")

    def __imul__(self, o):
        return self.assign(o, "*=")

    def __itruediv__(self, o):
        return self.assign(o, "/=")

    def copy(self) -> "multivector":
        """Deep copy (multivector_create.cpp copy_constructor): components
        are copied, so mutating the copy leaves the original untouched."""
        return multivector(
            components=[c.copy() for c in self._comps], context=self.context
        )

    def to_numpy(self) -> np.ndarray:
        return np.stack([c.to_numpy() for c in self._comps])

    def __repr__(self) -> str:
        return f"multivector<{self.dtype},{self.nparts}>[{self.size}]"


class _Tied:
    """Result of vex::tie(x, y, ...): assign a tuple of expressions in ONE
    fused kernel (operations.hpp:2230-2256)."""

    def __init__(self, vectors: Sequence[vector]):
        self.vectors = list(vectors)

    def assign(self, exprs: Sequence[Any], op: str = "=") -> None:
        if isinstance(exprs, MultiExpr):
            exprs = exprs.components
        exprs = [as_expr(e) for e in exprs]
        if len(exprs) != len(self.vectors):
            raise ValueError("tie(): arity mismatch")
        outs = evaluate_multi(
            exprs,
            ns=[v.size for v in self.vectors],
            ops=[op] * len(exprs),
            olds=[v.array for v in self.vectors],
            out_dtypes=[v.dtype for v in self.vectors],
            donate_buffers=[
                v.storage
                if op == "=" and not v._pad and not v._borrowed else None
                for v in self.vectors
            ],
            olds_donatable=[not v._borrowed for v in self.vectors],
        )
        for v, arr in zip(self.vectors, outs):
            v._set_array(arr)

    def __setitem__(self, key, value) -> None:
        if isinstance(key, slice) and key == slice(None):
            self.assign(value)
        else:
            raise TypeError("use tied[:] = (expr, ...)")


def tie(*vectors: vector) -> _Tied:
    return _Tied(vectors)
