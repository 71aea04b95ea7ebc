"""Symbolic kernel generator: record a host algorithm, replay it as one
fused device kernel.

Analog of vexcl/generator.hpp (recorder :75-140, symbolic :405, kernel
:547, build_kernel :723-732, make_function :740, FunctorAdapter :776-829).

The reference runs a generic C++ algorithm (e.g. a Boost.odeint stepper)
over `vex::symbolic<T>` variables; every arithmetic op appends OpenCL
source to a recorder, and `build_kernel` compiles the recorded straight-
line body.  Here a `symbolic` variable carries a lazy expression tree
instead of appending strings: running the host algorithm builds the tree,
and `build_kernel` wraps it in one cached fused XLA kernel.  Assignment
back into a symbolic (`s.assign(expr)`, `s <<= expr`) is the recorded
mutation, so iterative steppers Just Work::

    x = generator.symbolic()
    for _ in range(4):                  # e.g. RK4 stages on the host
        x.assign(x + dt * f(x))
    step = generator.build_kernel("euler4", [x], params=[x])
    step(X)                             # X: vex.vector, updated in place
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence

from .expr.compile import evaluate_multi
from .expr.node import Expr, as_expr
from .expr.builtins import builtin

__all__ = ["symbolic", "build_kernel", "make_function", "Kernel"]


class _SymbolicParam(Expr):
    """Placeholder leaf bound to a runtime vector/scalar at kernel-call
    time (the VectorParameter / ScalarParameter of generator.hpp:405)."""

    _opname = "symp"
    _counter = [0]

    def __init__(self, kind: str):
        _SymbolicParam._counter[0] += 1
        self.uid = _SymbolicParam._counter[0]
        self.kind = kind
        self.bound: Any = None

    def _sig(self, ctx) -> str:
        s = ctx.slot(self)
        return f"p{s}"

    def leaf_key(self):
        return ("sym", self.uid)

    def payload(self):
        if self.bound is None:
            raise RuntimeError(
                "symbolic parameter used outside a kernel invocation"
            )
        return self.bound

    def emit(self, env):
        return env.values[id(self)]

    def size_hint(self):
        return None


class symbolic:
    """vex::symbolic<T> (generator.hpp:405-545).

    Participates in arithmetic like a value; `.assign()` / `<<=` records
    mutation.  VectorParameter is the default; pass ``kind="scalar"`` for
    ScalarParameter semantics.
    """

    def __init__(self, kind: str = "vector", value: Any = None):
        self._param = _SymbolicParam(kind)
        self._expr: Expr = self._param if value is None else as_expr(value)

    # -- recorded mutation --------------------------------------------------
    def assign(self, value: Any) -> "symbolic":
        self._expr = as_expr(value)
        return self

    def __ilshift__(self, value: Any) -> "symbolic":  # s <<= expr
        return self.assign(value)

    def __setitem__(self, key, value) -> None:
        if isinstance(key, slice) and key == slice(None):
            self.assign(value)
        else:
            raise TypeError("symbolic supports only full assignment s[:] = expr")

    # -- expression protocol ------------------------------------------------
    def _as_terminal(self) -> Expr:
        return self._expr

    def __add__(self, o):
        return self._expr + o

    def __radd__(self, o):
        return as_expr(o) + self._expr

    def __sub__(self, o):
        return self._expr - o

    def __rsub__(self, o):
        return as_expr(o) - self._expr

    def __mul__(self, o):
        return self._expr * o

    def __rmul__(self, o):
        return as_expr(o) * self._expr

    def __truediv__(self, o):
        return self._expr / o

    def __rtruediv__(self, o):
        return as_expr(o) / self._expr

    def __pow__(self, o):
        return self._expr ** o

    def __neg__(self):
        return -self._expr


class Kernel:
    """Compiled recorded kernel (generator.hpp kernel :547)."""

    def __init__(self, name: str, outputs: Sequence[symbolic], params: Sequence[symbolic]):
        self.name = name
        self.outputs = list(outputs)
        self.params = list(params)
        # freeze the recorded trees
        self._exprs: List[Expr] = [s._expr for s in self.outputs]

    def __call__(self, *args) -> None:
        if len(args) != len(self.params):
            raise ValueError(
                f"kernel {self.name!r} expects {len(self.params)} arguments"
            )
        from .vector import vector

        bind_of = {}
        for sym, arg in zip(self.params, args):
            sym._param.bound = arg.array if isinstance(arg, vector) else arg
            bind_of[id(sym._param)] = arg
        try:
            targets = []
            for out in self.outputs:
                tgt = bind_of.get(id(out._param))
                if not isinstance(tgt, vector):
                    raise ValueError(
                        "kernel outputs must be bound to vectors "
                        f"(output param of {self.name!r} got {type(tgt)!r})"
                    )
                targets.append(tgt)
            outs = evaluate_multi(
                self._exprs,
                ns=[t.size for t in targets],
                ops=["="] * len(targets),
                olds=[None] * len(targets),
                out_dtypes=[t.dtype for t in targets],
            )
            if len(targets) == 1:
                outs = (outs,) if not isinstance(outs, tuple) else outs
            for t, arr in zip(targets, outs):
                t._set_array(arr)
        finally:
            for sym in self.params:
                sym._param.bound = None

    def as_function(self):
        """Pure-function form of the recorded kernel: ``fn(*arrays) ->
        tuple(outputs)``, jittable and composable (e.g. chained inside a
        ``lax.fori_loop``) — the reference's kernel can only be enqueued
        per step from the host (generator.hpp:547-720)."""
        from .expr.compile import evaluate_multi

        def fn(*arrays):
            if len(arrays) != len(self.params):
                raise ValueError(
                    f"kernel {self.name!r} expects "
                    f"{len(self.params)} arguments")
            for sym, arr in zip(self.params, arrays):
                sym._param.bound = arr
            try:
                k = len(self._exprs)
                ns = [getattr(s._param.bound, "shape", (None,))[0]
                      for s in self.outputs]
                # ONE fused evaluation (shared subexpressions — e.g. RK4
                # stages feeding all outputs — compute once), same path
                # as __call__
                outs = evaluate_multi(self._exprs, ns=ns, ops=["="] * k,
                                      olds=[None] * k,
                                      out_dtypes=[None] * k)
                if k == 1 and not isinstance(outs, tuple):
                    outs = (outs,)
                return tuple(outs)
            finally:
                for sym in self.params:
                    sym._param.bound = None

        return fn


def build_kernel(name: str, outputs: Sequence[symbolic], params: Sequence[symbolic]) -> Kernel:
    """generator::build_kernel (generator.hpp:723-732): freeze the recorded
    state of ``outputs`` into a reusable fused kernel over ``params``."""
    return Kernel(name, outputs, params)


def make_function(functor: Callable, name: Optional[str] = None) -> builtin:
    """generator::make_function<Signature> (generator.hpp:740-829): convert
    a generic host functor into a device function usable in expressions.
    Under tracing this is direct: the functor body is traced into the
    calling kernel."""
    return builtin(name or getattr(functor, "__name__", "generated"), functor)
