"""Lazy expression tree — the TPU-native expression engine core.

Analog of the reference's Boost.Proto grammar + codegen traversal
(vexcl/operations.hpp: grammars :682-827, `vector_expr_context` :1196-1353,
`declare_expression_parameter` :1356, `set_expression_argument` :1386,
`get_expression_properties` :1411).

The reference walks a C++ expression tree and emits OpenCL/CUDA source which
it JIT-compiles once per (expression type, device).  Here the tree is built
at runtime from Python operator overloads; "codegen" is tracing the tree
into a jitted JAX function (XLA fuses the whole expression into one kernel),
and the compilation cache is keyed by the tree's structural signature — the
same role the sha1 source hash plays in the reference
(vexcl/backend/opencl/compiler.hpp:109-182).

Every node implements:

* ``children``      — sub-expressions,
* ``extra_sig()``   — static parameters baked into the cache key,
* ``leaf_key()``    — (terminals) identity used for argument dedup
                      (the tagged_terminal mechanism, tagged_terminal.hpp),
* ``payload()``     — (terminals) runtime argument passed to the jitted fn,
* ``emit(env)``     — build the traced JAX value.
"""

from __future__ import annotations

import operator
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..types import dtype_of

__all__ = [
    "Expr",
    "BinOp",
    "UnOp",
    "FuncCall",
    "Where",
    "VectorTerminal",
    "ArrayTerminal",
    "ScalarTerminal",
    "ConstantTerminal",
    "ElementIndex",
    "TaggedTerminal",
    "Temporary",
    "CastExpr",
    "element_index",
    "tag",
    "make_temp",
    "constant",
    "cast",
    "if_else",
    "as_expr",
    "EmitEnv",
    "Analysis",
    "analyze",
    "expression_properties",
]


class EmitEnv:
    """Carries leaf values + output-size context during trace.

    ``values``  maps id(terminal-node) -> traced JAX value.
    ``n``       is the output length (for broadcasting terminals such as
                element_index, the analog of expression_properties' size).
    ``temps``   memoizes Temporary nodes so they are computed once
                (temporary.hpp:49-108 semantics).
    """

    def __init__(self, values: Dict[int, Any], n: Optional[int] = None):
        self.values = values
        self.n = n
        self.temps: Dict[Any, Any] = {}
        #: ids of terminal nodes whose leaf slot is jit-DONATED and
        #: single-use: a Pallas terminal (e.g. the stencil) may consume
        #: the buffer in place via input_output_aliases (compile.py
        #: _slot_single_use; the reference's inherent in-place write,
        #: vector.hpp:679-801).
        self.inplace: set = set()
        #: False when the traced leaves were leaf_transform-ed (vex
        #: .enqueue redirects, events.py) and so may live on a DIFFERENT
        #: device set than the captured expression's containers: emit()
        #: dispatches that inspect concrete container shardings (the
        #: Pallas stencil's dist/local guards) must then fall back to the
        #: placement-neutral XLA form, which follows the traced leaves
        #: (code-review r3 finding: the dist stencil shard_map crashed
        #: under an enqueue redirect to a different context).
        self.placement_known: bool = True


class Analysis:
    """Result of one structural traversal: cache signature + flat leaves."""

    __slots__ = ("sig", "leaves", "slot_of", "elementwise_sizes")

    def __init__(self, sig: str, leaves: List[Any], slot_of: Dict[int, int],
                 elementwise_sizes: List[int] = ()):
        self.sig = sig
        self.leaves = leaves
        self.slot_of = slot_of
        self.elementwise_sizes = elementwise_sizes


class _SigCtx:
    def __init__(self) -> None:
        self.leaves: List[Any] = []
        self.slot_of: Dict[int, int] = {}
        self._key_slot: Dict[Any, int] = {}
        # DAG handling: expressions built by host algorithms (e.g. the
        # symbolic generator recording an RK4 step) share subtrees; a naive
        # tree walk re-visits them exponentially.  Shared nodes get a
        # back-reference "@k" in the signature and are traversed once.
        self.node_ref: Dict[int, int] = {}
        # sizes of vector terminals reached only through size-preserving
        # nodes — collected during THIS walk so VEXCL_CHECK_SIZES needs no
        # second traversal (operations.hpp:1442-1458 analog)
        self.elementwise_sizes: List[int] = []
        self.transparent: bool = True
        # nodes already walked in a TRANSPARENT context: a shared subtree
        # first reached under a size-transforming node is memoized as a
        # back-reference, so its terminal sizes must still be collected the
        # first time it is ALSO reached elementwise (A*x + x vs x + A*x)
        self.seen_transparent: set = set()

    def slot(self, node: "Expr") -> int:
        key = node.leaf_key()
        if key in self._key_slot:
            s = self._key_slot[key]
        else:
            s = len(self.leaves)
            self._key_slot[key] = s
            self.leaves.append(node.payload())
        self.slot_of[id(node)] = s
        return s


def analyze(*exprs: "Expr") -> Analysis:
    """One deterministic preorder traversal over (possibly several) DAGs."""
    ctx = _SigCtx()
    sigs = [e.sig_cached(ctx) for e in exprs]
    return Analysis(";".join(sigs), ctx.leaves, ctx.slot_of,
                    ctx.elementwise_sizes)


class Expr:
    """Base class: lazy value with operator overloads."""

    children: Tuple["Expr", ...] = ()
    _opname = "expr"
    #: False on size-transforming nodes (views, spmv, tensordot, ...):
    #: vector terminals beneath them are exempt from elementwise size checks
    #: (the VEXCL_CHECK_SIZES walk stops at such terminals too).
    _size_transparent = True

    # -- structural signature ---------------------------------------------
    def extra_sig(self) -> str:
        return ""

    def sig_cached(self, ctx: _SigCtx) -> str:
        """Signature with shared-subtree back-references (DAG-safe)."""
        ref = ctx.node_ref.get(id(self))
        if ref is not None:
            if ctx.transparent and id(self) not in ctx.seen_transparent:
                # first elementwise visit of a subtree first seen under a
                # size-transforming node: collect sizes without re-signing
                self._collect_sizes(ctx)
            return f"@{ref}"
        ctx.node_ref[id(self)] = len(ctx.node_ref)
        if ctx.transparent:
            ctx.seen_transparent.add(id(self))
        return self._sig(ctx)

    def _collect_sizes(self, ctx: _SigCtx) -> None:
        """Size-check-only walk of an already-signed subtree (no slots, no
        signature): append elementwise vector sizes, stopping at
        size-transforming nodes exactly like the signing walk does."""
        ctx.seen_transparent.add(id(self))
        if not self._size_transparent:
            return
        for c in self.children:
            if id(c) not in ctx.seen_transparent:
                c._collect_sizes(ctx)

    def _sig(self, ctx: _SigCtx) -> str:
        if self._size_transparent or not ctx.transparent:
            inner = ",".join(c.sig_cached(ctx) for c in self.children)
        else:
            # size-transforming node: vector terminals below are exempt
            # from the elementwise size check
            ctx.transparent = False
            inner = ",".join(c.sig_cached(ctx) for c in self.children)
            ctx.transparent = True
        ex = self.extra_sig()
        return f"{self._opname}{'[' + ex + ']' if ex else ''}({inner})"

    # -- terminals override these ------------------------------------------
    def leaf_key(self) -> Any:
        raise NotImplementedError

    def payload(self) -> Any:
        raise NotImplementedError

    def load(self, value):
        """In-trace transform applied to this terminal's raw leaf value
        when the evaluation environment is built (identity by default)."""
        return value

    # -- trace --------------------------------------------------------------
    def emit_cached(self, env: "EmitEnv"):
        """Emit with per-node memoization (DAG-safe; shared subexpressions
        trace once, like the reference's CSE over generated source)."""
        vid = id(self)
        if vid in env.values:
            return env.values[vid]
        v = self.emit(env)
        env.values[vid] = v
        return v

    def emit(self, env: EmitEnv):
        raise NotImplementedError

    # -- size/partition inference (get_expression_properties analog) --------
    def size_hint(self) -> Optional[int]:
        for c in self.children:
            n = c.size_hint()
            if n is not None:
                return n
        return None

    def vector_terminals(self) -> List["VectorTerminal"]:
        out: List[VectorTerminal] = []
        stack: List[Expr] = [self]
        seen = set()
        while stack:
            e = stack.pop()
            if id(e) in seen:
                continue
            seen.add(id(e))
            if isinstance(e, VectorTerminal):
                out.append(e)
            stack.extend(e.children)
        return out

    # -- python protocol ----------------------------------------------------
    def __add__(self, o):
        return BinOp("add", self, as_expr(o))

    def __radd__(self, o):
        return BinOp("add", as_expr(o), self)

    def __sub__(self, o):
        return BinOp("sub", self, as_expr(o))

    def __rsub__(self, o):
        return BinOp("sub", as_expr(o), self)

    def __mul__(self, o):
        return BinOp("mul", self, as_expr(o))

    def __rmul__(self, o):
        return BinOp("mul", as_expr(o), self)

    def __truediv__(self, o):
        return BinOp("div", self, as_expr(o))

    def __rtruediv__(self, o):
        return BinOp("div", as_expr(o), self)

    def __floordiv__(self, o):
        return BinOp("floordiv", self, as_expr(o))

    def __rfloordiv__(self, o):
        return BinOp("floordiv", as_expr(o), self)

    def __mod__(self, o):
        return BinOp("mod", self, as_expr(o))

    def __rmod__(self, o):
        return BinOp("mod", as_expr(o), self)

    def __pow__(self, o):
        return BinOp("pow", self, as_expr(o))

    def __rpow__(self, o):
        return BinOp("pow", as_expr(o), self)

    def __neg__(self):
        return UnOp("neg", self)

    def __pos__(self):
        return self

    def __abs__(self):
        return UnOp("abs", self)

    def __invert__(self):
        return UnOp("bitnot", self)

    def __and__(self, o):
        return BinOp("bitand", self, as_expr(o))

    def __rand__(self, o):
        return BinOp("bitand", as_expr(o), self)

    def __or__(self, o):
        return BinOp("bitor", self, as_expr(o))

    def __ror__(self, o):
        return BinOp("bitor", as_expr(o), self)

    def __xor__(self, o):
        return BinOp("bitxor", self, as_expr(o))

    def __rxor__(self, o):
        return BinOp("bitxor", as_expr(o), self)

    def __lshift__(self, o):
        return BinOp("shl", self, as_expr(o))

    def __rshift__(self, o):
        return BinOp("shr", self, as_expr(o))

    def __lt__(self, o):
        return BinOp("lt", self, as_expr(o))

    def __le__(self, o):
        return BinOp("le", self, as_expr(o))

    def __gt__(self, o):
        return BinOp("gt", self, as_expr(o))

    def __ge__(self, o):
        return BinOp("ge", self, as_expr(o))

    def __eq__(self, o):  # noqa: E721 - expression semantics, like VexCL
        return BinOp("eq", self, as_expr(o))

    def __ne__(self, o):
        return BinOp("ne", self, as_expr(o))

    __hash__ = None  # type: ignore[assignment]


_BINOPS: Dict[str, Callable] = {
    "add": operator.add,
    "sub": operator.sub,
    "mul": operator.mul,
    "div": operator.truediv,
    "floordiv": operator.floordiv,
    "mod": operator.mod,
    "pow": operator.pow,
    "bitand": operator.and_,
    "bitor": operator.or_,
    "bitxor": operator.xor,
    "shl": operator.lshift,
    "shr": operator.rshift,
    "lt": operator.lt,
    "le": operator.le,
    "gt": operator.gt,
    "ge": operator.ge,
    "eq": operator.eq,
    "ne": operator.ne,
    "atan2": jnp.arctan2,
    "fmod": jnp.fmod,
    "min": jnp.minimum,
    "max": jnp.maximum,
    "hypot": jnp.hypot,
    "copysign": jnp.copysign,
    "fdim": lambda a, b: jnp.maximum(a - b, 0),
    "ldexp": jnp.ldexp,
    "nextafter": jnp.nextafter,
    "logical_and": jnp.logical_and,
    "logical_or": jnp.logical_or,
}

_UNOPS: Dict[str, Callable] = {
    "neg": operator.neg,
    "abs": jnp.abs,
    "bitnot": operator.invert,
    "logical_not": jnp.logical_not,
}


class BinOp(Expr):
    _opname = "b"

    def __init__(self, op: str, a: Expr, b: Expr):
        self.op = op
        self.children = (a, b)

    def extra_sig(self) -> str:
        return self.op

    def emit(self, env: EmitEnv):
        a = self.children[0].emit_cached(env)
        b = self.children[1].emit_cached(env)
        return _BINOPS[self.op](a, b)


class UnOp(Expr):
    _opname = "u"

    def __init__(self, op: str, a: Expr):
        self.op = op
        self.children = (a,)

    def extra_sig(self) -> str:
        return self.op

    def emit(self, env: EmitEnv):
        return _UNOPS[self.op](self.children[0].emit_cached(env))


class FuncCall(Expr):
    """Application of a named device function (builtin or user-defined).

    The analog of proto UserFunction terminals (operations.hpp:575-628):
    the function body becomes part of the traced computation, so XLA inlines
    and fuses it exactly like the reference inlines the function source.
    """

    _opname = "f"

    def __init__(self, name: str, impl: Callable, args: Sequence[Expr]):
        self.name = name
        self.impl = impl
        self.children = tuple(as_expr(a) for a in args)

    def extra_sig(self) -> str:
        # Name alone cannot key the kernel cache: two functions named "f"
        # with different bodies must compile separately (the reference keys
        # on generated source, so it gets this for free).
        from ..cache import fn_token

        return f"{self.name}#{fn_token(self.impl)}"

    def emit(self, env: EmitEnv):
        return self.impl(*[c.emit_cached(env) for c in self.children])


class Where(Expr):
    """Ternary select: if_else(cond, a, b) — `cond ? a : b` in the
    reference's generated source."""

    _opname = "where"

    def __init__(self, c: Expr, a: Expr, b: Expr):
        self.children = (as_expr(c), as_expr(a), as_expr(b))

    def emit(self, env: EmitEnv):
        c, a, b = (x.emit_cached(env) for x in self.children)
        return jnp.where(c, a, b)


# ---------------------------------------------------------------------------
# Terminals
# ---------------------------------------------------------------------------


class VectorTerminal(Expr):
    """A vexcl_tpu.vector leaf — becomes one kernel argument.

    Analog of the vector terminal's partial_vector_expr "prm_N[idx]"
    (operations.hpp:167-185).  Dedup by underlying buffer identity: the
    same array appearing twice is passed once (what vex::tag achieves
    manually in the reference, tagged_terminal.hpp:116-145).
    """

    _opname = "v"

    def __init__(self, vec):
        self.vec = vec

    def extra_sig(self) -> str:
        return ""

    def _collect_sizes(self, ctx: _SigCtx) -> None:
        ctx.seen_transparent.add(id(self))
        ctx.elementwise_sizes.append(self.vec.size)

    def _sig(self, ctx: _SigCtx) -> str:
        s = ctx.slot(self)
        if ctx.transparent:
            ctx.elementwise_sizes.append(self.vec.size)
        pad = getattr(self.vec, "_pad", 0)
        # padded storage (odd size sharded over the mesh): the logical size
        # is part of the structure — emit slices the pad off in-kernel
        return f"v{s}p{self.vec.size}" if pad else f"v{s}"

    def leaf_key(self) -> Any:
        return ("buf", id(self.vec.storage))

    def payload(self) -> Any:
        # padded STORAGE ships to the kernel; emit() slices to logical size
        # inside the trace (fused by XLA, keeps the even sharding on input)
        return self.vec.storage

    def load(self, value):
        if getattr(self.vec, "_pad", 0):
            return value[: self.vec.size]
        return value

    def emit(self, env: EmitEnv):
        return env.values[id(self)]

    def size_hint(self) -> Optional[int]:
        return self.vec.size


class ArrayTerminal(Expr):
    """A raw jax/numpy array leaf."""

    _opname = "a"

    def __init__(self, array):
        self.array = array

    def _sig(self, ctx: _SigCtx) -> str:
        s = ctx.slot(self)
        return f"a{s}r{np.ndim(self.array)}"

    def leaf_key(self) -> Any:
        return ("buf", id(self.array))

    def payload(self) -> Any:
        return self.array

    def emit(self, env: EmitEnv):
        return env.values[id(self)]

    def size_hint(self) -> Optional[int]:
        shp = np.shape(self.array)
        return int(shp[0]) if len(shp) == 1 else None


class ScalarTerminal(Expr):
    """A runtime scalar — passed as a (weak-typed) argument, NOT baked into
    the signature, so `x = a*y` hits the cache for every value of `a`
    (the reference passes scalars as kernel args the same way)."""

    _opname = "s"

    def __init__(self, value):
        self.value = value

    def _sig(self, ctx: _SigCtx) -> str:
        s = ctx.slot(self)
        return f"s{s}"

    def leaf_key(self) -> Any:
        return ("scalar", id(self))

    def payload(self) -> Any:
        return self.value

    def emit(self, env: EmitEnv):
        return env.values[id(self)]

    def size_hint(self) -> Optional[int]:
        return None


class ConstantTerminal(Expr):
    """A compile-time constant baked into the kernel (VEX_CONSTANT,
    constants.hpp:52-142).  Its value is part of the cache signature."""

    _opname = "c"

    def __init__(self, value, name: str = ""):
        self.value = value
        self.name = name or repr(value)

    def extra_sig(self) -> str:
        return self.name

    def emit(self, env: EmitEnv):
        return self.value

    def size_hint(self) -> Optional[int]:
        return None


class ElementIndex(Expr):
    """Global element index terminal (element_index.hpp:38-58):
    emits iota(n) + offset at the expression's output size.

    Width caveat: the reference's index is OpenCL ``size_t`` (64-bit), so
    integer index arithmetic wraps mod 2^64; here it is i32 unless
    ``jax_enable_x64`` (TPUs have no native i64), so pure-integer products
    like ``element_index()**4`` wrap mod 2^32 (found by
    exp/fuzz_expressions.py).  Promote to float early (``1.0 *
    element_index()``) when composing large index polynomials."""

    _opname = "idx"

    def __init__(self, offset: int = 0, length: Optional[int] = None):
        self.offset = offset
        self.length = length

    def extra_sig(self) -> str:
        return f"{self.offset}:{self.length}"

    def emit(self, env: EmitEnv):
        n = self.length if self.length is not None else env.n
        if n is None:
            raise ValueError(
                "element_index() needs an explicit length or a sized expression"
            )
        return jnp.arange(self.offset, self.offset + n, dtype=jnp.int64 if jax.config.jax_enable_x64 else jnp.int32)

    def size_hint(self) -> Optional[int]:
        return self.length


class TaggedTerminal(Expr):
    """vex::tag<N>(x): force two occurrences to share one kernel argument
    (tagged_terminal.hpp:50-269)."""

    _opname = "tag"

    def __init__(self, tag_id: Any, inner: Expr):
        self.tag_id = tag_id
        self.inner = inner

    def _sig(self, ctx: _SigCtx) -> str:
        s = ctx.slot(self)
        return f"t{s}"

    def leaf_key(self) -> Any:
        return ("tag", self.tag_id)

    def payload(self) -> Any:
        if isinstance(self.inner, (VectorTerminal, ArrayTerminal, ScalarTerminal)):
            return self.inner.payload()
        raise TypeError("tag() expects a vector/array/scalar terminal")

    def emit(self, env: EmitEnv):
        return env.values[id(self)]

    def size_hint(self) -> Optional[int]:
        return self.inner.size_hint()


class Temporary(Expr):
    """vex::make_temp<Tag>(expr): evaluate a subexpression once and reuse
    the value (temporary.hpp:49-108).  Under XLA, CSE would usually do this
    anyway; the node guarantees it structurally and keeps trace size small."""

    _opname = "tmp"

    def __init__(self, tag_id: Any, inner: Expr):
        self.tag_id = tag_id
        self.children = (inner,)

    def extra_sig(self) -> str:
        return str(self.tag_id)

    def emit(self, env: EmitEnv):
        key = ("temp", self.tag_id)
        if key not in env.temps:
            env.temps[key] = self.children[0].emit_cached(env)
        return env.temps[key]


class CastExpr(Expr):
    """vex::cast<T>(expr) (cast.hpp:44-120)."""

    _opname = "cast"

    def __init__(self, dtype, inner: Expr):
        self.dtype = dtype_of(dtype)
        self.children = (as_expr(inner),)

    def extra_sig(self) -> str:
        return str(self.dtype)

    def emit(self, env: EmitEnv):
        return self.children[0].emit_cached(env).astype(self.dtype)


# ---------------------------------------------------------------------------
# Public constructors
# ---------------------------------------------------------------------------


def as_expr(x: Any) -> Expr:
    """Coerce any operand to an expression node."""
    if isinstance(x, Expr):
        return x
    # vector duck-typing (avoid circular import)
    if hasattr(x, "_as_terminal"):
        return x._as_terminal()
    if isinstance(x, (jax.Array, np.ndarray)):
        return ArrayTerminal(x)
    if isinstance(x, (int, float, complex, bool, np.generic)):
        return ScalarTerminal(x)
    raise TypeError(f"cannot use {type(x)!r} in a vector expression")


def element_index(offset: int = 0, length: Optional[int] = None) -> ElementIndex:
    return ElementIndex(offset, length)


def tag(tag_id: Any, x: Any = None):
    """``tag(7)(x)`` or ``tag(7, x)`` — mirror of vex::tag<7>(x)."""
    if x is None:
        return lambda y: TaggedTerminal(tag_id, as_expr(y))
    return TaggedTerminal(tag_id, as_expr(x))


def make_temp(tag_id: Any, expr: Any):
    """vex::make_temp<Tag>(expr) (temporary.hpp:49-108).  Lifts
    componentwise over multivector expressions (temporary.cpp
    multivector_temporary): each component gets its own (tag, i) slot so
    components never alias each other's cached value inside the one fused
    kernel."""
    if hasattr(expr, "components") or hasattr(expr, "_as_multi"):
        from ..multivector import MultiExpr

        comps = (expr.components if hasattr(expr, "components")
                 else [expr(i)._as_terminal() for i in range(expr.nparts)])
        return MultiExpr(
            [Temporary((tag_id, i), as_expr(c)) for i, c in enumerate(comps)]
        )
    return Temporary(tag_id, as_expr(expr))


def constant(value, name: str = "") -> ConstantTerminal:
    return ConstantTerminal(value, name)


def cast(dtype, expr: Any) -> CastExpr:
    return CastExpr(dtype, expr)


def if_else(cond: Any, a: Any, b: Any) -> Where:
    return Where(as_expr(cond), as_expr(a), as_expr(b))


# ---------------------------------------------------------------------------
# Expression properties (get_expression_properties, operations.hpp:1411)
# ---------------------------------------------------------------------------


def expression_properties(expr: Expr):
    """Return (size, context) deduced from the first vector terminal."""
    from ..context import current_context

    terms = expr.vector_terminals()
    if terms:
        v = terms[0].vec
        return v.size, v.context
    n = expr.size_hint()
    return n, current_context(required=False)
