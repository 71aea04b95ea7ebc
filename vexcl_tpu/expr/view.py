"""Vector views: slicing, permutation, reshape, sliced reduction.

Analog of vexcl/vector_view.hpp (gslice :264-417, range/`_` :420-446,
slicer :511-560, permutation :684-698, expr_permutation :601-682,
reduced_vector_view :708-, reshape :1099-1125) and vexcl/tensordot.hpp.

The reference generates index arithmetic (start + i*stride) into the kernel
source; here each view is an expression node emitting the corresponding JAX
indexing op, which XLA folds into the fused kernel as a strided/gathered
load.  Unlike the reference (which restricts views to single-device vectors,
docs/expressions.rst:813-819), sharded inputs work: XLA repartitions as
needed.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .node import ArrayTerminal, EmitEnv, Expr, as_expr

__all__ = [
    "SliceTerminal",
    "MultiSliceView",
    "PermutationView",
    "ReshapeView",
    "ReducedView",
    "slicer",
    "permutation",
    "reshape",
    "reduce_view",
    "r",
    "range_",
    "_",
    "SUM",
    "MIN",
    "MAX",
]


def _flat_indices_of_view(view) -> np.ndarray:
    """Host-side flat indices a static-keyed view reads from its base
    vector; used for the write path (assign-to-view)."""
    if isinstance(view, SliceTerminal):
        n = view.children[0].size_hint()
        (k,) = view._static_key[:1]
        if isinstance(k, slice):
            return np.arange(*k.indices(n))
        raise TypeError("assignment needs a static slice key")
    if isinstance(view, MultiSliceView):
        grid = np.arange(int(np.prod(view.dims))).reshape(view.dims)
        key = view._static_key
        if any(not isinstance(k, (slice, int, np.integer)) for k in key):
            raise TypeError("assignment needs static slice/int keys")
        return np.ravel(grid[tuple(key)])
    raise TypeError(f"cannot assign into {type(view).__name__}")


class _ViewAssignMixin:
    """Write path for views over a vector (vex: assign_to_view,
    vector_view.hpp — `slc[i](X) = expr;` writes through the view).  The
    update compiles to one fused kernel ending in an XLA scatter."""

    def assign(self, value, op: str = "="):
        from .node import VectorTerminal

        base = self.children[0]
        if not isinstance(base, VectorTerminal):
            raise TypeError("can only assign into a view of a vector")
        vec = base.vec
        if isinstance(self, PermutationView):
            from ..ops.atomic import _scatter_assign_dynamic

            return _scatter_assign_dynamic(vec, self.children[1], value, op)
        idx = _flat_indices_of_view(self)
        from .compile import evaluate

        val = evaluate(as_expr(value), n=len(idx)) if not np.isscalar(value) \
            else value
        arr = vec.array
        if np.isscalar(val):
            val = jnp.full(len(idx), val, dtype=arr.dtype)
        val = val.astype(arr.dtype)
        at = arr.at[idx]
        from ..expr.compile import ASSIGN_OPS

        if op == "=":
            vec._set_array(at.set(val))
        elif op == "+=":
            vec._set_array(at.add(val))
        elif op == "*=":
            vec._set_array(at.multiply(val))
        elif op in ASSIGN_OPS:
            cur = arr[idx]
            vec._set_array(at.set(ASSIGN_OPS[op](cur, val).astype(arr.dtype)))
        else:
            raise ValueError(f"unsupported view assignment op {op!r}")
        return self


class _UnderscoreType:
    """vex::_ — the whole-dimension placeholder (vector_view.hpp:446)."""

    def __repr__(self):
        return "_"


_ = _UnderscoreType()


class r:
    """vex::range(start, [stride,] stop) (vector_view.hpp:420-446)."""

    def __init__(self, start=None, stride_or_stop=None, stop=None):
        if start is None:
            self.slice = slice(None)
        elif stop is None:
            self.slice = slice(start, stride_or_stop)
        else:
            self.slice = slice(start, stop, stride_or_stop)


range_ = r


def _norm_key(key) -> Tuple:
    if not isinstance(key, tuple):
        key = (key,)
    out = []
    for k in key:
        if isinstance(k, _UnderscoreType):
            out.append(slice(None))
        elif isinstance(k, r):
            out.append(k.slice)
        else:
            out.append(k)
    return tuple(out)


def _key_sig(key: Tuple) -> str:
    parts = []
    for k in key:
        if isinstance(k, slice):
            parts.append(f"{k.start}:{k.stop}:{k.step}")
        elif isinstance(k, (int, np.integer)):
            parts.append(str(int(k)))
        else:
            parts.append("ix")  # runtime index array -> leaf
    return ",".join(parts)


class SliceTerminal(_ViewAssignMixin, Expr):
    """expr[key] over the flat vector (1-D gslice)."""

    _size_transparent = False

    _opname = "slice"

    def __init__(self, inner: Any, key):
        key = _norm_key(key)
        self._static_key = key
        idx_leaves = []
        for k in key:
            if not isinstance(k, (slice, int, np.integer)):
                a = k.array if hasattr(k, "array") else np.asarray(k)
                idx_leaves.append(ArrayTerminal(a))
        self.children = (as_expr(inner),) + tuple(idx_leaves)

    def extra_sig(self) -> str:
        return _key_sig(self._static_key)

    def emit(self, env: EmitEnv):
        x = self.children[0].emit_cached(env)
        leaves = iter(self.children[1:])
        key = tuple(
            k if isinstance(k, (slice, int, np.integer)) else next(leaves).emit_cached(env)
            for k in self._static_key
        )
        return x[key if len(key) > 1 else key[0]]

    def size_hint(self) -> Optional[int]:
        k = self._static_key[0]
        if isinstance(k, slice):
            n = self.children[0].size_hint()
            if n is not None:
                return len(range(*k.indices(n)))
        return None


class MultiSliceView(_ViewAssignMixin, Expr):
    """N-D strided view of a flat vector: slicer(dims)[key](x)
    (gslice/slicer, vector_view.hpp:264-560).  Emits
    x.reshape(dims)[key] — a strided load fused into the kernel."""

    _size_transparent = False

    _opname = "gslice"

    def __init__(self, dims: Sequence[int], key, inner: Any):
        self.dims = tuple(int(d) for d in dims)
        key = _norm_key(key)
        if len(key) < len(self.dims):
            key = key + (slice(None),) * (len(self.dims) - len(key))
        self._static_key = key
        idx_leaves = []
        for k in key:
            if not isinstance(k, (slice, int, np.integer)):
                a = k.array if hasattr(k, "array") else np.asarray(k)
                idx_leaves.append(ArrayTerminal(a))
        self.children = (as_expr(inner),) + tuple(idx_leaves)

    def extra_sig(self) -> str:
        return f"{self.dims}|{_key_sig(self._static_key)}"

    def emit(self, env: EmitEnv):
        x = self.children[0].emit_cached(env).reshape(self.dims)
        leaves = iter(self.children[1:])
        key = tuple(
            k if isinstance(k, (slice, int, np.integer)) else next(leaves).emit_cached(env)
            for k in self._static_key
        )
        return x[key]

    def shape_hint(self) -> Optional[Tuple[int, ...]]:
        """Post-key output dims (ints drop a dim; None if any dynamic
        index array participates)."""
        out = []
        for d, k in zip(self.dims, self._static_key):
            if isinstance(k, slice):
                out.append(len(range(*k.indices(d))))
            elif isinstance(k, (int, np.integer)):
                continue
            else:
                return None
        return tuple(out)

    def size_hint(self) -> Optional[int]:
        n = 1
        for d, k in zip(self.dims, self._static_key):
            if isinstance(k, slice):
                n *= len(range(*k.indices(d)))
            elif isinstance(k, (int, np.integer)):
                continue
            else:
                return None
        return n


class slicer:
    """vex::slicer<NDIM>(extents): ``slicer((n, m))[i, j](x)``."""

    def __init__(self, *dims):
        if len(dims) == 1 and isinstance(dims[0], (tuple, list, np.ndarray)):
            dims = tuple(dims[0])
        self.dims = tuple(int(d) for d in dims)

    def __getitem__(self, key):
        dims = self.dims

        class _Bound:
            def __call__(_self, x):
                return MultiSliceView(dims, key, x)

            def __getitem__(_self, more):
                more_t = more if isinstance(more, tuple) else (more,)
                key_t = key if isinstance(key, tuple) else (key,)
                return slicer(dims).__getitem__(key_t + more_t)

        return _Bound()


class PermutationView(_ViewAssignMixin, Expr):
    """permutation(idx)(x): x gathered at idx
    (vector_view.hpp:601-698).  idx may be a vector, array, or index
    expression (expr_permutation)."""

    _size_transparent = False

    _opname = "perm"

    def __init__(self, index: Any, inner: Any):
        self.children = (as_expr(inner), as_expr(index))

    def emit(self, env: EmitEnv):
        x = self.children[0].emit_cached(env)
        idx = self.children[1].emit_cached(env)
        return jnp.take(x, idx.astype(jnp.int32), axis=0)

    def size_hint(self) -> Optional[int]:
        return self.children[1].size_hint()


def permutation(index: Any):
    return lambda x: PermutationView(index, x)


class ReshapeView(Expr):
    """vex::reshape(expr, dst_lengths, order) (vector_view.hpp:1099-1125).

    out[i0..ik] = x[i[order[0]], i[order[1]], ...] where x is viewed with
    shape [dst[o] for o in order].  order a full permutation -> transpose;
    a subset -> broadcast along the missing output dims.
    """

    _size_transparent = False

    _opname = "reshape"

    def __init__(self, inner: Any, dst_dims: Sequence[int], order: Sequence[int]):
        self.dst = tuple(int(d) for d in dst_dims)
        self.order = tuple(int(o) for o in order)
        self.children = (as_expr(inner),)

    def extra_sig(self) -> str:
        return f"{self.dst}|{self.order}"

    def emit(self, env: EmitEnv):
        x = self.children[0].emit_cached(env)
        src_shape = tuple(self.dst[o] for o in self.order)
        xr = x.reshape(src_shape)
        # place source axis j at output dim order[j]
        out_ndim = len(self.dst)
        # build transpose+expand: start with xr axes in src order, create
        # output by inserting size-1 dims for missing outputs then transposing
        missing = [d for d in range(out_ndim) if d not in self.order]
        xr = jnp.expand_dims(xr, axis=tuple(range(len(src_shape), len(src_shape) + len(missing))))
        # current axis order: [order..., missing...] -> want ascending dims
        axis_for_dim = {}
        for j, o in enumerate(self.order):
            axis_for_dim[o] = j
        for j, m in enumerate(missing):
            axis_for_dim[m] = len(self.order) + j
        perm = [axis_for_dim[d] for d in range(out_ndim)]
        xr = jnp.transpose(xr, perm)
        return jnp.broadcast_to(xr, self.dst).reshape(-1)

    def shape_hint(self) -> Optional[Tuple[int, ...]]:
        return self.dst

    def size_hint(self) -> Optional[int]:
        return int(np.prod(self.dst))


def reshape(x: Any, dst_dims: Sequence[int], order: Optional[Sequence[int]] = None):
    if order is None:
        order = tuple(range(len(dst_dims)))
    return ReshapeView(x, dst_dims, order)


SUM = "sum"
MIN = "min"
MAX = "max"

_REDUCERS = {
    "sum": jnp.sum,
    "min": jnp.min,
    "max": jnp.max,
    "prod": jnp.prod,
}


class ReducedView(Expr):
    """vex::reduce<SUM>(view, dims): partial reduction over view axes
    (reduced_vector_view, vector_view.hpp:708-).  The result is again a
    (flattened) expression usable inside larger expressions."""

    _size_transparent = False

    _opname = "vreduce"

    def __init__(self, op: str, inner: Expr, axes: Sequence[int]):
        self.op = op
        self.axes = tuple(int(a) for a in axes)
        self.children = (as_expr(inner),)

    def extra_sig(self) -> str:
        return f"{self.op}|{self.axes}"

    def emit(self, env: EmitEnv):
        x = self.children[0].emit_cached(env)
        out = _REDUCERS[self.op](x, axis=self.axes)
        return out.reshape(-1)

    def size_hint(self) -> Optional[int]:
        sh = getattr(self.children[0], "shape_hint", lambda: None)()
        if sh is None:
            return None
        axes = {a % len(sh) for a in self.axes}  # emit accepts negatives
        rem = [d for i, d in enumerate(sh) if i not in axes]
        return int(np.prod(rem)) if rem else 1


def reduce_view(op: str, view: Any, axes) -> ReducedView:
    if isinstance(axes, (int, np.integer)):
        axes = (int(axes),)
    if not isinstance(view, Expr) and callable(getattr(view, "view", None)):
        view = view.view()  # vex::reduce(multi_array, dims)
    op = str(op).lower()  # accept the reference's SUM/MIN/MAX spellings
    if op not in _REDUCERS:
        raise ValueError(f"unknown reduction {op!r}; one of {sorted(_REDUCERS)}")
    return ReducedView(op, view, axes)
