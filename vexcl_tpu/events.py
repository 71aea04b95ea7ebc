"""Cross-queue ordering: markers, barriers, explicit-queue assignment.

Analog of vexcl/backend/opencl/event.hpp:50-100 (enqueue_marker /
enqueue_barrier / wait lists) and vexcl/enqueue.hpp:38-136
(``vex::enqueue(queue)(x) = expr``).

On TPU, XLA's dataflow order already serializes dependent work per device
(there are no user-visible queues to race), so:

* ``enqueue_marker`` returns a handle that becomes ready when everything
  currently enqueued has completed (a sync point, like marker+wait);
* ``enqueue_barrier`` blocks host-side until the device drains — the
  strongest ordering the reference's barrier gives;
* ``enqueue(context)`` redirects an assignment's computation to another
  context/device set (the duplicate-queue use-case of the reference:
  overlap independent streams of work).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .context import Context, current_context
from .expr.compile import evaluate

__all__ = ["Event", "enqueue_marker", "enqueue_barrier", "enqueue"]


class Event:
    """Completion handle (backend::event analog)."""

    def __init__(self, sentinel):
        self._sentinel = sentinel

    def wait(self) -> None:
        jax.block_until_ready(self._sentinel)

    @property
    def complete(self) -> bool:
        try:
            return self._sentinel.is_ready()
        except Exception:
            return True


def enqueue_marker(context: Optional[Context] = None) -> Event:
    ctx = context or current_context()
    sent = jax.device_put(np.zeros(1, np.float32), ctx.devices[0])
    return Event(sent)


def enqueue_barrier(context: Optional[Context] = None) -> None:
    (context or current_context()).finish()


import functools


@functools.partial(jax.jit, static_argnums=2)
def _recombine(re, im, dt):
    return jax.lax.complex(re, im).astype(dt)


def _put(leaf, sh):
    """device_put that tolerates complex dtypes on the axon TPU platform
    (eager complex transfers raise UNIMPLEMENTED there): complex arrays
    migrate as (real, imag) float planes and recombine in a tiny jitted
    kernel on the target devices."""
    from .vector import (
        _complex_workaround_needed, _host_to_device_any, _split_complex)

    if isinstance(leaf, np.ndarray):
        return _host_to_device_any(leaf, sh)
    if _complex_workaround_needed(getattr(leaf, "dtype", np.float32)):
        dt = np.dtype(leaf.dtype)
        re, im = _split_complex(leaf)
        re = jax.device_put(re, sh)
        im = jax.device_put(im, sh)
        # combine runs where its inputs are committed (the target)
        return _recombine(re, im, dt)
    return jax.device_put(leaf, sh)


def _target_placer(ctx: Context):
    """Commit a concrete leaf to the target context so the computation
    executes THERE (committed inputs pin XLA's execution device)."""

    def place(leaf):
        if not hasattr(leaf, "shape"):
            return leaf  # python scalar — weak-typed, follows the arrays
        from .expr.compile import _commit_replicable, _replicable_ref

        if _replicable_ref(leaf):
            # Registered table (stencil coeffs, mba patch, image data):
            # commit it to the TARGET's device set through the shared
            # per-(buffer, sharding) cache (ADVICE r3: leaving it
            # untouched made _commit_scalars infer the device set from
            # the table's SOURCE sharding when no other device leaf
            # pinned the target, so the kernel ran on the wrong
            # context).  Cache-shared with _commit_scalars, so repeat
            # redirects are a dict hit; placement_known is unaffected
            # because _apply_leaf_transform's known() already excludes
            # replicable leaves.
            if ctx.size > 1:
                sh = ctx.replicated
            else:
                sh = jax.sharding.SingleDeviceSharding(ctx.devices[0])
            return _commit_replicable(leaf, sh)
        if ctx.size > 1:
            if (
                getattr(leaf, "ndim", 0) == 1
                and leaf.shape[0] > 0
                and leaf.shape[0] % ctx.size == 0
            ):
                sh = ctx.vector_sharding
            else:
                sh = ctx.replicated
        else:
            sh = jax.sharding.SingleDeviceSharding(ctx.devices[0])
        # Identity: a leaf whose devices already EQUAL the target set is
        # returned unchanged (its layout — sharded/replicated/padded —
        # is GSPMD-visible and needs no move; re-placing a multi-GB
        # matrix plane replicated every call is pure waste).  The
        # evaluator detects an all-unchanged redirect and keeps
        # placement_known=True, preserving the Pallas dist/local fast
        # paths for same-context enqueue (code-review r3).  EQUALITY,
        # not subset: a single-device leaf redirected onto a larger mesh
        # (or vice versa) must really move, or one jit would see mixed
        # committed device sets ('incompatible devices').
        cur = getattr(leaf, "sharding", None)
        if cur is not None:
            try:
                if cur == sh or set(cur.device_set) == set(sh.device_set):
                    return leaf
            except Exception:
                pass
        return _put(leaf, sh)

    return place


def _check_redirect(value, tgt: Context) -> None:
    """Fail fast BEFORE any leaf moves: a distributed-matrix expression
    cannot redirect to a different device set (its exchange topology is
    the construction mesh).  Detecting it at emit time would first pay a
    full-matrix transfer through the leaf transform (code-review r3)."""
    from .expr.node import as_expr
    from .sparse.distributed import DistSpMVExpr

    stack = [as_expr(value)]
    seen = set()
    while stack:
        node = stack.pop()
        if id(node) in seen:
            continue
        seen.add(id(node))
        if isinstance(node, DistSpMVExpr) and (
            set(tgt.devices) != set(node.mat.context.devices)
        ):
            raise ValueError(
                "vex.enqueue() cannot redirect a distributed SpMV to a "
                "different context: the matrix is sharded over its "
                "construction mesh. Evaluate on the matrix's context and "
                "copy the result, or rebuild the matrix on the target "
                "context."
            )
        inner = getattr(node, "inner", None)
        if inner is not None:
            stack.append(inner)
        stack.extend(getattr(node, "children", ()))


class _EnqueueTarget:
    def __init__(self, context: Context):
        self.context = context

    def __call__(self, vec):
        outer = self

        # tied / multivector targets: the reference's
        # enqueue_multiexpression case (tests/events.cpp) — one fused
        # kernel for all components, executed on the target context
        comps = None
        if hasattr(vec, "vectors"):  # vex.tie(...) result
            comps = list(vec.vectors)
        elif hasattr(vec, "_comps"):  # multivector
            comps = list(vec._comps)
        if comps is not None:
            return _RedirectedMulti(self.context, comps)

        class _Redirected:
            """Assignment proxy running the kernel on the target context.

            The reference's enqueue launches the same kernel on explicitly
            given queues (enqueue.hpp:38-136) — its use-case is overlapping
            independent work streams.  On TPU:

            * target devices == the vector's devices: XLA's per-device
              async streams already overlap independent programs — the
              assignment dispatches asynchronously as usual (this IS the
              duplicate-queue analog);
            * different devices: the inputs are committed to the target
              context and the kernel executes there, asynchronously
              overlapping whatever the original devices are running; the
              vector adopts the target context (its buffers now live
              where the kernel ran, like the reference's queue/buffer
              pairing).
            """

            def assign(_self, value, op: str = "=") -> None:
                if isinstance(value, type(vec)):
                    value = value[:]
                tgt = outer.context
                _check_redirect(value, tgt)
                same = set(tgt.devices) == set(vec.context.devices)
                # always re-commit inputs to the target (no-op when they
                # already live there): mixed-context expressions — e.g. a
                # migrated LHS combined with vectors still on the original
                # context — must execute on ONE device set
                place = _target_placer(tgt)
                old = None
                from .expr.compile import ASSIGN_OPS

                if ASSIGN_OPS[op] is not None:
                    old = vec.array
                arr = evaluate(
                    value, n=vec.size, op=op, old=old,
                    out_dtype=vec.dtype, leaf_transform=place,
                    # same-device re-commit is a no-copy alias of the
                    # vector's storage: borrowed buffers must survive
                    old_donatable=not vec._borrowed,
                )
                if not same:
                    # the vector migrates to the context that computed it
                    vec.context = tgt
                    vec._sharded = tgt.size > 1
                vec._set_array(arr)

            def __setitem__(_self, key, value) -> None:
                if not (isinstance(key, slice) and key == slice(None)):
                    raise TypeError("enqueue()(x)[:] = expr")
                _self.assign(value)

            def __iadd__(_self, value):
                _self.assign(value, "+="); return _self

            def __isub__(_self, value):
                _self.assign(value, "-="); return _self

            def __imul__(_self, value):
                _self.assign(value, "*="); return _self

            def __itruediv__(_self, value):
                _self.assign(value, "/="); return _self

        return _Redirected()


class _RedirectedMulti:
    """enqueue()(tie(x, y)) / enqueue()(mv): fused multi-assignment on the
    target context (enqueue.hpp:38-136 + assign_multiexpression)."""

    def __init__(self, context: Context, comps):
        self._context = context
        self._comps = comps

    def assign(self, value, op: str = "=") -> None:
        from .expr.compile import ASSIGN_OPS, evaluate_multi
        from .expr.node import as_expr
        from .multivector import MultiExpr, multivector

        vecs = self._comps
        if isinstance(value, multivector):
            value = value._as_multi()
        if isinstance(value, MultiExpr):
            exprs = list(value.components)
        elif isinstance(value, (tuple, list)):
            exprs = [as_expr(v) for v in value]
        else:
            exprs = [as_expr(value)] * len(vecs)
        if len(exprs) != len(vecs):
            raise ValueError("enqueue(): component count mismatch")
        tgt = self._context
        for e in exprs:
            _check_redirect(e, tgt)
        place = _target_placer(tgt)
        need_old = ASSIGN_OPS[op] is not None
        outs = evaluate_multi(
            exprs,
            ns=[v.size for v in vecs],
            ops=[op] * len(vecs),
            olds=[v.array if need_old else None for v in vecs],
            out_dtypes=[v.dtype for v in vecs],
            olds_donatable=[not v._borrowed for v in vecs],
            leaf_transform=place,
        )
        for v, arr in zip(vecs, outs):
            if set(tgt.devices) != set(v.context.devices):
                v.context = tgt
                v._sharded = tgt.size > 1
            v._set_array(arr)

    def __setitem__(self, key, value) -> None:
        if not (isinstance(key, slice) and key == slice(None)):
            raise TypeError("enqueue()(tie(...))[:] = exprs")
        self.assign(value)

    def __iadd__(self, value):
        self.assign(value, "+="); return self

    def __isub__(self, value):
        self.assign(value, "-="); return self

    def __imul__(self, value):
        self.assign(value, "*="); return self

    def __itruediv__(self, value):
        self.assign(value, "/="); return self


def enqueue(context: Context) -> _EnqueueTarget:
    """vex::enqueue(queue_list)(x) = expr (enqueue.hpp:38-136): run the
    assignment's kernel on the given context's devices (async; overlaps
    work on other devices), instead of the expression's home context."""
    return _EnqueueTarget(context)
