"""Atomic scatter updates evaluated for side effects.

Analog of the reference's atomic builtins used through ``vex::eval``
(tests/eval.cpp:10-28: ``vex::eval(atomic_add(&permutation(idx)(y), 1))``
histograms into y).  OpenCL atomics exist because colliding work-items race;
on TPU the same operation is a *scatter-add*: ``y.at[idx].add(v)`` lowers to
an XLA scatter with ADD combiner, which is deterministic — duplicate indices
accumulate exactly, no atomics needed.  Supported combiners mirror the
OpenCL 1.1 atom_* family (atomic_add/sub/min/max).

Usage::

    vex.eval(vex.atomic_add(vex.permutation(idx)(y), 1))
    vex.eval(vex.atomic_sub(vex.permutation(idx)(y), some_expr))
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..cache import kernel_cache
from ..config import config
from ..expr.node import VectorTerminal, analyze, as_expr
from ..expr.view import PermutationView

__all__ = ["AtomicUpdate", "atomic_add", "atomic_sub", "atomic_min",
           "atomic_max"]

_COMBINE = {
    "add": lambda ref, v: ref.add(v),
    "sub": lambda ref, v: ref.add(-v),
    "min": lambda ref, v: ref.min(v),
    "max": lambda ref, v: ref.max(v),
}


class AtomicUpdate:
    """A pending scatter update; ``vex.eval`` executes it."""

    def __init__(self, op: str, target: PermutationView, value: Any):
        if not isinstance(target, PermutationView):
            raise TypeError(
                "atomic target must be a permutation view: "
                "atomic_add(permutation(idx)(y), v)"
            )
        base = target.children[0]
        if not isinstance(base, VectorTerminal):
            raise TypeError("atomic target must view a vector directly")
        self.op = op
        self.vec = base.vec
        self.index = target.children[1]
        self.value = as_expr(value)

    def execute(self):
        analysis = analyze(self.index, self.value)
        cache_key = ("atomic", self.op, analysis.sig)

        def factory():
            index, value = self.index, self.value

            def run(dest, *leaves):
                from ..expr.compile import _env_from

                env = _env_from(analysis, (index, value), leaves, None)
                idx = index.emit_cached(env).astype(jnp.int32)
                val = value.emit_cached(env)
                if jnp.ndim(val) == 0:
                    val = jnp.broadcast_to(val, idx.shape)
                return _COMBINE[self.op](dest.at[idx], val.astype(dest.dtype))

            donate = (0,) if config.donate else ()
            return jax.jit(run, donate_argnums=donate)

        jfn = (
            kernel_cache.get_or_create(cache_key, factory)
            if config.cache_kernels
            else factory()
        )
        self.vec._set_array(jfn(self.vec.array, *analysis.leaves))
        return self.vec


def _scatter_assign_dynamic(vec, index_expr, value, op: str = "="):
    """Assign through a permutation view: ``permutation(idx)(y).assign(v)``
    scatters v into y at idx (vector_view.hpp assign-to-permutation)."""
    index_expr = as_expr(index_expr)
    value = as_expr(value)
    analysis = analyze(index_expr, value)
    cache_key = ("scatter-assign", op, analysis.sig)

    def factory():
        def run(dest, *leaves):
            from ..expr.compile import _env_from

            env = _env_from(analysis, (index_expr, value), leaves, None)
            idx = index_expr.emit_cached(env).astype(jnp.int32)
            val = value.emit_cached(env)
            if jnp.ndim(val) == 0:
                val = jnp.broadcast_to(val, idx.shape)
            val = val.astype(dest.dtype)
            if op == "=":
                return dest.at[idx].set(val)
            if op == "+=":
                return dest.at[idx].add(val)
            if op == "*=":
                return dest.at[idx].multiply(val)
            from ..expr.compile import ASSIGN_OPS

            cur = dest[idx]
            return dest.at[idx].set(ASSIGN_OPS[op](cur, val).astype(dest.dtype))

        donate = (0,) if config.donate else ()
        return jax.jit(run, donate_argnums=donate)

    jfn = (
        kernel_cache.get_or_create(cache_key, factory)
        if config.cache_kernels
        else factory()
    )
    vec._set_array(jfn(vec.array, *analysis.leaves))
    return vec


def atomic_add(target, value) -> AtomicUpdate:
    return AtomicUpdate("add", target, value)


def atomic_sub(target, value) -> AtomicUpdate:
    return AtomicUpdate("sub", target, value)


def atomic_min(target, value) -> AtomicUpdate:
    return AtomicUpdate("min", target, value)


def atomic_max(target, value) -> AtomicUpdate:
    return AtomicUpdate("max", target, value)
