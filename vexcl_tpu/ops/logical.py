"""any_of / all_of predicates over expressions.

Analog of vexcl/logical.hpp:47-181.  The reference launches a one-workgroup
sampling kernel hoping for an early answer, then a full reduction; XLA's
fused any/all reduction reads each element exactly once with no second
pass, so the sampling trick is unnecessary on TPU.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..cache import kernel_cache
from ..config import config
from ..expr.compile import _env_from
from ..expr.node import analyze, as_expr, expression_properties

__all__ = ["any_of", "all_of"]


def _pred(expr: Any, mode: str) -> bool:
    expr = as_expr(expr)
    n, _ = expression_properties(expr)
    analysis = analyze(expr)
    key = ("logical", analysis.sig, mode, n)

    def factory():
        def run(*leaves):
            env = _env_from(analysis, (expr,), leaves, n)
            val = expr.emit_cached(env)
            return jnp.any(val) if mode == "any" else jnp.all(val)

        return jax.jit(run)

    jfn = (
        kernel_cache.get_or_create(key, factory)
        if config.cache_kernels
        else factory()
    )
    return bool(jfn(*analysis.leaves))


def any_of(expr: Any) -> bool:
    return _pred(expr, "any")


def all_of(expr: Any) -> bool:
    return _pred(expr, "all")
