"""User-defined device functions.

Analog of the VEX_FUNCTION macro family (vexcl/function.hpp:146-243) and
proto UserFunction (vexcl/operations.hpp:575-628).  The reference splices
user-written OpenCL/CUDA source into the generated kernel; here the user
writes a plain Python function over JAX values, which is traced into the
fused expression kernel — same inlining/fusion result, no string pasting.

Dependencies between user functions (VEX_FUNCTION_D) need no declaration:
calling one traced function from another just works.  VEX_DUAL_FUNCTOR is
the default behavior: the function runs eagerly on plain values and lazily
inside expressions.
"""

from __future__ import annotations

from typing import Callable

from .builtins import builtin

__all__ = ["function", "Function", "device_function"]


def function(fn: Callable = None, *, name: str = None):
    """Decorator turning a Python function into an expression-capable
    device function::

        @vex.function
        def squared_radius(x, y):
            return x * x + y * y

        r2[:] = squared_radius(x, y)          # lazy, fused
        assert squared_radius(3.0, 4.0) == 25 # eager (dual functor)
    """

    def wrap(f: Callable) -> builtin:
        return builtin(name or f.__name__, f)

    if fn is None:
        return wrap
    return wrap(fn)


def Function(name: str, fn: Callable) -> builtin:
    """Explicit constructor form: ``Function("rad2", lambda x, y: x*x+y*y)``."""
    return builtin(name, fn)


device_function = function
