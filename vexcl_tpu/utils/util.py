"""Small utilities (vexcl/util.hpp analog: precondition :67, nextpow2 :80,
alignup :91) and the kernel-failure diagnostics of detail/backtrace.hpp."""

from __future__ import annotations

import traceback
from typing import Any

__all__ = ["precondition", "nextpow2", "alignup", "ExpressionError"]


def precondition(cond: Any, message: str = "precondition failed") -> None:
    """vex::precondition (util.hpp:67)."""
    if not cond:
        raise ValueError(message)


def nextpow2(n: int) -> int:
    """Smallest power of two >= n (util.hpp:80)."""
    if n <= 1:
        return 1
    return 1 << (int(n) - 1).bit_length()


def alignup(n: int, m: int) -> int:
    """Round n up to a multiple of m (util.hpp:91)."""
    return ((int(n) + int(m) - 1) // int(m)) * int(m)


class ExpressionError(RuntimeError):
    """Raised when compiling/evaluating an expression kernel fails; carries
    the expression signature the way the reference prints the generated
    source + backtrace on build failure (opencl/compiler.hpp:164-174,
    detail/backtrace.hpp:45-59)."""

    def __init__(self, signature: str, cause: BaseException):
        self.signature = signature
        self.cause = cause
        super().__init__(
            f"expression kernel failed\n  signature: {signature}\n"
            f"  cause: {type(cause).__name__}: {cause}"
        )


def to_device(host) -> Any:
    """Host -> device transfer that tolerates complex dtypes on the axon
    TPU platform (eager complex transfers raise UNIMPLEMENTED there):
    complex arrays ship as (real, imag) scalar pairs and recombine inside
    a tiny jitted kernel.  Mirrors vector.py's host-boundary shim."""
    import numpy as np

    host = np.asarray(host)
    if np.issubdtype(host.dtype, np.complexfloating):
        import jax
        import jax.numpy as jnp

        if jax.default_backend() not in ("cpu",):
            scalar = np.float32 if host.dtype == np.complex64 else np.float64
            re = jnp.asarray(np.ascontiguousarray(host.real, dtype=scalar))
            im = jnp.asarray(np.ascontiguousarray(host.imag, dtype=scalar))
            return jax.jit(
                lambda a, b: jax.lax.complex(a, b).astype(host.dtype)
            )(re, im)
    import jax.numpy as jnp

    return jnp.asarray(host)
