"""Custom device kernels — the `backend::source_generator` / raw
`backend::kernel` escape hatch.

Analog of the reference's custom-kernel path (tests/custom_kernel.cpp:16-40,
backend/opencl/kernel.hpp): when the expression language is not enough, the
user writes a kernel directly against a vector's device buffers.  Here the
kernel language is Pallas (the TPU-native kernel DSL) or any traced JAX
function; `CustomKernel` wraps it with the per-partition launch the
reference does per device, including the interpret-mode fallback on
non-TPU backends (the JIT/OpenMP backend analog).

    import jax.experimental.pallas as pl

    def body(x_ref, y_ref):
        y_ref[...] = x_ref[...] * 2.0

    k = vex.backend.CustomKernel(body, out_like="input")
    y = k(x)                       # x: vex.vector -> vex.vector
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from .config import config
from .vector import vector

__all__ = ["CustomKernel", "pallas_call", "launch"]


def pallas_call(kernel_fn: Callable, **kwargs):
    """pl.pallas_call with the backend-appropriate interpret default
    (config.pallas_interpret()), mirroring how the reference picks the
    OpenCL vs JIT backend at compile time."""
    import jax.experimental.pallas as pl

    kwargs.setdefault("interpret", config.pallas_interpret())
    return pl.pallas_call(kernel_fn, **kwargs)


class CustomKernel:
    """Launch a user kernel over vector buffers.

    ``fn`` is either a Pallas kernel body (used with ``grid``/``specs``
    kwargs passed through to pallas_call) or, when ``traced=True``, a plain
    JAX function array->array.
    """

    def __init__(
        self,
        fn: Callable,
        *,
        traced: bool = False,
        out_like: str = "input",
        out_shape: Optional[Any] = None,
        **pallas_kwargs,
    ):
        self.fn = fn
        self.traced = traced
        self.out_like = out_like
        self.out_shape = out_shape
        self.pallas_kwargs = pallas_kwargs
        self._compiled = {}

    def __call__(self, *vecs: vector) -> vector:
        arrays = [v.array if isinstance(v, vector) else jnp.asarray(v) for v in vecs]
        key = tuple((a.shape, str(a.dtype)) for a in arrays)
        if key not in self._compiled:
            if self.traced:
                self._compiled[key] = jax.jit(self.fn)
            else:
                out_shape = self.out_shape or jax.ShapeDtypeStruct(
                    arrays[0].shape, arrays[0].dtype
                )
                call = pallas_call(self.fn, out_shape=out_shape, **self.pallas_kwargs)
                self._compiled[key] = jax.jit(call)
        out = self._compiled[key](*arrays)
        ctx = next((v.context for v in vecs if isinstance(v, vector)), None)
        return vector(data=out, context=ctx)


def launch(fn: Callable, *vecs: vector, **kwargs) -> vector:
    """One-shot custom kernel launch."""
    return CustomKernel(fn, **kwargs)(*vecs)
