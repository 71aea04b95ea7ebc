"""Scalar type mapping and promotion.

TPU-native analog of vexcl/types.hpp (type_name<T>(), cl_scalar_of /
cl_vector_of).  The reference maps C++ scalars onto OpenCL source-level type
names; here we map user-facing names onto JAX dtypes and expose the same
queries.  OpenCL short-vector types (cl_float4 etc.) have no TPU analog —
their role (SIMD within a lane) is played by the VPU's (8, 128) registers,
which XLA targets automatically; `multivector` covers the SoA use-case.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

# Canonical name -> dtype table (analog of the type_name specializations,
# vexcl/types.hpp:70-200).
_NAMED_TYPES = {
    "bool": jnp.bool_,
    "char": jnp.int8,
    "uchar": jnp.uint8,
    "short": jnp.int16,
    "ushort": jnp.uint16,
    "int": jnp.int32,
    "uint": jnp.uint32,
    "long": jnp.int64,
    "ulong": jnp.uint64,
    "half": jnp.float16,
    "bfloat16": jnp.bfloat16,
    "float": jnp.float32,
    "double": jnp.float64,
    "cfloat": jnp.complex64,
    "cdouble": jnp.complex128,
}

_DTYPE_NAMES = {np.dtype(v): k for k, v in _NAMED_TYPES.items()}


def dtype_of(t: Any) -> np.dtype:
    """Resolve a user-provided type designator to a numpy dtype."""
    if isinstance(t, str) and t in _NAMED_TYPES:
        return np.dtype(_NAMED_TYPES[t])
    return np.dtype(t)


def type_name(t: Any) -> str:
    """Device-source-level name of a scalar type (types.hpp type_name<T>)."""
    dt = dtype_of(t)
    return _DTYPE_NAMES.get(dt, dt.name)


def is_floating(t: Any) -> bool:
    return jnp.issubdtype(dtype_of(t), jnp.floating)


def is_integral(t: Any) -> bool:
    return jnp.issubdtype(dtype_of(t), jnp.integer)


def is_complex(t: Any) -> bool:
    return jnp.issubdtype(dtype_of(t), jnp.complexfloating)


def scalar_of(t: Any) -> np.dtype:
    """Underlying real scalar of a type (cl_scalar_of analog)."""
    dt = dtype_of(t)
    if jnp.issubdtype(dt, jnp.complexfloating):
        return np.dtype(np.float64 if dt == np.complex128 else np.float32)
    return dt


def promote(*dtypes: Any) -> np.dtype:
    """Common result type of an expression (deduce_value_type analog,
    vexcl/operations.hpp:1723-1796)."""
    return np.dtype(jnp.result_type(*[dtype_of(d) for d in dtypes]))
