"""vexcl_tpu — a TPU-native array-expression framework.

A ground-up rebuild of the capabilities of VexCL (ddemidov/vexcl, mounted at
/root/reference) for TPU: lazy vector/multivector expressions compile to
single fused XLA kernels; containers are transparently sharded over a
``jax.sharding.Mesh``; the performance-critical primitives (reduction, scan,
sort, SpMV, stencil, FFT, RNG) are Pallas/XLA kernels; inter-device traffic
rides ICI collectives instead of the reference's host-staged exchange.

Typical use mirrors vex::

    import vexcl_tpu as vex

    ctx = vex.Context(vex.Filter.Env)
    x, y, z = (vex.vector(n) for _ in range(3))
    x[:] = 2 * y + vex.sin(z)

    Sum = vex.Reductor(vex.SUM)
    s = Sum(x * x)
"""

from __future__ import annotations

from .config import config
from .cache import ObjectCache, kernel_cache, purge_caches
from .context import Context, Filter, current_context, make_context
from .types import dtype_of, promote, type_name
from .vector import copy, partition, vector
from .expr import (
    BUILTINS,
    Expr,
    Function,
    as_expr,
    builtin,
    cast,
    constant,
    device_function,
    element_index,
    eval_expr as eval,
    function,
    if_else,
    make_temp,
    permutation,
    r,
    range_,
    reduce_view,
    reshape,
    slicer,
    tag,
    _,
)
from .expr import mathconst as constants  # vex.constants.pi etc.
from .expr.builtins import *  # noqa: F401,F403 - sin, cos, exp, ...
from .expr.pointer import constant_pointer, raw_pointer

# Bind these class names eagerly: a submodule import anywhere (e.g.
# `from ..multivector import MultiExpr` inside sparse/) would otherwise set
# the package attribute to the MODULE and shadow the lazy __getattr__ below.
from .multivector import MultiExpr, multivector, tie  # noqa: E402
from .ndarray import extents, indices, multi_array  # noqa: E402
from .profiler import profiler, stopwatch  # noqa: E402
from .parallel.partition import reset_partitioning, set_partitioning
from .utils.util import ExpressionError, alignup, nextpow2, precondition

__version__ = "0.1.0"


# Lazily-populated submodule API (heavy pieces import on first use).
def __getattr__(name):
    import importlib

    _lazy = {
        "Reductor": ("vexcl_tpu.ops.reductor", "Reductor"),
        "SUM": ("vexcl_tpu.ops.reductor", "SUM"),
        "MAX": ("vexcl_tpu.ops.reductor", "MAX"),
        "MIN": ("vexcl_tpu.ops.reductor", "MIN"),
        "SUM_Kahan": ("vexcl_tpu.ops.reductor", "SUM_Kahan"),
        "CombineReductors": ("vexcl_tpu.ops.reductor", "CombineReductors"),
        "MIN_MAX": ("vexcl_tpu.ops.reductor", "MIN_MAX"),
        "any_of": ("vexcl_tpu.ops.logical", "any_of"),
        "all_of": ("vexcl_tpu.ops.logical", "all_of"),
        "multivector": ("vexcl_tpu.multivector", "multivector"),
        "tie": ("vexcl_tpu.multivector", "tie"),
        "sort": ("vexcl_tpu.ops.sort", "sort"),
        "sort_by_key": ("vexcl_tpu.ops.sort", "sort_by_key"),
        "inclusive_scan": ("vexcl_tpu.ops.scan", "inclusive_scan"),
        "exclusive_scan": ("vexcl_tpu.ops.scan", "exclusive_scan"),
        "inclusive_scan_by_key": ("vexcl_tpu.ops.scan_by_key", "inclusive_scan_by_key"),
        "exclusive_scan_by_key": ("vexcl_tpu.ops.scan_by_key", "exclusive_scan_by_key"),
        "reduce_by_key": ("vexcl_tpu.ops.reduce_by_key", "reduce_by_key"),
        "atomic_add": ("vexcl_tpu.ops.atomic", "atomic_add"),
        "atomic_sub": ("vexcl_tpu.ops.atomic", "atomic_sub"),
        "atomic_min": ("vexcl_tpu.ops.atomic", "atomic_min"),
        "atomic_max": ("vexcl_tpu.ops.atomic", "atomic_max"),
        "gather": ("vexcl_tpu.ops.gather", "gather"),
        "scatter": ("vexcl_tpu.ops.gather", "scatter"),
        "Gather": ("vexcl_tpu.ops.gather", "Gather"),
        "Scatter": ("vexcl_tpu.ops.gather", "Scatter"),
        "Random": ("vexcl_tpu.ops.random", "Random"),
        "RandomNormal": ("vexcl_tpu.ops.random", "RandomNormal"),
        "SpMat": ("vexcl_tpu.sparse", "SpMat"),
        "SpMatCCSR": ("vexcl_tpu.sparse", "SpMatCCSR"),
        "make_inline": ("vexcl_tpu.sparse", "make_inline"),
        "sparse": ("vexcl_tpu.sparse", None),
        "stencil": ("vexcl_tpu.ops.stencil", "stencil"),
        "StencilOperator": ("vexcl_tpu.ops.stencil", "StencilOperator"),
        "stencil_operator": ("vexcl_tpu.ops.stencil", "stencil_operator"),
        "FFT": ("vexcl_tpu.ops.fft", "FFT"),
        "fft": ("vexcl_tpu.ops.fft", "fft"),
        "ifft": ("vexcl_tpu.ops.fft", "ifft"),
        "mba": ("vexcl_tpu.ops.mba", "mba"),
        "tensordot": ("vexcl_tpu.ops.tensordot", "tensordot"),
        "axes_pairs": ("vexcl_tpu.ops.tensordot", "axes_pairs"),
        "generator": ("vexcl_tpu.generator", None),
        "symbolic": ("vexcl_tpu.generator", "symbolic"),
        "profiler": ("vexcl_tpu.profiler", "profiler"),
        "stopwatch": ("vexcl_tpu.profiler", "stopwatch"),
        "backend": ("vexcl_tpu.backend", None),
        "CustomKernel": ("vexcl_tpu.backend", "CustomKernel"),
        "events": ("vexcl_tpu.events", None),
        "enqueue": ("vexcl_tpu.events", "enqueue"),
        "enqueue_marker": ("vexcl_tpu.events", "enqueue_marker"),
        "enqueue_barrier": ("vexcl_tpu.events", "enqueue_barrier"),
        "interop": ("vexcl_tpu.interop", None),
        "image1d": ("vexcl_tpu.ops.image", "image1d"),
        "image2d": ("vexcl_tpu.ops.image", "image2d"),
        "svm_vector": ("vexcl_tpu.ops.image", "svm_vector"),
        "parallel": ("vexcl_tpu.parallel", None),
    }
    if name in _lazy:
        mod_name, attr = _lazy[name]
        mod = importlib.import_module(mod_name)
        value = mod if attr is None else getattr(mod, attr)
        globals()[name] = value
        return value
    raise AttributeError(f"module 'vexcl_tpu' has no attribute {name!r}")
