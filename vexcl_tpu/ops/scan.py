"""Inclusive / exclusive scan.

Analog of vexcl/scan.hpp:67-522 (Bolt-derived 3-kernel block scan: per-block
inclusive scan, intra-block scan of block tails, uniform add; multi-device
via host partial_sum of per-device tails :426-458).

TPU-native design: one fused `associative_scan` (Blelloch-style log-depth
scan that XLA maps onto the VPU) replaces all three kernels; for sharded
inputs XLA partitions the scan and inserts the cross-shard tail propagation
as ICI collectives — the device-side version of the reference's host fix-up.
Custom associative operators are traced Python callables.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..cache import kernel_cache
from ..config import config
from ..vector import vector

__all__ = ["inclusive_scan", "exclusive_scan", "scan"]


def _scan_impl(op_name, op, exclusive, has_init, pallas_mode=None):
    key = ("scan", op_name, id(op) if op is not None else None,
           exclusive, has_init, pallas_mode)

    def factory():
        def run(x, init):
            fn = op or jnp.add
            if pallas_mode == "sum":
                from .pallas_scan import pallas_cumsum

                y = pallas_cumsum(x)
            elif pallas_mode in ("max", "min"):
                from .pallas_monoid_scan import pallas_cummax

                y = pallas_cummax(x, is_max=pallas_mode == "max")
            else:
                y = jax.lax.associative_scan(fn, x)
            if exclusive:
                y = jnp.concatenate([jnp.zeros((1,), x.dtype), y[:-1]])
                if has_init:
                    # init folds into every prefix (scan.hpp exclusive :471-)
                    y = fn(jnp.broadcast_to(jnp.asarray(init, x.dtype), y.shape), y)
                    y = y.at[0].set(jnp.asarray(init, x.dtype))
            elif has_init:
                y = fn(jnp.broadcast_to(jnp.asarray(init, x.dtype), y.shape), y)
            return y

        return jax.jit(run)

    return (
        kernel_cache.get_or_create(key, factory) if config.cache_kernels else factory()
    )


def scan(
    src: vector,
    dst: Optional[vector] = None,
    init: Any = None,
    op: Optional[Callable] = None,
    op_name: Optional[str] = None,
    exclusive: bool = False,
) -> vector:
    """Generic scan driver (detail::scan, scan.hpp:332-415)."""
    if dst is None:
        dst = vector(src.size, dtype=src.dtype, context=src.context)
    if op is not None and op_name is None:
        op_name = getattr(op, "__name__", repr(op))
    from .pallas_monoid_scan import use_pallas_monoid_scan
    from .pallas_scan import use_pallas_scan

    # op_name alone must mean the same thing on every path (the XLA
    # fallback uses `op or jnp.add`, which would silently SUM); shared
    # named-monoid dispatch in ops/monoid.py raises on unrecognized names
    from .monoid import monoid_of

    mono, op = monoid_of(op, op_name)
    std_mono = mono in ("max", "min")
    if use_pallas_scan(src.array, op):
        mode = "sum"
    elif std_mono and use_pallas_monoid_scan(src.array, mono):
        # only for the STANDARD max/min callables — a custom op that
        # merely carries the name must run through associative_scan
        mode = mono
    else:
        mode = None

    jfn = _scan_impl(
        op_name or "add", op, exclusive, init is not None,
        pallas_mode=mode,
    )
    dst._set_array(jfn(src.array, 0 if init is None else init).astype(dst.dtype))
    return dst


def inclusive_scan(src: vector, dst: Optional[vector] = None, init: Any = None,
                   op: Optional[Callable] = None, op_name: Optional[str] = None) -> vector:
    """vex::inclusive_scan (scan.hpp:426-458)."""
    return scan(src, dst, init, op, op_name, exclusive=False)


def exclusive_scan(src: vector, dst: Optional[vector] = None, init: Any = None,
                   op: Optional[Callable] = None, op_name: Optional[str] = None) -> vector:
    """vex::exclusive_scan (scan.hpp:471-)."""
    return scan(src, dst, init, op, op_name, exclusive=True)
