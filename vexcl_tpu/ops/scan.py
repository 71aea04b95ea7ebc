"""Inclusive / exclusive scan.

Analog of vexcl/scan.hpp:67-522 (Bolt-derived 3-kernel block scan: per-block
inclusive scan, intra-block scan of block tails, uniform add; multi-device
via host partial_sum of per-device tails :426-458).

TPU-native design: one fused `associative_scan` (Blelloch-style log-depth
scan that XLA maps onto the VPU) replaces all three kernels.  Sharded
inputs route to a shard_map three-phase scan (`_scan_impl_dist`): local
scan, all_gather of the D block tails (D scalars), combine-and-offset —
the device-side version of the reference's host partial_sum fix-up
(scan.hpp:426-458).  GSPMD alone does NOT partition a cumulative op: a
jitted cumsum over a P('x') array lowers with THREE all-gathers
(measured on the 8-device mesh), i.e. the whole signal lands on every
device.  Custom associative operators are traced Python callables.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..cache import kernel_cache
from ..config import config
from ..vector import vector

__all__ = ["inclusive_scan", "exclusive_scan", "scan"]


def _scan_impl(op_name, op, exclusive, has_init, pallas_mode=None,
               donate=False):
    key = ("scan", op_name, id(op) if op is not None else None,
           exclusive, has_init, pallas_mode, donate)

    def factory():
        def run(x, init):
            fn = op or jnp.add
            if pallas_mode == "sum":
                from .pallas_scan import pallas_cumsum

                y = pallas_cumsum(x, donate=donate)
            elif pallas_mode in ("max", "min"):
                from .pallas_monoid_scan import pallas_cummax

                y = pallas_cummax(x, is_max=pallas_mode == "max",
                                  donate=donate)
            else:
                y = jax.lax.associative_scan(fn, x)
            # init folds into every prefix (scan.hpp exclusive :471-)
            return _exclusive_post(y, fn, exclusive, has_init, init, x.dtype)

        return jax.jit(run, donate_argnums=(0,) if donate else ())

    return (
        kernel_cache.get_or_create(key, factory) if config.cache_kernels else factory()
    )


def _exclusive_post(y, fn, exclusive, has_init, init, dtype):
    """Shared exclusive-shift + init-fold postprocessing (global array)."""
    if exclusive:
        y = jnp.concatenate([jnp.zeros((1,), dtype), y[:-1]])
        if has_init:
            y = fn(jnp.broadcast_to(jnp.asarray(init, dtype), y.shape), y)
            y = y.at[0].set(jnp.asarray(init, dtype))
    elif has_init:
        y = fn(jnp.broadcast_to(jnp.asarray(init, dtype), y.shape), y)
    return y


def _local_pallas_sum(n_local: int, dtype, op) -> bool:
    """Whether the dist scan's LOCAL phase should run the Pallas blocked
    cumsum: inside shard_map each shard is a single-device block, so the
    kernel's multi-device guard does not apply — this is how the Pallas
    fast path reaches a real multi-chip mesh.  Mirrors use_pallas_scan's
    remaining conditions (plain add, float dtype, amortizable size)."""
    return (
        op is None
        and not config.pallas_interpret()
        and dtype in (jnp.float32, jnp.bfloat16)
        and n_local >= (1 << 20)
    )


def _scan_impl_dist(ctx, op_name, op, exclusive, has_init):
    """Mesh-distributed scan: local scan per shard, all_gather of the D
    block tails (D scalars over ICI), left-combine the carry.  The
    reference's multi-device scan does this fix-up on the HOST
    (scan.hpp:426-458); GSPMD's alternative all-gathers the whole
    signal.  id(mesh)/id(op) cache keys are pinned by the cached
    closure (same argument as scan_by_key)."""
    key = ("scan_dist", id(ctx.mesh), op_name,
           id(op) if op is not None else None, exclusive, has_init)

    def factory():
        from jax.sharding import PartitionSpec as P

        fn = op or jnp.add
        axis = ctx.axis

        def local(x):
            if _local_pallas_sum(x.shape[0], x.dtype, op):
                from .pallas_scan import pallas_cumsum

                y = pallas_cumsum(x)
            else:
                y = jax.lax.associative_scan(fn, x)
            tails = jax.lax.all_gather(y[-1], axis)       # (D,)
            s = jax.lax.associative_scan(fn, tails)
            r = jax.lax.axis_index(axis)
            carry = s[jnp.maximum(r, 1) - 1]              # s[r-1]
            yc = fn(jnp.broadcast_to(carry, y.shape), y)  # left-combine
            return jnp.where(r == 0, y, yc)

        # check_vma=False: pallas_call inside shard_map cannot annotate
        # its outputs' varying-mesh-axes, so the check must be off for
        # the Pallas local phase
        sm = jax.shard_map(local, mesh=ctx.mesh, in_specs=P(axis),
                           out_specs=P(axis), check_vma=False)

        def run(x, init):
            return _exclusive_post(sm(x), fn, exclusive, has_init, init,
                                   x.dtype)

        return jax.jit(run)

    return (
        kernel_cache.get_or_create(key, factory) if config.cache_kernels else factory()
    )


def _dist_eligible(src: vector) -> bool:
    import os

    d = src.context.axis_size  # vectors shard over the first mesh axis
    return (
        os.environ.get("VEXTPU_SCAN_DIST", "1") != "0"
        and src.nparts > 1 and d > 1 and not src._pad
        and src.size > 0 and src.size % d == 0
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

    if mode is None and _dist_eligible(src):
        jfn = _scan_impl_dist(src.context, op_name or "add", op,
                              exclusive, init is not None)
    else:
        # in-place scan (dst IS src): donate the source buffer and alias
        # the Pallas kernel's output onto it (config.donate; the
        # reference's in-place write semantics, vector.hpp:679-801)
        donate = (config.donate and dst is src
                  and not src._borrowed and not src._pad)
        jfn = _scan_impl(
            op_name or "add", op, exclusive, init is not None,
            pallas_mode=mode, donate=donate,
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
