"""Segmented (by-key) scan.

Analog of vexcl/scan_by_key.hpp:67-757 (same Bolt 3-phase structure as
scan.hpp with a key-equality predicate; single-device per partition in the
reference).

TPU-native design: the classic segmented-scan monoid over (reset-flag,
value) pairs run through one `associative_scan` —
    (f1,v1) . (f2,v2) = (f1|f2,  f2 ? v2 : op(v1,v2))
which is associative for any associative op.  Sharded inputs route to a
shard_map three-phase version of the same monoid (local pair scan,
all_gather of the D block-tail pairs, carry combine gated on the local
has-seen-a-head flag) — multi-device with ICI-only fix-up, improving on
the reference's single-device restriction (GSPMD alone all-gathers the
whole signal for a cumulative op; measured in ops/scan.py).

Keys may be a single vector or a tuple of vectors (the reference's
fusion-tuple keys, scan_by_key.hpp:724-757); a custom key-equality
predicate is supported as a traced callable over neighboring key values.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from ..cache import kernel_cache
from ..config import config
from ..vector import vector

__all__ = [
    "inclusive_scan_by_key",
    "exclusive_scan_by_key",
    "segment_flags",
]


def _key_arrays(keys) -> Tuple:
    if isinstance(keys, (tuple, list)):
        return tuple(k.array if isinstance(k, vector) else jnp.asarray(k) for k in keys)
    return (keys.array if isinstance(keys, vector) else jnp.asarray(keys),)


def segment_flags(keys, key_eq: Optional[Callable] = None):
    """flags[i] = 1 if element i starts a new segment."""
    ks = _key_arrays(keys)

    def flags_of(*ks):
        if key_eq is not None:
            eq = key_eq(*[k[:-1] for k in ks], *[k[1:] for k in ks])
        else:
            eq = jnp.ones(ks[0].shape[0] - 1, dtype=bool)
            for k in ks:
                eq = eq & (k[:-1] == k[1:])
        return jnp.concatenate([jnp.ones((1,), bool), ~eq])

    return flags_of(*ks), ks


def _run(keys, src, dst, op, op_name, key_eq, exclusive, init):
    ks = _key_arrays(keys)
    # Pallas fast path: single-pass blocked segmented cumsum (one i32 key
    # vector, plain add) — see ops/pallas_segscan.py.  Exclusive/init
    # variants derive from the inclusive scan by the exact shifted-prefix
    # rule (matching the XLA path bit-for-bit; `incl - x` cancels
    # catastrophically), per the reference's exclusive semantics
    # (scan_by_key.hpp :743-757).  MUST go through kernel_cache: a fresh
    # jit closure per call would re-pay the kernel's multi-minute Mosaic
    # compile on every call; `init` rides as a runtime argument.
    # monoid selection (shared with reduce_by_key, ops/monoid.py): plain
    # add, or the STANDARD max/min callables — a custom op merely named
    # "max" must not take the kernel path
    from .monoid import monoid_of

    mono, op = monoid_of(op, op_name)

    if mono is not None:
        from .pallas_segscan import (
            pallas_segmented_cumsum_flags, use_pallas_segscan_flags)

        # The kernel reads only i8 head flags, derived in a fused XLA
        # pre-pass — so TUPLE keys and CUSTOM key_eq predicates ride the
        # same fast path (the associative_scan fallback cannot finish a
        # 16M measurement in 10 min on this chip).
        if use_pallas_segscan_flags(ks, src.array):
            if dst is None:
                dst = vector(src.size, dtype=src.dtype, context=src.context)
            # id(key_eq) is a safe cache key ONLY because the cached
            # closure below captures key_eq, pinning it alive for the
            # cache entry's lifetime — so the id cannot be recycled by a
            # different callable while the entry exists.
            pk = ("segscan_pallas", mono, exclusive, init is not None,
                  len(ks), id(key_eq) if key_eq is not None else None)
            fn = (jnp.add if mono == "add"
                  else (jnp.maximum if mono == "max" else jnp.minimum))

            def factory():
                has_init = init is not None

                def run(x, iv, *karrs):
                    if key_eq is not None:
                        eq = key_eq(*[k[:-1] for k in karrs],
                                    *[k[1:] for k in karrs])
                    else:
                        eq = karrs[0][:-1] == karrs[0][1:]
                        for k in karrs[1:]:
                            eq = eq & (k[:-1] == k[1:])
                    heads = jnp.concatenate(
                        [jnp.ones((1,), jnp.int8),
                         (~eq).astype(jnp.int8)])
                    incl = pallas_segmented_cumsum_flags(heads, x, mono)
                    if not exclusive:
                        return fn(incl, iv) if has_init else incl
                    hb = heads.astype(bool)
                    # heads get init (or 0 when none) — identical to the
                    # generic path's exclusive semantics for every monoid
                    shifted = jnp.concatenate(
                        [jnp.zeros((1,), incl.dtype), incl[:-1]])
                    if has_init:
                        return jnp.where(hb, iv, fn(shifted, iv))
                    return jnp.where(hb, jnp.zeros((), incl.dtype),
                                     shifted)

                return jax.jit(run)

            jfn = (kernel_cache.get_or_create(pk, factory)
                   if config.cache_kernels else factory())
            iv = jnp.asarray(0 if init is None else init, src.array.dtype)
            out = jfn(src.array, iv, *ks)
            dst._set_array(out.astype(dst.dtype))
            return dst

    flags, ks = segment_flags(keys, key_eq)
    if dst is None:
        dst = vector(src.size, dtype=src.dtype, context=src.context)

    from .scan import _dist_eligible

    dist_ctx = src.context if _dist_eligible(src) else None
    cache_key = (
        "scan_by_key",
        op_name or "add",
        # distinct custom callables must not share a cached closure even
        # when their names collide (e.g. two lambdas); the closure pins
        # op/mesh alive so the ids cannot be recycled
        id(op) if op is not None else None,
        key_eq is not None,
        exclusive,
        init is not None,
        len(ks),
        id(dist_ctx.mesh) if dist_ctx is not None else None,
    )

    def factory():
        def combine(a, b):
            fn = op or jnp.add
            fa, va = a
            fb, vb = b
            return fa | fb, jnp.where(fb, vb, fn(va, vb))

        if dist_ctx is not None:
            # distributed pair scan: local scan, all_gather the D
            # block-tail PAIRS, combine the carry value into positions
            # before the shard's first head (the local pair-scan flag)
            from jax.sharding import PartitionSpec as P

            axis = dist_ctx.axis

            def local(flags, vals):
                fn = op or jnp.add
                from .monoid import monoid_of as _mono_of
                from .scan import _local_pallas_sum

                mono_l, _ = _mono_of(op, op_name)
                if (mono_l in ("add", "max", "min")
                        and _local_pallas_sum(vals.shape[0], vals.dtype,
                                              None)):
                    # inside shard_map each shard is single-device: the
                    # Pallas segscan kernel runs the local phase on a
                    # real multi-chip mesh (its own guard declines only
                    # GLOBAL sharded arrays)
                    from .pallas_segscan import (
                        pallas_segmented_cumsum_flags)

                    v = pallas_segmented_cumsum_flags(
                        flags.astype(jnp.int8), vals, mono_l)
                    # has-seen-a-head inclusive OR for the carry gate
                    f = jax.lax.associative_scan(jnp.logical_or, flags)
                else:
                    f, v = jax.lax.associative_scan(combine, (flags, vals))
                # ONE gather of the packed (flag, value) tail pair: 0/1
                # is exact in every value dtype, and a second collective
                # would double the per-call ICI latency
                tail = jnp.stack([f[-1].astype(vals.dtype), v[-1]])
                tails = jax.lax.all_gather(tail, axis)      # (D, 2)
                tf = tails[:, 0].astype(bool)
                tv = tails[:, 1]
                _, sv = jax.lax.associative_scan(combine, (tf, tv))
                r = jax.lax.axis_index(axis)
                cv = sv[jnp.maximum(r, 1) - 1]       # blocks 0..r-1
                vc = jnp.where(f, v, fn(jnp.broadcast_to(cv, v.shape), v))
                return jnp.where(r == 0, v, vc)

            # check_vma=False: the Pallas local phase cannot annotate
            # varying-mesh-axes on its outputs
            seg_scan = jax.shard_map(local, mesh=dist_ctx.mesh,
                                     in_specs=(P(axis), P(axis)),
                                     out_specs=P(axis), check_vma=False)
        else:
            def seg_scan(flags, vals):
                _, incl = jax.lax.associative_scan(combine, (flags, vals))
                return incl

        def run(flags, vals, init_val):
            fn = op or jnp.add

            incl = seg_scan(flags, vals)
            if not exclusive:
                if init is not None:
                    incl = fn(jnp.broadcast_to(init_val, incl.shape), incl)
                return incl
            shifted = jnp.concatenate([jnp.zeros((1,), vals.dtype), incl[:-1]])
            iv = jnp.asarray(init_val, vals.dtype)
            out = jnp.where(
                flags,
                iv,
                fn(jnp.broadcast_to(iv, shifted.shape), shifted)
                if init is not None
                else shifted,
            )
            if init is None:
                out = jnp.where(flags, jnp.zeros((), vals.dtype), shifted)
            return out

        return jax.jit(run)

    jfn = (
        kernel_cache.get_or_create(cache_key, factory)
        if config.cache_kernels
        else factory()
    )
    iv = jnp.asarray(0 if init is None else init, src.array.dtype)
    dst._set_array(jfn(flags, src.array, iv).astype(dst.dtype))
    return dst


def inclusive_scan_by_key(
    keys: Union[vector, Sequence[vector]],
    src: vector,
    dst: Optional[vector] = None,
    init: Any = None,
    op: Optional[Callable] = None,
    op_name: Optional[str] = None,
    key_eq: Optional[Callable] = None,
) -> vector:
    """vex::inclusive_scan_by_key (scan_by_key.hpp:724-741)."""
    return _run(keys, src, dst, op, op_name, key_eq, exclusive=False, init=init)


def exclusive_scan_by_key(
    keys: Union[vector, Sequence[vector]],
    src: vector,
    dst: Optional[vector] = None,
    init: Any = None,
    op: Optional[Callable] = None,
    op_name: Optional[str] = None,
    key_eq: Optional[Callable] = None,
) -> vector:
    """vex::exclusive_scan_by_key (scan_by_key.hpp:743-757)."""
    return _run(keys, src, dst, op, op_name, key_eq, exclusive=True, init=init)
