"""sort / sort_by_key.

Analog of vexcl/sort.hpp:427-2186 (ModernGPU-style CTA mergesort in shared
memory + log2(nblocks) merge passes per device, then a HOST k-way merge
across devices :1924-2068).

TPU-native design: XLA's sort HLO (`jax.lax.sort`) — a vectorized
bitonic-style network the TPU backend schedules across the VPU — replaces
the CTA mergesort.  Sharded inputs route to a mesh-distributed odd-even
block merge-split over ppermute (ops/sort_dist.py) — device-side, no
host merge, memory scaling with the mesh.  Fusion-tuple keys
(sort.hpp:2120-2156) map to multi-operand lexicographic sort via
``num_keys``.  Arbitrary comparator *functors* cannot be compiled to a TPU
sort network; supported orderings are ascending (default), descending, and
comparator-by-key-transform (``key_fn``), which covers the reference's test
suite uses (std::less / std::greater / custom weight functions).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from ..cache import kernel_cache
from ..config import config
from ..vector import vector

__all__ = ["sort", "sort_by_key"]


def _keys_tuple(keys) -> Tuple:
    if isinstance(keys, (tuple, list)):
        return tuple(k if isinstance(k, vector) else k for k in keys)
    return (keys,)


def _sorter(nkeys: int, nvals: int, descending: bool, has_key_fn: bool, key_fn):
    # id(key_fn) must be part of the key: two sorts with DIFFERENT
    # comparator transforms would otherwise share one cached closure and
    # the second would silently use the first's ordering.  The cached
    # closure pins key_fn alive, so the id cannot be recycled while the
    # entry exists (same argument as scan_by_key's id(key_eq)).
    cache_key = ("sort", nkeys, nvals, descending,
                 id(key_fn) if has_key_fn else None)

    def factory():
        def run(*arrays):
            ks = list(arrays[:nkeys])
            vs = list(arrays[nkeys:])
            if has_key_fn:
                # key_fn may return one transformed key or a tuple of them
                # (lexicographic) — covers comparators like the reference's
                # even_first (sort.cpp sort_keys_vals_custom_op): parity
                # outranks value -> key_fn=lambda k: (k & 1, k)
                kf = key_fn(*ks)
                skeys = list(kf) if isinstance(kf, (tuple, list)) else [kf]
            else:
                skeys = list(ks)
            if descending:
                skeys = [_neg_order(k) for k in skeys]
            if has_key_fn or descending:
                # transformed sort keys lead; originals ride as payload
                res = jax.lax.sort(
                    tuple(skeys) + tuple(ks) + tuple(vs),
                    num_keys=len(skeys),
                    is_stable=True,
                )
                return res[len(skeys):]
            res = jax.lax.sort(
                tuple(ks) + tuple(vs), num_keys=nkeys, is_stable=True
            )
            return res

        return jax.jit(run)

    return (
        kernel_cache.get_or_create(cache_key, factory)
        if config.cache_kernels
        else factory()
    )


def _neg_order(k):
    """Map values to a key with reversed order (for descending sort)."""
    if jnp.issubdtype(k.dtype, jnp.integer):
        return ~k  # ~k = -k-1: monotone decreasing, no overflow at INT_MIN
    return -k


def _dist_sorter(vecs, nkeys: int, nvals: int, descending: bool, key_fn):
    """Mesh-distributed sorter for sharded inputs (ops/sort_dist.py):
    odd-even block merge-split over ppermute — GSPMD would instead
    gather and redundantly full-sort on every device.  None when the
    inputs are not eligible."""
    from .sort_dist import distributed_eligible, make_distributed_sorter

    if not distributed_eligible(vecs):
        return None
    ctx = vecs[0].context
    # id(mesh)/id(key_fn) are safe cache keys: the cached shard_map
    # closure pins both alive, so the ids cannot be recycled while the
    # entry exists (same argument as scan_by_key)
    cache_key = ("sort_dist", id(ctx.mesh), nkeys, nvals, descending,
                 id(key_fn) if key_fn is not None else None)

    def factory():
        return jax.jit(make_distributed_sorter(
            ctx.mesh, ctx.axis, ctx.axis_size, nkeys, nvals, descending,
            key_fn))

    return (
        kernel_cache.get_or_create(cache_key, factory)
        if config.cache_kernels
        else factory()
    )


def sort(
    keys: Union[vector, Sequence[vector]],
    descending: bool = False,
    key_fn: Optional[Callable] = None,
) -> None:
    """In-place sort of one vector or a tuple of key vectors
    (vex::sort, sort.hpp:2157-2169)."""
    ks = _keys_tuple(keys)
    jfn = (_dist_sorter(ks, len(ks), 0, descending, key_fn)
           or _sorter(len(ks), 0, descending, key_fn is not None, key_fn))
    outs = jfn(*[k.array for k in ks])
    for k, arr in zip(ks, outs):
        k._set_array(arr)


def sort_by_key(
    keys: Union[vector, Sequence[vector]],
    vals: Union[vector, Sequence[vector]],
    descending: bool = False,
    key_fn: Optional[Callable] = None,
) -> None:
    """In-place key-value sort (vex::sort_by_key, sort.hpp:2171-2183)."""
    ks = _keys_tuple(keys)
    vs = _keys_tuple(vals)
    both = list(ks) + list(vs)
    jfn = (_dist_sorter(both, len(ks), len(vs), descending, key_fn)
           or _sorter(len(ks), len(vs), descending, key_fn is not None,
                      key_fn))
    outs = jfn(*[k.array for k in ks], *[v.array for v in vs])
    for k, arr in zip(both, outs):
        k._set_array(arr)
