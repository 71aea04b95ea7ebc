"""Distributed sort over the device mesh (odd-even block merge-split).

The reference sorts each device's partition with a CTA mergesort, then
performs a HOST k-way merge across devices (sort.hpp:1924-2068) — the
result lands on the host.  GSPMD-compiling `lax.sort` over a sharded
array is no better on a mesh: the sort HLO makes XLA gather the WHOLE
array and sort it redundantly on every device (D x memory + all-gather
traffic — sortable size stops scaling with the mesh).

TPU-native design: odd-even transposition on BLOCKS, entirely on ICI.
Each device locally sorts its n/D-element block; D rounds of
neighbor-pair merge-split follow — partners exchange their full blocks
(`ppermute`, a STATIC permutation, so every shape is static and the
schedule is skew-immune), each merges 2n/D presorted elements and keeps
its half (lower rank keeps the lower half).  After D rounds the block
sequence is globally sorted in device-rank order — exactly the
library's natural block sharding, so the result IS a valid vector with
no redistribution step.  Block odd-even transposition sorts for ANY
device count (no power-of-two restriction), unlike a block-bitonic
schedule.

Stability: a global-index tiebreak column rides behind the sort keys,
making every merge deterministic and the whole network equivalent to a
stable sort — matching the single-device path's ``is_stable=True``.

Memory scales: each device only ever holds 2n/D elements per column, so
the sortable n grows linearly with the mesh (the replicated-gather
alternative caps n at one device's HBM).  Total traffic per device is
D * n/D = n per column — the same volume the all-gather pays, but
overlapped pairwise on ICI and with per-round compute n/D log(n/D)
instead of a redundant full-n sort per device.

The per-round merge deliberately stays `lax.sort` over the
concatenation.  A/B at n/D = 2M (f32 key + i32 gidx + f32 payload, one
process, exp/sort_merge_ab.py, r3): lax.sort concat 11.7 ms; a
hand-written XLA bitonic MERGE (log-depth half-cleaners via
reshape+where, with exact total-order int encodings) 70.4 ms — XLA's
monolithic sort op is ~6x faster than composed shuffle stages despite
doing O(log^2) work; searchsorted ranks + gather 1235 ms (binary-search
gathers).  The theoretically-cheaper merge forms lose to the optimized
sort lowering on this toolchain (kernel notes "Distributed sort merge
A/B").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


def make_distributed_sorter(mesh, axis: str, d: int, nkeys: int,
                            nvals: int, descending: bool, key_fn):
    """shard_map sorter: global P(axis)-sharded key/value arrays ->
    globally sorted arrays, same sharding.  Call with nkeys key arrays
    followed by nvals payload arrays (all length n, d | n)."""
    from .sort import _neg_order

    def _lead(ks):
        """Transformed lead sort keys (mirrors sort._sorter)."""
        if key_fn is not None:
            kf = key_fn(*ks)
            skeys = list(kf) if isinstance(kf, (tuple, list)) else [kf]
        else:
            skeys = list(ks)
        if descending:
            skeys = [_neg_order(k) for k in skeys]
        return skeys

    def local(*arrs):
        m = arrs[0].shape[0]
        r = jax.lax.axis_index(axis)
        ks = list(arrs[:nkeys])
        vs = list(arrs[nkeys:])
        skeys = _lead(ks)
        # global-index tiebreak: stability + deterministic merges
        gidx = (r * m + jnp.arange(m)).astype(jnp.int32)
        transformed = key_fn is not None or descending
        payload = (ks + vs) if transformed else vs
        cols = tuple(skeys) + (gidx,) + tuple(payload)
        nk = len(skeys) + 1
        cols = jax.lax.sort(cols, num_keys=nk)  # local block sort
        for t in range(d):
            pairs = []
            for i in range(t % 2, d - 1, 2):
                pairs += [(i, i + 1), (i + 1, i)]
            if not pairs:
                continue
            other = tuple(
                jax.lax.ppermute(c, axis, pairs) for c in cols)
            merged = jax.lax.sort(
                tuple(jnp.concatenate([a, b]) for a, b in zip(cols, other)),
                num_keys=nk,
            )
            low = (r % 2) == (t % 2)          # left member of its pair
            has_right = low & (r < d - 1)
            has_left = (~low) & (r > 0)
            paired = has_right | has_left
            # unpaired devices received ppermute zero-fill: keep their
            # own block (select, not control flow — SPMD-safe)
            cols = tuple(
                jnp.where(paired, jnp.where(has_right, mc[:m], mc[m:]), c)
                for mc, c in zip(merged, cols)
            )
        if transformed:
            return cols[nk:]                  # original keys + values
        return cols[:nk - 1] + cols[nk:]      # sorted keys + values

    nin = nkeys + nvals
    return jax.shard_map(local, mesh=mesh, in_specs=(P(axis),) * nin,
                         out_specs=(P(axis),) * nin)


def distributed_eligible(vecs) -> bool:
    """All vectors sharded over >1 block, equal un-padded sizes.  The
    block count is the VECTOR-SHARDING axis size (Context.axis_size) —
    on a multi-axis mesh vectors shard over the first axis only."""
    import os

    if os.environ.get("VEXTPU_SORT_DIST", "1") == "0":
        return False
    v0 = vecs[0]
    if v0.nparts <= 1:
        return False
    d = v0.context.axis_size
    n = v0.size
    if d <= 1 or n == 0 or n % d != 0:
        return False
    return all(v.nparts == v0.nparts and v.size == n and not v._pad
               for v in vecs)
