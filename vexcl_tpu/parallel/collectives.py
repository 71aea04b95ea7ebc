"""Mesh-level collective algorithms for sharded containers.

Device-side replacements for the reference's host-staged cross-device
fix-ups:

* `distributed_scan` — per-shard scan + shard-offset propagation.  The
  reference scans each device partition, reads the per-device tails to the
  host, `std::partial_sum`s them, and launches a uniform-add kernel
  (vexcl/scan.hpp:426-458).  Here the tails move over ICI inside the same
  compiled step: each shard scans locally, all shards exchange their totals
  with one tiled `all_gather` (ndev scalars), and the masked sum of
  preceding totals is added locally — no host round-trip, one kernel.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

__all__ = ["distributed_scan"]


def distributed_scan(x, mesh, axis: str, exclusive: bool = False,
                     local_scan: Optional[Callable] = None):
    """Inclusive/exclusive cumsum of a sharded 1-D array, shard_map style.

    ``local_scan`` computes the per-shard inclusive scan (defaults to
    jnp.cumsum; pass the Pallas kernel for the TPU fast path).
    """
    scan1 = local_scan or jnp.cumsum

    def shard_fn(blk):
        local = scan1(blk)
        total = local[-1:]
        # tails of every shard (ndev values) over ICI
        totals = jax.lax.all_gather(total, axis, tiled=True)
        idx = jax.lax.axis_index(axis)
        ndev = jax.lax.axis_size(axis)
        pos = jax.lax.broadcasted_iota(jnp.int32, (ndev,), 0)
        offset = jnp.sum(jnp.where(pos < idx, totals, 0))
        if exclusive:
            # out[i] = (sum of previous shards) + local-exclusive prefix
            shifted = jnp.concatenate([jnp.zeros((1,), local.dtype), local[:-1]])
            return (shifted + offset).astype(blk.dtype)
        return (local + offset).astype(blk.dtype)

    return jax.shard_map(
        shard_fn, mesh=mesh, in_specs=P(axis), out_specs=P(axis)
    )(x)
