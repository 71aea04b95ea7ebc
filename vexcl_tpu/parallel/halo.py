"""Explicit halo exchange over the mesh axis for shard_map kernels.

Analog of the reference's host-staged halo exchange
(vexcl/stencil.hpp:90-165): each device needs `lhalo` elements from its
left neighbor and `rhalo` from its right, with edge replication at the
domain boundaries.  Here the transfer is a pair of `lax.ppermute`
neighbor-shifts riding ICI — the direct device-to-device version of what
the reference stages through the host.

Use inside `jax.shard_map` bodies; the expression-level stencil terminal
does not need this (XLA inserts equivalent collectives automatically), but
custom Pallas/shard_map kernels do.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["exchange_halos", "with_halo"]


def exchange_halos(x_blk, axis: str, lhalo: int, rhalo: int):
    """Return (left_halo, right_halo) for this shard's block.

    left_halo  — the last `lhalo` elements of the left neighbor's block
                 (edge-replicated on the first shard),
    right_halo — the first `rhalo` elements of the right neighbor's block
                 (edge-replicated on the last shard).
    """
    ndev = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)

    left = jnp.zeros((0,), x_blk.dtype)
    right = jnp.zeros((0,), x_blk.dtype)

    if lhalo > 0:
        # shift right: device d receives tail of device d-1
        tail = x_blk[-lhalo:]
        recv = jax.lax.ppermute(
            tail, axis, [(d, (d + 1) % ndev) for d in range(ndev)]
        )
        # first shard: replicate its own left edge (stencil.hpp :138-154)
        edge = jnp.broadcast_to(x_blk[0], (lhalo,))
        left = jnp.where(idx == 0, edge, recv)
    if rhalo > 0:
        head = x_blk[:rhalo]
        recv = jax.lax.ppermute(
            head, axis, [(d, (d - 1) % ndev) for d in range(ndev)]
        )
        edge = jnp.broadcast_to(x_blk[-1], (rhalo,))
        right = jnp.where(idx == ndev - 1, edge, recv)
    return left, right


def with_halo(x_blk, axis: str, lhalo: int, rhalo: int):
    """Block padded with neighbor halos: shape (lhalo + blk + rhalo,)."""
    left, right = exchange_halos(x_blk, axis, lhalo, rhalo)
    return jnp.concatenate([left, x_blk, right])
