"""Pallas TPU kernel: block-local stream compaction of flag positions.

The reduce_by_key compaction primitive (VERDICT r2 item 1; reference
vexcl/reduce_by_key.hpp:435-580 compacts via an offset scan + scatter).
TPUs have no fast scatter (0.14 Gelem/s measured) and Mosaic no vector
scatter at all, so r1 rode the sort network (0.31 Gelem/s end-to-end).
This kernel compacts WITHOUT sort or scatter:

Per (BLOCK_R, 128) block, given 0/1 tail flags:
  1. block-local flat cumsum of flags (lane Hillis-Steele + row-prefix
     H-S over the (R,1) aggregate column — the fast-compiling phases of
     pallas_segscan) gives each tail its block-local destination slot;
  2. delta = position - destination is MONOTONE non-decreasing along the
     block, so moving every tail left by its delta, one binary digit per
     step (LSB to MSB), never collides two live elements: with m =
     2^{k+1}-1, (dj & m) - (di & m) <= dj - di <= j - i - 1 < j - i.
     Each step is a flat left-shift (lane roll + sublane rolls + selects,
     docs/tpu_kernel_notes.md "lane-roll shift idiom") of the (delta,
     alive) planes plus selects — no scatter, no data-dependent DMA;
  3. outputs: compacted POSITIONS (slot j holds the block-flat position
     of the j-th tail, f32-exact: < 2^15) and the per-block tail count.

The caller assembles globally in XLA: exclusive-cumsum the tiny per-block
counts, then one monotone gather pulls values/keys at the compacted
positions — sized by the (synced) total count, not N.

Everything is f32 (counts/positions < 2^24 exact): in-kernel i32 phases
cost 450-1300 s of Mosaic compile in the segscan bisection
(exp/segscan_compile_bisect.py); f32 H-S phases compile in seconds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config

LANE = 128
BLOCK_R = 256          # 32K elements/block: 15 shift steps, ~1 MiB live set


def _shift_left_flat(x, d: int, R: int):
    """Flat row-major left shift by static d: out[p] = x[p+d], 0 beyond
    the block end.  d = q*LANE + t -> one lane roll (shared per t) + row
    rolls + an iota select; row slices stay sublane-aligned."""
    import jax.experimental.pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    q, t = divmod(d, LANE)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 0)
    if t == 0:
        rolled = x if q == 0 else pltpu.roll(x, R - q, axis=0)
        return jnp.where(row < R - q, rolled, 0.0)
    rolled = pltpu.roll(x, LANE - t, axis=1)     # lane left-roll by t
    a = pltpu.roll(rolled, (R - q) % R, axis=0)        # rows up by q
    b = pltpu.roll(rolled, (R - q - 1) % R, axis=0)    # rows up by q+1
    y = jnp.where(lane < LANE - t, a, b)
    # zero everything whose source p+d falls beyond the block
    src = row * LANE + lane + d
    return jnp.where(src < R * LANE, y, 0.0)


def _bit(x, k: int):
    """Bit k of a small non-negative f32 integer (exact below 2^24)."""
    h = jnp.floor(x * np.float32(2.0 ** -(k + 1)))
    return jnp.floor(x * np.float32(2.0 ** -k)) - 2.0 * h


def _compact_kernel(*refs):
    """Compact the set-flag positions — and optionally transport payload
    planes through the same movement.  Ref order (pallas_call): inputs
    (flags, payload_0..k-1) then outputs (positions, compacted_0..k-1);
    payloads are f32 bit-patterns — only rolls/selects touch them."""
    import jax.experimental.pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    nv = (len(refs) - 2) // 2
    f_ref = refs[0]
    val_refs = refs[1 : 1 + nv]
    o_ref = refs[1 + nv]
    out_refs = refs[2 + nv :]

    R = f_ref.shape[0]
    f = f_ref[...].astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
    rcol = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)

    # -- 1. block-local flat inclusive cumsum of flags ------------------
    v = f
    for d in (1, 2, 4, 8, 16, 32, 64):
        v = v + pltpu.roll(v, d, axis=1) * (lane >= d).astype(jnp.float32)
    tails_col = v[:, LANE - 1 : LANE]                     # (R, 1) row sums
    p = pltpu.roll(tails_col, 1, axis=0) * (rcol >= 1).astype(jnp.float32)
    d = 1
    while d < R:
        p = p + pltpu.roll(p, d, axis=0) * (rcol >= d + 1).astype(jnp.float32)
        d *= 2
    # p = exclusive row prefix of row sums; incl = flat inclusive cumsum
    incl = v + p

    # -- 2. monotone pack: move each tail left by delta, bit by bit -----
    pos = (jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 0) * LANE
           + lane).astype(jnp.float32)
    delta = jnp.where(f > 0, pos - (incl - 1.0), 0.0)
    alive = f
    payload = [r[...] for r in val_refs]
    nbits = int(np.log2(R * LANE))
    for k in range(nbits):
        dk = 1 << k
        delta_s = _shift_left_flat(delta, dk, R)
        alive_s = _shift_left_flat(alive, dk, R)
        arrived = alive_s * _bit(delta_s, k)              # element lands here
        moved = alive * _bit(delta, k)                    # element leaves
        alive = jnp.where(arrived > 0, 1.0,
                          jnp.where(moved > 0, 0.0, alive))
        delta = jnp.where(arrived > 0, delta_s, delta)
        payload = [
            jnp.where(arrived > 0, _shift_left_flat(pl_, dk, R), pl_)
            for pl_ in payload
        ]

    # final slot s holds the element whose original position was s+delta;
    # dead slots get the -1 sentinel (counts derive from it in XLA — a
    # per-block SMEM count output is not lowerable on TPU)
    o_ref[...] = jnp.where(alive > 0, pos + delta, -1.0)
    for r, pl_ in zip(out_refs, payload):
        r[...] = pl_


def pallas_compact(flags: jnp.ndarray, *payloads):
    """Block-compacted flag positions, with optional payload transport.

    flags: (n,) 0/1 i8 — e.g. segment tails.  payloads: any number of
    (n,) arrays whose elements ride along with their flag (moved as f32
    bit-patterns — any 32-bit dtype, bit-exact).

    Returns (positions, counts, *compacted_payloads): positions
    (nblocks, BLOCK) f32 — positions[b, j] = block-flat index of the j-th
    set flag in block b, -1 sentinel beyond counts[b]; counts (nblocks,)
    f32; compacted payloads in the same (nblocks, BLOCK) layout.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = flags.shape[0]
    BLOCK = BLOCK_R * LANE
    nblocks = max(1, -(-n // BLOCK))
    padded = nblocks * BLOCK
    if padded != n:
        flags = jnp.pad(flags, (0, padded - n))  # pad flags are 0: no tails
        payloads = tuple(jnp.pad(p, (0, padded - n)) for p in payloads)
    f2 = flags.reshape(nblocks * BLOCK_R, LANE)
    # each payload becomes one f32 plane per 32 bits (64-bit dtypes split
    # into lo/hi word planes and are reassembled after the kernel)
    dts = []        # (dtype, n_planes) per payload
    p2 = []
    for p in payloads:
        it = np.dtype(p.dtype).itemsize
        if it == 8:
            w = jax.lax.bitcast_convert_type(p, jnp.uint32)  # (n, 2)
            planes = [jax.lax.bitcast_convert_type(w[:, i], jnp.float32)
                      for i in range(2)]
        elif it == 4:
            planes = [p if p.dtype == jnp.float32
                      else jax.lax.bitcast_convert_type(p, jnp.float32)]
        else:
            raise TypeError(
                f"pallas_compact payloads must be 32- or 64-bit, got "
                f"{p.dtype}")
        dts.append((p.dtype, len(planes)))
        p2.extend(pl_.reshape(nblocks * BLOCK_R, LANE) for pl_ in planes)

    spec = pl.BlockSpec((BLOCK_R, LANE), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    k = len(p2)
    outs = pl.pallas_call(
        _compact_kernel,
        grid=(nblocks,),
        in_specs=[spec] * (1 + k),
        out_specs=[spec] * (1 + k),
        out_shape=[jax.ShapeDtypeStruct((nblocks * BLOCK_R, LANE),
                                        jnp.float32)] * (1 + k),
        interpret=config.pallas_interpret(),
    )(f2, *p2)
    pos = outs[0].reshape(nblocks, BLOCK)
    counts = jnp.sum((pos >= 0.0).astype(jnp.float32), axis=1)
    comp = []
    oi = 1
    for dt, np_ in dts:
        if np_ == 2:
            lo = jax.lax.bitcast_convert_type(
                outs[oi].reshape(-1), jnp.uint32)
            hi = jax.lax.bitcast_convert_type(
                outs[oi + 1].reshape(-1), jnp.uint32)
            w = jnp.stack([lo, hi], axis=-1)
            comp.append(jax.lax.bitcast_convert_type(w, dt)
                        .reshape(nblocks, BLOCK))
        else:
            o = outs[oi]
            comp.append((jax.lax.bitcast_convert_type(o, dt)
                         if dt != jnp.float32 else o).reshape(nblocks, BLOCK))
        oi += np_
    return (pos, counts, *comp)


def pallas_compact_positions(flags: jnp.ndarray):
    """Positions-only form (see pallas_compact)."""
    pos, counts = pallas_compact(flags)[:2]
    return pos, counts


def use_pallas_compact(flags) -> bool:
    from .dispatch import array_on_multiple_devices

    if array_on_multiple_devices(flags):
        return False
    if config.pallas_interpret():
        return False
    return flags.shape[0] >= BLOCK_R * LANE
