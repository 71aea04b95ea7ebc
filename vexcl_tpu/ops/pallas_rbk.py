"""Fused Pallas kernel for reduce_by_key stage 1: segmented scan +
per-ROW compaction in ONE pass.

r2 ran three dispatches (XLA flags pass, pallas_segscan, pallas_compact)
with the segmented sums written to HBM and re-read by the compaction.
The r3 probe (exp/rbk_stage_probe.py) put the r2 block compaction at
2.36 ms of the 3.68 ms 16M pipeline — VPU-op-bound: a full-block
bit-serial pack is ~15 steps x ~20 ops/element, and a 4-plane variant
with cheaper bit tests recovered only 10% (exp/compact_v2_ab.py).

This kernel cuts the pack to its 7 LANE-bit steps by compacting within
each 128-lane ROW only (deltas < 128; shifts are pure lane rolls that
never cross rows), and fuses it with the segmented scan so the
inclusive values never round-trip HBM:

  1. heads derive in-kernel from the tails plane (heads[i] =
     tails[i-1]; the block boundary rides the SMEM carry) — the XLA
     pre-pass writes ONE i8 plane instead of two;
  2. segmented scan phases exactly as ops/pallas_segscan.py (lane
     Hillis-Steele + sublane-roll cross-row carries, add/max/min);
  3. per-row rank = inclusive lane cumsum of tails (7 roll-adds);
  4. 7-step bit-serial row pack of (drem, pos, incl, keys...):
     delta-HALVING bookkeeping (test only the LSB each step), pos
     carries validity (-1 sentinel) so there is no alive plane, and
     payloads update with one select (stale values sit in dead slots).

The caller assembles with a sized sort over rows x kpad_row slices
(ops/reduce_by_key.py) — rows hold their tails left-justified, and
row-major (row, slot) order is global order, so a flat-index sortkey
suffices.  Positions are exact in f32 up to n = 2^24.

Reference analog: vexcl/reduce_by_key.hpp:435-580 (offset scan +
scatter per block); TPUs have no fast scatter, hence this shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config

LANE = 128
BLOCK_R = 512  # VMEM: ~10 live f32 planes + 3in/3out double-buffered IO


def _fused_kernel(*refs, kp, mono):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_ref, x_ref = refs[0], refs[1]
    key_refs = refs[2 : 2 + kp]
    pos_ref, o_ref = refs[2 + kp], refs[3 + kp]
    okey_refs = refs[4 + kp : 4 + 2 * kp]
    carry_ref = refs[-1]  # SMEM (2,): [value carry, prev block last tail]

    if mono == "add":
        ident, comb = 0.0, None
    elif mono == "max":
        ident, comb = -np.inf, jnp.maximum
    else:
        ident, comb = np.inf, jnp.minimum

    i = pl.program_id(0)
    R = x_ref.shape[0]

    @pl.when(i == 0)
    def _():
        carry_ref[0] = jnp.full((), ident, jnp.float32)
        carry_ref[1] = 1.0  # virtual tail before element 0 -> head at 0

    t = t_ref[...].astype(jnp.float32)
    v = x_ref[...].astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
    rcol = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 0)

    # -- 1. heads[p] = tails[p-1] (flat shift right by one) --------------
    tr = pltpu.roll(t, 1, axis=1)           # lane j <- lane j-1 (wraps)
    trr = pltpu.roll(tr, 1, axis=0)         # for lane 0: row r-1 lane 127
    f = jnp.where(lane == 0, trr, tr)
    f = jnp.where((lane == 0) & (rcol == 0), carry_ref[1], f)
    carry_ref[1] = t[R - 1, LANE - 1]

    # -- 2. segmented scan (pallas_segscan.py structure) ------------------
    F = f
    for d in (1, 2, 4, 8, 16, 32, 64):
        vr = pltpu.roll(v, d, axis=1)
        fr = pltpu.roll(F, d, axis=1)
        take = (lane >= d).astype(jnp.float32)
        if mono == "add":
            v = v + vr * take * (1.0 - F)
        else:
            v = comb(v, jnp.where((lane >= d) & (F == 0.0), vr,
                                  jnp.float32(ident)))
        F = jnp.maximum(F, fr * take)

    tails_col = v[:, LANE - 1 : LANE]
    anyhead = F[:, LANE - 1 : LANE]
    base = carry_ref[0]
    cv = jnp.where(rcol == 0, base, pltpu.roll(tails_col, 1, axis=0))
    cf = jnp.where(rcol == 0, 0.0, pltpu.roll(anyhead, 1, axis=0))
    d = 1
    while d < R:
        keep = (rcol >= d).astype(jnp.float32)
        fs = pltpu.roll(cf, d, axis=0) * keep
        if mono == "add":
            vs = pltpu.roll(cv, d, axis=0) * keep
            cv = cv + vs * (1.0 - cf)
        else:
            vs = jnp.where((rcol >= d) & (cf == 0.0),
                           pltpu.roll(cv, d, axis=0), jnp.float32(ident))
            cv = comb(cv, vs)
        cf = jnp.maximum(cf, fs)
        d *= 2
    last_comb = (cv[R - 1, 0] + tails_col[R - 1, 0] if mono == "add"
                 else comb(cv[R - 1, 0], tails_col[R - 1, 0]))
    carry_ref[0] = jnp.where(anyhead[R - 1, 0] > 0,
                             tails_col[R - 1, 0], last_comb)
    if mono == "add":
        incl = v + cv * (1.0 - F)
    else:
        incl = comb(v, jnp.where(F == 0.0, cv, jnp.float32(ident)))

    # -- 3. per-row rank of tails -----------------------------------------
    rank = t
    for d in (1, 2, 4, 8, 16, 32, 64):
        rank = rank + (pltpu.roll(rank, d, axis=1)
                       * (lane >= d).astype(jnp.float32))

    # -- 4. 7-step row pack ------------------------------------------------
    lanef = lane.astype(jnp.float32)
    drem = jnp.where(t > 0, lanef - (rank - 1.0), 0.0)
    gpos = ((i * R + row) * LANE + lane).astype(jnp.float32)
    pos = jnp.where(t > 0, gpos, -1.0)
    planes = [incl] + [r[...] for r in key_refs]

    def lshift(x, dk, fill):
        s = pltpu.roll(x, LANE - dk, axis=1)
        return jnp.where(lane < LANE - dk, s, fill)

    for k in range(7):
        dk = 1 << k
        h = jnp.floor(drem * 0.5)
        bit = drem - 2.0 * h
        drem_s = lshift(drem, dk, 0.0)
        h_s = jnp.floor(drem_s * 0.5)
        bit_s = drem_s - 2.0 * h_s
        arrived = bit_s > 0.0
        moved = bit > 0.0
        drem = jnp.where(arrived, h_s, h)
        pos = jnp.where(arrived, lshift(pos, dk, -1.0),
                        jnp.where(moved, -1.0, pos))
        planes = [jnp.where(arrived, lshift(p, dk, 0.0), p)
                  for p in planes]

    pos_ref[...] = pos
    o_ref[...] = planes[0]
    for r, p in zip(okey_refs, planes[1:]):
        r[...] = p


def _split_planes(payloads):
    """Each payload -> f32 bit-pattern planes (64-bit dtypes split into
    lo/hi words); returns (planes, [(dtype, n_planes)])."""
    dts = []
    planes = []
    for p in payloads:
        it = np.dtype(p.dtype).itemsize
        if it == 8:
            w = jax.lax.bitcast_convert_type(p, jnp.uint32)  # (n, 2)
            pls = [jax.lax.bitcast_convert_type(w[:, i], jnp.float32)
                   for i in range(2)]
        elif it == 4:
            pls = [p if p.dtype == jnp.float32
                   else jax.lax.bitcast_convert_type(p, jnp.float32)]
        else:
            raise TypeError(
                f"pallas_rbk payloads must be 32- or 64-bit, got {p.dtype}")
        dts.append((p.dtype, len(pls)))
        planes.extend(pls)
    return planes, dts


def _join_planes(outs, dts, shape):
    comp = []
    oi = 0
    for dt, np_ in dts:
        if np_ == 2:
            lo = jax.lax.bitcast_convert_type(outs[oi].reshape(-1),
                                              jnp.uint32)
            hi = jax.lax.bitcast_convert_type(outs[oi + 1].reshape(-1),
                                              jnp.uint32)
            w = jnp.stack([lo, hi], axis=-1)
            comp.append(jax.lax.bitcast_convert_type(w, dt).reshape(shape))
        else:
            o = outs[oi]
            comp.append((jax.lax.bitcast_convert_type(o, dt)
                         if dt != jnp.float32 else o).reshape(shape))
        oi += np_
    return comp


def pallas_segscan_rowcompact(tails, vals, *keys, mono="add"):
    """Fused segscan + row compaction.

    tails: (n,) i8, 1 at each segment END.  vals: (n,) f32/bf16.
    keys: 32/64-bit arrays transported to the compacted slots.

    Returns (pos, incl_c, *keys_c), each (n/128, 128): row r holds its
    segment tails left-justified — pos = global flat index (f32, exact
    for n <= 2^24) or -1, incl_c/keys_c the segment sum and key.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = vals.shape[0]
    BLOCK = BLOCK_R * LANE
    nblocks = max(1, -(-n // BLOCK))
    padded = nblocks * BLOCK
    if padded != n:
        vals = jnp.pad(vals, (0, padded - n))
        # pad elements are their own dead segments: tails=1 everywhere
        # in the pad keeps ranks finite, but those tails must not emit —
        # mark by tail=0 instead (no tail => dead slots, pos=-1).  The
        # REAL last element's tail is already 1 (caller sets it).
        tails = jnp.pad(tails, (0, padded - n))
        keys = tuple(jnp.pad(k, (0, padded - n)) for k in keys)
    kplanes, dts = _split_planes(keys)

    rows = nblocks * BLOCK_R
    f2 = tails.reshape(rows, LANE)
    x2 = vals.reshape(rows, LANE)
    k2 = [k.reshape(rows, LANE) for k in kplanes]

    spec = pl.BlockSpec((BLOCK_R, LANE), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    kp = len(k2)
    outs = pl.pallas_call(
        functools.partial(_fused_kernel, kp=kp, mono=mono),
        grid=(nblocks,),
        in_specs=[spec] * (2 + kp),
        out_specs=[spec] * (2 + kp),
        out_shape=[jax.ShapeDtypeStruct((rows, LANE), jnp.float32)]
        * (2 + kp),
        scratch_shapes=[pltpu.SMEM((2,), jnp.float32)],
        interpret=config.pallas_interpret(),
    )(f2, x2, *k2)
    pos = outs[0]
    incl_c = outs[1]
    keys_c = _join_planes(outs[2:], dts, (rows, LANE))
    return (pos, incl_c, *keys_c)


def use_pallas_rbk(keys, vals, n) -> bool:
    """Fused-kernel eligibility: integer keys (flags derive exactly at
    native width in the XLA pre-pass), f32/bf16 values, large,
    single-device, n <= 2^24 (pos exactness in f32), and at most TWO
    transported key planes — each extra plane adds a double-buffered
    IO pair plus pack temporaries, and a Pallas VMEM overrun crashes
    the remote worker (CLAUDE.md); wider tuple keys take the r2
    pipeline whose compact kernel runs at BLOCK_R=256."""
    from .dispatch import array_on_multiple_devices

    if array_on_multiple_devices(vals) or any(
            array_on_multiple_devices(k) for k in keys):
        return False
    if config.pallas_interpret():
        return False
    if vals.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if not (1 << 20) <= vals.shape[0] <= (1 << 24):
        return False
    kp = sum(2 if np.dtype(k.dtype).itemsize == 8 else 1 for k in keys)
    if kp > 2:
        return False
    return True
