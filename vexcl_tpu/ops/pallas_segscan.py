"""Pallas TPU kernel: single-pass blocked SEGMENTED inclusive sum scan.

scan_by_key (reference vexcl/scan_by_key.hpp:67-722) runs three kernels
per scan and is single-device-per-partition; XLA's associative_scan over a
(flags, values) pair is log-depth — many full HBM round trips.  This
kernel does one pass, reading i8 head flags + values and writing the
segmented scan, with a running-value scalar carry threading the
sequential grid steps (same structure as pallas_scan.py).

Per (BLOCK_R, 128) block:
  1. head flags arrive from a fused XLA pre-pass (one shifted key
     compare, i8) — deriving them in-kernel from i32 keys cost 1326 s of
     Mosaic compile by itself (exp/segscan_compile_bisect.py).
  2. lane phase: classic 7-step Hillis-Steele segmented scan along lanes
     (GPU Gems ch.39): v[j] += f[j] ? 0 : v[j-d]; f[j] |= f[j-d].
     Rolls are native VPU ops; row-local result V, or-scanned flags F.
  3. cross-row phase: per-row aggregates (tail = V[:,127], anyhead =
     F[:,127]) get a Hillis-Steele segmented scan along SUBLANES via
     `pltpu.roll(axis=0)` + iota masks (concat of non-8-multiple row
     slices is a Mosaic error), and the block carry rides as a virtual
     row -1.
     Rejected (measured): per-128-row-group data-dependent 0/1-matmul
     carries — Q[r,s] = (s<r)&(headcnt_incl[s]==headcnt_excl[r]), Q @
     tails.  With (128,1)<->(1,128) broadcast transposes it ran at 2.0
     Gelem/s (Mosaic relayouts); transpose-free via one-hot count
     indicators + lane-contracting dot_general reached 15.2 Gelem/s but
     took 480 s to compile (8 unrolled matmul groups).
  4. out = V + carry_row * (1 - F): rows' incoming carry applies only to
     elements before the row's first head.

Exact in f32: flags/counts are small integers (exact in bf16 matmuls);
value sums accumulate in f32 on the VPU (plain adds, no matmul on the
value path), so results match a sequential host segmented sum at f32.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..config import config

LANE = 128
# 0.5 MiB f32 values + 0.5 MiB i32 keys per block (x2 buffered by the
# pipeline); the kernel's live set (v, F, roll temporaries, iotas) runs
# ~8x the value block on the Mosaic stack — 2048 rows exceeded the 16 MiB
# scoped-vmem limit at AOT compile (20.4 MiB)
BLOCK_R = 1024


def _seg_kernel(f_ref, x_ref, o_ref, carry_ref, *, mono="add"):
    """Segmented scan kernel over any of the add/max/min monoids: the
    same paired Hillis-Steele structure, with masked contributions
    selected against the monoid identity (0 / -inf / +inf) instead of
    the add-only multiply-mask form."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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
        carry_ref[0, 0] = jnp.full((), ident, jnp.float32)

    # head flags arrive PRE-COMPUTED from a cheap fused XLA pass (one
    # shifted key compare).  Deriving them in-kernel from i32 keys made
    # Mosaic compile take 450-1300 s (bisected: the i32 shift/compare +
    # i32 SMEM carry phase ALONE cost 1326 s while the paired
    # Hillis-Steele phases compile in ~1 s — exp/segscan_compile_bisect
    # .py); with f32 flags the whole kernel compiles in seconds and the
    # cross-block key carry disappears.
    f = f_ref[...].astype(jnp.float32)   # i8 0/1 flags -> f32
    v = x_ref[...].astype(jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)

    # -- 2. lane phase: Hillis-Steele segmented scan --------------------
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

    # -- 3. cross-row carries -------------------------------------------
    # Hillis-Steele segmented scan over the (R, 1) per-row aggregate
    # columns with SUBLANE rolls + iota masks (no matmuls, no relayouts;
    # an (R,1) op costs the same tiles as an (R,128) op anyway —
    # docs/tpu_kernel_notes.md).  The incoming block carry rides as a
    # virtual row -1: shift aggregates down one row and seed row 0 with
    # (base, no-head).
    tails = v[:, LANE - 1 : LANE]                    # (R, 1)
    anyhead = F[:, LANE - 1 : LANE]                  # (R, 1) 0/1

    base = carry_ref[0, 0]                           # value carry into row 0
    rcol = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    # down-shift by one row via sublane roll (concat of odd-length row
    # slices is a Mosaic "offset mismatch on non-concat dimension" error)
    cv = jnp.where(rcol == 0, base,
                   pltpu.roll(tails, 1, axis=0))
    cf = jnp.where(rcol == 0, 0.0,
                   pltpu.roll(anyhead, 1, axis=0))
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
    carry_col = cv                                   # (R, 1), excl. carries
    # next block's carry: fold in the last row's own aggregate
    last_comb = (carry_col[R - 1, 0] + tails[R - 1, 0] if mono == "add"
                 else comb(carry_col[R - 1, 0], tails[R - 1, 0]))
    carry_ref[0, 0] = jnp.where(
        anyhead[R - 1, 0] > 0, tails[R - 1, 0], last_comb)

    # -- 4. combine ------------------------------------------------------
    if mono == "add":
        o_ref[...] = (v + carry_col * (1.0 - F)).astype(o_ref.dtype)
    else:
        o_ref[...] = comb(
            v, jnp.where(F == 0.0, carry_col, jnp.float32(ident))
        ).astype(o_ref.dtype)


def pallas_segmented_cumsum(keys: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Segmented inclusive cumsum of 1-D ``x``, segments = runs of equal
    ``keys`` (i32)."""
    # flags via one fused XLA pass (the kernel reads f32 flags, not keys:
    # in-kernel i32 flag derivation cost 450-1300 s of Mosaic compile)
    flags = jnp.concatenate(
        [jnp.ones((1,), jnp.int8),
         (keys[1:] != keys[:-1]).astype(jnp.int8)])
    return pallas_segmented_cumsum_flags(flags, x)


def pallas_segmented_cumsum_flags(flags: jnp.ndarray, x: jnp.ndarray,
                                  mono: str = "add") -> jnp.ndarray:
    """Segmented inclusive scan with PRECOMPUTED head flags (i8, 1 at
    each segment start) — the multi-key / custom-equality entry: callers
    derive flags from any number of key arrays in one fused XLA pass.
    ``mono`` selects the monoid: "add" (default), "max", "min"."""
    import functools

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    BLOCK = BLOCK_R * LANE
    nblocks = max(1, -(-n // BLOCK))
    padded = nblocks * BLOCK
    if padded != n:
        x = jnp.pad(x, (0, padded - n))
        # pad is its own fresh segment
        flags = jnp.pad(flags, (0, padded - n),
                        constant_values=np.int8(1))
    f2 = flags.reshape(nblocks * BLOCK_R, LANE)
    x2 = x.reshape(nblocks * BLOCK_R, LANE)

    out = pl.pallas_call(
        functools.partial(_seg_kernel, mono=mono),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((BLOCK_R, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_R, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_R, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks * BLOCK_R, LANE), x.dtype),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        interpret=config.pallas_interpret(),
    )(f2, x2)
    return out.reshape(padded)[:n]


def use_pallas_segscan_flags(key_arrays, x) -> bool:
    """Pallas eligibility when the caller derives head flags itself in a
    fused XLA pre-pass (any key count/dtype, any equality predicate —
    the kernel only ever sees i8 flags): plain-add, f32/bf16 values,
    large, single-device."""
    from .dispatch import array_on_multiple_devices

    if array_on_multiple_devices(x) or any(
            array_on_multiple_devices(k) for k in key_arrays):
        return False
    if config.pallas_interpret():
        return False
    if x.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if x.shape[0] < 1 << 20:
        return False
    return True


def use_pallas_segscan(keys, x, op, key_eq) -> bool:
    """Pallas path: plain-add segmented scan over a single integer key
    vector, f32/bf16 values, large single-device arrays.

    The kernel never reads keys: segment-head flags are derived in a fused
    XLA pre-pass (``keys[1:] != keys[:-1]``) at the keys' NATIVE dtype, so
    any integer width is exact.  Float keys are rejected conservatively
    (NaN != NaN would split segments; the generic path defines that case).
    """
    from .dispatch import array_on_multiple_devices

    if array_on_multiple_devices(x) or array_on_multiple_devices(keys):
        return False
    if config.pallas_interpret():
        return False
    if op is not None or key_eq is not None:
        return False
    if x.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if not jnp.issubdtype(keys.dtype, jnp.integer):
        return False
    if x.shape[0] < 1 << 20:
        return False
    return True
