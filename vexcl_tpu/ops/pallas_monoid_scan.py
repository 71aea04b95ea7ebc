"""Pallas TPU kernel: single-pass blocked MIN/MAX inclusive scan.

ops/pallas_scan.py covers the SUM scan on the MXU (triangular matmuls);
min/max have no matmul form, and XLA's `associative_scan` fallback is
log-depth (many full HBM passes).  This kernel runs the running
min/maximum in one pass with the pallas_segscan.py machinery minus keys
and flags: 7-step Hillis-Steele over lanes (rolls), a Hillis-Steele over
the (R,1) row-tail column via sublane rolls, and a scalar SMEM carry
threading the sequential grid steps.  Identity values (+-inf) mask the
rolled-in wraparound lanes/rows.

Reference analog: vexcl/scan.hpp with a MIN/MAX functor (the 3-kernel
Bolt structure, host-fixed-up across devices).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import config

LANE = 128
BLOCK_R = 1024


def _mono_kernel(x_ref, o_ref, carry_ref, *, is_max):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    R = x_ref.shape[0]
    op = jnp.maximum if is_max else jnp.minimum
    ident = jnp.float32(-jnp.inf if is_max else jnp.inf)

    @pl.when(i == 0)
    def _():
        carry_ref[0, 0] = ident

    v = x_ref[...].astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)

    # lane phase: running op within each row
    for d in (1, 2, 4, 8, 16, 32, 64):
        vr = pltpu.roll(v, d, axis=1)
        v = op(v, jnp.where(lane >= d, vr, ident))

    # cross-row phase: exclusive running op over row tails (+ block carry
    # as a virtual row -1), via sublane rolls + iota masks
    tails = v[:, LANE - 1 : LANE]                    # (R, 1)
    rcol = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    cv = jnp.where(rcol == 0, carry_ref[0, 0],
                   pltpu.roll(tails, 1, axis=0))
    d = 1
    while d < R:
        vs = jnp.where(rcol >= d, pltpu.roll(cv, d, axis=0), ident)
        cv = op(cv, vs)
        d *= 2

    carry_ref[0, 0] = op(cv[R - 1, 0], tails[R - 1, 0])
    o_ref[...] = op(v, cv).astype(o_ref.dtype)


def pallas_cummax(x, is_max=True, donate: bool = False):
    """Inclusive running max (or min) of a 1-D f32/bf16 array.

    ``donate=True`` aliases the output onto x's buffer
    (input_output_aliases) — safe: each grid block's input lands in VMEM
    before its output region is overwritten, and blocks are disjoint.
    Used when the scan destination IS the source vector (config.donate)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from functools import partial

    n = x.shape[0]
    BLOCK = BLOCK_R * LANE
    nblocks = max(1, -(-n // BLOCK))
    padded = nblocks * BLOCK
    if padded != n:
        fill = float("-inf") if is_max else float("inf")
        x = jnp.pad(x, (0, padded - n), constant_values=fill)
        donate = False  # the padded copy is a fresh buffer anyway
    x2 = x.reshape(nblocks * BLOCK_R, LANE)

    out = pl.pallas_call(
        partial(_mono_kernel, is_max=is_max),
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((BLOCK_R, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLOCK_R, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks * BLOCK_R, LANE), x.dtype),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        interpret=config.pallas_interpret(),
        **({"input_output_aliases": {0: 0}} if donate else {}),
    )(x2)
    return out.reshape(padded)[:n]


def pallas_cummin(x):
    return pallas_cummax(x, is_max=False)


def use_pallas_monoid_scan(x, op_name) -> bool:
    from .dispatch import array_on_multiple_devices

    if array_on_multiple_devices(x):
        return False
    if config.pallas_interpret():
        return False
    if op_name not in ("max", "min"):
        return False
    if x.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if x.shape[0] < 1 << 20:
        return False
    return True
