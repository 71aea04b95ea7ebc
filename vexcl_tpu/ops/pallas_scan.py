"""Pallas TPU scan kernel: single-pass blocked cumsum.

Replaces the 3-kernel Bolt structure of the reference (vexcl/scan.hpp:67-415:
block scan, scan-of-tails, uniform add) with ONE kernel pass: TPU grid
steps execute sequentially on a core, so a scalar carry in SMEM scratch
threads the running total through the blocks — no second kernel, no
host fix-up, half the HBM traffic of the 3-pass scheme.

Within a block the cumsum runs on the MXU as triangular matmuls applied
hierarchically: lane-wise prefix = X @ U (U upper-triangular ones,
128x128), then the per-row totals get the same treatment one level up.
This replaces the log-depth shared-memory tree of the reference with the
unit the TPU is best at.  Blocks are large (2048x128 = 1 MiB) so the
sequential-grid overhead amortizes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config

LANE = 128
BLOCK_R = 2048  # 2048 x 128 f32 = 1 MiB per block
BLOCK = BLOCK_R * LANE
_GROUPS = BLOCK_R // LANE  # 16


def _scan_kernel(x_ref, o_ref, carry_ref, *, acc_dtype):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[0, 0] = jnp.zeros((), acc_dtype)

    hp = jax.lax.Precision.HIGHEST
    row = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    upper = (row <= col).astype(acc_dtype)  # inclusive prefix (X @ U)

    blk = x_ref[...].astype(acc_dtype)  # (BLOCK_R, 128)
    row_cum = jnp.dot(blk, upper, preferred_element_type=acc_dtype,
                      precision=hp)
    totals = row_cum[:, LANE - 1 : LANE]                # (BLOCK_R, 1)

    # cross-row exclusive prefix, group-wise: rows split into G groups of
    # 128; within a group a strictly-lower triangular dot gives the
    # offsets, group bases chain through scalars (static slices only —
    # Mosaic rejects sublane<->lane reshapes)
    l_i = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    l_j = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    lower_strict = (l_j < l_i).astype(acc_dtype)

    carry = carry_ref[0, 0]
    base = carry
    for g in range(_GROUPS):
        sl = slice(g * LANE, (g + 1) * LANE)
        tg = totals[sl]                                  # (128, 1)
        offs_g = jnp.dot(lower_strict, tg,
                         preferred_element_type=acc_dtype, precision=hp)
        o_ref[sl, :] = (row_cum[sl, :] + offs_g + base).astype(o_ref.dtype)
        base = base + offs_g[LANE - 1, 0] + tg[LANE - 1, 0]
    carry_ref[0, 0] = base


def pallas_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum of a 1-D array via the blocked Pallas kernel."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    nblocks = max(1, -(-n // BLOCK))
    padded = nblocks * BLOCK
    if padded != n:
        x = jnp.pad(x, (0, padded - n))
    x2 = x.reshape(nblocks * BLOCK_R, LANE)

    acc_dtype = (
        jnp.float32
        if x.dtype in (jnp.float32, jnp.bfloat16, jnp.float16)
        else x.dtype
    )

    out = pl.pallas_call(
        partial(_scan_kernel, acc_dtype=acc_dtype),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((BLOCK_R, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_R, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks * BLOCK_R, LANE), x.dtype),
        scratch_shapes=[pltpu.SMEM((1, 1), acc_dtype)],
        interpret=config.pallas_interpret(),
    )(x2)
    return out.reshape(padded)[:n]


def use_pallas_scan(x: jnp.ndarray, op) -> bool:
    """Pallas path: TPU, plain-add scan, float dtype, single device,
    large enough to amortize."""
    if config.pallas_interpret():
        return False
    if op is not None:
        return False
    if x.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if x.shape[0] < 2 * BLOCK:
        return False
    try:
        if len(x.sharding.device_set) > 1:
            return False
    except Exception:
        pass
    return True
