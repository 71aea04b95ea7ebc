"""Pallas TPU scan kernel: single-pass blocked cumsum.

Replaces the 3-kernel Bolt structure of the reference (vexcl/scan.hpp:67-415:
block scan, scan-of-tails, uniform add) with ONE kernel pass: TPU grid
steps execute sequentially on a core, so a scalar carry in SMEM scratch
threads the running total through the blocks — no second kernel, no
host fix-up, half the HBM traffic of the 3-pass scheme.

Within a block the cumsum runs on the MXU as triangular matmuls applied
hierarchically: lane-wise prefix = X @ U (U upper-triangular ones,
128x128), then the per-row totals chain through 128-row group matmuls.

Precision trick: U is a 0/1 matrix, so splitting X into three bf16
pieces that sum exactly to the f32 value (8+8+8 mantissa bits) makes
X @ U = the sum of three NATIVE bf16 matmuls with f32 accumulation —
exact products, f32-quality results, at half the MXU passes of
Precision.HIGHEST (which must split both operands).  Rejected
alternatives (measured): pure-VPU Hillis-Steele roll scan 13.7 Gelem/s —
(R,1)-shaped ops cost as much as full (R,128) ops; scalar-free MXU
gather/scatter level-2 18.3 Gelem/s — the 16-piece concat + extra
matmuls cost more than the scalar chain they replace.

Measured ~50 Gelem/s (f32, 16M, cheap fused post; 10x XLA cumsum).
Beware benchmarking with a transcendental post-op: a fused cos drops the
same kernel to 28.8 Gelem/s — VPU transcendentals are NOT free even in a
DMA-bound kernel.  input_output_aliases measured no gain here (the
kernel sits at ~400 GB/s aggregate, above the 325 GB/s distinct-buffer
figure — block count, not stream turnaround, is what the larger 2 MiB
blocks bought).

An optional elementwise ``post`` lambda is fused into the output write
(the carry threads the raw cumsum), so benchmark/consumer chains need no
extra HBM pass over the result.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config

LANE = 128
# 4096 x 128 f32 = 2 MiB per block: fewer grid steps amortize the per-block
# scalar carry chain (measured 50-53 Gelem/s vs 47 at 2048, 45 at 1024)
BLOCK_R = 4096
BLOCK = BLOCK_R * LANE
_GROUPS = BLOCK_R // LANE  # 32


def _split3_dot(x, u_f32, u_bf16, acc_dtype):
    """x @ u with x split into three exactly-summing bf16 pieces; exact
    products against the 0/1 matrix u, f32 accumulation."""
    if acc_dtype != jnp.float32:
        return jnp.dot(x, u_f32.astype(acc_dtype),
                       preferred_element_type=acc_dtype,
                       precision=jax.lax.Precision.HIGHEST)
    x0 = x.astype(jnp.bfloat16)
    r = x - x0.astype(jnp.float32)
    x1 = r.astype(jnp.bfloat16)
    x2 = (r - x1.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jnp.dot(x0, u_bf16, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(x1, u_bf16, preferred_element_type=jnp.float32)
    return acc + jnp.dot(x2, u_bf16, preferred_element_type=jnp.float32)


def _scan_kernel(x_ref, o_ref, carry_ref, *, acc_dtype, post):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[0, 0] = jnp.zeros((), acc_dtype)

    row = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    upper = (row <= col).astype(jnp.float32)  # inclusive prefix (X @ U)
    upper_bf = upper.astype(jnp.bfloat16)

    blk = x_ref[...].astype(acc_dtype)  # (BLOCK_R, 128)
    row_cum = _split3_dot(blk, upper, upper_bf, acc_dtype)
    totals = row_cum[:, LANE - 1 : LANE]                # (BLOCK_R, 1)

    # cross-row exclusive prefix, group-wise: rows split into G groups of
    # 128; within a group a strictly-lower triangular dot gives the
    # offsets, group bases chain through scalars (static slices only —
    # Mosaic rejects sublane<->lane reshapes).  Measured alternatives that
    # LOST to this scalar chain: MXU gather/scatter of group bases (the
    # extra (16,R)/(R,16) HIGHEST matmuls cost more than 32 scalar
    # reads), pure-VPU roll scans, Mosaic-native cumsum (unimplemented).
    hp = jax.lax.Precision.HIGHEST
    lower_strict = (col < row).astype(jnp.float32)

    carry = carry_ref[0, 0]
    base = carry
    for g in range(_GROUPS):
        sl = slice(g * LANE, (g + 1) * LANE)
        tg = totals[sl]                                  # (128, 1)
        # tiny (128,128)@(128,1): HIGHEST is cheap here
        offs_g = jnp.dot(lower_strict, tg,
                         preferred_element_type=acc_dtype, precision=hp)
        o_ref[sl, :] = post(row_cum[sl, :] + offs_g + base).astype(
            o_ref.dtype)
        base = base + offs_g[LANE - 1, 0] + tg[LANE - 1, 0]
    carry_ref[0, 0] = base


def pallas_cumsum(x: jnp.ndarray, post=None, donate: bool = False) -> jnp.ndarray:
    """Inclusive cumsum of a 1-D array via the blocked Pallas kernel.

    ``post`` (optional elementwise lambda) is fused into the output write;
    the running carry always threads the raw cumsum.  ``donate=True``
    aliases the output onto x's buffer (no measured speed gain for this
    kernel — see module docstring — but it halves the memory footprint
    when the scan destination IS the source vector)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    nblocks = max(1, -(-n // BLOCK))
    padded = nblocks * BLOCK
    if padded != n:
        x = jnp.pad(x, (0, padded - n))
        donate = False  # the padded copy is a fresh buffer anyway
    x2 = x.reshape(nblocks * BLOCK_R, LANE)
    if post is None:
        post = lambda v: v  # noqa: E731

    acc_dtype = (
        jnp.float32
        if x.dtype in (jnp.float32, jnp.bfloat16, jnp.float16)
        else x.dtype
    )

    out = pl.pallas_call(
        partial(_scan_kernel, acc_dtype=acc_dtype, post=post),
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
        **({"input_output_aliases": {0: 0}} if donate else {}),
    )(x2)
    return out.reshape(padded)[:n]


def use_pallas_scan(x: jnp.ndarray, op) -> bool:
    """Pallas path: TPU, plain-add scan, float dtype, single device,
    large enough to amortize."""
    from .dispatch import array_on_multiple_devices

    if array_on_multiple_devices(x):
        return False
    if config.pallas_interpret():
        return False
    if op is not None:
        return False
    if x.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if x.shape[0] < 1 << 20:  # absolute cutoff, independent of BLOCK_R
        return False
    return True
