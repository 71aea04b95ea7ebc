"""Pallas TPU kernel for DIA (banded) SpMV.

The XLA formulation (dia.py) is correct but materializes the padded x and
per-diagonal partial sums; for large matrices that costs several extra HBM
round-trips.  This kernel makes the traffic explicit and minimal:

  per output block of B elements:
    one async DMA pulls the needed x window (B + band-span) HBM->VMEM,
    one blocked read pulls the d value rows (d, B),
    the d shifted multiply-adds run in VMEM,
    one blocked write stores y.

Total HBM traffic = (d + 1 + span/B) reads + 1 write of n elements — the
same bytes the reference's hybrid-ELL kernel moves, minus its column
indices (diagonal structure is implicit).  Double-buffered via the Pallas
pipeline on vals/y; the x-window DMA overlaps the previous block's compute
(grid steps are sequential per core).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config

__all__ = ["dia_matvec_pallas", "use_pallas_dia"]

LANE = 128
BLOCK = 512 * LANE  # 65536 elements = 256 KiB f32 per value row block


def _align(x, m=1024):
    """1-D HBM DMA slices must be length-aligned to 1024 on Mosaic."""
    return -(-x // m) * m


def _kernel(xp_hbm, vals_ref, o_ref, xwin0, xwin1, sem, *, offsets, s0,
            span, block):
    """Double-buffered: one window buffer computes while the other
    prefetches the next block (guide: Patterns/Double Buffering).  Two
    separate scratch buffers + static branches: Mosaic cannot slice a
    (2, W) VMEM scratch along the tiled leading dim at runtime."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    nb = pl.num_programs(0)
    win = block + _align(span)
    omin = min(offsets)

    def dma(buf, slot, blk_idx):
        return pltpu.make_async_copy(
            xp_hbm.at[pl.ds(blk_idx * block + s0, win)],
            buf,
            sem.at[slot],
        )

    def run(cur, cur_slot, nxt, nxt_slot):
        @pl.when(i == 0)
        def _():
            dma(cur, cur_slot, i).start()

        @pl.when(i + 1 < nb)
        def _():
            dma(nxt, nxt_slot, i + 1).start()

        dma(cur, cur_slot, i).wait()

        acc = None
        for k, off in enumerate(offsets):
            # window element (off - omin + j) == xp[lpad + (i*B + j) + off]
            seg = vals_ref[k, :] * cur[off - omin : off - omin + block]
            acc = seg if acc is None else acc + seg
        o_ref[...] = acc

    even = jax.lax.rem(i, 2) == 0

    @pl.when(even)
    def _():
        run(xwin0, 0, xwin1, 1)

    @pl.when(jnp.logical_not(even))
    def _():
        run(xwin1, 1, xwin0, 0)


def dia_matvec_pallas(n: int, m: int, offsets, vals, x):
    """y = A x for DIA planes `vals` (d, n); 1-D f32/bf16 only."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = len(offsets)
    lpad = max(0, -min(offsets))
    s0 = lpad + min(offsets)  # = max(min(offsets), 0)
    span = max(offsets) - min(offsets)
    nblocks = -(-n // BLOCK)
    npad = nblocks * BLOCK
    # pad x so every window read is in range (+ DMA alignment slack)
    rpad = (npad + s0 + _align(span)) - (lpad + m)
    xp = jnp.pad(x, (lpad, max(0, rpad)))
    vals_p = (
        jnp.pad(vals, ((0, 0), (0, npad - n))) if npad != n else vals
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel, offsets=tuple(offsets), s0=s0, span=span, block=BLOCK
        ),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM
            pl.BlockSpec((d, BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad,), vals.dtype),
        scratch_shapes=[
            pltpu.VMEM((BLOCK + _align(span),), x.dtype),
            pltpu.VMEM((BLOCK + _align(span),), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=config.pallas_interpret(),
    )(xp, vals_p)
    return out[:n]


def use_pallas_dia(offsets, vals) -> bool:
    """Static-only decision (callable under tracing)."""
    if config.pallas_interpret():
        return False
    if vals.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    span = max(offsets) - min(offsets)
    d = len(offsets)
    # window + value rows must fit comfortably in VMEM
    if (BLOCK + span) * 4 + d * BLOCK * 4 > 8 * 1024 * 1024:
        return False
    if vals.shape[1] < 2 * BLOCK:
        return False
    if min(offsets) > 0:
        return False  # keeps the DMA start offset 1024-aligned (i*BLOCK)
    return True
