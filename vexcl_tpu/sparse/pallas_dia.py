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

__all__ = ["dia_matvec_pallas", "use_pallas_dia",
           "dia_matvec_pallas_roll", "use_pallas_dia_roll",
           "dia_matvec_pallas_ring", "use_pallas_dia_ring"]

LANE = 128
# 131072 elements = 512 KiB f32 per value row block: in a same-process
# interleaved A/B on Poisson 64^3 (exp/dia_block_sweep.py methodology)
# 1024*LANE measured 329-349 GFLOP/s vs 315-328 at 512*LANE — a modest
# +4-6% from fewer grid steps, consistent with the bigger-block finding
# in the scan/stencil kernels.  (Cross-process runs of the same kernel
# swing ~300-560 GFLOP/s with the device's state — compare blocks only
# within one process.)  The use_pallas_dia_roll VMEM guard drops back to
# the window kernel when d value rows at this block no longer fit.
BLOCK = 1024 * LANE


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

    even = jax.lax.rem(i, jnp.int32(2)) == 0

    @pl.when(even)
    def _():
        run(xwin0, 0, xwin1, 1)

    @pl.when(jnp.logical_not(even))
    def _():
        run(xwin1, 1, xwin0, 0)


def _window_block(offsets, vals_dtype, n) -> int:
    """Block size for the window kernel: grow it for wide bands so the
    window/block re-read factor stays near 2 (a 256^3 Poisson span of
    131072 re-reads x 3.0x at the 64 Ki default; 2.0x at 128 Ki —
    measured 301 -> ~345 GFLOP/s), within a ~12 MiB VMEM budget."""
    span = max(offsets) - min(offsets)
    d = len(offsets)
    vb = 2 if vals_dtype == jnp.bfloat16 else 4
    block = BLOCK
    while block < _align(span) and block < (1 << 21):
        cand = block * 2
        win = cand + _align(span)
        vmem = 2 * win * 4 + 2 * d * cand * vb + 2 * cand * 4
        if vmem > 12 * 1024 * 1024 or cand > n:
            break
        block = cand
    return block


def dia_matvec_pallas(n: int, m: int, offsets, vals, x, prepadded=False):
    """y = A x for DIA planes `vals` (d, n); 1-D f32/bf16 only.

    ``prepadded=True``: x already carries the max(0, -min(offsets)) left
    elements (REAL neighbor-halo values in the distributed local phase,
    sparse/distributed.py) — only right alignment slack is added."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = len(offsets)
    lpad = max(0, -min(offsets))
    s0 = lpad + min(offsets)  # = max(min(offsets), 0)
    span = max(offsets) - min(offsets)
    BLOCK = _window_block(offsets, vals.dtype, n)
    nblocks = -(-n // BLOCK)
    npad = nblocks * BLOCK
    # pad x so every window read is in range (+ DMA alignment slack)
    if prepadded:
        need = npad + s0 + _align(span)
        xp = jnp.pad(x, (0, max(0, need - x.shape[0])))
    else:
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
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec((d, BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (npad,), jnp.promote_types(vals.dtype, x.dtype)),
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
    n = vals.shape[1]
    block = _window_block(offsets, vals.dtype, n)
    vb = 2 if vals.dtype == jnp.bfloat16 else 4
    # window + value rows must fit comfortably in VMEM
    if 2 * (block + _align(span)) * 4 + 2 * d * block * vb + 2 * block * 4 \
            > 13 * 1024 * 1024:
        return False
    if n < 2 * block:
        return False
    if min(offsets) > 0:
        return False  # keeps the DMA start offset 1024-aligned (i*BLOCK)
    return True


# --------------------------------------------------------------- roll kernel
# Second-generation DIA kernel: flat shifts as LANE ROLLS + row-slice
# selects on a (rows, 128) view (no lane-unaligned VMEM slices, which
# relayout and bound the window kernel above at ~155 GFLOP/s).  The x
# window is DMA'd directly from the unpadded (rows, 128) HBM view;
# domain-boundary blocks take per-block static branches whose windows are
# clipped and zero-filled (out-of-range vals are zero by DIA
# construction, so zero x contributes nothing).

ROLL_SUB = 8  # row alignment quantum for 2-D DMAs (worker faults otherwise)


def _ceil8(v):
    return -(-v // ROLL_SUB) * ROLL_SUB


def _roll_window(block, span):
    """Window length: block + span rounded so the roll-select can read one
    row past the last tap base (q+1 row slices)."""
    return block + _align(span + LANE)


def _roll_kernel(xp_hbm, vals_ref, o_ref, xwin0, xwin1, sem, *, offsets,
                 s0, span, block):
    """v1 window structure (1-D window DMA + auto-pipelined vals/out, which
    this runtime overlaps as independent DMA streams at ~480+ GB/s
    aggregate) with v2 tap evaluation: the window is reshaped (free) to
    (rows, 128) and flat shifts become lane rolls + row-slice selects
    instead of lane-unaligned 1-D VMEM slices (which relayout)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    nb = pl.num_programs(0)
    win = _roll_window(block, span)
    omin = min(offsets)
    R = block // LANE

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

        zwin = cur[...].reshape(win // LANE, LANE)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
        by_t = {}
        for k, off in enumerate(offsets):
            q, t = divmod(int(off) - omin, LANE)
            by_t.setdefault(t, []).append((q, k))
        acc = None
        for t, taps in by_t.items():
            rolled = zwin if t == 0 else pltpu.roll(zwin, LANE - t, axis=1)
            for q, k in taps:
                if t == 0:
                    sh = rolled[q:q + R, :]
                else:
                    sh = jnp.where(lane < LANE - t,
                                   rolled[q:q + R, :],
                                   rolled[q + 1:q + 1 + R, :])
                seg = vals_ref[k].reshape(R, LANE) * sh
                acc = seg if acc is None else acc + seg
        o_ref[...] = acc.reshape(block)

    even = jax.lax.rem(i, jnp.int32(2)) == 0

    @pl.when(even)
    def _():
        run(xwin0, 0, xwin1, 1)

    @pl.when(jnp.logical_not(even))
    def _():
        run(xwin1, 1, xwin0, 0)


def dia_matvec_pallas_roll(n, m, offsets, vals, x, prepadded=False):
    """y = A x via the roll kernel (f32, min(offset) <= 0).

    ``prepadded``: see dia_matvec_pallas — x already carries the left
    halo values (distributed local phase)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = len(offsets)
    lpad = max(0, -min(offsets))
    s0 = lpad + min(offsets)  # = max(min(offsets), 0)
    span = max(offsets) - min(offsets)
    nblocks = -(-n // BLOCK)
    npad = nblocks * BLOCK
    win = _roll_window(BLOCK, span)
    if prepadded:
        need = npad + s0 + (win - BLOCK)
        xp = jnp.pad(x, (0, max(0, need - x.shape[0])))
    else:
        rpad = (npad + s0 + (win - BLOCK)) - (lpad + m)
        xp = jnp.pad(x, (lpad, max(0, rpad)))
    vals_p = (
        jnp.pad(vals, ((0, 0), (0, npad - n))) if npad != n else vals
    )

    out = pl.pallas_call(
        functools.partial(
            _roll_kernel, offsets=tuple(int(o) for o in offsets), s0=s0,
            span=span, block=BLOCK,
        ),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec((d, BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (npad,), jnp.promote_types(vals.dtype, x.dtype)),
        scratch_shapes=[
            pltpu.VMEM((win,), x.dtype),
            pltpu.VMEM((win,), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=config.pallas_interpret(),
    )(xp, vals_p)
    return out[:n]


def _local_pallas_dia(nb: int, offsets, vals_blk, x_dtype):
    """Kernel choice for the DISTRIBUTED DIA SpMV's local phase (inside
    shard_map each shard is single-device, so the kernels apply —
    ops/scan.py:_local_pallas_sum pattern).  Returns "roll" | "window" |
    None.  vals_blk is the (d, n/D) local plane tracer; shapes/dtypes
    are static.  Monkeypatchable for the CPU-mesh composition test."""
    ok_dt = x_dtype == vals_blk.dtype or (
        x_dtype == jnp.float32 and vals_blk.dtype == jnp.bfloat16)
    if not ok_dt:
        return None
    if use_pallas_dia_roll(nb, nb, offsets, vals_blk):
        return "roll"
    if use_pallas_dia(offsets, vals_blk):
        return "window"
    return None


def use_pallas_dia_roll(n, m, offsets, vals) -> bool:
    if config.pallas_interpret():
        return False
    if vals.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    span = max(offsets) - min(offsets)
    d = len(offsets)
    win = _roll_window(BLOCK, span)
    if win > 3 * BLOCK // 2:
        # wide bands re-read x >1.5x; there the window kernel is DMA-bound
        # anyway and measured slightly faster (159 vs 151 GF/s, 256^3)
        return False
    if (4 * win + 2 * d * BLOCK + 2 * BLOCK) * 4 > 13 * 1024 * 1024:
        return False
    if vals.shape[1] < 2 * BLOCK:
        return False
    if min(offsets) > 0:
        return False  # keeps the DMA start offset 1024-aligned (i*BLOCK)
    return True


# --------------------------------------------------------------- ring kernel
# For matrices whose large diagonals are whole-block shifts (q = +-R rows,
# e.g. the +-n^2 planes of a 3-D Poisson operator with R = n^2/128), the
# windowed kernel re-reads x up to 3x.  The ring kernel keeps a 4-deep
# ring of (R,128) x core blocks in VMEM: each grid step DMAs ONE new core
# block, so x is read exactly once; the +-R taps multiply against the
# neighboring ring entries, and small taps (|q| <= 7) use an 8-row halo
# concatenated from the neighbors.


def _ring_split(offsets, rows):
    """(R, halo, core) or None. halo: (q, t, k) with |q|<=7; core: (c, k)
    with offset == c*R*128, c in {-1,+1}."""
    for R in (512, 1024, 256, 128, 64, 32, 16, 8):
        if rows % R:
            continue
        halo, core = [], []
        ok = True
        for k, off in enumerate(offsets):
            q, t = divmod(int(off), LANE)
            if -7 <= q <= 7:
                halo.append((q, t, k))
            elif t == 0 and abs(q) == R:
                core.append((q // R, k))
            else:
                ok = False
                break
        if not ok or rows // R < 3:
            continue
        d = len(offsets)
        vmem = (2 * d * R + 4 * R + 2 * R + 4 * (R + 16)) * LANE * 4
        if vmem > 12 * 1024 * 1024:
            continue
        return R, halo, core
    return None


def _ring_kernel(x_hbm, vals_ref, o_ref, r0, r1, r2, r3, sem, *, halo,
                 core, R):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    nb = pl.num_programs(0)
    bufs = (r0, r1, r2, r3)

    def dma(bufidx, blk):
        # FLAT 1-D DMA (the fast path on this runtime: 2-D (R,128) core
        # copies measured ~3x lower aggregate bandwidth); the buffer is
        # viewed as (R, 128) at use — a free row-major reshape
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(blk * R * LANE, R * LANE)], bufs[bufidx],
            sem.at[bufidx])

    def run(p):
        cur, prv, nxt = (bufs[p], bufs[(p - 1) % 4], bufs[(p + 1) % 4])

        @pl.when(i == 0)
        def _():
            dma(p, i).start()
            dma((p + 1) % 4, i + 1).start()
            prv[...] = jnp.zeros_like(prv)

        @pl.when(i + 2 < nb)
        def _():
            dma((p + 2) % 4, i + 2).start()

        @pl.when(i == nb - 1)
        def _():
            nxt[...] = jnp.zeros_like(nxt)

        @pl.when(i == 0)
        def _():
            dma(p, i).wait()

        @pl.when(i + 1 < nb)
        def _():
            dma((p + 1) % 4, i + 1).wait()

        prv2 = prv[...].reshape(R, LANE)
        cur2 = cur[...].reshape(R, LANE)
        nxt2 = nxt[...].reshape(R, LANE)
        win = jnp.concatenate(
            [prv2[R - 8:R, :], cur2, nxt2[0:8, :]], axis=0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
        by_t = {}
        for q, t, k in halo:
            by_t.setdefault(t, []).append((q, k))
        acc = None
        for t, taps in by_t.items():
            rolled = win if t == 0 else pltpu.roll(win, LANE - t, axis=1)
            for q, k in taps:
                base = 8 + q
                if t == 0:
                    sh = rolled[base:base + R, :]
                else:
                    sh = jnp.where(lane < LANE - t,
                                   rolled[base:base + R, :],
                                   rolled[base + 1:base + 1 + R, :])
                seg = vals_ref[k] * sh
                acc = seg if acc is None else acc + seg
        for c, k in core:
            sh = prv2 if c == -1 else nxt2
            seg = vals_ref[k] * sh
            acc = seg if acc is None else acc + seg
        o_ref[...] = acc

    ph = jax.lax.rem(i, jnp.int32(4))
    for p in range(4):
        @pl.when(ph == p)
        def _(p=p):
            run(p)


def dia_matvec_pallas_ring(n, m, offsets, vals, x):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = n // LANE
    R, halo, core = _ring_split(offsets, rows)
    d = len(offsets)
    nblocks = rows // R

    vals3 = vals.reshape(d, rows, LANE)

    y = pl.pallas_call(
        functools.partial(_ring_kernel, halo=tuple(halo), core=tuple(core),
                          R=R),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # flat x stays in HBM
            pl.BlockSpec((d, R, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (rows, LANE), jnp.promote_types(vals.dtype, x.dtype)),
        scratch_shapes=[
            pltpu.VMEM((R * LANE,), x.dtype),
            pltpu.VMEM((R * LANE,), x.dtype),
            pltpu.VMEM((R * LANE,), x.dtype),
            pltpu.VMEM((R * LANE,), x.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=config.pallas_interpret(),
    )(x, vals3)
    return y.reshape(-1)


def use_pallas_dia_ring(n, m, offsets, vals) -> bool:
    import os

    # Experimental: reads x exactly once (vs 3x for the windowed kernel on
    # plane-offset matrices) but measured slower on axon v5e (95 vs 155
    # GF/s, Poisson 256^3) — the per-step 2-D core DMAs reach lower
    # aggregate bandwidth than the big 1-D window DMA.  Kept opt-in for
    # future runtimes.
    if os.environ.get("VEXTPU_DIA_RING") != "1":
        return False
    if config.pallas_interpret():
        return False
    if vals.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if n != m or n % LANE != 0:
        return False
    span = max(offsets) - min(offsets)
    if _roll_window(BLOCK, span) <= 2 * BLOCK:
        return False  # windowed roll kernel is simpler and as fast
    return _ring_split(offsets, n // LANE) is not None
