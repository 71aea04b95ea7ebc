#!/usr/bin/env python
"""Stencil variant shoot-out on the real TPU.

Roadmap item 1: stencil at 174 GB/s vs ~600 possible. Hypothesis: flat
shifts done as LANE ROLLS (native VPU shuffle) + row-slice selects avoid
the lane-unaligned VMEM slice relayouts that bound both the current
Pallas window kernel and the XLA pad+slice path.

Variants:
  xla_pad    — current default: jnp.pad + w dynamic slices
  xla_roll   — 2-D (rows,128) layout, jnp.roll on lanes + row-slice select
  conv       — lax.conv_general_dilated (1,1,N)
  pallas_roll— Pallas kernel: double-buffered (R+2,128) window DMA,
               taps via pltpu.roll + select
Run: python exp/stencil_exp.py [variant ...]
"""
import functools
import sys
import os

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import slope_seconds  # noqa: E402

N = 1 << 26
W = 5
R_CENTER = W // 2


def coeffs():
    c = np.linspace(0.1, 0.5, W)
    return (c / c.sum()).astype(np.float32)


# ---------------------------------------------------------------- xla_pad
def make_xla_pad():
    cf = jnp.asarray(coeffs())

    def step(x):
        xp = jnp.pad(x, (R_CENTER, W - 1 - R_CENTER), mode="edge")
        y = jnp.zeros_like(x)
        for k in range(W):
            y = y + cf[k] * xp[k : k + N]
        return (y + 0.318) % 1.0

    return step


# ---------------------------------------------------------------- xla_roll
def make_xla_roll():
    cf = coeffs()
    ROWS = N // 128

    def step(x):
        # z: one halo row each side, edge values
        z = jnp.concatenate([
            jnp.full((128,), x[0], x.dtype), x, jnp.full((128,), x[-1], x.dtype)
        ]).reshape(ROWS + 2, 128)
        lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1)
        acc = jnp.zeros((ROWS, 128), x.dtype)
        for k in range(W):
            d = k - R_CENTER
            q, t = divmod(d, 128)
            if t == 0:
                sh = z[1 + q : 1 + q + ROWS, :]
            else:
                rolled = jnp.roll(z, -t, axis=1)
                sh = jnp.where(lane < 128 - t,
                               rolled[1 + q : 1 + q + ROWS, :],
                               rolled[2 + q : 2 + q + ROWS, :])
            acc = acc + cf[k] * sh
        return ((acc + 0.318) % 1.0).reshape(-1)

    return step


# ---------------------------------------------------------------- conv
def make_conv():
    cf = jnp.asarray(coeffs()[::-1].copy()).reshape(1, 1, W)

    def step(x):
        xp = jnp.pad(x, (R_CENTER, W - 1 - R_CENTER), mode="edge")
        y = jax.lax.conv_general_dilated(
            xp.reshape(1, 1, -1), cf, (1,), "VALID")
        return (y.reshape(-1) + 0.318) % 1.0

    return step


# ---------------------------------------------------------------- pallas_roll
BLOCK_ROWS = 1024  # (1024,128) f32 = 512 KiB per buffer


def _pallas_roll_kernel(z_hbm, o_ref, w0, w1, sem, *, cf):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    nb = pl.num_programs(0)
    R = BLOCK_ROWS

    def dma(buf, slot, blk):
        # window = R core rows + 8-row halo each side; 2-D DMAs fault the
        # worker unless the row count is a multiple of 8 (hard-won)
        return pltpu.make_async_copy(
            z_hbm.at[pl.ds(blk * R, R + 16), :], buf, sem.at[slot])

    def run(cur, cur_slot, nxt, nxt_slot):
        @pl.when(i == 0)
        def _():
            dma(cur, cur_slot, i).start()

        @pl.when(i + 1 < nb)
        def _():
            dma(nxt, nxt_slot, i + 1).start()

        dma(cur, cur_slot, i).wait()

        zwin = cur[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        acc = None
        rolls = {}
        for k in range(W):
            d = k - R_CENTER
            q, t = divmod(d, 128)
            if t == 0:
                sh = zwin[8 + q : 8 + q + R, :]
            else:
                if t not in rolls:
                    rolls[t] = pltpu.roll(zwin, 128 - t, axis=1)
                rolled = rolls[t]
                sh = jnp.where(lane < 128 - t,
                               rolled[8 + q : 8 + q + R, :],
                               rolled[9 + q : 9 + q + R, :])
            seg = cf[k] * sh
            acc = seg if acc is None else acc + seg
        o_ref[...] = acc

    even = jax.lax.rem(i, 2) == 0

    @pl.when(even)
    def _():
        run(w0, 0, w1, 1)

    @pl.when(jnp.logical_not(even))
    def _():
        run(w1, 1, w0, 0)


def make_pallas_roll():
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cf = tuple(float(c) for c in coeffs())
    ROWS = N // 128
    nblocks = ROWS // BLOCK_ROWS

    def step(x):
        z = jnp.concatenate([
            jnp.full((1024,), x[0], x.dtype), x,
            jnp.full((1024,), x[-1], x.dtype)
        ]).reshape(ROWS + 16, 128)
        y = pl.pallas_call(
            functools.partial(_pallas_roll_kernel, cf=cf),
            grid=(nblocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((BLOCK_ROWS, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, 128), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((BLOCK_ROWS + 16, 128), x.dtype),
                pltpu.VMEM((BLOCK_ROWS + 16, 128), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(z)
        return ((y + 0.318) % 1.0).reshape(-1)

    return step


VARIANTS = {
    "xla_pad": make_xla_pad,
    "xla_roll": make_xla_roll,
    "conv": make_conv,
    "pallas_roll": make_pallas_roll,
}



# ------------------------------------------------------- pallas_roll2
# No materialized pad: DMA core + 8-row halos straight from x2d, edge
# rows synthesized in-kernel for the boundary blocks; post-op fused.

def _pr2_kernel(x_hbm, o_ref, w0, w1, sem, *, cf, post):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    nb = pl.num_programs(0)
    R = BLOCK_ROWS

    def dmas(buf, slot, blk):
        core = pltpu.make_async_copy(
            x_hbm.at[pl.ds(blk * R, R), :], buf.at[8:8 + R, :],
            sem.at[slot, 0])
        lo_start = jnp.maximum(blk * R - 8, 0)
        lo = pltpu.make_async_copy(
            x_hbm.at[pl.ds(lo_start, 8), :], buf.at[0:8, :],
            sem.at[slot, 1])
        hi_start = jnp.minimum(blk * R + R, (nb - 1) * R)
        hi = pltpu.make_async_copy(
            x_hbm.at[pl.ds(hi_start, 8), :], buf.at[8 + R:R + 16, :],
            sem.at[slot, 2])
        return core, lo, hi

    def start(buf, slot, blk):
        for d in dmas(buf, slot, blk):
            d.start()

    def wait(buf, slot, blk):
        for d in dmas(buf, slot, blk):
            d.wait()

    def run(cur, cur_slot, nxt, nxt_slot):
        @pl.when(i == 0)
        def _():
            start(cur, cur_slot, i)

        @pl.when(i + 1 < nb)
        def _():
            start(nxt, nxt_slot, i + 1)

        wait(cur, cur_slot, i)

        @pl.when(i == 0)
        def _():
            cur[7:8, :] = jnp.full((1, 128), cur[8, 0], cur.dtype)

        @pl.when(i == nb - 1)
        def _():
            cur[8 + R:9 + R, :] = jnp.full((1, 128), cur[7 + R, 127],
                                           cur.dtype)

        zwin = cur[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        acc = None
        rolls = {}
        for k in range(W):
            d = k - R_CENTER
            q, t = divmod(d, 128)
            if t == 0:
                sh = zwin[8 + q:8 + q + R, :]
            else:
                if t not in rolls:
                    rolls[t] = pltpu.roll(zwin, 128 - t, axis=1)
                rolled = rolls[t]
                sh = jnp.where(lane < 128 - t,
                               rolled[8 + q:8 + q + R, :],
                               rolled[9 + q:9 + q + R, :])
            seg = cf[k] * sh
            acc = seg if acc is None else acc + seg
        o_ref[...] = post(acc)

    even = jax.lax.rem(i, 2) == 0

    @pl.when(even)
    def _():
        run(w0, 0, w1, 1)

    @pl.when(jnp.logical_not(even))
    def _():
        run(w1, 1, w0, 0)


def make_pallas_roll2():
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cf = tuple(float(c) for c in coeffs())
    ROWS = N // 128
    nblocks = ROWS // BLOCK_ROWS
    post = lambda v: (v + 0.318) % 1.0

    def step(x):
        x2d = x.reshape(ROWS, 128)
        y = pl.pallas_call(
            functools.partial(_pr2_kernel, cf=cf, post=post),
            grid=(nblocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((BLOCK_ROWS, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, 128), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((BLOCK_ROWS + 16, 128), x.dtype),
                pltpu.VMEM((BLOCK_ROWS + 16, 128), x.dtype),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
        )(x2d)
        return y.reshape(-1)

    return step

VARIANTS["pallas_roll2"] = make_pallas_roll2



# diagnostic: same 3-DMA skeleton, compute = copy (structural ceiling)
def make_pr2_copy():
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ROWS = N // 128
    nblocks = ROWS // BLOCK_ROWS

    def kern(x_hbm, o_ref, w0, w1, sem):
        i = pl.program_id(0)
        nb = pl.num_programs(0)
        R = BLOCK_ROWS

        def dmas(buf, slot, blk):
            core = pltpu.make_async_copy(
                x_hbm.at[pl.ds(blk * R, R), :], buf.at[8:8 + R, :],
                sem.at[slot, 0])
            lo_start = jnp.maximum(blk * R - 8, 0)
            lo = pltpu.make_async_copy(
                x_hbm.at[pl.ds(lo_start, 8), :], buf.at[0:8, :],
                sem.at[slot, 1])
            hi_start = jnp.minimum(blk * R + R, (nb - 1) * R)
            hi = pltpu.make_async_copy(
                x_hbm.at[pl.ds(hi_start, 8), :], buf.at[8 + R:R + 16, :],
                sem.at[slot, 2])
            return core, lo, hi

        def start(buf, slot, blk):
            for d in dmas(buf, slot, blk):
                d.start()

        def wait(buf, slot, blk):
            for d in dmas(buf, slot, blk):
                d.wait()

        def run(cur, cur_slot, nxt, nxt_slot):
            @pl.when(i == 0)
            def _():
                start(cur, cur_slot, i)

            @pl.when(i + 1 < nb)
            def _():
                start(nxt, nxt_slot, i + 1)

            wait(cur, cur_slot, i)
            o_ref[...] = cur[8:8 + R, :]

        even = jax.lax.rem(i, 2) == 0

        @pl.when(even)
        def _():
            run(w0, 0, w1, 1)

        @pl.when(jnp.logical_not(even))
        def _():
            run(w1, 1, w0, 0)

    def step(x):
        x2d = x.reshape(ROWS, 128)
        y = pl.pallas_call(
            kern,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((BLOCK_ROWS, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, 128), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((BLOCK_ROWS + 16, 128), x.dtype),
                pltpu.VMEM((BLOCK_ROWS + 16, 128), x.dtype),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
        )(x2d)
        return (y.reshape(-1) + 0.318) % 1.0  # keeps chain bounded, OUTSIDE

    return step

VARIANTS["pr2_copy"] = make_pr2_copy


# diagnostic: single core DMA only (no halos) + full tap compute
def make_pr2_onedma():
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cf = tuple(float(c) for c in coeffs())
    ROWS = N // 128
    nblocks = ROWS // BLOCK_ROWS
    post = lambda v: (v + 0.318) % 1.0

    def kern(x_hbm, o_ref, w0, w1, sem, *, cf, post):
        i = pl.program_id(0)
        nb = pl.num_programs(0)
        R = BLOCK_ROWS

        def dma(buf, slot, blk):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(blk * R, R + 16), :], buf, sem.at[slot])

        def run(cur, cur_slot, nxt, nxt_slot):
            @pl.when(i == 0)
            def _():
                dma(cur, cur_slot, i).start()

            @pl.when(i + 1 < nb)
            def _():
                dma(nxt, nxt_slot, i + 1).start()

            dma(cur, cur_slot, i).wait()

            zwin = cur[...]
            lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
            acc = None
            rolls = {}
            for k in range(W):
                d = k - R_CENTER
                q, t = divmod(d, 128)
                if t == 0:
                    sh = zwin[8 + q:8 + q + R, :]
                else:
                    if t not in rolls:
                        rolls[t] = pltpu.roll(zwin, 128 - t, axis=1)
                    rolled = rolls[t]
                    sh = jnp.where(lane < 128 - t,
                                   rolled[8 + q:8 + q + R, :],
                                   rolled[9 + q:9 + q + R, :])
                seg = cf[k] * sh
                acc = seg if acc is None else acc + seg
            o_ref[...] = post(acc)

        even = jax.lax.rem(i, 2) == 0

        @pl.when(even)
        def _():
            run(w0, 0, w1, 1)

        @pl.when(jnp.logical_not(even))
        def _():
            run(w1, 1, w0, 0)

    def step(x):
        # NOTE: reads 16 rows past each block boundary; results near the
        # global edges are wrong — diagnostic only.  Grid stops 1 early.
        x2d = x.reshape(ROWS, 128)
        y = pl.pallas_call(
            functools.partial(kern, cf=cf, post=post),
            grid=(nblocks - 1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((BLOCK_ROWS, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, 128), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((BLOCK_ROWS + 16, 128), x.dtype),
                pltpu.VMEM((BLOCK_ROWS + 16, 128), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(x2d)
        return y.reshape(-1)

    return step

VARIANTS["pr2_onedma"] = make_pr2_onedma


def main():
    names = sys.argv[1:] or list(VARIANTS)
    x0 = jnp.asarray(np.random.default_rng(3).random(N, dtype=np.float32))

    # correctness oracle (first 4096 elems)
    ref_step = make_xla_pad()
    ref = np.asarray(jax.jit(ref_step)(x0)[:4096])

    for name in names:
        step = VARIANTS[name]()
        got = np.asarray(jax.jit(step)(x0)[:4096])
        err = float(np.max(np.abs(got - ref)))
        t = slope_seconds(step, x0, lo=8, hi=48)
        gbs = 2 * N * 4 / t / 1e9
        print(f"{name:12s}  {gbs:7.1f} GB/s effective   maxerr={err:.2e}")


if __name__ == "__main__":
    main()
