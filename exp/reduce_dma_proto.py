"""Prototype: single-Pallas-kernel class column-sum via manual DMA.

The shipped SELL-R reduce is launch-overhead-bound (~10 us x 50 class
ops, exp/reduce_variants_probe.py: halving bytes or using the MXU moved
nothing).  This kernel replaces all per-class ops with ONE pallas_call:
grid over output blocks; per-block scalar-prefetched (base_tile,
stride_tiles, wk, read_tiles_code); a double-buffered DMA loop reads the
wk strided row-chunks of the class plane straight from HBM.

Measures: per-matvec ms and effective GB/s at the bench grid, vs the
0.553 ms shipped XLA reduce and the 0.10 ms one-stream byte bound.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("VEXTPU_PROTO_CPU", "") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import slope_seconds
from vexcl_tpu.config import config

interpret = config.pallas_interpret()

# read-height buckets (tiles): static DMA shapes selected per block
SIZES = (8, 32, 128, 256)


NBUF = 2


@partial(jax.jit, static_argnames=("TB", "nblocks", "interpret"))
def class_colsum_dma(h2, prm, TB, nblocks, interpret=False):
    """h2: (Mtiles, 128) f32.  prm: (nblocks, 4) int32 rows
    [base_tile, stride_tiles, wk, size_idx].  Output (nblocks*TB, 128):
    block b rows j = sum_i h2[base + i*stride + j, :] for j < read_tiles
    (rows beyond the class tail hold garbage — dropped downstream)."""

    def kernel(prm_ref, h_ref, o_ref, buf, sem):
        b = pl.program_id(0)
        base = prm_ref[b, 0]
        stride = prm_ref[b, 1]
        wk = prm_ref[b, 2]
        sidx = prm_ref[b, 3]

        o_ref[:, :] = jnp.zeros((TB, 128), h_ref.dtype)

        def start(slot, i):
            for k, sz in enumerate(SIZES):
                @pl.when(sidx == k)
                def _(sz=sz, slot=slot, i=i):
                    pltpu.make_async_copy(
                        h_ref.at[pl.ds(base + i * stride, sz), :],
                        buf.at[slot, pl.ds(0, sz), :],
                        sem.at[slot]).start()

        def wait(slot, i):
            for k, sz in enumerate(SIZES):
                @pl.when(sidx == k)
                def _(sz=sz, slot=slot, i=i):
                    pltpu.make_async_copy(
                        h_ref.at[pl.ds(base + i * stride, sz), :],
                        buf.at[slot, pl.ds(0, sz), :],
                        sem.at[slot]).wait()

        for w in range(NBUF - 1):
            @pl.when(w < wk)
            def _(w=w):
                start(w, w)

        def body(i, carry):
            slot = jax.lax.rem(i, NBUF)

            @pl.when(i + NBUF - 1 < wk)
            def _():
                start(jax.lax.rem(i + NBUF - 1, NBUF), i + NBUF - 1)

            wait(slot, i)
            o_ref[:, :] = o_ref[:, :] + buf[slot]
            return carry

        jax.lax.fori_loop(0, wk, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=pl.BlockSpec((TB, 128), lambda i, p: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((NBUF, max(SIZES), 128), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblocks * TB, 128), h2.dtype),
        interpret=interpret,
    )(prm, h2)


def plan_blocks(classes, TB):
    """classes: [(off, nk, nkp, wk)] -> (prm array, out slices).
    Every off and nkp is a 128-multiple.  Returns per-block params and,
    per class, (block0, ntiles) for downstream assembly."""
    prm = []
    spans = []
    for off, nk, nkp, wk in classes:
        tiles = nkp // 128
        b0 = len(prm)
        jt = 0
        while jt < tiles:
            rem = tiles - jt
            rd = TB
            if rem < TB:
                for k, sz in enumerate(SIZES):
                    if sz >= rem:
                        rd = sz
                        break
            sidx = SIZES.index(rd)
            prm.append((off // 128 + jt, tiles, wk, sidx))
            jt += rd
        spans.append((b0, tiles))
    return np.asarray(prm, np.int32), spans


def oracle(h, classes):
    parts = []
    for off, nk, nkp, wk in classes:
        parts.append(h[off: off + wk * nkp].reshape(wk, nkp).sum(axis=0))
    return np.concatenate(parts)


def run_case(name, classes, Mtiles, time_it=True):
    TB = SIZES[-1]
    prm, spans = plan_blocks(classes, TB)
    nblocks = len(prm)
    rng = np.random.default_rng(0)
    h = rng.standard_normal(Mtiles * 128).astype(np.float32)
    h2 = jnp.asarray(h.reshape(Mtiles, 128))
    prm_j = jnp.asarray(prm)

    out = class_colsum_dma(h2, prm_j, TB, nblocks, interpret=interpret)
    out_np = np.asarray(out).reshape(-1)
    want = oracle(h, classes)
    got = np.concatenate([
        out_np[b0 * TB * 128: b0 * TB * 128 + tiles * 128]
        for b0, tiles in spans])
    err = np.abs(got - want).max() / max(1.0, np.abs(want).max())
    print(f"{name}: nblocks={nblocks} rel err {err:.2e}")
    assert err < 1e-5

    if not time_it:
        return
    slots = sum(wk * nkp for _, _, nkp, wk in classes)
    x0 = jnp.asarray(rng.standard_normal(128).astype(np.float32))

    def step(v, hc, pp):
        hp = hc + v[0] * np.float32(1e-30)
        o = class_colsum_dma(hp, pp, TB, nblocks, interpret=interpret)
        return (v * np.float32(0.999)
                + o[0, 0] * np.float32(1e-9)) % 1.0

    t = slope_seconds(step, x0, lo=32, hi=288, extra=(h2, prm_j))
    print(f"{name}: {t * 1e3:8.3f} ms  ({slots * 4 / t / 1e9:.0f} GB/s read, "
          f"{slots} slots, {nblocks} blocks)")


# ---- tiny correctness case ----------------------------------------------
tiny = [(0, 256, 256, 3), (3 * 256, 128, 128, 5), (3 * 256 + 5 * 128, 384, 384, 2)]
Mt = (3 * 256 + 5 * 128 + 2 * 384) // 128 + SIZES[-1]
run_case("tiny", tiny, Mt, time_it=False)

# ---- bench-shaped case: replicate the real class structure ---------------
if os.environ.get("VEXTPU_PROTO_TINY", "") == "1":
    sys.exit(0)
t0 = time.time()
from bench import _random_lognormal_csr          # noqa: E402
from vexcl_tpu.sparse.shuffle import SELLR       # noqa: E402

n = 1 << 20
ptr, col, val, nnz = _random_lognormal_csr(n)
A = SELLR(n, n, ptr, col, val)
print(f"construction {time.time() - t0:.1f} s, classes={len(A._classes)}")
Mtiles = A._R  # route grid rows: reads may run past dst_rows into trash
assert Mtiles >= A._dst_rows + SIZES[-1]
run_case("bench", list(A._classes), Mtiles)
