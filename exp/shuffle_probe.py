#!/usr/bin/env python
"""Primitive rates for the shuffle-routed irregular SpMV design (r4).

Discovered capability envelope (probed on the real chip):
  * Mosaic lane gather: jnp.take_along_axis(tab, idx, axis=1) lowers to a
    native per-lane dynamic gather, ONLY for minor dim exactly 128 and
    tab.shape == idx.shape.
  * Mosaic sublane gather: axis=0 within one (8, 128) tile.
  * Anything bigger crashes the remote compiler (HTTP 500).

Design sketch this feeds: bucket nnz entries by 1024-element x tile,
2-op tile gather (sublane+lane) fetches x values; a Benes-style static
shuffle (lane-perm stages + transposes, edge-colored at construction)
routes products from bucket order to ELL row order; dense row-sum.

Rates measured here (all carry-coupled so nothing hoists out of the
fori_loop chain):
  1. lane-perm throughput at scale (Pallas grid kernel)    [Gelem/s]
  2. same through plain XLA take_along_axis (fast path?)   [Gelem/s]
  3. 2-op tile gather (x fetch stage)                      [Gelem/s]
  4. big transpose (M/128,128)->(128,M/128) XLA            [GB/s]
  5. corrected jnp.take rate vs table size                 [Melem/s]
  6. segment_sum sorted vs unsorted ids                    [Melem/s]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl

from bench import slope_seconds  # noqa: E402


def report(name, elems, t, unit="Gelem/s", scale=1e9):
    print(f"{name:>46}: {elems / t / scale:9.2f} {unit}  ({t*1e3:.3f} ms/link)")


def main():
    rng = np.random.default_rng(2)

    # ------------------------------------------------------------------
    # 1. lane-perm at scale: (M/128, 128) data + idx, out = taa axis=1.
    #    Pallas grid kernel, blocks of (512, 128).
    # ------------------------------------------------------------------
    M = 1 << 23  # 8M elements
    R = M // 128
    BLK = 512
    data = jnp.asarray(rng.random((R, 128), np.float32))
    # a within-row permutation per row
    perm = np.argsort(rng.random((R, 128)), axis=1).astype(np.int32)
    permj = jnp.asarray(perm)

    def laneperm_kernel(d_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(d_ref[:], i_ref[:], axis=1)

    laneperm = pl.pallas_call(
        laneperm_kernel,
        grid=(R // BLK,),
        in_specs=[
            pl.BlockSpec((BLK, 128), lambda i: (i, 0)),
            pl.BlockSpec((BLK, 128), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((BLK, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
    )

    def step(v, idx_):
        return (laneperm(v, idx_) * np.float32(0.999)) % 1.0

    t = slope_seconds(step, data, lo=64, hi=576, extra=(permj,))
    report("pallas lane-perm 8M", M, t)
    report("  as GB/s (12B/elem)", M * 12, t, "GB/s")

    # ------------------------------------------------------------------
    # 2. plain XLA take_along_axis axis=-1 on the same shapes
    # ------------------------------------------------------------------
    def step_xla(v, idx_):
        return (jnp.take_along_axis(v, idx_, axis=1) * np.float32(0.999)) % 1.0

    t = slope_seconds(step_xla, data, lo=1, hi=4, extra=(permj,))
    report("XLA take_along_axis 8M", M, t)

    # ------------------------------------------------------------------
    # 3. 2-op tile gather: x (8,128) tiles; entries bucketed per tile.
    #    Per grid step: one x tile (dynamic-sliced) + (G,128) idx pairs.
    #    out[g,l] = xt[sub[g,l], lane[g,l]] via lane-gather(sublane-gather).
    #    sublane gather needs (8,128)==(8,128): do it per 8-row chunk.
    # ------------------------------------------------------------------
    n = 1 << 20
    xt = jnp.asarray(rng.random((n // 128, 128), np.float32))  # x as tiles*8 rows
    NT = n // 1024  # tiles of (8,128)
    EPT = 8  # one (8,128) idx tile per x tile -> 1024 entries/tile
    sub = rng.integers(0, 8, (NT * EPT, 128)).astype(np.int32)
    lane = rng.integers(0, 128, (NT * EPT, 128)).astype(np.int32)
    # pre-compose: sublane idx must be taken at the LANE-GATHERED position:
    # g1[s,l] = xt[sub2[s,l], l]; out[s,l] = g1[s, lane[s,l]]
    #         = xt[sub2[s, lane[s,l]], lane[s,l]]  -> sub2 = sub routed back
    sub2 = np.empty_like(sub)
    np.put_along_axis(sub2, lane, sub, axis=1)  # best effort (collisions ok for perf)
    subj = jnp.asarray(sub2)
    lanej = jnp.asarray(lane)

    def tile_gather_kernel(x_ref, s_ref, l_ref, o_ref):
        g1 = jnp.take_along_axis(x_ref[:], s_ref[:], axis=0)
        o_ref[:] = jnp.take_along_axis(g1, l_ref[:], axis=1)

    tile_gather = pl.pallas_call(
        tile_gather_kernel,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (i, 0)),
            pl.BlockSpec((8, 128), lambda i: (i, 0)),
            pl.BlockSpec((8, 128), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((NT * 8, 128), jnp.float32),
    )

    def step_tg(v, s_, l_):
        g = tile_gather(v, s_, l_)
        # fold output back into the x table (same total size) to couple
        return (v * np.float32(0.999) + g * np.float32(1e-4)) % 1.0

    t = slope_seconds(step_tg, xt, lo=64, hi=576, extra=(subj, lanej))
    report("pallas 2-op tile gather 1M", n, t)

    # ------------------------------------------------------------------
    # 4. big transpose via XLA
    # ------------------------------------------------------------------
    def step_tr(v):
        return (v.T.reshape(v.shape) * np.float32(0.999)) % 1.0

    t = slope_seconds(step_tr, data, lo=16, hi=144)
    report("XLA transpose 8M (2 passes)", M * 8, t, "GB/s")

    # ------------------------------------------------------------------
    # 5. corrected take rate vs table size (carry = the table)
    # ------------------------------------------------------------------
    for tab_elems in (1 << 13, 1 << 16, 1 << 20, 1 << 24):
        NIDX = max(tab_elems, 1 << 22)
        tab0 = jnp.asarray(rng.random(tab_elems, np.float32))
        idx = jnp.asarray(rng.integers(0, tab_elems, NIDX).astype(np.int32))

        def step_take(tabv, idx_):
            g = jnp.take(tabv, idx_, axis=0)
            return (tabv * np.float32(0.999)
                    + g[: tabv.shape[0]] * np.float32(1e-4)) % 1.0

        t = slope_seconds(step_take, tab0, lo=2, hi=10, extra=(idx,))
        report(f"XLA take, table {tab_elems>>10}K elems", NIDX, t,
               "Melem/s", 1e6)

    # ------------------------------------------------------------------
    # 6. segment_sum sorted vs unsorted ids (carry-coupled via scalar)
    # ------------------------------------------------------------------
    NSEG = 1 << 20
    NV = 1 << 23
    vals = jnp.asarray(rng.random(NV, np.float32))
    ids_un = jnp.asarray(rng.integers(0, NSEG, NV).astype(np.int32))
    ids_so = jnp.asarray(np.sort(np.asarray(ids_un)))

    def mk(ids_, sorted_):
        def step_ss(y, vals_, ids__):
            p = vals_ * (y[0] * np.float32(1e-20) + np.float32(1.0))
            s = jax.ops.segment_sum(p, ids__, num_segments=NSEG,
                                    indices_are_sorted=sorted_)
            return (y * np.float32(0.999) + s * np.float32(1e-4)) % 1.0
        return step_ss

    y0 = jnp.asarray(rng.random(NSEG, np.float32))
    t = slope_seconds(mk(ids_un, False), y0, lo=2, hi=10, extra=(vals, ids_un))
    report("segment_sum UNSORTED 8M", NV, t, "Melem/s", 1e6)
    t = slope_seconds(mk(ids_so, True), y0, lo=2, hi=10, extra=(vals, ids_so))
    report("segment_sum SORTED 8M", NV, t, "Melem/s", 1e6)


if __name__ == "__main__":
    main()
