"""SELL-R: shuffle-routed ELL — the TPU-first general irregular SpMV.

Re-implements the role of the reference's flagship native kernel, hybrid
ELL for irregular matrices (vexcl/spmat/hybrid_ell.inl:1-403, width
heuristic vexcl/sparse/ell.hpp:92-121), as a TPU-native design: TPUs have
no hardware gather (XLA's take: ~0.14 Gelem/s at any table size,
exp/shuffle_probe.py), so instead of gathering x per entry the matvec is
a fixed sequence of DENSE shuffle passes:

  1. BALANCE  (when it shrinks the route grid) x elements are
              bin-packed into (tile, lane) source buckets by reference
              count — capacity-aware stratified pairing, overloaded
              elements duplicated — and a cheap pre-route rearranges x
              into that layout per matvec (_balance_layout).
  2. EXPAND   A Pallas kernel fetches each bucket's values from its
              (8,128) x tile with the two native Mosaic shuffle ops
              (sublane gather + lane gather), the tile selected per
              chunk via scalar prefetch.
  3. ROUTE    A static Clos/Benes shuffle network (shuffle_plan.py) —
              fused lane/sublane-perm passes at ~110 Gelem/s + blocked
              transposes — permutes the expanded values from bucket
              order into the width-class destination layout.  The plan
              is edge-colored once at construction (Konig via Euler
              splits, C++ fast path).
  4. REDUCE   Rows sort by length into width classes (SELL-sigma
              style); per class k a dense byte-bound row sum
              (routed_k * val_k).reshape(n_k, w_k).sum(axis=1); one
              small n-element route scatters the concatenated sums
              back to natural row order.

Random access thus becomes dense data movement — the shape the hardware
wants.  Measured end to end on a v5e chip at the 16.8M-nnz bench
matrix: 1.84 ms/matvec = 17.65 GFLOP/s (r5, fused transposing expand)
— ~150x the naive jnp.take ELL matvec (0.119 GFLOP/s, BENCH
spmv_random_* rows); roofline accounting in docs/tpu_kernel_notes.md.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import config
from ..utils.native import expand_rows, group_rank, perm_complete
from ..utils.util import to_device
import os

from .formats import CSR
from .shuffle_plan import (pick_R, pick_R_floor, plan_route,
                           plan_route_free_lanes)

__all__ = ["SELLR"]

CHUNK_ROWS = 32          # idx rows per gather grid step (big tiers)
CHUNK_ROWS_SMALL = 8     # small tiers: less per-bucket padding
TILE = 1024              # x elements per bucket = one (8, 128) tile

# Index planes are stored int8 (every route/gather index is a lane
# (<128), sublane (<8) or group-local (<32) value): 4x less HBM index
# traffic per pass (12 -> 9 bytes/element) and 4x smaller host->device
# plan uploads.  Kernels upcast in VMEM (_i32) where Mosaic wants i32
# gather indices.  VEXTPU_IDX8=0 keeps int32 planes.
def _idx8() -> bool:
    return os.environ.get("VEXTPU_IDX8", "1") != "0"


def _i32(a):
    return a.astype(jnp.int32) if a.dtype != jnp.int32 else a


# ---------------------------------------------------------------------------
# Pallas executors
# ---------------------------------------------------------------------------


def _as_idx(a):
    """Device index plane: int8 when VEXTPU_IDX8 (all values < 128)."""
    return jnp.asarray(a.astype(np.int8) if _idx8() else a)


def _pick_blk(rows: int) -> int:
    for b in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if rows % b == 0:
            return b
    return 1


@partial(jax.jit, static_argnames=("interpret",))
def _lane_perm(x, idx, interpret=False):
    """out[r, l] = x[r, idx[r, l]] — native Mosaic per-lane gather."""
    rows = x.shape[0]
    blk = _pick_blk(rows)

    def kernel(d_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(d_ref[:], _i32(i_ref[:]), axis=1)

    if blk < 8:
        # Mosaic blocks must divide (8, 128) unless they equal the whole
        # array; tiny/odd row counts (small tier-expand grids) go as one
        # full block
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=interpret,
        )(x, idx)
    return pl.pallas_call(
        kernel,
        grid=(rows // blk,),
        in_specs=[pl.BlockSpec((blk, 128), lambda i: (i, 0)),
                  pl.BlockSpec((blk, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((blk, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, idx)


@partial(jax.jit, static_argnames=("interpret",))
def _sub_perm(x, idx, interpret=False):
    """Per (8,128) tile: out[s, l] = x[idx[s, l], l] — Mosaic sublane
    gather (indices are tile-local).  Blocks carry many tiles with a
    static inner loop: one grid step per tile costs ~0.2 us of grid
    overhead, which dominated the pass 10x at 16K tiles
    (exp/route_fuse_probe r4)."""
    rows = x.shape[0]
    blk = _pick_blk(rows)

    def kernel(d_ref, i_ref, o_ref):
        for k in range(blk // 8):
            sl = slice(k * 8, (k + 1) * 8)
            o_ref[sl, :] = jnp.take_along_axis(d_ref[sl, :],
                                               _i32(i_ref[sl, :]), axis=0)

    if blk < 8:
        def kernel_small(d_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(d_ref[:], _i32(i_ref[:]), axis=0)

        return pl.pallas_call(
            kernel_small,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=interpret,
        )(x, idx)
    return pl.pallas_call(
        kernel,
        grid=(rows // blk,),
        in_specs=[pl.BlockSpec((blk, 128), lambda i: (i, 0)),
                  pl.BlockSpec((blk, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((blk, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, idx)


def _subk_body(d_ref, i_ref, base: int, K: int):
    """In-kernel K-row within-column perm of rows [base, base+K) of d_ref
    (idx group-local in [0, K)): K/8 sublane gathers + selects per output
    tile.  Returns the list of K/8 output (8, 128) tiles."""
    tiles = []
    for a in range(K // 8):
        idx = _i32(i_ref[base + a * 8: base + (a + 1) * 8, :])
        sub = idx & 7
        acc = None
        for j in range(K // 8):
            g1 = jnp.take_along_axis(
                d_ref[base + j * 8: base + (j + 1) * 8, :], sub, axis=0)
            acc = g1 if acc is None else jnp.where(idx // 8 == j, g1, acc)
        tiles.append(acc)
    return tiles


def _pick_gpb(ngrp: int, K: int) -> int:
    """Groups per grid step: keep blocks around 512 rows (grid overhead
    ~0.2 us/step; VMEM ~1.5 MB double-buffered at 512 rows x 3 operands)."""
    gpb = 1
    while gpb * 2 <= ngrp and ngrp % (gpb * 2) == 0 and K * gpb * 2 <= 512:
        gpb *= 2
    return gpb


@partial(jax.jit, static_argnames=("K", "interpret"))
def _subk_perm(x, idx, K, interpret=False):
    """Per (K,128) block: out[s,l] = x[base+idx[s,l], l] with idx in
    [0, K) — one byte-bound pass for the K in {16,24,32} recursion
    bottoms (t128 at K=16 padded 8x across three mid passes)."""
    rows = x.shape[0]
    gpb = _pick_gpb(rows // K, K)
    blk = K * gpb

    def kernel(d_ref, i_ref, o_ref):
        for g in range(gpb):
            for a, t in enumerate(_subk_body(d_ref, i_ref, g * K, K)):
                o_ref[g * K + a * 8: g * K + (a + 1) * 8, :] = t

    spec = pl.BlockSpec((blk, 128), lambda i: (i, 0))
    return pl.pallas_call(
        kernel,
        grid=(rows // blk,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, idx)


@partial(jax.jit, static_argnames=("K", "interpret"))
def _lslk_perm(x, ia, isub, ic, K, interpret=False):
    """Fused [lane][subk][lane] — the whole bottom level of a route whose
    groups span K rows, in one byte-bound pass."""
    rows = x.shape[0]
    gpb = _pick_gpb(rows // K, K)
    blk = K * gpb

    def kernel(x_ref, a_ref, s_ref, c_ref, o_ref):
        g1 = jnp.take_along_axis(x_ref[:], _i32(a_ref[:]), axis=1)
        for g in range(gpb):
            for a, t in enumerate(_subk_body_g(g1, s_ref, g * K, K)):
                sl = slice(g * K + a * 8, g * K + (a + 1) * 8)
                o_ref[sl, :] = jnp.take_along_axis(t, _i32(c_ref[sl, :]),
                                                   axis=1)

    def _subk_body_g(g1, s_ref, base, K):
        tiles = []
        for a in range(K // 8):
            idx = _i32(s_ref[base + a * 8: base + (a + 1) * 8, :])
            sub = idx & 7
            acc = None
            for j in range(K // 8):
                gg = jnp.take_along_axis(
                    g1[base + j * 8: base + (j + 1) * 8, :], sub, axis=0)
                acc = gg if acc is None else jnp.where(idx // 8 == j, gg, acc)
            tiles.append(acc)
        return tiles

    spec = pl.BlockSpec((blk, 128), lambda i: (i, 0))
    return pl.pallas_call(
        kernel,
        grid=(rows // blk,),
        in_specs=[spec, spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, ia, isub, ic)


@partial(jax.jit, static_argnames=("nchunks", "chunk_rows", "interpret"))
def _expand_gather(xt, tile_of_chunk, sub_idx, lane_idx, nchunks,
                   chunk_rows=CHUNK_ROWS, interpret=False, vsrc=None):
    """Fetch entry values from x: chunk c reads x tile tile_of_chunk[c]
    (scalar-prefetched block index) and resolves CHUNK_ROWS x 128 entries
    with one sublane + one lane gather per (8,128) sub-chunk.  ``vsrc``
    (source-order value planes, premultiply path): the gathered x is
    multiplied elementwise before the store — the VPU multiply rides the
    gather-op-bound kernel, and vsrc zeros kill every slot that carries
    no entry."""
    mul = vsrc is not None

    def kernel(tile_ref, x_ref, s_ref, l_ref, *rest):
        if mul:
            v_ref, o_ref = rest
        else:
            (o_ref,) = rest
        for k in range(chunk_rows // 8):
            s = _i32(s_ref[k * 8:(k + 1) * 8, :])
            l = _i32(l_ref[k * 8:(k + 1) * 8, :])
            g1 = jnp.take_along_axis(x_ref[:], s, axis=0)
            g2 = jnp.take_along_axis(g1, l, axis=1)
            if mul:
                g2 = g2 * v_ref[k * 8:(k + 1) * 8, :]
            o_ref[k * 8:(k + 1) * 8, :] = g2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i, t: (t[i], 0)),
            pl.BlockSpec((chunk_rows, 128), lambda i, t: (i, 0)),
            pl.BlockSpec((chunk_rows, 128), lambda i, t: (i, 0)),
        ] + ([pl.BlockSpec((chunk_rows, 128), lambda i, t: (i, 0))]
             if mul else []),
        out_specs=pl.BlockSpec((chunk_rows, 128), lambda i, t: (i, 0)),
    )
    args = (tile_of_chunk, xt, sub_idx, lane_idx)
    if mul:
        args = args + (vsrc,)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nchunks * chunk_rows, 128), xt.dtype),
        interpret=interpret,
    )(*args)


# grid-overhead fix (r5): one grid step per chunk costs ~0.2 us x 4096
# steps = 0.8 ms at the 16.8M bench — 4x the kernel's 0.19 ms byte
# bound.  When the whole padded x grid fits VMEM it is loaded ONCE as a
# constant block (index map pinned to (0, 0): Pallas re-fetches only on
# block-index change) and each grid step resolves F chunks, picking each
# chunk's x tile with a dynamic sublane slice.
_EXPAND_VMEM_X = 8 << 20      # full-x path when x bytes <= 8 MB
_EXPAND_VMEM_BLK = 4 << 20    # per-step chunk blocks (3 operands, dbuf)


def _expand_F(nchunks: int, chunk_rows: int, x_rows: int,
              itemsize: int = 4) -> int:
    """Chunks per grid step for the VMEM-resident expand; 0 = use the
    per-chunk scalar-prefetch kernel (x too large for VMEM)."""
    if x_rows * 128 * itemsize > _EXPAND_VMEM_X:
        return 0
    f = 1
    while (f < 32 and f * 2 <= nchunks
           and 3 * (f * 2) * chunk_rows * 128 * itemsize
           <= _EXPAND_VMEM_BLK):
        f *= 2
    return f


@partial(jax.jit, static_argnames=("nchunks", "chunk_rows", "F",
                                   "interpret"))
def _expand_gather_vmem(xt, tile_of_chunk, sub_idx, lane_idx, nchunks,
                        chunk_rows=CHUNK_ROWS, F=8, interpret=False,
                        vsrc=None):
    """VMEM-resident expand: x loaded once, F chunks per grid step.
    ``tile_of_chunk`` must be padded to ceil(nchunks/F)*F entries (the
    ragged last block's extra rows gather garbage that Mosaic's
    out-of-bounds store masking drops).  ``vsrc``: premultiply by the
    source-order value planes (see _expand_gather)."""
    x_rows = xt.shape[0]
    grid = -(-nchunks // F)
    mul = vsrc is not None

    def kernel(tile_ref, x_ref, s_ref, l_ref, *rest):
        if mul:
            v_ref, o_ref = rest
        else:
            (o_ref,) = rest
        step = pl.program_id(0)

        # fori_loop keeps the Mosaic program size CONSTANT in F: the
        # fully unrolled F=32 body took a ~240 s deferred Mosaic compile
        # at first execution (measured r5).  Slices are whole chunks
        # (chunk_rows-aligned, one packed int8 tile at chunk_rows=32).
        def body(c, carry):
            t = tile_ref[step * F + c]
            xtile = x_ref[pl.ds(t * 8, 8), :]
            r0 = c * chunk_rows
            s = _i32(s_ref[pl.ds(r0, chunk_rows), :])
            ll = _i32(l_ref[pl.ds(r0, chunk_rows), :])
            tiles = []
            for k in range(chunk_rows // 8):
                g1 = jnp.take_along_axis(xtile, s[k * 8:(k + 1) * 8, :],
                                         axis=0)
                tiles.append(jnp.take_along_axis(
                    g1, ll[k * 8:(k + 1) * 8, :], axis=1))
            g = (tiles[0] if len(tiles) == 1
                 else jnp.concatenate(tiles, axis=0))
            if mul:
                g = g * v_ref[pl.ds(r0, chunk_rows), :]
            o_ref[pl.ds(r0, chunk_rows), :] = g
            return carry

        jax.lax.fori_loop(0, F, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((x_rows, 128), lambda i, t: (0, 0)),
            pl.BlockSpec((F * chunk_rows, 128), lambda i, t: (i, 0)),
            pl.BlockSpec((F * chunk_rows, 128), lambda i, t: (i, 0)),
        ] + ([pl.BlockSpec((F * chunk_rows, 128), lambda i, t: (i, 0))]
             if mul else []),
        out_specs=pl.BlockSpec((F * chunk_rows, 128), lambda i, t: (i, 0)),
    )
    args = (tile_of_chunk, xt, sub_idx, lane_idx)
    if mul:
        args = args + (vsrc,)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nchunks * chunk_rows, 128),
                                       xt.dtype),
        interpret=interpret,
    )(*args)


@partial(jax.jit, static_argnames=("nchunks", "chunk_rows", "nb", "F2",
                                   "interpret"))
def _expand_gather_vmem_T(xt, tile_of_chunk, sub_idx, lane_idx, nchunks,
                          chunk_rows, nb, F2, interpret=False, vsrc=None):
    """VMEM-resident expand that writes its output DIRECTLY in the route's
    top-level transpose layout, retiring the route's first full-grid 't'
    pass (~0.45 ms of HBM traffic at 16.8M): out.reshape(128, nb, 128)
    [l, b, j] = g[b*128 + j, l], with g rows beyond the real chunk count
    zeroed (the route grid's zero padding).  The per-tile transposes ride
    the MXU (identity-dot, _tile_T), which idles during the VPU-bound
    gather — measured overlap makes them ~free.  ``tile_of_chunk`` must
    cover nb*128/chunk_rows entries (pad ids are masked by c < nchunks).
    """
    x_rows = xt.shape[0]
    cpb = 128 // chunk_rows          # chunks per 128-row b-tile
    mul = vsrc is not None

    def kernel(tile_ref, x_ref, s_ref, l_ref, *rest):
        if mul:
            v_ref, o_ref = rest
        else:
            (o_ref,) = rest
        step = pl.program_id(0)

        # Fully static body: the alternatives all lost (measured r5 at
        # 16.8M) — fori over the F2 b-tiles compiles in seconds but its
        # dynamic middle-dim o_ref store relayouts every iteration
        # (2.15 vs 1.89 ms/matvec); a VMEM scratch round-trip serializes
        # the gathers against the MXU transpose (2.45 ms); and Mosaic
        # has no dynamic_update_slice lowering for a value carry.  The
        # price is a one-time ~430 s Mosaic compile of the ~128 unrolled
        # gather groups, paid once per process (kernel-level cache) and
        # amortized by the XLA persistent compilation cache across
        # processes on one machine.
        for f in range(F2):
            tiles = []
            for c4 in range(cpb):
                c = (step * F2 + f) * cpb + c4
                t = tile_ref[c]
                xtile = x_ref[pl.ds(t * 8, 8), :]
                r0 = f * 128 + c4 * chunk_rows
                s = _i32(s_ref[r0:r0 + chunk_rows, :])
                ll = _i32(l_ref[r0:r0 + chunk_rows, :])
                for k in range(chunk_rows // 8):
                    g1 = jnp.take_along_axis(
                        xtile, s[k * 8:(k + 1) * 8, :], axis=0)
                    tiles.append(jnp.take_along_axis(
                        g1, ll[k * 8:(k + 1) * 8, :], axis=1))
            gtile = jnp.concatenate(tiles, axis=0)      # (128, 128)
            if mul:
                gtile = gtile * v_ref[f * 128:(f + 1) * 128, :]
            # zero route-grid padding: chunks past the real count carry
            # pad-id tiles whose gathers are garbage
            nvalid = jnp.minimum(
                jnp.maximum(nchunks - (step * F2 + f) * cpb, 0), cpb)
            row = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            gtile = jnp.where(row < nvalid * chunk_rows, gtile, 0)
            o_ref[:, f, :] = _tile_T(gtile)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb // F2,),
        in_specs=[
            pl.BlockSpec((x_rows, 128), lambda i, t: (0, 0)),
            pl.BlockSpec((F2 * 128, 128), lambda i, t: (i, 0)),
            pl.BlockSpec((F2 * 128, 128), lambda i, t: (i, 0)),
        ] + ([pl.BlockSpec((F2 * 128, 128), lambda i, t: (i, 0))]
             if mul else []),
        out_specs=pl.BlockSpec((128, F2, 128), lambda i, t: (0, i, 0)),
    )
    args = (tile_of_chunk, xt, sub_idx, lane_idx)
    if mul:
        args = args + (vsrc,)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((128, nb, 128), xt.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(128 * nb, 128)


def _expand_T_params(stage_kinds, chunk_rows, x_rows, itemsize=4):
    """(nb, F2) when the fused transposing expand applies — the first
    route stage is the whole-grid ('t', 1, R) transpose, x fits VMEM,
    and the shapes tile cleanly — else None."""
    if (not stage_kinds or stage_kinds[0][0] != "t"
            or stage_kinds[0][1] != 1):
        return None
    R = stage_kinds[0][2]
    if R % 128 or chunk_rows > 128 or 128 % chunk_rows:
        return None
    if x_rows * 128 * itemsize > _EXPAND_VMEM_X:
        return None
    nb = R // 128
    F2 = 1
    while F2 < 8 and nb % (F2 * 2) == 0:
        F2 *= 2
    return nb, F2


def _run_expand(xt, tile_of_chunk, sub_idx, lane_idx, nchunks,
                chunk_rows, interpret, vsrc=None):
    """Dispatch the expand gather: VMEM-resident (F chunks/step) when the
    padded x grid fits the VMEM budget, else per-chunk scalar prefetch."""
    F = _expand_F(nchunks, chunk_rows, xt.shape[0], xt.dtype.itemsize)
    if F:
        return _expand_gather_vmem(xt, tile_of_chunk, sub_idx, lane_idx,
                                   nchunks, chunk_rows=chunk_rows, F=F,
                                   interpret=interpret, vsrc=vsrc)
    return _expand_gather(xt, tile_of_chunk, sub_idx, lane_idx, nchunks,
                          chunk_rows=chunk_rows, interpret=interpret,
                          vsrc=vsrc)


def _tile_T(t):
    """In-kernel (128,128) tile transpose as an MXU identity-matmul
    contraction over dim 0: result[i,j] = sum_k t[k,i]*I[k,j] = t[j,i].
    Measured BIT-EXACT for f32 at HIGHEST precision (the 3-pass bf16
    split reconstructs the mantissa; x*1 and x*0 products are exact) and
    compiles in ~1 s.  The naive in-kernel `.T` is NOT usable: Mosaic's
    transpose lowering hangs (>300 s) compiling even a (256,128) grid of
    (128,128) tile transposes on this toolchain (exp/route_fuse_probe
    r4 log) — opt back in with VEXTPU_ROUTE_T=native to re-test."""
    if os.environ.get("VEXTPU_ROUTE_T") == "native":
        return t.T
    eye = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
           ).astype(t.dtype)
    return jax.lax.dot_general(
        t, eye, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=t.dtype)


def _pick_F(nb: int) -> int:
    """Tile-row factor per grid step for the transpose-carrying kernels:
    the largest power-of-two divisor of nb, capped at 16 — (128,128)
    output blocks write 512-byte HBM bursts at huge strides (measured
    0.98 ms/pass); F=8..32 blocks write 4-16 KB bursts (0.58 ms) while
    staying well under the VMEM crash budget (F=16: ~7 MB with gather
    operands, double-buffered)."""
    f = 1
    while f < 16 and nb % (f * 2) == 0:
        f *= 2
    return f


@partial(jax.jit, static_argnames=("G", "R", "interpret"))
def _t_pallas(x, G, R, interpret=False):
    """Per-group blocked transpose (G*R,128)->(G*128*(R//128),128) as a
    single Pallas pass of MXU tile transposes, F tiles per grid step.
    NOTE: for a BARE transpose XLA's own lowering measured slightly
    faster (0.486 vs 0.519 ms at 16.8M, exp/route_fuse_probe), so the
    executor uses XLA for unfused t/tinv; this kernel is the building
    block the fused lane_t/tinv_lane variants beat XLA with."""
    nb = R // 128
    F = _pick_F(nb)

    def kernel(x_ref, o_ref):
        for k in range(F):
            o_ref[:, k * 128:(k + 1) * 128] = _tile_T(
                x_ref[k * 128:(k + 1) * 128, :])

    out = pl.pallas_call(
        kernel,
        grid=(G, nb // F),
        in_specs=[pl.BlockSpec((F * 128, 128),
                               lambda g, i, nbF=nb // F: (g * nbF + i, 0))],
        out_specs=pl.BlockSpec((128, F * 128), lambda g, i: (g, i)),
        out_shape=jax.ShapeDtypeStruct((G * 128, R), x.dtype),
        interpret=interpret,
    )(x)
    return out.reshape(G * 128 * nb, 128)


@partial(jax.jit, static_argnames=("G", "R", "interpret"))
def _tinv_pallas(x, G, R, interpret=False):
    nb = R // 128
    F = _pick_F(nb)

    def kernel(x_ref, o_ref):
        for k in range(F):
            o_ref[k * 128:(k + 1) * 128, :] = _tile_T(
                x_ref[:, k * 128:(k + 1) * 128])

    return pl.pallas_call(
        kernel,
        grid=(G, nb // F),
        in_specs=[pl.BlockSpec((128, F * 128), lambda g, i: (g, i))],
        out_specs=pl.BlockSpec((F * 128, 128),
                               lambda g, i, nbF=nb // F: (g * nbF + i, 0)),
        out_shape=jax.ShapeDtypeStruct((G * R, 128), x.dtype),
        interpret=interpret,
    )(x.reshape(G * 128, R))


@partial(jax.jit, static_argnames=("G", "R", "interpret"))
def _lane_t(x, idx, G, R, interpret=False):
    """Fused [lane perm] + [per-group transpose]: one HBM pass instead of
    two (fused 0.58 ms vs 0.294 + 0.486 unfused at 16.8M elements)."""
    nb = R // 128
    F = _pick_F(nb)

    def kernel(x_ref, i_ref, o_ref):
        g1 = jnp.take_along_axis(x_ref[:], _i32(i_ref[:]), axis=1)
        for k in range(F):
            o_ref[:, k * 128:(k + 1) * 128] = _tile_T(
                g1[k * 128:(k + 1) * 128, :])

    spec_in = pl.BlockSpec((F * 128, 128),
                           lambda g, i, nbF=nb // F: (g * nbF + i, 0))
    out = pl.pallas_call(
        kernel,
        grid=(G, nb // F),
        in_specs=[spec_in, spec_in],
        out_specs=pl.BlockSpec((128, F * 128), lambda g, i: (g, i)),
        out_shape=jax.ShapeDtypeStruct((G * 128, R), x.dtype),
        interpret=interpret,
    )(x, idx)
    return out.reshape(G * 128 * nb, 128)


@partial(jax.jit, static_argnames=("G", "R", "interpret"))
def _tinv_lane(x, idx, G, R, interpret=False):
    """Fused [per-group inverse transpose] + [lane perm]."""
    nb = R // 128
    F = _pick_F(nb)

    def kernel(x_ref, i_ref, o_ref):
        for k in range(F):
            t = _tile_T(x_ref[:, k * 128:(k + 1) * 128])
            o_ref[k * 128:(k + 1) * 128, :] = jnp.take_along_axis(
                t, _i32(i_ref[k * 128:(k + 1) * 128, :]), axis=1)

    return pl.pallas_call(
        kernel,
        grid=(G, nb // F),
        in_specs=[pl.BlockSpec((128, F * 128), lambda g, i: (g, i)),
                  pl.BlockSpec((F * 128, 128),
                               lambda g, i, nbF=nb // F: (g * nbF + i, 0))],
        out_specs=pl.BlockSpec((F * 128, 128),
                               lambda g, i, nbF=nb // F: (g * nbF + i, 0)),
        out_shape=jax.ShapeDtypeStruct((G * R, 128), x.dtype),
        interpret=interpret,
    )(x.reshape(G * 128, R), idx)


@partial(jax.jit, static_argnames=("interpret",))
def _lsl_perm(x, ia, isub, ic, interpret=False):
    """Fused [lane][sub][lane] — the whole bottom level of the Benes
    recursion in one pass (all three ops act within one (8,128) tile;
    the sub gather is evaluated per-tile in a static inner loop)."""
    rows = x.shape[0]
    blk = _pick_blk(rows)

    def kernel(x_ref, a_ref, s_ref, c_ref, o_ref):
        g1 = jnp.take_along_axis(x_ref[:], _i32(a_ref[:]), axis=1)
        for k in range(blk // 8):
            sl = slice(k * 8, (k + 1) * 8)
            g2 = jnp.take_along_axis(g1[sl, :], _i32(s_ref[sl, :]), axis=0)
            o_ref[sl, :] = jnp.take_along_axis(g2, _i32(c_ref[sl, :]),
                                               axis=1)

    if blk < 8:
        def kernel_small(x_ref, a_ref, s_ref, c_ref, o_ref):
            g1 = jnp.take_along_axis(x_ref[:], _i32(a_ref[:]), axis=1)
            g2 = jnp.take_along_axis(g1, _i32(s_ref[:]), axis=0)
            o_ref[:] = jnp.take_along_axis(g2, _i32(c_ref[:]), axis=1)

        return pl.pallas_call(
            kernel_small,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=interpret,
        )(x, ia, isub, ic)
    spec = pl.BlockSpec((blk, 128), lambda i: (i, 0))
    return pl.pallas_call(
        kernel,
        grid=(rows // blk,),
        in_specs=[spec, spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, ia, isub, ic)


# number of device idx arrays each op kind carries (op layout:
# (kind, *arrays, *statics))
_KIND_ARRAYS = {"lane": 1, "sub": 1, "subk": 1, "lsl": 3, "lslk": 3,
                "lane_t": 1, "tinv_lane": 1}


def fuse_stages(ops: List[Tuple]) -> List[Tuple]:
    """Peephole-fuse a planned stage list: [lane,sub,lane] -> lsl (and
    [lane,subk,lane] -> lslk), [lane,t] -> lane_t, [tinv,lane] ->
    tinv_lane.  Cuts the 11-pass plan of a two-level route to 5 passes
    (each at lane-perm speed)."""
    out: List[Tuple] = []
    i = 0
    while i < len(ops):
        k = ops[i][0]
        if (k == "lane" and i + 2 < len(ops) and ops[i + 1][0] == "sub"
                and ops[i + 2][0] == "lane"):
            out.append(("lsl", ops[i][1], ops[i + 1][1], ops[i + 2][1]))
            i += 3
        elif (k == "lane" and i + 2 < len(ops) and ops[i + 1][0] == "subk"
                and ops[i + 2][0] == "lane"):
            out.append(("lslk", ops[i][1], ops[i + 1][1], ops[i + 2][1],
                        ops[i + 1][2]))
            i += 3
        elif k == "lane" and i + 1 < len(ops) and ops[i + 1][0] == "t":
            out.append(("lane_t", ops[i][1], ops[i + 1][1], ops[i + 1][2]))
            i += 2
        elif k == "tinv" and i + 1 < len(ops) and ops[i + 1][0] == "lane":
            out.append(("tinv_lane", ops[i + 1][1], ops[i][1], ops[i][2]))
            i += 2
        else:
            out.append(ops[i])
            i += 1
    return out


def split_stage_ops(ops: List[Tuple]) -> Tuple[List[Tuple], List]:
    """Separate the static stage structure (kind + shape params — part of
    the kernel-cache key) from the device idx arrays (jit leaves)."""
    kinds, arrays = [], []
    for op in ops:
        na = _KIND_ARRAYS.get(op[0], 0)
        arrays.extend(op[1:1 + na])
        kinds.append((op[0],) + tuple(op[1 + na:]))
    return kinds, arrays


def join_stage_ops(kinds: List[Tuple], arrays) -> List[Tuple]:
    arrays = list(arrays)
    out = []
    for k in kinds:
        na = _KIND_ARRAYS.get(k[0], 0)
        out.append((k[0],) + tuple(arrays[:na]) + tuple(k[1:]))
        del arrays[:na]
    return out


def _apply_route(x, stages, interpret):
    """Execute the planned shuffle stages (device arrays prepared at
    construction; perms and blocked transposes are fused Pallas passes,
    the padded t128 bottom stays XLA)."""
    for op in stages:
        kind = op[0]
        if kind == "lane":
            x = _lane_perm(x, op[1], interpret=interpret)
        elif kind == "sub":
            x = _sub_perm(x, op[1], interpret=interpret)
        elif kind == "subk":
            x = _subk_perm(x, op[1], op[2], interpret=interpret)
        elif kind == "lsl":
            x = _lsl_perm(x, op[1], op[2], op[3], interpret=interpret)
        elif kind == "lslk":
            x = _lslk_perm(x, op[1], op[2], op[3], op[4],
                           interpret=interpret)
        elif kind == "lane_t":
            x = _lane_t(x, op[1], op[2], op[3], interpret=interpret)
        elif kind == "tinv_lane":
            x = _tinv_lane(x, op[1], op[2], op[3], interpret=interpret)
        elif kind == "t":
            # bare transposes stay XLA: measured 0.486 vs 0.519 ms/pass
            # for the Pallas tiling at 16.8M (exp/route_fuse_probe)
            G, R = op[1], op[2]
            x = (x.reshape(G, R, 128).transpose(0, 2, 1)
                 .reshape(G * 128 * (R // 128), 128))
        elif kind == "tinv":
            G, R = op[1], op[2]
            x = (x.reshape(G, 128, R // 128, 128).reshape(G, 128, R)
                 .transpose(0, 2, 1).reshape(G * R, 128))
        elif kind == "t128":
            G, R = op[1], op[2]
            t = x.reshape(G, R, 128).transpose(0, 2, 1)
            x = jnp.pad(t, ((0, 0), (0, 0), (0, 128 - R))).reshape(
                G * 128, 128)
        elif kind == "t128inv":
            G, R = op[1], op[2]
            x = (x.reshape(G, 128, 128)[:, :, :R]
                 .transpose(0, 2, 1).reshape(G * R, 128))
        else:  # pragma: no cover
            raise ValueError(kind)
    return x


# ---------------------------------------------------------------------------
# Format
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# DMA class column-sum (r5).  The premultiplied reduce (sum_i h[i, :] per
# transposed class plane) is launch-overhead-bound as per-class XLA ops:
# ~10 us x 50 classes = 0.5 ms against a 0.10 ms one-stream byte bound,
# and neither halving the bytes nor the MXU moves it
# (exp/reduce_variants_probe.py).  This kernel replaces all of them with
# ONE pallas_call: the grid runs over output blocks; each block carries
# scalar-prefetched (base_tile, stride_tiles, w_k, read-size code) and a
# double-buffered DMA loop streams the w_k strided row-chunks of its
# class plane straight from HBM (contiguous (sz, 128) row bursts).
# Output rows beyond a class tail hold garbage — the y-route, whose
# source layout is exactly this block-padded scratch, drops them (its
# perm_complete maps them to trash positions >= n).  Measured 0.260 ms
# at the 16.8M bench grid (exp/reduce_dma_proto.py).
# ---------------------------------------------------------------------------

_REDUCE_SIZES = (8, 32, 128, 256)   # static DMA read heights (tiles)
_REDUCE_TB = _REDUCE_SIZES[-1]      # output block tiles
_REDUCE_NBUF = 2


@partial(jax.jit, static_argnames=("nblocks", "interpret"))
def _class_colsum_dma(h2, prm, nblocks, interpret=False, v2=None):
    """h2: (Mtiles, 128) grid; prm: (nblocks, 4) int32 rows
    [base_tile, stride_tiles, w_k, size_idx].  Output block b row j =
    sum_i h2[base + i*stride + j, :] for j < read size (garbage above).
    ``v2`` (dst-order value planes, >= class_end + TB rows): dual-stream
    variant — each chunk is multiplied by its value chunk before the
    accumulate (used when the h grid is NOT premultiplied, i.e. when the
    fused transposing expand carries x unscaled)."""
    TB = _REDUCE_TB
    mul = v2 is not None

    def kernel(prm_ref, *refs):
        if mul:
            h_ref, v_ref, o_ref, buf, vbuf, sem, vsem = refs
        else:
            h_ref, o_ref, buf, sem = refs
        b = pl.program_id(0)
        base = prm_ref[b, 0]
        stride = prm_ref[b, 1]
        wk = prm_ref[b, 2]
        sidx = prm_ref[b, 3]

        o_ref[:, :] = jnp.zeros((TB, 128), h_ref.dtype)

        def dmas(slot, i, sz):
            out = [pltpu.make_async_copy(
                h_ref.at[pl.ds(base + i * stride, sz), :],
                buf.at[slot, pl.ds(0, sz), :],
                sem.at[slot])]
            if mul:
                out.append(pltpu.make_async_copy(
                    v_ref.at[pl.ds(base + i * stride, sz), :],
                    vbuf.at[slot, pl.ds(0, sz), :],
                    vsem.at[slot]))
            return out

        def start(slot, i):
            for k, sz in enumerate(_REDUCE_SIZES):
                @pl.when(sidx == k)
                def _(sz=sz, slot=slot, i=i):
                    for d in dmas(slot, i, sz):
                        d.start()

        def wait(slot, i):
            for k, sz in enumerate(_REDUCE_SIZES):
                @pl.when(sidx == k)
                def _(sz=sz, slot=slot, i=i):
                    for d in dmas(slot, i, sz):
                        d.wait()

        start(0, 0)

        def body(i, carry):
            slot = jax.lax.rem(i, jnp.int32(_REDUCE_NBUF))

            @pl.when(i + 1 < wk)
            def _():
                start(jax.lax.rem(i + 1, jnp.int32(_REDUCE_NBUF)), i + 1)

            wait(slot, i)
            for k, sz in enumerate(_REDUCE_SIZES):
                @pl.when(sidx == k)
                def _(sz=sz, slot=slot):
                    c = buf[slot, pl.ds(0, sz), :]
                    if mul:
                        c = c * vbuf[slot, pl.ds(0, sz), :]
                    o_ref[pl.ds(0, sz), :] = o_ref[pl.ds(0, sz), :] + c
            return carry

        jax.lax.fori_loop(0, wk, body, 0)

    any_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[any_spec] * (2 if mul else 1),
        out_specs=pl.BlockSpec((TB, 128), lambda i, p: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((_REDUCE_NBUF, _REDUCE_TB, 128), h2.dtype),
        ] + ([pltpu.VMEM((_REDUCE_NBUF, _REDUCE_TB, 128), h2.dtype)]
             if mul else []) + [
            pltpu.SemaphoreType.DMA((_REDUCE_NBUF,)),
        ] + ([pltpu.SemaphoreType.DMA((_REDUCE_NBUF,))] if mul else []),
    )
    args = (prm, h2) + ((v2,) if mul else ())
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblocks * TB, 128), h2.dtype),
        interpret=interpret,
    )(*args)


def _plan_reduce_blocks(classes):
    """Per-block DMA params for _class_colsum_dma.  classes:
    [(off, nk, nkp, wk)], every off and nkp a 128-multiple.  Returns
    (prm (nblocks, 4) int32, spans [(block0, ntiles)] per class)."""
    prm = []
    spans = []
    for off, nk, nkp, wk in classes:
        tiles = nkp // 128
        b0 = len(prm)
        jt = 0
        while jt < tiles:
            rd = _REDUCE_TB
            if tiles - jt < _REDUCE_TB:
                rd = next(sz for sz in _REDUCE_SIZES if sz >= tiles - jt)
            prm.append((off // 128 + jt, tiles, wk,
                        _REDUCE_SIZES.index(rd)))
            jt += rd
        spans.append((b0, tiles))
    return np.asarray(prm, np.int32), spans


class SELLR:
    """Shuffle-routed sparse matrix with width-class row planes
    (SELL-sigma adapted to routing) and dense hot-column extraction.

    * Rows are SORTED BY LENGTH at construction and partitioned into
      WIDTH CLASSES: class k is a dense (n_k, w_k) plane inside the one
      route destination space, sized to its rows' actual entry counts
      (exact widths up to 32, geometric ratio 1.1 above), so EVERY entry
      of every row rides the single expand -> route -> reduce pipeline.
      Per-class row sums concatenate into a sorted-order y that one
      small shuffle route (n elements) scatters back to natural row
      order.  (The earlier recursive-tier design stacked four full
      pipelines plus a 307K-entry CSR tail on the 16.8M-nnz bench
      matrix; classes replace all of it with static layout.)
    * Hot COLUMNS (count > VEXTPU_SELLR_HOT_COL, default 2048) become a
      dense (n, k) plane: y += W @ x[hot_cols] — a k-column dense matvec
      instead of k*count shuffle slots (a dense column IS dense data).
    * A per-(tile, lane) cap backstops pathological lane skew by spilling
      the excess to a small CSR tail; when the natural source grid lands
      just above a pick_R breakpoint, the deepest buckets are trimmed
      into the tail instead of letting the route grid jump a level
      (src_rows=131104 vs the 131072 breakpoint cost 2x route traffic
      on the bench matrix before the trim).
    """

    format = "sellr"

    def __init__(self, n: int, m: int, ptr, col, val,
                 width: Optional[int] = None,
                 uniform: Optional[dict] = None, premeter: bool = False):
        # ``uniform``: force the structural parameters (chunk_rows, cap,
        # and — in the build phase — src_rows, R, tail_nnz) so that
        # same-shaped row shards produce IDENTICAL leaf pytrees: the
        # distributed SpMV stacks per-shard leaves under one shard_map
        # (SPMD needs one program).  Implies: no hot plane, no recursive
        # tier (overflow goes to a zero-padded CSR tail).  ``premeter``:
        # stop after measuring the natural sizes (premeter_src_rows,
        # premeter_tail_nnz) used to compute the forced maxima.
        # VEXTPU_SELLR_TIMING=1 prints per-phase construction seconds
        # (the planner is host-bound; see docs/tpu_kernel_notes.md)
        import time as _time
        _tt = [_time.perf_counter()]
        if os.environ.get("VEXTPU_SELLR_TIMING", "") == "1":
            def _tick(label):
                now = _time.perf_counter()
                print(f"[sellr] {label:18s} {now - _tt[0]:7.2f} s",
                      flush=True)
                _tt[0] = now
        else:
            def _tick(label):
                pass

        ptr = np.asarray(ptr, dtype=np.int64)
        col = np.asarray(col)
        val = np.asarray(val)
        self.n = int(n)
        self.m = int(m)
        self.nnz = int(ptr[-1])
        if self.nnz >= 2**31 or max(self.n, self.m) >= 2**31:
            raise ValueError("SELLR host planner is int32-indexed "
                             "(nnz and dims must be < 2^31)")
        col = col.astype(np.int32, copy=False)
        row_len = np.diff(ptr)

        # single-width mode (explicit width / uniform distributed shards):
        # one (n, w) class in natural row order, length overflow to the
        # CSR tail.  Multi-class mode (the default): width=0 sentinel,
        # classes computed after hot/spill extraction below.
        single = width is not None or uniform is not None
        if single and width is None:
            raise ValueError("uniform SELLR requires an explicit width")
        w = max(1, min(int(width), 128)) if single else 0
        self.width = w

        # ---- split ELL part vs row overflow --------------------------------
        # all host index math is int32 + native counting passes: the r4
        # int64/argsort pipeline cost 85-98 s at 16M nnz (VERDICT r4 #3)
        rows_of, within = expand_rows(ptr)
        if single:
            in_ell = within < np.minimum(row_len, w).astype(
                np.int32)[rows_of]
            ecol = col[in_ell]
            eval_ = val[in_ell]
            erow = rows_of[in_ell]
        else:
            in_ell = None  # every entry rides the width-class planes
            ecol = col
            eval_ = val
            erow = rows_of

        _tick("split")
        # ---- hot columns -> dense rank-k plane ------------------------------
        hot_min = int(os.environ.get("VEXTPU_SELLR_HOT_COL", "2048"))
        if uniform is None:
            cnt_col = np.bincount(ecol, minlength=self.m)
            hot_cols = np.nonzero(cnt_col > hot_min)[0]
        else:
            hot_cols = ()   # per-shard hot planes would break uniformity
        self._hot_idx = None
        self._hot_W = None
        if len(hot_cols):
            hot_mask = np.zeros(self.m, dtype=bool)
            hot_mask[hot_cols] = True
            is_hot = hot_mask[ecol]
            Wp = np.zeros((self.n, len(hot_cols)), dtype=val.dtype)
            hr = erow[is_hot]
            hc = np.searchsorted(hot_cols, ecol[is_hot])
            np.add.at(Wp, (hr, hc), eval_[is_hot])
            self._hot_idx = jnp.asarray(hot_cols.astype(np.int32))
            self._hot_W = to_device(Wp)
            ecol, eval_, erow = ecol[~is_hot], eval_[~is_hot], erow[~is_hot]

        _tick("hot")
        # ---- destination size estimate (drives trim + balance choices) -----
        if single:
            dst_rows_est = max(1, (self.n * w + 127) // 128)
        elif len(ecol):
            elen_full = np.bincount(erow, minlength=self.n)
            cls0, tr0 = _choose_classes(np.sort(elen_full)[::-1])
            slots0 = sum(((-(-nk // 128) * 128) if tr0 else nk) * wk
                         for _, nk, wk in cls0)
            dst_rows_est = max(1, (slots0 + 127) // 128)
        else:
            dst_rows_est = 1

        _tick("estimate")
        # ---- source buckets (one 1024-element x tile each); the natural
        # layout places entries at lane = col % 128, so the two-op tile
        # gather composes without conflicts; per-(tile, lane) rank gives
        # the row.  The balanced layout (below) re-bins via a pre-route.
        m_pad = ((self.m + TILE - 1) // TILE) * TILE
        ntiles = m_pad // TILE
        tile_id = ecol // TILE
        sub_in_tile = (ecol % TILE) // 128
        lane_in_tile = ecol % 128

        # lane-skew backstop: cap the per-(tile, lane) depth, spill excess
        # to the overflow path (bounded slot inflation)
        if uniform is not None:
            chunk_rows = uniform["chunk_rows"]
            cap = uniform["cap"]
        else:
            chunk_rows = (CHUNK_ROWS if len(ecol) > (1 << 21)
                          else CHUNK_ROWS_SMALL)
            mean_depth = max(1.0, len(ecol) / max(1, ntiles * 128))
            cap = int(max(1024, 16 * mean_depth))
        self._chunk_rows = chunk_rows

        # ---- balanced source layout: adopt when it shrinks the route ------
        self._x_kinds = None
        self._x_arrays = ()
        self._x_R = 0
        self._dup_idx = None
        if uniform is None and not premeter and len(ecol):
            tl = tile_id * 128 + lane_in_tile
            depth_nat = np.minimum(
                np.bincount(tl, minlength=ntiles * 128), cap
            ).reshape(ntiles, 128).max(axis=1)
            src_nat = int(((depth_nat + chunk_rows - 1) // chunk_rows
                           ).sum()) * chunk_rows
            R_nat = pick_R(max(dst_rows_est, max(1, src_nat)) * 128)
            bal = _balance_layout(ecol, self.m, chunk_rows)
            if bal is not None:
                (tile_b, sub_b, lane_b, ntiles_b, cap_b, el2slot,
                 dup_src, m_eff, spill_est) = bal
                tl_b = tile_b * 128 + lane_b
                depth_b = np.minimum(
                    np.bincount(tl_b, minlength=ntiles_b * 128), cap_b
                ).reshape(ntiles_b, 128).max(axis=1)
                src_bal = int(((depth_b + chunk_rows - 1) // chunk_rows
                               ).sum()) * chunk_rows
                R_bal = pick_R(max(dst_rows_est, max(1, src_bal)) * 128)
                # ~6 pre-route passes over m elements vs ~5 route passes
                # over the grid difference; reject if the hard per-bin
                # capacity would push too many entries to the CSR tail
                if (R_bal < R_nat
                        and 5 * (R_nat - R_bal) * 128
                        > 6 * ntiles_b * TILE
                        and spill_est <= min(
                            max(4096, len(ecol) // 256),
                            max(256, len(ecol) // 8))):
                    tile_id, sub_in_tile, lane_in_tile = (
                        tile_b, sub_b, lane_b)
                    ntiles, cap = ntiles_b, cap_b
                    R_x = pick_R(ntiles_b * TILE)
                    dst_x = np.full(R_x * 128, -1, dtype=np.int32)
                    dst_x[:m_eff] = el2slot
                    perm_complete(dst_x)
                    xops = fuse_stages(plan_route(dst_x, R_x))
                    self._x_kinds, x_arr = split_stage_ops(xops)
                    self._x_arrays = tuple(_as_idx(a) for a in x_arr)
                    self._x_R = R_x
                    self._m_eff = m_eff
                    if len(dup_src):
                        self._dup_idx = jnp.asarray(
                            dup_src.astype(np.int32))

        _tick("balance+xroute")
        tl = tile_id * 128 + lane_in_tile
        rank = group_rank(tl, ntiles * 128)
        cnt_tl = np.bincount(tl, minlength=ntiles * 128)

        # per-tile row allowance (max capped lane depth, rounded to whole
        # chunks); the breakpoint trim may shave deep tiles further
        depth_tl = np.minimum(cnt_tl, cap).reshape(ntiles, 128)
        allow_t = depth_tl.max(axis=1)
        allow_t = ((allow_t + chunk_rows - 1) // chunk_rows) * chunk_rows
        if uniform is None and not premeter:
            # spill budget: a CSR-tail entry costs ~15 ns, a route-grid
            # level jump ~1 ms — but never degrade more than 1/8 of the
            # entries to the gather path
            budget = min(max(4096, len(ecol) // 256),
                         max(256, len(ecol) // 8))
            allow_t = _trim_allowances(allow_t, depth_tl, chunk_rows,
                                       dst_rows_est, budget=budget)

        spill = (rank >= cap) | (rank >= allow_t[tile_id])
        sp_col, sp_val, sp_row = ecol[spill], eval_[spill], erow[spill]
        if spill.any():
            ks = ~spill
            ecol, eval_, erow = ecol[ks], eval_[ks], erow[ks]
            tile_id, sub_in_tile = tile_id[ks], sub_in_tile[ks]
            lane_in_tile, rank = lane_in_tile[ks], rank[ks]

        _tick("spill")
        n_clip = 0 if in_ell is None else int(len(col) - in_ell.sum())
        if premeter:
            sr = int(max(1, allow_t.sum()))
            self.premeter_src_rows = (
                (sr + chunk_rows - 1) // chunk_rows) * chunk_rows
            self.premeter_tail_nnz = n_clip + len(sp_col)
            return

        # ---- overflow (clipped long rows + spills) -> CSR tail --------------
        # recompute slot-within-row for the surviving routed entries
        ek = group_rank(erow, self.n)

        self.tail = None
        if n_clip:
            over = ~in_ell
            ocol = np.concatenate([col[over], sp_col])
            oval = np.concatenate([val[over], sp_val])
            orow = np.concatenate([rows_of[over], sp_row])
        else:
            ocol, oval, orow = sp_col, sp_val, sp_row
        if uniform is not None:
            tnnz = uniform["tail_nnz"]
            assert len(ocol) <= tnnz
            if tnnz:
                order_o = np.argsort(orow, kind="stable")
                orow, ocol, oval = orow[order_o], ocol[order_o], oval[order_o]
                pad_t = tnnz - len(ocol)
                tlen_full = np.bincount(orow, minlength=self.n)
                # pad entries sit in the last row with zero values
                tlen_full[self.n - 1] += pad_t
                tptr = np.concatenate([[0], np.cumsum(tlen_full)])
                ocol = np.concatenate([ocol, np.zeros(pad_t, np.int64)])
                oval = np.concatenate([oval, np.zeros(pad_t, val.dtype)])
                self.tail = CSR(self.n, self.m, tptr,
                                ocol.astype(np.int32), oval)
        elif len(ocol):
            order_o = np.argsort(orow, kind="stable")
            orow, ocol, oval = orow[order_o], ocol[order_o], oval[order_o]
            tlen_full = np.bincount(orow, minlength=self.n)
            tptr = np.concatenate([[0], np.cumsum(tlen_full)])
            self.tail = CSR(self.n, self.m, tptr,
                            ocol.astype(np.int32), oval)

        _tick("tail")
        # ---- bucket rows & gather planes ------------------------------------
        bucket_rows = allow_t
        row_off = np.zeros(ntiles, dtype=np.int32)
        row_off[1:] = np.cumsum(bucket_rows)[:-1].astype(np.int32)
        src_rows = int(max(1, bucket_rows.sum()))
        src_rows = ((src_rows + chunk_rows - 1) // chunk_rows) * chunk_rows
        if uniform is not None:
            assert src_rows <= uniform["src_rows"]
            src_rows = uniform["src_rows"]
        self._nchunks = int(src_rows // chunk_rows)
        # padded to a multiple of 32 (the max chunks-per-step F of the
        # VMEM-resident expand) so the ragged last grid block can still
        # read F tile ids; extra chunks gather garbage that Mosaic's
        # out-of-bounds store masking drops.  (Extended again below once
        # R is known: the fused transposing expand covers the FULL route
        # grid, R/chunk_rows chunk slots.)
        tile_of_chunk = np.zeros(-(-self._nchunks // 32) * 32,
                                 dtype=np.int32)
        tile_of_chunk[: int((bucket_rows // chunk_rows).sum())] = np.repeat(
            np.arange(ntiles), bucket_rows // chunk_rows).astype(np.int32)

        src_flat = ((row_off[tile_id] + rank) * np.int32(128)
                    + lane_in_tile)

        sub_plane = np.zeros(src_rows * 128, dtype=np.int32)
        sub_plane[src_flat] = sub_in_tile.astype(np.int32)
        sub_plane = sub_plane.reshape(src_rows, 128)

        _tick("planes")
        # ---- width classes & destination slot layout -------------------------
        # Multi-class planes are stored TRANSPOSED: class k is a (w_k,
        # n_k_pad) plane with n_k padded to a multiple of 128 (row i's
        # slot j lives at off_k + j*nkp + i).  Every per-class slice is
        # then 128-aligned and every reshape is a clean tiled view —
        # the row-major (n_k, w_k) layout's ~59 odd-shaped slice+reduce
        # ops cost ~260 s of XLA compile at 16.8M nnz (measured r5,
        # /tmp reduce A/B: 47 s -> 5 s for the reduce alone at bench
        # scale) for ~3.8% slot padding.  Classes: (off, nk, nkp, wk);
        # nkp == 0 marks the single-width row-major mode (off + i*w + j),
        # whose one uniform reduce op compiles fine and whose natural row
        # order the uniform/distributed shard layout depends on.
        if single:
            self._classes = ((0, self.n, 0, w),)
            self._row_order = None
            slots = self.n * w
            assert slots < 2**31
            dst_flat_e = erow * np.int32(w) + ek
        else:
            elen = np.bincount(erow, minlength=self.n)
            row_order = np.argsort(-elen, kind="stable").astype(np.int64)
            sl = elen[row_order]
            classes, transposed = _choose_classes(sl)
            base_sorted = np.empty(self.n, dtype=np.int32)
            stride_sorted = np.empty(self.n, dtype=np.int32)
            cls = []
            off = 0
            for start, nk, wk in classes:
                if transposed:
                    nkp = -(-nk // 128) * 128
                    base_sorted[start:start + nk] = off + np.arange(
                        nk, dtype=np.int32)
                    stride_sorted[start:start + nk] = nkp
                    cls.append((off, nk, nkp, wk))
                    off += nkp * wk
                else:
                    base_sorted[start:start + nk] = (
                        off + np.arange(nk, dtype=np.int32) * wk)
                    stride_sorted[start:start + nk] = 1
                    cls.append((off, nk, 0, wk))
                    off += nk * wk
            slots = off
            assert slots < 2**31
            self._classes = tuple(cls)
            pos_of_row = np.empty(self.n, dtype=np.int64)
            pos_of_row[row_order] = np.arange(self.n)
            row_base = base_sorted[pos_of_row]
            row_stride = stride_sorted[pos_of_row]
            dst_flat_e = row_base[erow] + ek * row_stride[erow]
            self._row_order = row_order

        _tick("classes")
        dst_rows = max(1, (slots + 127) // 128)
        R = (uniform["R"] if uniform is not None
             else pick_R(max(src_rows, dst_rows) * 128))
        assert R >= max(src_rows, dst_rows)
        M_route = R * 128

        dst = np.full(M_route, -1, dtype=np.int32)
        dst[src_flat] = dst_flat_e
        perm_complete(dst)
        # free-lanes plan: the expand gather can place each entry at ANY
        # lane of its source row, so the route's top A pass folds into
        # the lane gather the expand already does (one full HBM pass
        # saved); adjacent [lane,t]/[tinv,lane]/[lane,sub,lane] passes
        # then peephole-fuse into single Pallas kernels (11 -> 5 passes
        # for a two-level route)
        _tick("dstperm")
        lanes, stages = plan_route_free_lanes(dst, R)
        stages = fuse_stages(stages)
        _tick("route-plan")
        lanes2 = lanes.reshape(R, 128)[:src_rows]
        try:
            from ..utils.native import plan_scatter_a

            lane_plane = plan_scatter_a(src_rows, lanes2)
        except Exception:
            lane_plane = np.empty(src_rows * 128, dtype=np.int32)
            pos = (np.arange(src_rows, dtype=np.int32)[:, None]
                   * np.int32(128) + lanes2)
            lane_plane[pos.reshape(-1)] = np.ascontiguousarray(
                np.broadcast_to(np.arange(128, dtype=np.int32),
                                (src_rows, 128))).reshape(-1)
        lane_plane = lane_plane.reshape(src_rows, 128)

        _tick("lane-plane")
        # ---- device arrays ---------------------------------------------------
        self._xpad_tiles = ntiles
        self._src_rows = src_rows
        self._R = R
        if R % 128 == 0 and R // chunk_rows > len(tile_of_chunk):
            tile_of_chunk = np.concatenate(
                [tile_of_chunk,
                 np.zeros(R // chunk_rows - len(tile_of_chunk),
                          np.int32)])
        self._tile_of_chunk = jnp.asarray(tile_of_chunk)
        self._sub_idx = _as_idx(sub_plane)
        self._lane_idx = _as_idx(lane_plane)
        # stage structure is static; the (large) idx planes travel through
        # leaves() so they are jit ARGUMENTS, not embedded constants
        # (closed-over arrays blow the remote-compile payload — the
        # HTTP 413 hazard, bench.py:slope_seconds docstring)
        self._stage_kinds, st_arr = split_stage_ops(stages)
        self._stage_arrays = tuple(_as_idx(a) for a in st_arr)
        self._dst_rows = dst_rows
        # premultiply (r5): permutation commutes with elementwise
        # multiply, so the value planes can live in SOURCE order and the
        # expand gather multiplies them in (a VPU op riding the
        # op-bound gather) — the reduce then reads ONE array instead of
        # two, and vsrc zeros kill every slot without an entry (route
        # pads, spilled lanes, class padding) at the source.  Entry e
        # sits at expand-output slot (src row, Konig color lane).
        self._premul = (
            self._row_order is not None
            and np.issubdtype(val.dtype, np.floating)
            and os.environ.get("VEXTPU_SELLR_PREMUL", "1") == "1")
        if self._premul:
            vsrc = np.zeros(R * 128, dtype=val.dtype)
            vsrc[(src_flat >> 7).astype(np.int64) * 128
                 + lanes[src_flat]] = eval_
            self._val = to_device(vsrc.reshape(R, 128))
        else:
            vflat = np.zeros(dst_rows * 128, dtype=val.dtype)
            vflat[dst_flat_e] = eval_
            self._val = to_device(vflat.reshape(dst_rows, 128))
        # single-pallas-call reduce: engages when the premultiplied
        # column sums can read past each class tail into the route
        # grid's trash region (R slack >= the largest read height)
        self._rprm = None
        self._rspans = None
        if (self._premul and R >= dst_rows + _REDUCE_TB
                and os.environ.get("VEXTPU_SELLR_DMAR", "1") == "1"):
            rprm, self._rspans = _plan_reduce_blocks(self._classes)
            self._rprm = jnp.asarray(rprm)
            self._rnb = len(rprm)

        _tick("device")
        # scatter the per-class column sums (class-padded sorted order,
        # length Ny = sum nkp) back to natural row order: one small route
        # over Ny elements.  The same route drops the inter-class padding
        # (pad positions land in trash slots >= n), so the reduce never
        # slices odd [:nk] pieces.
        self._y_kinds = None
        self._y_arrays = ()
        self._y_R = 0
        self._y_src = self.n
        if self._rprm is not None:
            # DMA-reduce scratch layout: class c's sums sit flat at
            # block0_c*TB*128 (contiguous per class), with per-block
            # garbage beyond each class tail — the route maps the
            # garbage to trash positions >= n (perm_complete fills the
            # unused destinations) and the [:n] slice drops it.
            Nys = self._rnb * _REDUCE_TB * 128
            Ry = pick_R(Nys)
            dst_y = np.full(Ry * 128, -1, dtype=np.int32)
            start = 0
            for (b0, _), (_, nk, _, _) in zip(self._rspans,
                                              self._classes):
                yb = b0 * _REDUCE_TB * 128
                dst_y[yb:yb + nk] = self._row_order[
                    start:start + nk].astype(np.int32)
                start += nk
            perm_complete(dst_y)
            yops = fuse_stages(plan_route(dst_y, Ry))
            self._y_kinds, y_arr = split_stage_ops(yops)
            self._y_arrays = tuple(_as_idx(a) for a in y_arr)
            self._y_R = Ry
            self._y_src = Nys
        elif self._row_order is not None:
            Ny = sum(nkp or nk for _, nk, nkp, _ in self._classes)
            identity = np.array_equal(self._row_order,
                                      np.arange(self.n))
            if not identity or (len(self._classes) > 1 and Ny != self.n):
                Ry = pick_R(Ny)
                dst_y = np.full(Ry * 128, -1, dtype=np.int32)
                yb = 0
                start = 0
                for _, nk, nkp, _ in self._classes:
                    dst_y[yb:yb + nk] = self._row_order[
                        start:start + nk].astype(np.int32)
                    yb += nkp or nk
                    start += nk
                perm_complete(dst_y)
                yops = fuse_stages(plan_route(dst_y, Ry))
                self._y_kinds, y_arr = split_stage_ops(yops)
                self._y_arrays = tuple(_as_idx(a) for a in y_arr)
                self._y_R = Ry
                self._y_src = Ny

        _tick("yroute")

    @property
    def dtype(self):
        return self._val.dtype

    def leaves(self) -> Tuple:
        out = (self._tile_of_chunk, self._sub_idx, self._lane_idx,
               self._val)
        if self._rprm is not None:
            out = out + (self._rprm,)
        out = out + self._stage_arrays + self._y_arrays + self._x_arrays
        if self._dup_idx is not None:
            out = out + (self._dup_idx,)
        if self._hot_W is not None:
            out = out + (self._hot_idx, self._hot_W)
        if self.tail is not None:
            out = out + self.tail.leaves()
        return out

    def apply_leaves(self, leaves, x):
        tile_of_chunk, sub_idx, lane_idx, vleaf = leaves[:4]
        rest = leaves[4:]
        rprm = None
        if self._rprm is not None:
            rprm = rest[0]
            rest = rest[1:]
        ns = len(self._stage_arrays)
        stages = join_stage_ops(self._stage_kinds, rest[:ns])
        rest = rest[ns:]
        ny = len(self._y_arrays)
        if ny:
            ystages = join_stage_ops(self._y_kinds, rest[:ny])
            rest = rest[ny:]
        nx = len(self._x_arrays)
        if nx:
            xstages = join_stage_ops(self._x_kinds, rest[:nx])
            rest = rest[nx:]
        if self._dup_idx is not None:
            dup_idx = rest[0]
            rest = rest[1:]
        interpret = config.pallas_interpret()
        n = self.n
        if self._premul and x.dtype != vleaf.dtype:
            # cast BEFORE the route: permutation commutes with the cast,
            # and the premultiplied pipeline runs in the value dtype
            x = x.astype(vleaf.dtype)
        if self._x_kinds is not None:
            # balanced source layout: duplicate the overloaded elements
            # (small static gather), pre-route x into the packed bins
            xflat = x.reshape(-1)
            if self._dup_idx is not None:
                xflat = jnp.concatenate(
                    [xflat, jnp.take(xflat, dup_idx, axis=0)])
            xpad = jnp.pad(xflat, (0, self._x_R * 128 - xflat.shape[0]))
            xr = _apply_route(xpad.reshape(-1, 128), xstages, interpret)
            xt = xr[: self._xpad_tiles * 8]
        else:
            xpad = jnp.pad(x.reshape(-1),
                           (0, self._xpad_tiles * TILE - x.shape[0]))
            xt = xpad.reshape(self._xpad_tiles * 8, 128)
        # Fused transposing expand only on the default multi-class path:
        # single-width templates are what sellr_uniform_shards runs under
        # shard_map, where this kernel crashes the TPU worker with an
        # INTERNAL backend error (r5, bench_dist_pallas isolation — the
        # plain VMEM expand + XLA 't' composes fine there).
        expT = (_expand_T_params(self._stage_kinds, self._chunk_rows,
                                 xt.shape[0], xt.dtype.itemsize)
                if self.width == 0
                and os.environ.get("VEXTPU_SELLR_EXPT", "1") == "1"
                else None)
        vsrc = vleaf if self._premul else None
        if expT is not None:
            # fused transposing expand: emits the route's first 't' pass
            # output directly (zero-padded to the full R-row grid)
            nb, F2 = expT
            g = _expand_gather_vmem_T(xt, tile_of_chunk, sub_idx,
                                      lane_idx, self._nchunks,
                                      self._chunk_rows, nb, F2,
                                      interpret=interpret, vsrc=vsrc)
            h = _apply_route(g, stages[1:], interpret)
        else:
            g = _run_expand(xt, tile_of_chunk, sub_idx, lane_idx,
                            self._nchunks, self._chunk_rows, interpret,
                            vsrc=vsrc)
            if self._R > g.shape[0]:
                g = jnp.concatenate(
                    [g, jnp.zeros((self._R - g.shape[0], 128), g.dtype)])
            h = _apply_route(g, stages, interpret)
        if self._premul and rprm is not None:
            # single-kernel DMA column sums in the block-padded scratch
            # layout the y-route was planned against
            y = _class_colsum_dma(h, rprm, self._rnb,
                                  interpret=interpret).reshape(-1)
        else:
            hf = h.reshape(-1)
            vf = vleaf.reshape(-1)
            # per-class dense sums; multi-class planes are transposed
            # (wk, nkp) with 128-aligned offsets/strides so every slice
            # and reshape is a clean tiled view (the row-major odd
            # shapes cost ~260 s of XLA compile at 59 classes); XLA
            # fuses multiply+reduce per plane.  nkp == 0: single-width
            # row-major plane.  Premultiplied pipelines sum hf alone.
            parts = []
            for off, nk, nkp, wk in self._classes:
                if nkp == 0:
                    seg = hf[off: off + nk * wk]
                    if not self._premul:
                        seg = seg.astype(vf.dtype) * vf[off: off + nk * wk]
                    parts.append(seg.reshape(nk, wk).sum(axis=1))
                else:
                    seg = hf[off: off + wk * nkp]
                    if not self._premul:
                        seg = seg.astype(vf.dtype) * vf[off: off + wk * nkp]
                    parts.append(seg.reshape(wk, nkp).sum(axis=0))
            y = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        if self._y_kinds is not None:
            ypad = jnp.zeros((self._y_R * 128,), y.dtype
                             ).at[: self._y_src].set(y)
            y = _apply_route(ypad.reshape(-1, 128), ystages,
                             interpret).reshape(-1)[:n]
        else:
            y = y[:n]
        if self._hot_W is not None:
            hot_idx, hot_W = rest[0], rest[1]
            rest = rest[2:]
            y = y + hot_W @ jnp.take(x, hot_idx, axis=0).astype(hot_W.dtype)
        if self.tail is not None:
            y = y + CSR.matvec(n, rest, x).astype(y.dtype)
        return y

    def apply(self, x):
        return self.apply_leaves(self.leaves(), x)


def _balance_layout(ecol, m, chunk_rows):
    """Bin-pack the x elements into (tile, lane) source buckets by
    reference count.

    The expand gather reads each entry's value through (tile, sub, lane)
    indices WE choose, so the bucket does not have to be the column's
    natural position (lane = col % 128): a cheap per-matvec pre-route
    (~6 passes over m elements) rearranges x into a layout where every
    (tile, lane) bucket carries ~the mean depth — elements sorted by
    reference count, snake round-robin across the bins, elements hotter
    than half a bucket split into duplicate copies (a small static
    jnp.take materializes the copies before the pre-route).  The natural
    layout's per-bucket depth skew padded the source grid ~25% on the
    16.8M-nnz bench matrix (src_rows 167520 vs the 131072 breakpoint),
    doubling every route pass.

    Returns (tile_id, sub, lane, ntiles, cap, el2slot, dup_src, m_eff)
    for the caller to adopt if it shrinks the route grid, else None.
    """
    entries = len(ecol)
    if entries == 0:
        return None
    cnt_el = np.bincount(ecol, minlength=m).astype(np.int64)
    ntiles0 = (m + TILE - 1) // TILE
    C0 = -(-entries // (ntiles0 * 128))
    C_t = max(chunk_rows,
              ((C0 + chunk_rows - 1) // chunk_rows) * chunk_rows)
    S = max(1, C_t // 2)
    # split overloaded elements into <= S-reference copies
    hvy = np.nonzero(cnt_el > S)[0]
    ncop = -(-cnt_el[hvy] // S)
    ndup = int((ncop - 1).sum())
    m_eff = m + ndup
    ntiles = (m_eff + TILE - 1) // TILE
    nbins = ntiles * 128
    # packing weight per xdup position
    w_all = np.empty(m_eff, dtype=np.int64)
    w_all[:m] = cnt_el
    dup_src = np.repeat(hvy, ncop - 1)
    if ndup:
        w_all[hvy] = S
        w_ex = np.full(ndup, S, dtype=np.int64)
        ex_rel = np.concatenate([[0], np.cumsum(ncop - 1)[:-1]])
        w_ex[ex_rel + ncop - 2] = cnt_el[hvy] - (ncop - 1) * S
        w_all[m:] = w_ex
    # stratified pairing: 8 rounds, each pairing the next nbins heaviest
    # elements against the bins sorted by current load ASCENDING.  Loads
    # stay within ~the last round's weight spread of the mean, i.e.
    # (almost) under C_t — so every tile's row allowance is exactly C_t
    # with no chunk-quantization waste; the residue spills via cap=C_t.
    order_w = np.argsort(-w_all, kind="stable")
    loads = np.zeros(nbins, dtype=np.int64)
    el2slot = np.empty(m_eff, dtype=np.int32)
    for rnd in range(8):
        seg = order_w[rnd * nbins: (rnd + 1) * nbins]
        if not len(seg):
            break
        ob = np.argsort(loads, kind="stable")[: len(seg)].astype(np.int32)
        loads[ob] += w_all[seg]
        el2slot[seg] = (ob // 128) * TILE + rnd * 128 + (ob % 128)
    spill_est = int(np.maximum(loads - C_t, 0).sum())
    # per-entry owner copy: the j-th reference of element c reads copy
    # j // S (0 = the base position, k >= 1 the k-th duplicate)
    if ndup:
        occ = group_rank(ecol, m)
        ex_start = np.full(m, -1, dtype=np.int32)
        ex_start[hvy] = (m + ex_rel).astype(np.int32)
        cidx = occ // np.int32(S)
        owner = np.where(cidx == 0, ecol, ex_start[ecol] + cidx - 1)
    else:
        owner = ecol
    sl = el2slot[owner]
    return (sl // TILE, (sl % TILE) // 128, sl % 128, ntiles,
            C_t, el2slot, dup_src, m_eff, spill_est)


_EXACT_W = 32        # class widths are exact up to here
_CLASS_RATIO = 1.1   # geometric width ratio above (pad <= 10% per row)
_MAX_CLASSES = 96


def _length_classes(sl: np.ndarray,
                    snap128: bool = False) -> List[Tuple[int, int, int]]:
    """Partition rows (lengths ``sl`` sorted DESC) into width classes:
    returns [(start, n_k, w_k)] covering all rows.  Widths are exact up
    to _EXACT_W (zero padding — short lengths carry most of the mass)
    and grow geometrically above (pad <= _CLASS_RATIO per row); class
    count is bounded so the per-class reduce ops stay cheap to compile.
    With ``snap128`` every class boundary snaps UP to a multiple of 128
    rows, so n_k is an exact 128-multiple (except the last class) for
    the transposed (w_k, n_k_pad128) plane layout — the few snapped-in
    rows pad their width to w_v, far cheaper than block-padding sparse
    head classes (bench head: 8 classes of 1-36 longest rows would pad
    to 420K slots; one merged 128-row class pads to 81K).
    Unlike the reference's 3:1 ELL occupancy rule (sparse/ell.hpp:92-121,
    which optimizes GPU gather width), the classes only size dense
    planes — the route moves every entry regardless."""
    n = len(sl)
    classes: List[Tuple[int, int, int]] = []
    start = 0
    neg = -np.asarray(sl)  # ascending for searchsorted
    while start < n:
        wv = int(sl[start])
        if wv <= 1 or len(classes) == _MAX_CLASSES - 1:
            classes.append((start, n - start, max(1, wv)))
            break
        lim = wv if wv <= _EXACT_W else int(np.ceil(wv / _CLASS_RATIO))
        end = int(np.searchsorted(neg, -lim, side="right"))
        end = max(end, start + 1)
        if snap128:
            end = min(n, ((end + 127) // 128) * 128)
        classes.append((start, end - start, wv))
        start = end
    return classes


def _choose_classes(sl: np.ndarray):
    """Pick the class layout for rows with DESC-sorted lengths ``sl``:

    * transposed (w_k, n_k_pad128) planes with 128-snapped boundaries —
      every per-class slice/reshape is a clean 128-aligned tiled view,
      which is what keeps XLA compile sane at many classes (the
      row-major odd shapes cost ~260 s of XLA compile at 16.8M nnz /
      59 classes, measured r5); or
    * exact row-major (n_k, w_k) planes — minimal slots, used when the
      snap padding would be material (small matrices, where a few
      hundred padded slots can push the route grid over a pick_R
      breakpoint and compile is cheap anyway).

    Returns (classes, transposed) where classes = [(start, n_k, w_k)].
    """
    exact = _length_classes(sl)
    snap = _length_classes(sl, snap128=True)
    slots_exact = sum(nk * wk for _, nk, wk in exact)
    slots_snap = sum((-(-nk // 128) * 128) * wk for _, nk, wk in snap)
    # the snap padding only *matters* when it pushes the destination
    # grid over a pick_R breakpoint (route traffic jumps a level there;
    # a few percent of extra byte-bound reduce traffic does not) —
    # slots pct is the wrong yardstick (13.9% pad at 1K rows, 0.3% at
    # the 16.8M bench, measured r5)
    if pick_R(slots_snap) == pick_R(slots_exact):
        return snap, True
    return exact, False


def _trim_allowances(allow_t: np.ndarray, depth_tl: np.ndarray,
                     chunk_rows: int, dst_rows: int,
                     budget: int) -> np.ndarray:
    """When the natural source grid sits just above a pick_R breakpoint
    the whole route pays a level jump (2x grid on the bench matrix);
    shave whole chunks off the deepest tiles' row allowances — spilling
    those entries to the CSR tail — if at most ``budget`` entries buy
    the smaller grid.  Returns the (possibly trimmed) allowances."""
    src_nat = int(allow_t.sum())
    if src_nat <= chunk_rows:
        return allow_t
    target = max(pick_R_floor(src_nat), pick_R(max(1, dst_rows) * 128))
    if target >= src_nat or src_nat - target > max(64 * chunk_rows,
                                                   src_nat // 16):
        return allow_t
    allow = allow_t.copy()
    spilled = 0
    total = src_nat
    while total > target:
        # marginal spill of shaving one chunk: entries whose rank falls
        # in [a - chunk_rows, a) across the tile's lanes
        band = np.clip(depth_tl - (allow[:, None] - chunk_rows),
                       0, chunk_rows)
        cost = band.sum(axis=1)
        cost[allow < chunk_rows] = 1 << 62
        t = int(np.argmin(cost))
        spilled += int(cost[t])
        if spilled > budget or allow[t] < chunk_rows:
            return allow_t  # too expensive — keep the natural grid
        allow[t] -= chunk_rows
        total -= chunk_rows
    return allow


def sellr_uniform_shards(S: int, m: int, ptr, col, val, ndev: int):
    """Build ``ndev`` row-shards (S rows each; ptr covers ndev*S rows) as
    SELLR matrices with IDENTICAL leaf pytrees, for the distributed SpMV:
    shard_map is SPMD, so every shard must run the same program over
    same-shaped leaves.  Returns ``(template, stacked)`` — the shard-0
    object (static structure only) and the per-leaf np.stack over shards.

    Uniformization (reference analog: setup_exchange precomputing the
    topology once, vexcl/spmat.hpp:291-378): a premeter pass measures
    each shard's natural src_rows/tail_nnz; the build pass forces the
    maxima everywhere (pad slots route to unused ELL destinations, pad
    tail entries carry zero values into the last row)."""
    ptr = np.asarray(ptr, dtype=np.int64)
    nnz = int(ptr[-1])
    row_len = np.diff(ptr)
    # width: no-tier cost model (overflow rides the CSR-crumb gather)
    best_w, best_c = 1, float("inf")
    for w in (4, 8, 16, 24, 32, 48, 64, 96, 128):
        c = (pick_R(S * w) * 128
             + 150.0 * np.maximum(row_len - w, 0).sum() / ndev)
        if c < best_c:
            best_w, best_c = w, c
    w = best_w
    chunk_rows = CHUNK_ROWS if nnz // ndev > (1 << 21) else CHUNK_ROWS_SMALL
    ntiles = ((m + TILE - 1) // TILE)
    cap = int(max(1024, 16 * max(1.0, nnz / max(1, ntiles * 128))))
    uni = {"chunk_rows": chunk_rows, "cap": cap}

    def shard_csr(d):
        lo, hi = d * S, (d + 1) * S
        p = ptr[lo:hi + 1] - ptr[lo]
        return p, col[ptr[lo]:ptr[hi]], val[ptr[lo]:ptr[hi]]

    src_rows, tail_nnz = 1, 0
    for d in range(ndev):
        p, c_, v_ = shard_csr(d)
        probe = SELLR(S, m, p, c_, v_, width=w, uniform=uni, premeter=True)
        src_rows = max(src_rows, probe.premeter_src_rows)
        tail_nnz = max(tail_nnz, probe.premeter_tail_nnz)

    uni = dict(uni, src_rows=src_rows, tail_nnz=tail_nnz,
               R=pick_R(max(src_rows, (S * w + 127) // 128) * 128))
    shards = [SELLR(S, m, *shard_csr(d), width=w, uniform=uni)
              for d in range(ndev)]
    leaf_sets = [sh.leaves() for sh in shards]
    nl = {len(ls) for ls in leaf_sets}
    assert len(nl) == 1, "uniformization failed: leaf counts differ"
    stacked = [np.stack([np.asarray(ls[i]) for ls in leaf_sets])
               for i in range(nl.pop())]
    return shards[0], stacked
