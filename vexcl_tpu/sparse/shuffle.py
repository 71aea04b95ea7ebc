"""SELL-R: shuffle-routed ELL — the TPU-first general irregular SpMV.

Re-implements the role of the reference's flagship native kernel, hybrid
ELL for irregular matrices (vexcl/spmat/hybrid_ell.inl:1-403, width
heuristic vexcl/sparse/ell.hpp:92-121), as a TPU-native design: TPUs have
no hardware gather (XLA's take: ~0.14 Gelem/s at any table size,
exp/shuffle_probe.py), so instead of gathering x per entry the matvec is
a fixed sequence of DENSE shuffle passes:

  1. EXPAND   Entries are bucketed by 1024-element x tile at
              construction; a Pallas kernel fetches each bucket's values
              from its (8,128) x tile with the two native Mosaic shuffle
              ops (sublane gather + lane gather), the tile selected per
              chunk via scalar prefetch.
  2. ROUTE    A static Clos/Benes shuffle network (shuffle_plan.py) —
              lane-perm passes at ~110 Gelem/s + blocked transposes —
              permutes the expanded values from bucket order into dense
              ELL (row-major) order.  The plan is edge-colored once at
              construction (Konig via Euler splits, C++ fast path).
  3. REDUCE   y = (routed * val).reshape(n, w).sum(axis=1): a dense,
              byte-bound row reduction.  Long rows overflow into a
              recursive compact-row-space tier whose dense result is
              route-expanded back onto the full row space.

Random access thus becomes dense data movement — the shape the hardware
wants.  Measured end to end on a v5e chip this is two orders of magnitude
above the naive jnp.take ELL matvec (BENCH spmv_random_* rows).
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
from ..utils.util import to_device
import os

from .formats import CSR
from .shuffle_plan import pick_R, plan_route, plan_route_free_lanes

__all__ = ["SELLR"]

CHUNK_ROWS = 32          # idx rows per gather grid step (big tiers)
CHUNK_ROWS_SMALL = 8     # small tiers: less per-bucket padding
TILE = 1024              # x elements per bucket = one (8, 128) tile


# ---------------------------------------------------------------------------
# Pallas executors
# ---------------------------------------------------------------------------


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
        o_ref[:] = jnp.take_along_axis(d_ref[:], i_ref[:], axis=1)

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
            o_ref[sl, :] = jnp.take_along_axis(d_ref[sl, :], i_ref[sl, :],
                                               axis=0)

    if blk < 8:
        def kernel_small(d_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(d_ref[:], i_ref[:], axis=0)

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


@partial(jax.jit, static_argnames=("nchunks", "chunk_rows", "interpret"))
def _expand_gather(xt, tile_of_chunk, sub_idx, lane_idx, nchunks,
                   chunk_rows=CHUNK_ROWS, interpret=False):
    """Fetch entry values from x: chunk c reads x tile tile_of_chunk[c]
    (scalar-prefetched block index) and resolves CHUNK_ROWS x 128 entries
    with one sublane + one lane gather per (8,128) sub-chunk."""

    def kernel(tile_ref, x_ref, s_ref, l_ref, o_ref):
        for k in range(chunk_rows // 8):
            s = s_ref[k * 8:(k + 1) * 8, :]
            l = l_ref[k * 8:(k + 1) * 8, :]
            g1 = jnp.take_along_axis(x_ref[:], s, axis=0)
            o_ref[k * 8:(k + 1) * 8, :] = jnp.take_along_axis(g1, l, axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i, t: (t[i], 0)),
            pl.BlockSpec((chunk_rows, 128), lambda i, t: (i, 0)),
            pl.BlockSpec((chunk_rows, 128), lambda i, t: (i, 0)),
        ],
        out_specs=pl.BlockSpec((chunk_rows, 128), lambda i, t: (i, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nchunks * chunk_rows, 128), xt.dtype),
        interpret=interpret,
    )(tile_of_chunk, xt, sub_idx, lane_idx)


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
        g1 = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)
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
                t, i_ref[k * 128:(k + 1) * 128, :], axis=1)

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
        g1 = jnp.take_along_axis(x_ref[:], a_ref[:], axis=1)
        for k in range(blk // 8):
            sl = slice(k * 8, (k + 1) * 8)
            g2 = jnp.take_along_axis(g1[sl, :], s_ref[sl, :], axis=0)
            o_ref[sl, :] = jnp.take_along_axis(g2, c_ref[sl, :], axis=1)

    if blk < 8:
        def kernel_small(x_ref, a_ref, s_ref, c_ref, o_ref):
            g1 = jnp.take_along_axis(x_ref[:], a_ref[:], axis=1)
            g2 = jnp.take_along_axis(g1, s_ref[:], axis=0)
            o_ref[:] = jnp.take_along_axis(g2, c_ref[:], axis=1)

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
_KIND_ARRAYS = {"lane": 1, "sub": 1, "lsl": 3, "lane_t": 1, "tinv_lane": 1}


def fuse_stages(ops: List[Tuple]) -> List[Tuple]:
    """Peephole-fuse a planned stage list: [lane,sub,lane] -> lsl,
    [lane,t] -> lane_t, [tinv,lane] -> tinv_lane.  Cuts the 11-pass plan
    of a two-level route to 5 passes (each at lane-perm speed)."""
    out: List[Tuple] = []
    i = 0
    while i < len(ops):
        k = ops[i][0]
        if (k == "lane" and i + 2 < len(ops) and ops[i + 1][0] == "sub"
                and ops[i + 2][0] == "lane"):
            out.append(("lsl", ops[i][1], ops[i + 1][1], ops[i + 2][1]))
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
        elif kind == "lsl":
            x = _lsl_perm(x, op[1], op[2], op[3], interpret=interpret)
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


class SELLR:
    """Shuffle-routed ELL with recursive overflow tiers and dense
    hot-column extraction.

    * Long ROWS overflow into a compact-row-space child SELLR (tier)
      whose dense result is route-expanded back onto the full row space —
      every static irregular movement is a shuffle network, never an XLA
      gather/scatter.  Recursion bottoms out in a plain CSR once the
      crumb count is small (VEXTPU_SELLR_CSR_MAX, default 32768).
    * Hot COLUMNS (count > VEXTPU_SELLR_HOT_COL, default 2048) become a
      dense (n, k) plane: y += W @ x[hot_cols] — a k-column dense matvec
      instead of k*count shuffle slots (a dense column IS dense data).
    * A per-(tile, lane) cap backstops pathological lane skew by spilling
      the excess to the overflow path.
    """

    format = "sellr"

    def __init__(self, n: int, m: int, ptr, col, val,
                 width: Optional[int] = None, _depth: int = 0,
                 uniform: Optional[dict] = None, premeter: bool = False):
        # ``uniform``: force the structural parameters (chunk_rows, cap,
        # and — in the build phase — src_rows, R, tail_nnz) so that
        # same-shaped row shards produce IDENTICAL leaf pytrees: the
        # distributed SpMV stacks per-shard leaves under one shard_map
        # (SPMD needs one program).  Implies: no hot plane, no recursive
        # tier (overflow goes to a zero-padded CSR tail).  ``premeter``:
        # stop after measuring the natural sizes (premeter_src_rows,
        # premeter_tail_nnz) used to compute the forced maxima.
        ptr = np.asarray(ptr, dtype=np.int64)
        col = np.asarray(col, dtype=np.int64)
        val = np.asarray(val)
        self.n = int(n)
        self.m = int(m)
        self.nnz = int(ptr[-1])
        row_len = np.diff(ptr)

        w = int(width) if width else _choose_sellr_width(self.n, row_len)
        w = max(1, min(w, 128))
        self.width = w

        # ---- split ELL part vs row overflow --------------------------------
        keep = np.minimum(row_len, w)
        within = np.arange(len(col)) - np.repeat(ptr[:-1], row_len)
        rows_of = np.repeat(np.arange(self.n), row_len)
        in_ell = within < np.repeat(keep, row_len)

        ecol = col[in_ell]
        eval_ = val[in_ell]
        erow = rows_of[in_ell]

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
            is_hot = np.isin(ecol, hot_cols)
            Wp = np.zeros((self.n, len(hot_cols)), dtype=val.dtype)
            hr = erow[is_hot]
            hc = np.searchsorted(hot_cols, ecol[is_hot])
            np.add.at(Wp, (hr, hc), eval_[is_hot])
            self._hot_idx = jnp.asarray(hot_cols.astype(np.int32))
            self._hot_W = to_device(Wp)
            ecol, eval_, erow = ecol[~is_hot], eval_[~is_hot], erow[~is_hot]

        # ---- source buckets (by 1024-element x tile); placement lane is
        # the entry's col%128, so the two-op tile gather composes without
        # conflicts; per-(tile, lane) rank gives the row ---------------------
        m_pad = ((self.m + TILE - 1) // TILE) * TILE
        ntiles = m_pad // TILE
        tile_id = ecol // TILE
        sub_in_tile = (ecol % TILE) // 128
        lane_in_tile = ecol % 128
        tl = tile_id * 128 + lane_in_tile
        o2 = np.argsort(tl, kind="stable")
        s2 = tl[o2]
        g2 = np.searchsorted(s2, s2, side="left")
        rank = np.empty(len(ecol), dtype=np.int64)
        rank[o2] = np.arange(len(ecol)) - g2

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
        cnt_tl = np.bincount(tl, minlength=ntiles * 128)
        spill = rank >= cap
        sp_col, sp_val, sp_row = ecol[spill], eval_[spill], erow[spill]
        if spill.any():
            ks = ~spill
            ecol, eval_, erow = ecol[ks], eval_[ks], erow[ks]
            tile_id, sub_in_tile = tile_id[ks], sub_in_tile[ks]
            lane_in_tile, rank = lane_in_tile[ks], rank[ks]

        if premeter:
            depth_tl = np.minimum(cnt_tl, cap).reshape(ntiles, 128)
            b_rows = depth_tl.max(axis=1)
            b_rows = ((b_rows + chunk_rows - 1) // chunk_rows) * chunk_rows
            sr = int(max(1, b_rows.sum()))
            self.premeter_src_rows = (
                (sr + chunk_rows - 1) // chunk_rows) * chunk_rows
            self.premeter_tail_nnz = int((~in_ell).sum() + len(sp_col))
            return

        # ---- overflow (long rows + spills): recursive tier or CSR ----------
        ek = np.zeros(len(ecol), dtype=np.int64)  # ELL slot within row
        # recompute slot-within-row for the surviving ELL entries
        o3 = np.argsort(erow, kind="stable")
        s3 = erow[o3]
        g3 = np.searchsorted(s3, s3, side="left")
        ek[o3] = np.arange(len(erow)) - g3

        self.tail = None
        self.tier = None
        self._tier_route = None
        ocol = np.concatenate([col[~in_ell], sp_col])
        oval = np.concatenate([val[~in_ell], sp_val])
        orow = np.concatenate([rows_of[~in_ell], sp_row])
        if uniform is not None:
            tnnz = uniform["tail_nnz"]
            assert len(ocol) <= tnnz
            if tnnz:
                order = np.argsort(orow, kind="stable")
                orow, ocol, oval = orow[order], ocol[order], oval[order]
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
            order = np.argsort(orow, kind="stable")
            orow, ocol, oval = orow[order], ocol[order], oval[order]
            csr_max = int(os.environ.get("VEXTPU_SELLR_CSR_MAX", "65536"))
            if len(ocol) > csr_max and _depth < 3:
                rows_long, tlen = np.unique(orow, return_counts=True)
                n_t = len(rows_long)
                tptr_c = np.concatenate([[0], np.cumsum(tlen)])
                self.tier = SELLR(n_t, self.m, tptr_c, ocol, oval,
                                  _depth=_depth + 1)
                # route the tier's dense (n_t,) result onto the n rows
                Rexp = pick_R(max(self.n, n_t))
                dst = np.full(Rexp * 128, -1, dtype=np.int64)
                dst[np.arange(n_t)] = rows_long
                used = np.zeros(Rexp * 128, dtype=bool)
                used[rows_long] = True
                dst[np.nonzero(dst < 0)[0]] = np.nonzero(~used)[0][
                    : Rexp * 128 - n_t]
                ops = fuse_stages(plan_route(dst, Rexp))
                self._tier_route, t_arr = split_stage_ops(ops)
                self._tier_route_arrays = tuple(
                    jnp.asarray(a) for a in t_arr)
                self._tier_R = Rexp
                self._tier_n = n_t
            else:
                tlen_full = np.bincount(orow, minlength=self.n)
                tptr = np.concatenate([[0], np.cumsum(tlen_full)])
                self.tail = CSR(self.n, self.m, tptr,
                                ocol.astype(np.int32), oval)

        # ---- bucket rows & gather planes ------------------------------------
        depth_tl = np.minimum(cnt_tl, cap).reshape(ntiles, 128)
        bucket_rows = depth_tl.max(axis=1)
        bucket_rows = ((bucket_rows + chunk_rows - 1) // chunk_rows
                       ) * chunk_rows
        row_off = np.zeros(ntiles, dtype=np.int64)
        row_off[1:] = np.cumsum(bucket_rows)[:-1]
        src_rows = int(max(1, bucket_rows.sum()))
        src_rows = ((src_rows + chunk_rows - 1) // chunk_rows) * chunk_rows
        if uniform is not None:
            assert src_rows <= uniform["src_rows"]
            src_rows = uniform["src_rows"]
        self._nchunks = int(src_rows // chunk_rows)
        tile_of_chunk = np.zeros(self._nchunks, dtype=np.int32)
        tile_of_chunk[: int((bucket_rows // chunk_rows).sum())] = np.repeat(
            np.arange(ntiles), bucket_rows // chunk_rows).astype(np.int32)

        src_row = row_off[tile_id] + rank
        src_flat = src_row * 128 + lane_in_tile

        sub_plane = np.zeros((src_rows, 128), dtype=np.int32)
        sub_plane[src_row, lane_in_tile] = sub_in_tile.astype(np.int32)

        # ---- destination & route plan ---------------------------------------
        M_dst = self.n * w
        dst_rows = (M_dst + 127) // 128
        R = (uniform["R"] if uniform is not None
             else pick_R(max(src_rows, dst_rows) * 128))
        assert R >= max(src_rows, dst_rows)
        M_route = R * 128

        dst = np.full(M_route, -1, dtype=np.int64)
        dst_flat_e = (erow * w + ek).astype(np.int64)
        dst[src_flat] = dst_flat_e
        free_src = np.nonzero(dst < 0)[0]
        used_dst = np.zeros(M_route, dtype=bool)
        used_dst[dst_flat_e] = True
        dst[free_src] = np.nonzero(~used_dst)[0]
        # free-lanes plan: the expand gather can place each entry at ANY
        # lane of its source row, so the route's top A pass folds into
        # the lane gather the expand already does (one full HBM pass
        # saved); adjacent [lane,t]/[tinv,lane]/[lane,sub,lane] passes
        # then peephole-fuse into single Pallas kernels (11 -> 5 passes
        # for a two-level route)
        lanes, stages = plan_route_free_lanes(dst, R)
        stages = fuse_stages(stages)
        lanes2 = lanes.reshape(R, 128)[:src_rows].astype(np.int64)
        lane_plane = np.empty((src_rows, 128), dtype=np.int32)
        np.put_along_axis(
            lane_plane, lanes2,
            np.broadcast_to(np.arange(128, dtype=np.int32),
                            (src_rows, 128)), axis=1)

        # ---- device arrays ---------------------------------------------------
        self._xpad_tiles = ntiles
        self._src_rows = src_rows
        self._R = R
        self._tile_of_chunk = jnp.asarray(tile_of_chunk)
        self._sub_idx = jnp.asarray(sub_plane)
        self._lane_idx = jnp.asarray(lane_plane)
        # stage structure is static; the (large) idx planes travel through
        # leaves() so they are jit ARGUMENTS, not embedded constants
        # (closed-over arrays blow the remote-compile payload — the
        # HTTP 413 hazard, bench.py:slope_seconds docstring)
        self._stage_kinds, st_arr = split_stage_ops(stages)
        self._stage_arrays = tuple(jnp.asarray(a) for a in st_arr)
        vplane = np.zeros((self.n, w), dtype=val.dtype)
        vplane[erow, ek] = eval_
        self._val = to_device(vplane)

    @property
    def dtype(self):
        return self._val.dtype

    def leaves(self) -> Tuple:
        out = (self._tile_of_chunk, self._sub_idx, self._lane_idx,
               self._val) + self._stage_arrays
        if self._hot_W is not None:
            out = out + (self._hot_idx, self._hot_W)
        if self.tier is not None:
            out = out + self._tier_route_arrays + self.tier.leaves()
        elif self.tail is not None:
            out = out + self.tail.leaves()
        return out

    def apply_leaves(self, leaves, x):
        tile_of_chunk, sub_idx, lane_idx, vplane = leaves[:4]
        ns = len(self._stage_arrays)
        stages = join_stage_ops(self._stage_kinds, leaves[4:4 + ns])
        rest = leaves[4 + ns:]
        interpret = config.pallas_interpret()
        n, w = self.n, self.width
        xpad = jnp.pad(x.reshape(-1),
                       (0, self._xpad_tiles * TILE - x.shape[0]))
        xt = xpad.reshape(self._xpad_tiles * 8, 128)
        g = _expand_gather(xt, tile_of_chunk, sub_idx, lane_idx,
                           self._nchunks, chunk_rows=self._chunk_rows,
                           interpret=interpret)
        if self._R > g.shape[0]:
            g = jnp.concatenate(
                [g, jnp.zeros((self._R - g.shape[0], 128), g.dtype)])
        h = _apply_route(g, stages, interpret)
        routed = h.reshape(-1)[: n * w].reshape(n, w)
        y = jnp.sum(routed.astype(vplane.dtype) * vplane, axis=1)
        if self._hot_W is not None:
            hot_idx, hot_W = rest[0], rest[1]
            rest = rest[2:]
            y = y + hot_W @ jnp.take(x, hot_idx, axis=0).astype(hot_W.dtype)
        if self.tier is not None:
            nr = len(self._tier_route_arrays)
            tstages = join_stage_ops(self._tier_route, rest[:nr])
            y_t = self.tier.apply_leaves(rest[nr:], x)
            yt_pad = jnp.zeros((self._tier_R * 128,), y_t.dtype
                               ).at[: self._tier_n].set(y_t)
            expanded = _apply_route(yt_pad.reshape(-1, 128), tstages,
                                    interpret)
            y = y + expanded.reshape(-1)[: n].astype(y.dtype)
        elif self.tail is not None:
            y = y + CSR.matvec(n, rest, x).astype(y.dtype)
        return y

    def apply(self, x):
        return self.apply_leaves(self.leaves(), x)


def _choose_sellr_width(n: int, row_len: np.ndarray) -> int:
    """Width minimizing the modeled matvec cost: routed slots are cheap
    dense passes, overflow entries recurse at roughly 2.5 slots-equivalent
    each, so the optimum sits near a high quantile of the row-length
    distribution (unlike the reference's 3:1 occupancy rule, which
    optimizes GPU gather width — sparse/ell.hpp:92-121)."""
    csr_max = int(os.environ.get("VEXTPU_SELLR_CSR_MAX", "65536"))
    best_w, best_c = 1, float("inf")
    for w in (4, 8, 16, 24, 32, 48, 64, 96, 128):
        slots = pick_R(n * w) * 128
        tail = int(np.maximum(row_len - w, 0).sum())
        if tail > csr_max:
            # recursing tier: ~2.5 slot-equivalents per overflow entry
            # plus a fixed per-tier pipeline overhead
            c = slots + 2.5 * tail + 300_000
        else:
            # CSR crumbs ride the XLA gather (~15 ns/entry ~ 150 slots)
            c = slots + 150 * tail
        if c < best_c:
            best_w, best_c = w, c
    return best_w


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
