"""Per-stage SELL-R timing on the real TPU at the bench size.

The r4 balanced packing halved the route grid at 16.8M nnz (byte-bound
model ~19 GFLOP/s); this probe breaks the measured matvec into its
stages to show where the remaining time goes:

    xroute  — pre-route of x into the balanced (tile, lane) bins
    expand  — the Pallas two-shuffle gather (one value per nnz slot)
    route   — the static Benes route, bucket order -> width-class order
    reduce  — per-class multiply + row sums + concat (XLA, byte-bound)
    yroute  — the small n-element scatter back to natural row order
    tail    — CSR crumb-tail matvec (XLA gather + segment_sum)
    full    — the whole apply_leaves (the bench row)

Pallas stages are chained with a scalar coupling (XLA cannot DCE inside
a pallas_call); the XLA reduce/tail stages couple through a full
n-vector so nothing is elided.  Run with NO env overrides (real chip).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import _random_lognormal_csr, slope_seconds  # noqa: E402
from vexcl_tpu.sparse.shuffle import (  # noqa: E402
    SELLR, _apply_route, _run_expand, join_stage_ops)
from vexcl_tpu.sparse.formats import CSR  # noqa: E402

print("devices:", jax.devices())

# SELLR_N=16 (i.e. 1<<16) for a quick CPU/interpret shape check
n = 1 << int(os.environ.get("SELLR_N", "20"))
ptr, col, val, nnz = _random_lognormal_csr(n)
t0 = time.perf_counter()
A = SELLR(n, n, ptr, col, val)
print(f"plan: {time.perf_counter() - t0:.1f}s  nnz={nnz}  "
      f"R={A._R}  x_R={A._x_R}  classes={len(A._classes)}  "
      f"route_passes={len(A._stage_kinds)}  "
      f"x_passes={len(A._x_kinds) if A._x_kinds else 0}  "
      f"y_passes={len(A._y_kinds) if A._y_kinds else 0}  "
      f"tail_nnz={A.tail.nnz if A.tail is not None else 0}  "
      f"hot={(A._hot_W.shape[1] if A._hot_W is not None else 0)}")

x0 = jnp.asarray(np.random.rand(n).astype(np.float32))
leaves = A.leaves()

rows = {}


def gfl(t):
    return 2 * nnz / t / 1e9


# ---- full apply (the bench row) ----------------------------------------
def step_full(x, *lv):
    y = A.apply_leaves(lv, x)
    return (x * np.float32(0.999) + y * np.float32(1e-4)) % 1.0


t = slope_seconds(step_full, x0, lo=16, hi=144, extra=leaves)
rows["full"] = t
print(f"full    {t * 1e3:8.3f} ms  {gfl(t):6.1f} GFLOP/s")

# ---- stage inputs (computed once, shipped as jit args) ------------------
from vexcl_tpu.config import config  # noqa: E402

interpret = config.pallas_interpret()  # False on the real chip
if A._x_kinds is not None:
    xflat = x0
    if A._dup_idx is not None:
        xflat = jnp.concatenate([xflat, jnp.take(xflat, A._dup_idx, axis=0)])
    xpad = jnp.pad(xflat, (0, A._x_R * 128 - xflat.shape[0]))
    xstages = join_stage_ops(A._x_kinds, A._x_arrays)
    xr = _apply_route(xpad.reshape(-1, 128), xstages, interpret)
    xt = xr[: A._xpad_tiles * 8]
else:
    xpad = jnp.pad(x0, (0, A._xpad_tiles * 1024 - n))
    xt = xpad.reshape(A._xpad_tiles * 8, 128)
xt = jax.block_until_ready(xt)

g = _run_expand(xt, A._tile_of_chunk, A._sub_idx, A._lane_idx,
                A._nchunks, A._chunk_rows, interpret)
if A._R > g.shape[0]:
    g = jnp.concatenate([g, jnp.zeros((A._R - g.shape[0], 128), g.dtype)])
g = jax.block_until_ready(g)
stages = join_stage_ops(A._stage_kinds, A._stage_arrays)
h = jax.block_until_ready(_apply_route(g, stages, interpret))

# ---- xroute -------------------------------------------------------------
if A._x_kinds is not None:
    xa = A._x_arrays

    def step_xroute(x, *arr):
        xf = x
        if A._dup_idx is not None:
            xf = jnp.concatenate([xf, jnp.take(xf, A._dup_idx, axis=0)])
        xp = jnp.pad(xf, (0, A._x_R * 128 - xf.shape[0]))
        st = join_stage_ops(A._x_kinds, arr)
        out = _apply_route(xp.reshape(-1, 128), st, interpret)
        return (x * np.float32(0.999) + out[0, 0] * np.float32(1e-6)) % 1.0

    t = slope_seconds(step_xroute, x0, lo=64, hi=576, extra=xa)
    rows["xroute"] = t
    print(f"xroute  {t * 1e3:8.3f} ms")

# ---- expand -------------------------------------------------------------
def step_expand(xc, tile_of_chunk, sub_idx, lane_idx):
    gg = _run_expand(xc, tile_of_chunk, sub_idx, lane_idx,
                     A._nchunks, A._chunk_rows, interpret)
    return (xc * np.float32(0.999)
            + gg[0, 0] * np.float32(1e-6)) % 1.0


t = slope_seconds(step_expand, xt, lo=32, hi=288,
                  extra=(A._tile_of_chunk, A._sub_idx, A._lane_idx))
rows["expand"] = t
# throughput over the SLOTS the gather actually processes (tail/hot
# entries never ride the expand; nnz/t overstated it)
slots = A._nchunks * A._chunk_rows * 128
print(f"expand  {t * 1e3:8.3f} ms   ({slots / t / 1e9:.1f} Gslot/s, "
      f"{slots} slots)")

# ---- route --------------------------------------------------------------
from vexcl_tpu.sparse.shuffle import _expand_T_params  # noqa: E402

_expT = (_expand_T_params(A._stage_kinds, A._chunk_rows,
                          A._xpad_tiles * 8, 4) if A.width == 0 else None)
_kinds = A._stage_kinds[1:] if _expT else A._stage_kinds
if _expT:
    print(f"(route row excludes stages[0]='t': fused into the expand, "
          f"expT={_expT})")


def step_route(gc, *arr):
    st = join_stage_ops(_kinds, arr)
    out = _apply_route(gc, st, interpret)
    return (gc * np.float32(0.999) + out[0, 0] * np.float32(1e-6)) % 1.0


t = slope_seconds(step_route, g, lo=16, hi=144, extra=A._stage_arrays)
rows["route"] = t
gb = 0
for k in A._stage_kinds:
    gb += 2 * A._R * 128 * 4  # r+w per pass over the grid (f32)
print(f"route   {t * 1e3:8.3f} ms   (~{gb / 1e9:.2f} GB model "
      f"-> {gb / t / 1e9:.0f} GB/s)")

# ---- reduce -------------------------------------------------------------
def step_reduce(v, hc, vf):
    # _val is stored 2-D (dst_rows, 128) (shuffle.py _val layout);
    # apply_leaves flattens it before the per-class slicing — do the same.
    # LICM pin: hc/vf are loop-invariant jit args — tying hf to the carry
    # scalar keeps XLA from hoisting the whole reduce out of the timing
    # chain (the r5 probe measured 0.006 ms = 23 TB/s without this)
    vf = vf.reshape(-1)
    hf = hc.reshape(-1) + v[0] * np.float32(1e-30)
    parts = []
    for off, nk, nkp, wk in A._classes:
        if nkp == 0:
            seg = (hf[off: off + nk * wk].astype(vf.dtype)
                   * vf[off: off + nk * wk])
            parts.append(seg.reshape(nk, wk).sum(axis=1))
        else:
            seg = (hf[off: off + wk * nkp].astype(vf.dtype)
                   * vf[off: off + wk * nkp])
            parts.append(seg.reshape(wk, nkp).sum(axis=0))
    y = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    return (v * np.float32(0.999) + y.sum() * np.float32(1e-9)) % 1.0


t = slope_seconds(step_reduce, x0, lo=32, hi=288, extra=(h, A._val))
rows["reduce"] = t
rb = 2 * A._R * 128 * 4 + n * 4
print(f"reduce  {t * 1e3:8.3f} ms   (~{rb / 1e9:.2f} GB model "
      f"-> {rb / t / 1e9:.0f} GB/s)")

# ---- yroute -------------------------------------------------------------
if A._y_kinds is not None:
    def step_yroute(v, *arr):
        yp = jnp.zeros((A._y_R * 128,), v.dtype).at[:n].set(v)
        st = join_stage_ops(A._y_kinds, arr)
        out = _apply_route(yp.reshape(-1, 128), st, interpret).reshape(-1)[:n]
        return (v * np.float32(0.999) + out * np.float32(1e-4)) % 1.0

    t = slope_seconds(step_yroute, x0, lo=64, hi=576, extra=A._y_arrays)
    rows["yroute"] = t
    print(f"yroute  {t * 1e3:8.3f} ms")

# ---- tail ---------------------------------------------------------------
if A.tail is not None:
    tl = A.tail.leaves()

    def step_tail(v, *lv):
        y = CSR.matvec(n, lv, v)
        return (v * np.float32(0.999) + y * np.float32(1e-4)) % 1.0

    t = slope_seconds(step_tail, x0, lo=16, hi=144, extra=tl)
    rows["tail"] = t
    print(f"tail    {t * 1e3:8.3f} ms   ({A.tail.nnz} nnz)")

# ---- hot ----------------------------------------------------------------
if A._hot_W is not None:
    def step_hot(v, hot_idx, hot_W):
        y = hot_W @ jnp.take(v, hot_idx, axis=0).astype(hot_W.dtype)
        return (v * np.float32(0.999) + y * np.float32(1e-4)) % 1.0

    t = slope_seconds(step_hot, x0, lo=16, hi=144,
                      extra=(A._hot_idx, A._hot_W))
    rows["hot"] = t
    print(f"hot     {t * 1e3:8.3f} ms")

ssum = sum(v for k, v in rows.items() if k != "full")
print(f"\nsum of stages {ssum * 1e3:.3f} ms vs full {rows['full'] * 1e3:.3f} "
      f"ms (fusion/overlap delta {(rows['full'] - ssum) * 1e3:+.3f} ms)")
print(f"full -> {gfl(rows['full']):.1f} GFLOP/s")
