"""Static shuffle-network planning for the routed irregular SpMV.

TPU-first replacement for the reference's hybrid-ELL gather kernel
(vexcl/spmat/hybrid_ell.inl:1-403): TPUs have no hardware gather — XLA's
take runs at ~0.14 Gelem/s regardless of table size (measured,
exp/shuffle_probe.py) — but Mosaic exposes two NATIVE dynamic-shuffle ops:

  * lane gather   out[r, l] = x[r, idx[r, l]]   (minor dim exactly 128)
  * sublane gather within one (8, 128) tile      out[s, l] = x[idx[s,l], l]

both measured at ~110 Gelem/s.  Any static permutation of M elements laid
out as an (R, 128) grid decomposes into lane-perm / sublane-perm /
transpose stages by the classic Clos/Benes rearrangeability argument:

  perm = C (lane) . B (within-column row perms) . A (lane)

where A assigns each element the "color" lane from a proper 128-edge-
coloring of the bipartite multigraph {source row -> dest row} (Konig's
theorem: a d-regular bipartite multigraph is d-edge-colorable;
constructive via repeated Euler splits), B moves rows within each lane
column, and C places elements in their final lanes.  B recurses: a
within-column permutation of R-long columns becomes, after a blocked
transpose, 128 independent grid permutations of (R/128, 128) — until the
column length reaches 8 (one native sublane pass) or <=128 (a padded
transpose + lane pass).

The plan is computed once at matrix construction (this module, host-side
numpy + optional C++ coloring) and executed per matvec as a short
sequence of dense, byte-bound passes (sparse/shuffle.py).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

__all__ = ["plan_route", "apply_plan_numpy", "edge_color_pow2"]


# ---------------------------------------------------------------------------
# Konig edge coloring via Euler splits
# ---------------------------------------------------------------------------


def _euler_halve(su: np.ndarray, dv: np.ndarray, nv: int) -> np.ndarray:
    """Orient each edge of a bipartite multigraph (all degrees even) along
    Euler circuits; returns True for edges oriented src->dst.  Each side
    of the orientation is exactly half of every vertex's edges."""
    E = len(su)
    # incidence CSR over 2*nv vertices (dst offset by nv)
    u = np.concatenate([su, dv + nv])
    eid = np.concatenate([np.arange(E), np.arange(E)])
    order = np.argsort(u, kind="stable")
    inc = eid[order]
    deg = np.bincount(u, minlength=2 * nv)
    ptr = np.concatenate([[0], np.cumsum(deg)])
    cur = ptr[:-1].copy()  # next unused incidence slot per vertex
    used = np.zeros(E, dtype=bool)
    fwd = np.zeros(E, dtype=bool)

    su_l = su
    dv_l = dv
    inc_l = inc
    ptr_end = ptr[1:]

    for e0 in range(E):
        if used[e0]:
            continue
        # walk a circuit starting from edge e0's source vertex
        v = int(su_l[e0])
        while True:
            # advance past used incidences
            c = cur[v]
            end = ptr_end[v]
            while c < end and used[inc_l[c]]:
                c += 1
            cur[v] = c
            if c >= end:
                break  # circuit closed (all-even degrees guarantee it)
            e = int(inc_l[c])
            used[e] = True
            if v == su_l[e] and v < nv:
                fwd[e] = True
                v = int(dv_l[e]) + nv
            else:
                fwd[e] = False
                v = int(su_l[e])
    return fwd


def edge_color_pow2(su: np.ndarray, dv: np.ndarray, nv: int, d: int,
                    seg: int = None) -> np.ndarray:
    """Proper d-edge-coloring of a d-regular bipartite multigraph
    (d a power of two) by recursive Euler splitting.  Tries the C++
    fast path (utils/native.py) first; numpy/python fallback.  ``seg``
    marks vertex-disjoint contiguous edge segments (per-group grids)."""
    try:
        from ..utils.native import edge_color

        return edge_color(su, dv, nv, d, seg=seg)
    except Exception:
        pass
    colors = np.zeros(len(su), dtype=np.int32)
    _color_rec(su, dv, np.arange(len(su)), nv, d, 0, colors)
    return colors


def _color_rec(su, dv, idx, nv, d, base, colors):
    if d == 1:
        colors[idx] = base
        return
    fwd = _euler_halve(su, dv, nv)
    _color_rec(su[fwd], dv[fwd], idx[fwd], nv, d // 2, base, colors)
    _color_rec(su[~fwd], dv[~fwd], idx[~fwd], nv, d // 2, base + d // 2,
               colors)


# ---------------------------------------------------------------------------
# Clos/Benes planning
# ---------------------------------------------------------------------------


# Allowed recursion-bottom row counts: {2,4,8} execute as one native
# sublane pass, {16,24,32} as one fused subk pass (K/8 in-VMEM sublane
# gathers + selects per output tile — still byte-bound at K<=32), and
# {64,128} as the padded-transpose t128 (pad <= 2x).  Bottoms in
# (32, 64) would pad t128 >2x or pay >4x VPU work in subk; rounding the
# grid up is cheaper (the r4 16.8M-matvec bottomed at 16 via t128 and
# paid 3 passes over 8x-padded data — 6.17 GB/matvec of route traffic).
_BOTTOMS = (2, 4, 8, 16, 24, 32, 64, 128)


def _round_bottom(b: int) -> int:
    for v in _BOTTOMS:
        if b <= v:
            return v
    raise ValueError(f"bottom {b} > 128")


def pick_R(M: int) -> int:
    """Smallest executable row count for an M-element route grid.

    Chooses sizes whose recursion bottoms out on the cheap ops (see
    _BOTTOMS): one native sublane pass, one fused subk pass, or a t128
    padded at most 2x."""
    r = (M + 127) // 128
    if r <= 1:
        return 1
    if r <= 128:
        return _round_bottom(r)
    if r <= 128 * 128:
        return 128 * _round_bottom((r + 127) // 128)
    if r <= 128 * 128 * 128:
        return 16384 * _round_bottom((r + 16383) // 16384)
    # three levels (beyond 268M elements)
    return 16384 * 128 * _round_bottom((r + 16384 * 128 - 1)
                                       // (16384 * 128))


def _R_image() -> List[int]:
    """All row counts pick_R can return (the executable route grids)."""
    vals = {1}
    for scale in (1, 128, 16384, 16384 * 128):
        vals.update(scale * b for b in _BOTTOMS)
    return sorted(vals)


_R_IMAGE = _R_image()


def pick_R_floor(rows: int) -> int:
    """Largest executable route row count <= ``rows`` (pick_R's image) —
    the breakpoint a slightly-oversized source grid could be trimmed
    down to."""
    i = np.searchsorted(_R_IMAGE, rows, side="right")
    return _R_IMAGE[max(0, i - 1)]


def _color_rows(drow, nv, d, seg=None):
    """Color the planner's row-major multigraph: edge i's SOURCE vertex is
    implicitly i // 128; ``drow`` is the (global) destination row per
    element.  Native int32 fast path; python fallback."""
    try:
        from ..utils.native import edge_color_rows

        return edge_color_rows(drow, nv, d, seg=seg)
    except Exception:
        pass
    E = len(drow)
    su = np.arange(E, dtype=np.int64) // 128
    colors = np.zeros(E, dtype=np.int32)
    _color_rec(su, np.asarray(drow, dtype=np.int64), np.arange(E), nv, d,
               0, colors)
    return colors


def plan_route_free_lanes(dst: np.ndarray, R: int):
    """Like :func:`plan_route`, but for sources whose LANE within their
    row is free (the expand-gather places each entry at any lane of its
    source row): returns ``(lanes, ops)`` where ``lanes[p]`` is the lane
    the element of source slot p must be PLACED at (its Konig color), and
    ``ops`` omits the top A stage — one full pass saved per matvec."""
    dst = np.ascontiguousarray(dst, dtype=np.int32)
    if len(dst) != R * 128:
        raise ValueError("dst must cover the full grid")
    if R == 1:
        # single row: placing at the dest lane IS the whole route
        return (dst & 127).astype(np.int32), []
    drow = dst >> 7
    colors = _color_rows(drow, R, 128)
    # dst as seen from the color-placed layout: element occupying slot
    # (srow, color) has destination dst[p]; its color there is its lane
    # (flat int32 scatter: np.put_along_axis builds int64 index temps;
    # native single-pass form when available)
    try:
        from ..utils import native as _nat

        dst2 = _nat.plan_scatter_freelanes(R, dst, colors)
    except Exception:
        colors2 = colors.reshape(R, 128)
        dst2 = np.empty(R * 128, dtype=np.int32)
        pos = np.arange(R, dtype=np.int32)[:, None] << 7
        pos = pos + colors2
        dst2[pos] = dst.reshape(R, 128)
    ops = _plan(dst2, 1, R, known_colors=True)
    return colors.copy(), ops


def plan_route(dst: np.ndarray, R: int) -> List[Tuple]:
    """Plan a static permutation of an (R, 128) grid.

    ``dst[p]`` = destination flat position of the element at source flat
    position ``p`` (a full permutation of [0, R*128)).  Returns a list of
    executable ops:

      ("lane", idx (rows,128))       out[r,l] = x[r, idx[r,l]]
      ("sub",  idx (rows,128))       per (8,128) block: out[s,l]=x[idx[s,l],l]
      ("subk", idx (rows,128), K)    per (K,128) block, idx group-local
      ("t",    G, R)                 per-group blocked transpose (R%128==0)
      ("tinv", G, R)                 its inverse
      ("t128", G, R)                 per-group (R,128)->(128,R) pad to 128
      ("t128inv", G, R)
    """
    dst = np.ascontiguousarray(dst, dtype=np.int32)
    if len(dst) != R * 128:
        raise ValueError("dst must cover the full grid")
    return _plan(dst, 1, R)


_LANE128 = np.arange(128, dtype=np.int32)


def _plan(dst: np.ndarray, G: int, R: int,
          known_colors: bool = False) -> List[Tuple]:
    """dst: group-LOCAL destination flat position per element (int32), in
    source order (row-major over the (G*R, 128) grid).  When
    ``known_colors`` is True the elements already SIT at their color
    lanes (color == lane) and the A stage is omitted
    (plan_route_free_lanes).

    All index math is int32 and 2-D (row, lane) — flat int64 position
    arrays cost ~18 s per call at 16.8M elements on the bench host
    (np.repeat at ~13 Melem/s; see the r4 construction cProfile)."""
    rows = G * R
    dst2 = dst.reshape(rows, 128)
    row0 = np.arange(rows, dtype=np.int32)

    # native single-pass scatter forms (utils/native.py plan_scatter_*):
    # the numpy forms below each build (rows, 128) int32 position temps
    # (2-5 full passes) before the fancy scatter — ~7 s of the 16.8M
    # construction on the 1-core bench host (r5)
    _nat = None
    if rows * 128 >= (1 << 20):
        try:
            from ..utils import native as _n

            _n._plan_lib()
            _nat = _n
        except Exception:
            _nat = None

    if R == 1:
        # single row per group: one lane perm
        dlane = dst2 & 127
        idx = np.empty(rows * 128, dtype=np.int32)
        pos = (row0[:, None] << 7) + dlane
        idx[pos] = np.broadcast_to(_LANE128, (rows, 128))
        return [("lane", idx.reshape(rows, 128))]

    ops: List[Tuple] = []
    if not known_colors:
        # color the (src row -> dst row) multigraph, batched over groups
        # (edges are in source order, so each group's R*128 edges are a
        # contiguous vertex-disjoint segment — the native colorer keeps
        # each segment cache-resident)
        if G > 1:
            grpR = (row0 // R) * R        # group base row
            gdrow = (dst2 >> 7) + grpR[:, None]
        else:
            gdrow = dst2 >> 7
        colors_f = _color_rows(gdrow.reshape(-1), rows, 128,
                               seg=R * 128 if G > 1 else None)
        colors = colors_f.reshape(rows, 128)
        # A: within-row, move each element to its color lane
        if _nat is not None:
            idx = _nat.plan_scatter_a(rows, colors_f)
        else:
            idx = np.empty(rows * 128, dtype=np.int32)
            pos = (row0[:, None] << 7) + colors
            idx[pos] = np.broadcast_to(_LANE128, (rows, 128))
        ops.append(("lane", idx.reshape(rows, 128)))
        colors_n = colors_f               # native passes take the array
    else:
        colors = np.broadcast_to(_LANE128, (rows, 128))
        colors_n = None                   # native passes synthesize iota

    def _base():
        # (global dst row) << 7 — shared by the numpy B and C scatters
        drow = dst2 >> 7
        grpR = (row0 // R) * R
        b = drow + grpR[:, None]
        np.left_shift(b, 7, out=b)
        return b, drow

    # B: within each lane column, route src row -> dst row
    if R in (2, 4, 8) and rows % 8 == 0:
        # one native sublane pass per (8,128) block; for R < 8 several
        # groups share a tile, so the indices are TILE-absolute — which
        # collapses to the source row's position within its 8-row tile
        if _nat is not None:
            idx = _nat.plan_scatter_b(rows, R, 1, dst2, colors_n)
        else:
            base, _ = _base()
            idx = np.empty(rows * 128, dtype=np.int32)
            idx[base | colors] = np.broadcast_to(
                (row0 & 7)[:, None], (rows, 128))
        ops.append(("sub", idx.reshape(rows, 128)))
    elif R <= 32 and R % 8 == 0:
        # one fused subk pass: a K-row within-column perm as K/8 in-VMEM
        # sublane gathers + selects per output tile — one byte-bound HBM
        # pass, vs t128's three passes over 128/K-padded data.  Indices
        # are group-LOCAL (in [0, K)).
        if _nat is not None:
            idx = _nat.plan_scatter_b(rows, R, 0, dst2, colors_n)
        else:
            base, _ = _base()
            idx = np.empty(rows * 128, dtype=np.int32)
            idx[base | colors] = np.broadcast_to(
                (row0 % R)[:, None], (rows, 128))
        ops.append(("subk", idx.reshape(rows, 128), R))
    elif R <= 128:
        # transpose trick: columns become rows of length R (pad to 128)
        ops.append(("t128", G, R))
        # after t128: grid (G*128, 128); element at row grp*128+color,
        # lane srow; needs lane drow
        drow = dst2 >> 7
        idx = np.tile(_LANE128, (G * 128, 1))
        grp128 = (row0 // R) * 128
        flat = grp128[:, None] + colors
        np.left_shift(flat, 7, out=flat)
        flat |= drow
        idx.reshape(-1)[flat] = np.broadcast_to(
            (row0 % R)[:, None], (rows, 128))
        ops.append(("lane", idx))
        ops.append(("t128inv", G, R))
    else:
        if R % 128:
            raise ValueError("R must be a multiple of 128 at inner levels")
        nb = R // 128
        ops.append(("t", G, R))
        # after t: groups G*128 (one per (group, color)), rows R//128;
        # element at local (srow//128, srow%128) must reach local drow
        if _nat is not None:
            dstn = _nat.plan_t_next(rows, R, dst2, colors_n)
        else:
            drow = dst2 >> 7
            grp128 = (row0 // R) * 128
            srow_hi = (row0 % R) >> 7
            newpos = grp128[:, None] + colors
            newpos *= nb
            newpos += srow_hi[:, None]
            np.left_shift(newpos, 7, out=newpos)
            newpos |= (row0 & 127)[:, None]
            dstn = np.empty(rows * 128, dtype=np.int32)
            dstn[newpos] = drow
            del newpos
        ops.extend(_plan(dstn, G * 128, nb))
        ops.append(("tinv", G, R))

    # C: final lane placement
    if _nat is not None:
        idxc = _nat.plan_scatter_c(rows, R, dst2, colors_n)
    else:
        base, _ = _base()
        dlane = dst2 & 127
        idxc = np.empty(rows * 128, dtype=np.int32)
        base |= dlane
        idxc[base] = colors
    ops.append(("lane", idxc.reshape(rows, 128)))
    return ops


# ---------------------------------------------------------------------------
# numpy reference executor (tests; the JAX/Pallas executor lives in
# sparse/shuffle.py)
# ---------------------------------------------------------------------------


def apply_plan_numpy(x: np.ndarray, ops: List[Tuple]) -> np.ndarray:
    """Apply a plan to x (flat, R*128) with numpy — the oracle."""
    cur = np.asarray(x).reshape(-1, 128)
    for op in ops:
        kind = op[0]
        if kind == "lane":
            idx = op[1]
            cur = np.take_along_axis(cur, idx, axis=1)
        elif kind == "sub":
            idx = op[1]
            out = np.empty_like(cur)
            for b in range(cur.shape[0] // 8):
                blk = cur[b * 8:(b + 1) * 8]
                out[b * 8:(b + 1) * 8] = np.take_along_axis(
                    blk, idx[b * 8:(b + 1) * 8], axis=0)
            cur = out
        elif kind == "subk":
            idx, K = op[1], op[2]
            out = np.empty_like(cur)
            for b in range(cur.shape[0] // K):
                blk = cur[b * K:(b + 1) * K]
                out[b * K:(b + 1) * K] = np.take_along_axis(
                    blk, idx[b * K:(b + 1) * K], axis=0)
            cur = out
        elif kind == "t":
            G, R = op[1], op[2]
            cur = (cur.reshape(G, R, 128).transpose(0, 2, 1)
                   .reshape(G * 128 * (R // 128), 128))
        elif kind == "tinv":
            G, R = op[1], op[2]
            cur = (cur.reshape(G, 128, R // 128, 128).reshape(G, 128, R)
                   .transpose(0, 2, 1).reshape(G * R, 128))
        elif kind == "t128":
            G, R = op[1], op[2]
            t = cur.reshape(G, R, 128).transpose(0, 2, 1)  # (G,128,R)
            pad = np.zeros((G, 128, 128 - R), dtype=cur.dtype)
            cur = np.concatenate([t, pad], axis=2).reshape(G * 128, 128)
        elif kind == "t128inv":
            G, R = op[1], op[2]
            cur = (cur.reshape(G, 128, 128)[:, :, :R]
                   .transpose(0, 2, 1).reshape(G * R, 128))
        else:  # pragma: no cover
            raise ValueError(f"unknown op {kind}")
    return cur.reshape(-1)
