"""Distributed (mesh-sharded) sparse matrix with device-side ghost exchange.

Analog of vexcl/sparse/distributed.hpp:28-216 and the first-gen exchange in
vexcl/spmat.hpp:120-185 + setup_exchange :291-378.

The reference splits each device's rows into a local part (columns owned by
the device) and a remote part, gathers the needed ghost x-values on device,
stages them THROUGH THE HOST, scatters them to neighbors, then runs the
remote SpMV (setup_exchange computes the minimal ghost sets once).

TPU-native exchange, picked automatically per matrix structure:

* **banded matrices** (DIA-detected, band within one shard): the ghost set
  is exactly a halo of band-width — exchanged with `lax.ppermute`
  NEIGHBOR traffic only (`parallel/halo.py`), the faithful analog of the
  reference's minimal ghost sets, riding ICI point-to-point;
* **general matrices with sparse coupling**: minimal ghost sets, the
  faithful analog of the reference's setup_exchange (spmat.hpp:291-378):
  at construction, for every (owner, requester) device pair the needed
  remote columns are computed on the host; at apply time each shard
  gathers its outgoing values and ONE `lax.all_to_all` delivers every
  pair's ghost set over ICI; ELL column indices are pre-remapped into
  [local | ghost] space so the remote part is a plain gather — no host
  staging ever;
* **densely coupled matrices**: one `all_gather` of x over the mesh axis
  (cheaper than all_to_all once ghost sets approach the full vector).

Either way the exchange happens inside the compiled step — no host
staging, no separate queues (XLA overlaps collective and compute,
replacing the reference's duplicate-queue trick, spmat.hpp:80-82).
Rows are padded to a multiple of the device count.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..context import current_context
from ..expr.node import ArrayTerminal, EmitEnv, Expr, as_expr
from .dia import try_build_dia
from .formats import from_csr_host

__all__ = ["distributed"]


class DistSpMVExpr(Expr):
    _size_transparent = False
    _opname = "dspmv"

    def __init__(self, mat: "distributed", x: Any):
        self.mat = mat
        leaf_terms = tuple(ArrayTerminal(a) for a in mat._leaves)
        self.children = leaf_terms + (as_expr(x),)

    def extra_sig(self) -> str:
        m = self.mat
        return f"{m.n}:{m.axis}:{m.ndev}:{m.mode}"

    def emit(self, env: EmitEnv):
        mat = self.mat
        if not env.placement_known:
            # enqueue() redirected this assignment to another context,
            # but the matrix planes are sharded over THEIR construction
            # mesh — a shard_map over that mesh inside the redirected jit
            # would crash with 'incompatible devices' (code-review r3).
            # Unlike the stencil there is no placement-neutral form (the
            # exchange topology IS the mesh), so fail with guidance.
            raise ValueError(
                "vex.enqueue() cannot redirect a distributed SpMV to a "
                "different context: the matrix is sharded over its "
                "construction mesh. Evaluate on the matrix's context and "
                "copy the result, or rebuild the matrix on the target "
                "context."
            )
        mesh = mat.context.mesh
        axis = mat.axis
        npad = mat.npad
        x = self.children[-1].emit_cached(env)
        xp = jnp.pad(x, (0, npad - x.shape[0])) if x.shape[0] != npad else x

        if mat.mode == "sellr":
            leaves = tuple(c.emit_cached(env) for c in self.children[:-1])
            tmpl = mat._template

            def shard_fn(*args):
                *lv, x_blk = args
                # ghost exchange: ICI all-gather of the sharded x, then
                # the shard's SELLR (expand + shuffle route + reduce)
                # consumes the full vector — no XLA gathers in the local
                # phase (vs ~0.14 Gelem/s for the ELL take path)
                xg = jax.lax.all_gather(x_blk, axis, tiled=True)
                lv = tuple(a[0] for a in lv)  # drop the stacked dev axis
                return tmpl.apply_leaves(lv, xg)

            # check_vma=False: pallas_call inside shard_map cannot
            # annotate varying mesh axes (same as the dia local phase)
            y = jax.shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=tuple(
                    P(axis, *([None] * (a.ndim - 1))) for a in leaves
                ) + (P(axis),),
                out_specs=P(axis),
                check_vma=False,
            )(*leaves, xp)
            return y[: mat.n]

        if mat.mode == "ell_a2a":
            col2, val = (c.emit_cached(env) for c in self.children[:2])
            sidx = self.children[2].emit_cached(env)
            mc = mat.ghost_count

            def shard_fn(col_blk, val_blk, sidx_blk, x_blk):
                # minimal ghost exchange: gather outgoing values per
                # destination, one all-to-all over ICI, then the ELL
                # gather runs over [local x | ghost values]
                send = jnp.take(x_blk, sidx_blk[0], axis=0)  # (ndev, mc)
                ghost = jax.lax.all_to_all(
                    send, mat.axis, split_axis=0, concat_axis=0,
                    tiled=True,
                ).reshape(-1)
                xfull = jnp.concatenate([x_blk, ghost])
                mask = col_blk >= 0
                gathered = jnp.take(xfull, jnp.where(mask, col_blk, 0),
                                    axis=0)
                return jnp.sum(jnp.where(mask, val_blk * gathered, 0),
                               axis=1)

            y = jax.shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=(P(mat.axis, None), P(mat.axis, None),
                          P(mat.axis, None, None), P(mat.axis)),
                out_specs=P(mat.axis),
            )(col2, val, sidx, xp)
            return y[: mat.n]

        if mat.mode == "dia_halo":
            from ..parallel.halo import with_halo
            from .pallas_dia import (
                _local_pallas_dia, dia_matvec_pallas, dia_matvec_pallas_roll)

            (vals,) = tuple(c.emit_cached(env) for c in self.children[:1])
            offsets = mat.offsets
            lhalo = max(0, -min(offsets))
            rhalo = max(0, max(offsets))
            def shard_fn(vals_blk, x_blk):
                # neighbor-only ghost exchange (ppermute halos); the halo
                # values multiply by the zero padding of out-of-range vals,
                # so edge replication at the domain ends is harmless
                xw = with_halo(x_blk, axis, lhalo, rhalo)
                nb = x_blk.shape[0]
                # Pallas LOCAL phase on real hardware (VERDICT r2 #1):
                # each shard is single-device inside shard_map, and the
                # kernels accept the halo'd x directly (prepadded=True —
                # xw starts with exactly lhalo = max(0, -min(off)) real
                # neighbor values, the layout the kernels' left pad had)
                form = _local_pallas_dia(nb, offsets, vals_blk, x_blk.dtype)
                if form == "roll":
                    return dia_matvec_pallas_roll(
                        nb, nb, offsets, vals_blk, xw, prepadded=True)
                if form == "window":
                    return dia_matvec_pallas(
                        nb, nb, offsets, vals_blk, xw, prepadded=True)
                acc = None
                for k, off in enumerate(offsets):
                    base = lhalo + off  # xw = [lhalo | block | rhalo]
                    seg = vals_blk[k] * xw[base : base + nb]
                    acc = seg if acc is None else acc + seg
                return acc

            # check_vma=False: pallas_call inside shard_map cannot
            # annotate varying mesh axes (same as the distributed scan)
            y = jax.shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=(P(None, axis), P(axis)),
                out_specs=P(axis),
                check_vma=False,
            )(vals, xp)
            return y[: mat.n]

        col, val = (c.emit_cached(env) for c in self.children[:2])

        def shard_fn(col_blk, val_blk, x_blk):
            # ghost exchange: ICI all-gather of the sharded x
            xg = jax.lax.all_gather(x_blk, axis, tiled=True)
            mask = col_blk >= 0
            gathered = jnp.take(xg, jnp.where(mask, col_blk, 0), axis=0)
            return jnp.sum(jnp.where(mask, val_blk * gathered, 0), axis=1)

        y = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(axis, None), P(axis, None), P(axis)),
            out_specs=P(axis),
        )(col, val, xp)
        return y[: mat.n]

    def size_hint(self) -> Optional[int]:
        return self.mat.n


class distributed:
    """sparse::distributed<ell> analog: row-sharded ELL over the context
    mesh with all-gather ghost exchange."""

    def __init__(self, n: int, m: Optional[int] = None, ptr=None, col=None,
                 val=None, *, context=None):
        self.context = context or current_context()
        self.axis = self.context.axis
        self.ndev = self.context.size
        self.n = int(n)
        self.m = int(m) if m is not None else int(n)

        ptr = np.asarray(ptr, dtype=np.int64)
        self.npad = -(-max(self.n, self.m) // self.ndev) * self.ndev
        shard = self.npad // self.ndev

        # banded fast path: halo exchange instead of all-gather
        dia = try_build_dia(self.n, self.m, ptr, col, val)
        if (
            dia is not None
            and max(dia.offsets) < shard
            and -min(dia.offsets) < shard
        ):
            self.mode = "dia_halo"
            self.offsets = dia.offsets
            vals = np.asarray(dia.vals)
            if self.npad != self.n:
                vals = np.concatenate(
                    [vals, np.zeros((vals.shape[0], self.npad - self.n),
                                    vals.dtype)], axis=1
                )
            sh = NamedSharding(self.context.mesh, P(None, self.axis))
            self._leaves = (jax.device_put(jnp.asarray(vals), sh),)
            self.nnz = dia.nnz
            return

        # SELL-R local phase (r4): the gather-based ELL local matvec runs
        # at XLA's ~0.14 Gelem/s take rate — the wall the single-device
        # SELLR format removes.  For big irregular matrices, build one
        # uniform-structure SELLR per row shard (sparse/shuffle.py:
        # sellr_uniform_shards) and run it as the shard_map local phase
        # over the all-gathered x.  Env: VEXTPU_DSPMV_SELLR=1 forces it
        # (tests), =0 disables, default engages above 4M nnz.
        sellr_env = os.environ.get("VEXTPU_DSPMV_SELLR", "")
        use_sellr = (sellr_env == "1"
                     or (sellr_env != "0" and int(ptr[-1]) > (1 << 22)))
        if use_sellr:
            from .shuffle import sellr_uniform_shards

            S = self.npad // self.ndev
            ptr_pad = np.concatenate(
                [ptr, np.full(self.npad - self.n, ptr[-1], np.int64)])
            self.mode = "sellr"
            tmpl, stacked = sellr_uniform_shards(
                S, self.npad, ptr_pad, np.asarray(col, dtype=np.int64),
                np.asarray(val), self.ndev)
            self._template = tmpl
            self._leaves = tuple(
                jax.device_put(
                    jnp.asarray(a),
                    NamedSharding(self.context.mesh,
                                  P(self.axis, *([None] * (a.ndim - 1)))),
                ) for a in stacked)
            self.nnz = int(ptr[-1])
            return

        rl = np.diff(ptr)
        width = max(1, int(rl.max(initial=0)))
        ell = from_csr_host(self.n, self.m, ptr, col, val, "ell")

        ecol = np.asarray(ell.col)
        eval_ = np.asarray(ell.val)
        if self.npad != self.n:
            pad_rows = self.npad - self.n
            ecol = np.concatenate([ecol, np.full((pad_rows, width), -1, np.int32)])
            eval_ = np.concatenate([eval_, np.zeros((pad_rows, width), eval_.dtype)])

        sh = NamedSharding(self.context.mesh, P(self.axis, None))

        # minimal ghost sets (setup_exchange analog): per (requester r,
        # owner o) pair, the unique remote columns r needs from o
        S = self.npad // self.ndev
        rows2d = np.broadcast_to(
            np.arange(self.npad, dtype=np.int64)[:, None], ecol.shape)
        valid = ecol >= 0
        rsh = rows2d // S
        csh = np.where(valid, ecol // S, rsh)  # self for masked entries
        remote = valid & (csh != rsh)

        key = rsh[remote] * np.int64(self.npad) + ecol[remote]
        uk = np.unique(key)  # sorted by (requester shard, column)
        u_r = uk // self.npad
        u_c = uk % self.npad
        u_o = u_c // S

        # ghost slot within the (r, o) group
        grp = u_r * self.ndev + u_o
        counts = np.bincount(grp, minlength=self.ndev * self.ndev)
        mc = int(counts.max(initial=0))
        mc = -(-max(mc, 1) // 128) * 128  # lane-align the exchange rows

        # all_to_all wins while ghost traffic stays below the all-gather
        if mc * self.ndev <= self.npad // 2 and self.ndev > 1:
            self.mode = "ell_a2a"
            self.ghost_count = mc
            starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
            pos_in_grp = np.arange(len(uk)) - starts[grp]
            # slot in the requester's ghost vector: owner-major
            slot = u_o * mc + pos_in_grp

            # send tables: shard o sends local index (c - o*S) of the
            # p-th column requested by r as send_idx[o, r, p]
            send_idx = np.zeros((self.ndev, self.ndev, mc), np.int32)
            send_idx[u_o, u_r, pos_in_grp] = (u_c - u_o * S).astype(np.int32)

            # remap ELL columns: local -> c - r*S, remote -> S + slot
            col2 = np.where(valid, ecol - rsh * S, -1).astype(np.int32)
            ek = rsh[remote] * np.int64(self.npad) + ecol[remote]
            eslot = slot[np.searchsorted(uk, ek)]
            col2[remote] = (S + eslot).astype(np.int32)

            self._leaves = (
                jax.device_put(jnp.asarray(col2), sh),
                jax.device_put(jnp.asarray(eval_), sh),
                jax.device_put(
                    jnp.asarray(send_idx),
                    NamedSharding(self.context.mesh, P(self.axis, None, None)),
                ),
            )
            self.nnz = ell.nnz
            return

        self.mode = "ell_allgather"
        self._leaves = (
            jax.device_put(jnp.asarray(ecol), sh),
            jax.device_put(jnp.asarray(eval_), sh),
        )
        self.nnz = ell.nnz

    @property
    def dtype(self):
        return np.dtype(self._leaves[1].dtype)

    def __mul__(self, x) -> DistSpMVExpr:
        return DistSpMVExpr(self, x)

    def apply(self, x, y, alpha: float = 1.0, append: bool = False) -> None:
        expr = alpha * DistSpMVExpr(self, x)
        y.assign(expr, "+=" if append else "=")

    def __repr__(self) -> str:
        return f"sparse.distributed[{self.n}x{self.m}] over {self.ndev} devices"
