#!/usr/bin/env python
"""Compiled (non-interpret) evidence for the dist Pallas local phases
(VERDICT r3 missing #2 / next #3).

On the real chip, a 1-device mesh makes shard_map(pallas_call + ppermute
halos) compile under Mosaic for real — ppermute degenerates, the
composition does not.  The reference's analog is its fake-multi-device
fixture running the real runtime (tests/context_setup.hpp:24-38).

Asserts numeric parity with the single-device global kernels and measures
throughput for the BENCH keys (stencil_dist_GBs, dia_dist_GFLOPs,
scan_dist_Gelem_s).  The REAL guards decide the local phase (no
monkeypatching): this script asserts which path engaged.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bench import slope_seconds
import vexcl_tpu as vex


def main():
    rng = np.random.default_rng(0)
    mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
    print("mesh:", mesh)

    # ---- stencil: Pallas roll kernel as shard_map local phase ----------
    from vexcl_tpu.ops.pallas_stencil import (
        _local_pallas_stencil, stencil_pallas, stencil_pallas_dist)

    n = 1 << 22
    coeffs = [0.0625, 0.25, 0.375, 0.25, 0.0625]
    center = 2
    assert _local_pallas_stencil(n, len(coeffs), np.float32), \
        "real guard must engage the Pallas local phase"
    hx = rng.random(n, dtype=np.float32)
    x = jax.device_put(jnp.asarray(hx), NamedSharding(mesh, P("x")))

    y_dist = np.asarray(stencil_pallas_dist(x, coeffs, center, mesh, "x"))
    y_glob = np.asarray(stencil_pallas(jnp.asarray(hx), coeffs, center))
    err = np.abs(y_dist - y_glob).max()
    print("stencil dist vs global max err:", err)
    assert err == 0.0

    def step_d(v):
        return (stencil_pallas_dist(v, coeffs, center, mesh, "x")
                * np.float32(0.999)) % 1.0

    def step_g(v):
        return (stencil_pallas(v, coeffs, center) * np.float32(0.999)) % 1.0

    t_d = slope_seconds(step_d, x, lo=64, hi=576)
    t_g = slope_seconds(step_g, jnp.asarray(hx), lo=64, hi=576)
    print(f"stencil_dist_GBs: {2*n*4/t_d/1e9:.1f}   global: {2*n*4/t_g/1e9:.1f}")

    # ---- DIA: local Pallas phase over ppermute-halo'd x ----------------
    from vexcl_tpu.parallel.halo import with_halo
    from vexcl_tpu.sparse.pallas_dia import (
        _local_pallas_dia, dia_matvec_pallas, dia_matvec_pallas_roll)
    from vexcl_tpu.sparse.dia import DIA

    offsets = [-2, -1, 0, 1, 2]
    vals = rng.random((5, n), dtype=np.float32)
    lhalo, rhalo = 2, 2
    form = _local_pallas_dia(n, offsets, jnp.asarray(vals), jnp.float32)
    print("dia local form (real guard):", form)
    assert form in ("roll", "window")

    def dia_shard(vals_blk, x_blk):
        xw = with_halo(x_blk, "x", lhalo, rhalo)
        nb = x_blk.shape[0]
        if form == "roll":
            return dia_matvec_pallas_roll(nb, nb, offsets, vals_blk, xw,
                                          prepadded=True)
        return dia_matvec_pallas(nb, nb, offsets, vals_blk, xw,
                                 prepadded=True)

    dia_dist = jax.jit(jax.shard_map(
        dia_shard, mesh=mesh, in_specs=(P(None, "x"), P("x")),
        out_specs=P("x"), check_vma=False))

    vals_j = jax.device_put(jnp.asarray(vals), NamedSharding(mesh, P(None, "x")))
    y_dist = np.asarray(dia_dist(vals_j, x))
    y_glob = np.asarray(DIA.matvec(n, n, tuple(offsets), [jnp.asarray(vals)],
                                   jnp.asarray(hx)))
    err = np.abs(y_dist - y_glob).max() / np.abs(y_glob).max()
    print("dia dist vs global max rel err:", err)
    assert err < 1e-6

    def step_dia(v, vals_):
        return (dia_dist(vals_, v) * np.float32(0.999)) % 1.0

    t_d = slope_seconds(step_dia, x, lo=32, hi=288, extra=(vals_j,))
    nnz = 5 * n
    print(f"dia_dist_GFLOPs: {2*nnz/t_d/1e9:.1f}")

    # ---- scan: dist tail-carry with Pallas local cumsum ----------------
    from vexcl_tpu.ops.scan import _local_pallas_sum, _scan_impl_dist

    assert _local_pallas_sum(n, jnp.float32, None), \
        "real guard must engage the Pallas local cumsum"
    ctx = vex.Context(vex.Filter.Env)   # 1 real TPU device
    jfn = _scan_impl_dist(ctx, "add", None, False, False)
    y_dist = np.asarray(jfn(x, 0))
    y_glob = np.cumsum(hx, dtype=np.float32)
    err = np.abs(y_dist - y_glob).max() / np.abs(y_glob).max()
    print("scan dist vs numpy rel err:", err)
    assert err < 1e-4

    def step_s(v):
        return jfn(v, 0) * np.float32(1e-7)

    t_d = slope_seconds(step_s, x, lo=16, hi=128)
    print(f"scan_dist_Gelem_s: {n/t_d/1e9:.2f}")


if __name__ == "__main__":
    main()
