"""Diagnose the own-FFT 2^24 cliff (708 GFLOP/s @2^22 -> ~190-320 @2^24).

Both sizes use 3-stage radix-256 plans, so the per-element stage count is
identical — the cliff must live in one of the stage COMPONENTS scaling
non-linearly.  Measure each component in isolation at both sizes,
interleaved in ONE process (cross-process swings +-30%):

  a) codelet matmul pass   (2r,r)@(r,m) einsum, planar one-pass form
  b) swapaxes transpose    (..., r, m) -> (..., m, r) + ravel
  c) twiddle generation    iota -> octant-reduced sincos at (r, m)
  d) full own-engine FFT   (the end-to-end number for reference)

Usage (real chip): python exp/fft24_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import importlib

F = importlib.import_module("vexcl_tpu.ops.fft")


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    while getattr(leaf, "ndim", 0) > 0:
        leaf = leaf[0]
    return float(jnp.real(leaf)) if jnp.iscomplexobj(leaf) else float(leaf)


def slope(step, args, lo=4, hi=16, reps=5):
    def make(inner):
        @jax.jit
        def run(*a):
            def body(i, a):
                return step(*a)
            return jax.lax.fori_loop(0, inner, lambda i, a: step(*a), a)
        return run

    runs = {k: make(k) for k in (lo, hi)}
    for k in (lo, hi):
        _fetch(runs[k](*args))
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter(); _fetch(runs[lo](*args)); tl = time.perf_counter() - t0
        t0 = time.perf_counter(); _fetch(runs[hi](*args)); th = time.perf_counter() - t0
        slopes.append((th - tl) / (hi - lo))
    return sorted(slopes)[len(slopes) // 2]


def probe(logn):
    n = 1 << logn
    r = 256
    m = n // r
    key = jax.random.PRNGKey(0)
    xr = jax.random.normal(key, (r, m), jnp.float32)
    xi = jax.random.normal(key, (r, m), jnp.float32)
    cr, ci = F._codelet_planar_np(r, -1.0, "float32")
    cr = jnp.asarray(cr); ci = jnp.asarray(ci)

    res = {}

    # a) one codelet matmul pass (returns both planes; sum to bound chain)
    def stage(xr, xi):
        ar, ai = F._cmatmul_radix(cr, ci, xr, xi)
        return ar, ai
    s = slope(lambda a, b: stage(a, b), (xr, xi))
    res["stage_matmul_ms"] = s * 1e3
    res["stage_matmul_GBs"] = 4 * n * 4 / s / 1e9  # 2 planes r + 2 w

    # b) transpose pass (swapaxes + reshape, same planar traffic)
    def tr(xr, xi):
        return (jnp.swapaxes(xr.reshape(m, r), 0, 1).reshape(r, m),
                jnp.swapaxes(xi.reshape(m, r), 0, 1).reshape(r, m))
    s = slope(tr, (xr, xi))
    res["transpose_ms"] = s * 1e3
    res["transpose_GBs"] = 4 * n * 4 / s / 1e9

    # c) twiddle generation + apply (the mul is what fuses in practice)
    def tw(xr, xi):
        trc, tis = F._twiddle_planar(r, m, -1.0, jnp.float32)
        return xr * trc - xi * tis, xr * tis + xi * trc
    s = slope(tw, (xr, xi))
    res["twiddle_ms"] = s * 1e3

    # d) full own-engine FFT (planar in/out to keep the chain bounded)
    plan = F._radix_plan(n, F._MAX_CODELET)
    def full(xr, xi):
        return F._fft_planar(xr, xi, -1.0, plan)
    xr1 = xr.reshape(-1)
    xi1 = xi.reshape(-1)
    s = slope(full, (xr1, xi1), lo=2, hi=8)
    res["full_ms"] = s * 1e3
    res["full_GFLOPs"] = 5 * n * logn / s / 1e9
    res["plan"] = plan
    return res


def main():
    print("device:", jax.devices()[0].device_kind)
    for rep in range(2):
        for logn in (22, 24):
            r = probe(logn)
            print(f"[rep {rep}] 2^{logn}:")
            for k, v in r.items():
                print(f"    {k}: {v if isinstance(v, tuple) else round(v, 2)}")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
