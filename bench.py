#!/usr/bin/env python
"""Benchmark harness mirroring the reference's examples/benchmark.cpp +
fft_benchmark.cpp (see SURVEY.md §6 / BASELINE.md).

Prints ONE JSON line on stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Headline metric: fused-elementwise bandwidth as % of HBM speed-of-light
(BASELINE.json target: >=85% on v5e).  All sub-benchmarks land in "extra".

Timing methodology (important on the axon TPU tunnel):
  * `block_until_ready` can acknowledge early and the tunnel adds large,
    noisy round-trip latency (~30 ms), so a timed region must end with a
    DATA FETCH and the fetch/dispatch overhead must be cancelled.
  * Each benchmark therefore runs an on-device chain of `inner` dependent
    iterations (lax.fori_loop, output feeds input so nothing can be cached
    or elided) at TWO chain lengths; the per-iteration time is the SLOPE
    (T_hi - T_lo) / (inner_hi - inner_lo), which cancels RTT, dispatch and
    fetch costs — the same spirit as the reference timing an enqueued batch
    of M kernels (benchmark.cpp:84-148).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import vexcl_tpu as vex  # noqa: E402

HBM_SOL = float(os.environ.get("VEXTPU_HBM_GBS", "819")) * 1e9


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    while getattr(leaf, "ndim", 0) > 0:
        leaf = leaf[0]
    return float(jnp.real(leaf)) if jnp.iscomplexobj(leaf) else float(leaf)


def slope_seconds(step, x0, lo=64, hi=512, reps=3, extra=()):
    """Per-iteration seconds of `step` (array -> array), measured as the
    slope between two chained-run lengths.

    Large device arrays the step needs must go in `extra` (passed as jit
    ARGUMENTS): closed-over arrays are embedded as program constants and
    blow the remote-compile request size (HTTP 413 at ~hundreds of MB).
    """

    def make(inner):
        @jax.jit
        def run(v, *ex):
            return jax.lax.fori_loop(0, inner, lambda i, a: step(a, *ex), v)

        return run

    runs = {inner: make(inner) for inner in (lo, hi)}
    for inner in (lo, hi):
        _fetch(runs[inner](x0, *extra))  # compile + warm

    def measure(inner):
        t0 = time.perf_counter()
        out = runs[inner](x0, *extra)
        _fetch(out)
        return time.perf_counter() - t0

    # median of PAIRWISE slopes over interleaved lo/hi pairs: each
    # back-to-back (lo, hi) pair yields its own slope, so slow drift in
    # the tunnel RTT cancels within the pair (median-of-times across the
    # whole run does not cancel drift — measured saxpy swinging 291-675
    # GB/s between full-suite runs).  Early-ACK deflation makes a pair's
    # slope negative/absurd; the median rejects it, with a sanity retry.
    for _attempt in range(3):
        slopes = []
        for _ in range(reps):
            tl = measure(lo)
            th = measure(hi)
            slopes.append((th - tl) / (hi - lo))
        slope = sorted(slopes)[len(slopes) // 2]
        if slope > 0:
            return slope
    return 1e-9


def bench_fused_elementwise(n=1 << 26):
    """a = (a + b + c*d) %% 1 — the reference's fused kernel a += b + c*d
    (benchmark.cpp:153-216): 4 reads + 1 write = 5 arrays.

    Two timing hazards on this runtime (see module docstring): chains that
    saturate to a fixed point/inf get elided, and working sets that fit
    VMEM never touch HBM (impossible GB/s).  So: bounded chaotic update
    (mod 1) over DISTINCT random arrays, 5 x 256 MiB per iteration."""
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.random(n, dtype=np.float32))
    c = jnp.asarray(rng.random(n, dtype=np.float32))
    d = jnp.asarray(rng.random(n, dtype=np.float32))
    x0 = jnp.asarray(rng.random(n, dtype=np.float32))

    def step(v, b_, c_, d_):
        # LICM guard (r4, exp/hbm_probe.py + /tmp A/B): XLA hoists the
        # loop-invariant product c*d out of the chain — EVEN THROUGH an
        # optimization_barrier (measured: raw 874.7, barriered 863.1,
        # truly-pinned 708.2 GB/s) — so the loop streamed 4 arrays while
        # the formula counts 5 (1.25x flattery: the r1-r3 ">100% of SoL"
        # headline).  Tying c to the carry scalar makes the product
        # provably iteration-dependent; the extra flop is free.
        return (v + b_ + (c_ + v[0] * np.float32(1e-30)) * d_) % 1.0

    def step_bound(v, b_, c_, d_):
        # same 4-read+1-write byte mix with left-associated adds (every
        # partial sum involves v, so nothing is hoistable): the measured
        # achievable stream rate for this mix, taken back-to-back in the
        # same process so tunnel/device drift cancels in the ratio
        # (cross-process anchors swing +-15%: copy measured 634 one run,
        # 749 the next).  A/B: coupled-fused 708.2 vs adds 701.4 — the
        # library form sits at the mix bound.
        return (v + b_ + c_ + d_) % 1.0

    t = slope_seconds(step, x0, lo=8, hi=48, extra=(b, c, d))
    tb = slope_seconds(step_bound, x0, lo=8, hi=48, extra=(b, c, d))
    return 5 * n * 4 / t / 1e9, 5 * n * 4 / tb / 1e9


def bench_copy(n=1 << 26):
    """Pure device stream copy bound: 1 read + 1 write (the achievable-
    GB/s anchor the headline is reconciled against, VERDICT r3 weak #1)."""
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(rng.random(n, dtype=np.float32))
    t = slope_seconds(lambda v: (v * np.float32(1.0000001)) % 1.0, x0,
                      lo=8, hi=48)
    return 2 * n * 4 / t / 1e9, t


def bench_saxpy(n=1 << 26):
    """a = (2*a + b) %% 1 (benchmark.cpp:84-148): 2 reads + 1 write."""
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.random(n, dtype=np.float32))
    x0 = jnp.asarray(rng.random(n, dtype=np.float32))
    t = slope_seconds(lambda v, b_: (2.0 * v + b_) % 1.0, x0,
                      lo=8, hi=48, extra=(b,))
    return 3 * n * 4 / t / 1e9, t


def bench_reduction(n=1 << 26):
    """sum(a*b) (benchmark.cpp:220-280): chain mutates a so each iteration
    re-reads both arrays from HBM."""
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.random(n, dtype=np.float32))
    x0 = jnp.asarray(rng.random(n, dtype=np.float32))

    from vexcl_tpu.ops.pallas_reduce import pallas_map_reduce

    def step(v, b_):
        # the library's fused map-reduce kernel (Reductor fast path)
        s = pallas_map_reduce(
            [v, b_], [], lambda blks, sc: blks[0] * blks[1], "SUM"
        )
        return (v + b_) % 1.0 + s * 1e-30

    t = slope_seconds(step, x0, lo=8, hi=48, extra=(b,))
    # per iteration: reduce reads v+b (pallas map-reduce kernel) and the
    # chain update reads v+b / writes v -> 5 passes of n; report achieved
    # bandwidth over that total traffic
    return 5 * n * 4 / t / 1e9, t


def bench_stencil(n=1 << 26, w=5):
    c = np.linspace(0.1, 0.5, w)
    coeff = jnp.asarray(c / c.sum(), dtype=jnp.float32)  # sums to 1
    x0 = jnp.asarray(np.random.default_rng(3).random(n, dtype=np.float32))

    from vexcl_tpu.ops.pallas_stencil import stencil_pallas, use_pallas_stencil

    cnp = np.asarray(c / c.sum(), dtype=np.float32)

    post = lambda v: (v + 0.318) % 1.0  # bounded, never settles

    def step(x):
        if use_pallas_stencil(n, w, x.dtype):
            # post-op fused into the kernel: true 1-read+1-write step
            return stencil_pallas(x, cnp, w // 2, post=post)
        xp = jnp.pad(x, (w // 2, w - 1 - w // 2), mode="edge")
        y = jnp.zeros_like(x)
        for k in range(w):
            y = y + coeff[k] * xp[k : k + n]
        return post(y)

    t = slope_seconds(step, x0, lo=8, hi=48)

    # in-place (donated) variant: the same-buffer r+w stream runs ~2x
    # faster on this runtime (docs/tpu_kernel_notes.md); the kernel is
    # old-value-safe so x <- stencil(x) is well-defined (the reference
    # cannot express this at all)
    t_ip = t
    if use_pallas_stencil(n, w, np.float32):
        step_ip = lambda x: stencil_pallas(x, cnp, w // 2, post=post,
                                           donate=True)
        t_ip = slope_seconds(step_ip, x0, lo=8, hi=48)
    return 2 * w * n / t / 1e9, 2 * n * 4 / t / 1e9, 2 * n * 4 / t_ip / 1e9


def bench_spmv(m=64, fmt=None):
    """7-pt Poisson m^3 (benchmark.cpp:353-478); auto format -> DIA."""
    from vexcl_tpu.utils.poisson import poisson_7pt

    ptr, col, val = poisson_7pt(m, dtype=np.float32)
    n = m ** 3
    A = vex.SpMat(n, n, ptr, col, val, fmt=fmt)
    nnz = int(ptr[-1])
    dev = A.device
    x0 = jnp.asarray(np.random.rand(n).astype(np.float32))
    leaves = dev.leaves()
    # cheap chain bound (values shrink toward zero, which times identically):
    # a sin() here costs a full extra HBM pass + transcendental per link and
    # understated the 256^3 kernel by ~25%
    step = lambda x, *lv: dev.apply_leaves(lv, x) * 5e-5
    # chain lengths scaled so the slope rises above the ~5-30 ms tunnel
    # noise: small problems need thousands of chained SpMVs (a 64^3 SpMV
    # is ~7 us at 128Ki blocks — a 2048-link chain left only ~14 ms of
    # differential signal and produced impossible 3000-GFLOP/s readings)
    lo, hi = (1024, 8192) if n <= 1 << 19 else (
        (128, 1024) if n <= 1 << 22 else (16, 96))
    t = slope_seconds(step, x0, lo=lo, hi=hi, extra=leaves)
    return (2 * nnz + n) / t / 1e9, t


def _random_lognormal_csr(n, mean=16.0, sigma=0.8, seed=0):
    """Random irregular matrix: lognormal row lengths (mean ~16), uniform
    random columns, f32 — the general-matrix workload the reference's
    hybrid-ELL kernel exists for (hybrid_ell.inl; VERDICT r4 #1)."""
    rng = np.random.default_rng(seed)
    mu = np.log(mean) - sigma * sigma / 2
    lens = np.maximum(1, rng.lognormal(mu, sigma, n).astype(np.int64))
    ptr = np.concatenate([[0], np.cumsum(lens)])
    nnz = int(ptr[-1])
    col = rng.integers(0, n, nnz)
    val = rng.standard_normal(nnz).astype(np.float32)
    return ptr, col, val, nnz


def bench_spmv_random(n=1 << 20):
    """Shuffle-routed SELL-R on the random irregular matrix
    (sparse/shuffle.py): expand-gather + Benes route + dense row sums.
    Also reports host-side construction seconds (VERDICT r4 #3)."""
    from vexcl_tpu.sparse.shuffle import SELLR

    ptr, col, val, nnz = _random_lognormal_csr(n)
    tc0 = time.perf_counter()
    A = SELLR(n, n, ptr, col, val)
    t_construct = time.perf_counter() - tc0
    x0 = jnp.asarray(np.random.rand(n).astype(np.float32))
    leaves = A.leaves()

    def step(x, *lv):
        y = A.apply_leaves(lv, x)
        return (x * np.float32(0.999) + y * np.float32(1e-4)) % 1.0

    t = slope_seconds(step, x0, lo=16, hi=144, extra=leaves)
    return 2 * nnz / t / 1e9, t_construct


def bench_spmv_random_naive(n=1 << 20, w=24):
    """The same matrix through the naive whole-table-gather ELL matvec —
    the form every TPU SpMV takes without the shuffle route (~0.1-0.25
    GFLOP/s: XLA gathers are index-bound at ~0.14 Gelem/s)."""
    ptr, col, val, _ = _random_lognormal_csr(n)
    lens = np.diff(ptr)
    rl = np.minimum(lens, w)
    # vectorized ELL repack (the r4 per-row python loop cost minutes of
    # the bench budget at n=1M)
    within = np.arange(len(col)) - np.repeat(ptr[:-1], lens)
    rows_of = np.repeat(np.arange(n), lens)
    keep = within < w
    ecol = np.zeros((n, w), np.int32)
    evals = np.zeros((n, w), np.float32)
    maskp = np.zeros((n, w), np.float32)
    ecol[rows_of[keep], within[keep]] = col[keep]
    evals[rows_of[keep], within[keep]] = val[keep]
    maskp[rows_of[keep], within[keep]] = 1
    cj, vj, mj = jnp.asarray(ecol), jnp.asarray(evals), jnp.asarray(maskp)
    x0 = jnp.asarray(np.random.rand(n).astype(np.float32))

    def step(x, cj_, vj_, mj_):
        y = jnp.sum(vj_ * mj_ * jnp.take(x, cj_, axis=0), axis=1)
        return (x * np.float32(0.999) + y * np.float32(1e-4)) % 1.0

    t = slope_seconds(step, x0, lo=1, hi=5, extra=(cj, vj, mj))
    return 2 * int(rl.sum()) / t / 1e9, t


def bench_dist_pallas_local(n=1 << 22):
    """Compiled (non-interpret) evidence for the dist Pallas local phases
    (VERDICT r4 #3): on a real-chip 1-device mesh, shard_map(pallas_call +
    ppermute halos) compiles under Mosaic for real; the REAL guards decide
    the path.  Returns stencil/dia/scan throughputs + parity checks."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vexcl_tpu.ops.pallas_stencil import (
        _local_pallas_stencil, stencil_pallas, stencil_pallas_dist)
    from vexcl_tpu.parallel.halo import with_halo
    from vexcl_tpu.sparse.pallas_dia import (
        _local_pallas_dia, dia_matvec_pallas, dia_matvec_pallas_roll)
    from vexcl_tpu.ops.scan import _local_pallas_sum, _scan_impl_dist

    out = {}
    rng = np.random.default_rng(0)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("x",))
    hx = rng.random(n, dtype=np.float32)
    x = jax.device_put(jnp.asarray(hx), NamedSharding(mesh, P("x")))

    # stencil
    coeffs = [0.0625, 0.25, 0.375, 0.25, 0.0625]
    assert _local_pallas_stencil(n, len(coeffs), np.float32)
    y_d = np.asarray(stencil_pallas_dist(x, coeffs, 2, mesh, "x"))
    y_g = np.asarray(stencil_pallas(jnp.asarray(hx), coeffs, 2))
    assert np.array_equal(y_d, y_g), "dist stencil != global kernel"
    # chain lengths: the local stencil is ~50 us/iter, so the 64/576
    # differential was ~27 ms — inside the +-20 ms RTT noise band (r5
    # trial vs r5 partial swung 535 vs 644 GB/s).  128/1152 puts the
    # signal at ~60 ms.
    t = slope_seconds(
        lambda v: (stencil_pallas_dist(v, coeffs, 2, mesh, "x")
                   * np.float32(0.999)) % 1.0, x, lo=128, hi=1152)
    out["stencil_dist_GBs"] = round(2 * n * 4 / t / 1e9, 1)

    # DIA (the dia_halo local phase composition from sparse/distributed.py)
    offsets = [-2, -1, 0, 1, 2]
    vals = rng.random((5, n), dtype=np.float32)
    # DIA invariant (sparse/dia.py:14): vals[k, i] = A[i, i+off_k] is ZERO
    # where i+off_k is out of range — the dist path's edge replication
    # relies on it (sparse/distributed.py:126-128)
    for k, off in enumerate(offsets):
        if off < 0:
            vals[k, :-off] = 0.0
        elif off > 0:
            vals[k, n - off:] = 0.0
    form = _local_pallas_dia(n, offsets, jnp.asarray(vals), jnp.float32)
    assert form in ("roll", "window"), form

    def dia_shard(vals_blk, x_blk):
        xw = with_halo(x_blk, "x", 2, 2)
        nb = x_blk.shape[0]
        if form == "roll":
            return dia_matvec_pallas_roll(nb, nb, offsets, vals_blk, xw,
                                          prepadded=True)
        return dia_matvec_pallas(nb, nb, offsets, vals_blk, xw,
                                 prepadded=True)

    dia_dist = jax.jit(jax.shard_map(
        dia_shard, mesh=mesh, in_specs=(P(None, "x"), P("x")),
        out_specs=P("x"), check_vma=False))
    vals_j = jax.device_put(jnp.asarray(vals),
                            NamedSharding(mesh, P(None, "x")))
    from vexcl_tpu.sparse.dia import DIA
    y_d = np.asarray(dia_dist(vals_j, x))
    y_g = np.asarray(DIA.matvec(n, n, tuple(offsets), [jnp.asarray(vals)],
                                jnp.asarray(hx)))
    assert np.allclose(y_d, y_g, rtol=1e-6), "dist DIA != global kernel"
    t = slope_seconds(
        lambda v, vl: (dia_dist(vl, v) * np.float32(0.999)) % 1.0,
        x, lo=64, hi=576, extra=(vals_j,))
    out["dia_dist_GFLOPs"] = round(2 * 5 * n / t / 1e9, 1)

    # scan (dist tail-carry, Pallas local cumsum)
    assert _local_pallas_sum(n, jnp.float32, None)
    ctx = vex.Context(vex.Filter.Env)
    jfn = _scan_impl_dist(ctx, "add", None, False, False)
    y_d = np.asarray(jfn(x, 0))
    assert np.allclose(y_d, np.cumsum(hx, dtype=np.float32),
                       rtol=1e-4, atol=1e-2), "dist scan mismatch"
    # ~84 us/iter: 16/128 put the differential at ~9 ms, deep inside
    # the RTT noise (recorded 84.4 then 16.7 Gelem/s across r5 runs)
    t = slope_seconds(lambda v: jfn(v, 0) * np.float32(1e-7), x,
                      lo=128, hi=1152)
    out["scan_dist_Gelem_s"] = round(n / t / 1e9, 2)

    # SELL-R uniform shards (VERDICT r4 weak #6): the distributed SpMV's
    # local phase — sellr_uniform_shards under shard_map — compiled under
    # Mosaic on the real chip, with a CSR-oracle parity check
    ns = 1 << 16
    ptr_s, col_s, val_s, nnz_s = _random_lognormal_csr(ns, seed=3)
    from vexcl_tpu.sparse.shuffle import sellr_uniform_shards

    tmpl, stacked = sellr_uniform_shards(ns, ns, ptr_s, col_s, val_s, 1)
    sh = lambda a: NamedSharding(mesh, P("x", *([None] * (a.ndim - 1))))
    lv = tuple(jax.device_put(jnp.asarray(a), sh(a)) for a in stacked)

    def sellr_shard(*args):
        *leaves, x_blk = args
        xg = jax.lax.all_gather(x_blk, "x", tiled=True)
        return tmpl.apply_leaves(tuple(a[0] for a in leaves), xg)

    sellr_dist = jax.jit(jax.shard_map(
        sellr_shard, mesh=mesh,
        in_specs=tuple(P("x", *([None] * (a.ndim - 1))) for a in stacked)
        + (P("x"),),
        out_specs=P("x"), check_vma=False))
    hx_s = rng.random(ns, dtype=np.float32)
    x_s = jax.device_put(jnp.asarray(hx_s), NamedSharding(mesh, P("x")))
    y_d = np.asarray(sellr_dist(*lv, x_s))
    rows_of = np.repeat(np.arange(ns), np.diff(ptr_s))
    y_ref = np.bincount(rows_of, weights=val_s.astype(np.float64)
                        * hx_s.astype(np.float64)[col_s], minlength=ns)
    assert np.allclose(y_d, y_ref, rtol=1e-4, atol=1e-4), \
        "dist SELLR != CSR oracle"
    t = slope_seconds(
        lambda v, *lv_: (v * np.float32(0.999)
                         + sellr_dist(*lv_, v) * np.float32(1e-4)) % 1.0,
        x_s, lo=64, hi=576, extra=lv)
    out["sellr_dist_GFLOPs"] = round(2 * nnz_s / t / 1e9, 2)
    return out


def bench_spmv_ccsr(m=64):
    """CCSR SpMV (benchmark.cpp:481-607): 27 shared row patterns."""
    from vexcl_tpu.utils.poisson import poisson_7pt_ccsr

    idx, row, col, val = poisson_7pt_ccsr(m, dtype=np.float32)
    n = m ** 3
    A = vex.SpMatCCSR(n, n, idx, row, col, val)
    nnz = A.nnz_expanded if hasattr(A, "nnz_expanded") else 7 * n

    if A._cached_coeffs is not None:
        # r3 DEFAULT path: the expansion is cached at construction
        # (AUTO under the VEXTPU_CCSR_CACHE_MB budget), so the per-apply
        # kernel is the DIA roll over the bf16-exact planes — this is
        # what a user's y = A*x runs.  The coeffs ride as a chain extra
        # (closure constants blow the remote-compile request size).
        coeffs = A._cached_coeffs

        def step(x, cf):
            # cf is legitimately loop-invariant (the RESIDENT matrix —
            # exactly like the DIA bench's value planes); only x chains
            return A._banded_apply(cf, x) * 5e-5

        x0 = jnp.asarray(np.random.rand(n).astype(np.float32))
        # ~12 us/link at the cached path's rate: 7168-link differential
        # puts the signal ~86 ms above the RTT noise (CLAUDE.md rule)
        t = slope_seconds(step, x0, lo=1024, hi=8192, extra=(coeffs,))
        return (2 * 7 * n + n) / t / 1e9, t

    def step(x, idx_a):
        # memory-bound fallback: one-hot coefficient expansion per apply
        # feeding the DIA roll kernel (sparse/spmat.py banded_matvec);
        # tie idx to the carry so XLA cannot hoist it out of the loop
        idx_dep = idx_a + (x[0] * 0).astype(idx_a.dtype)
        return A.banded_matvec(idx_dep, x) * 5e-5

    x0 = jnp.asarray(np.random.rand(n).astype(np.float32))
    t = slope_seconds(step, x0, lo=1024, hi=8192, extra=(A._leaves[0],))
    return (2 * 7 * n + n) / t / 1e9, t


def bench_sort(n=1 << 24):
    x0 = jax.random.randint(jax.random.PRNGKey(0), (n,), 0, 1 << 30,
                            dtype=jnp.int32)

    def step(k):
        # cheap bit-mix so every iteration sorts fresh keys
        k = (k * np.int32(-1640531535)) ^ (k >> 7)  # 0x9E3779B1 as i32
        return jax.lax.sort(k)

    t = slope_seconds(step, x0, lo=4, hi=24)
    return n / t / 1e6, t


def bench_scan(n=1 << 24):
    from vexcl_tpu.ops.pallas_scan import pallas_cumsum, use_pallas_scan

    x0 = jnp.asarray(np.random.rand(n).astype(np.float32))
    # chain-bounding post must be CHEAP: a fused transcendental dominates the
    # measurement (cos post: 28.8 Gelem/s vs 50.7 with the mul — the kernel
    # itself is the same).  v*1e-7 keeps the chain bounded: the cumsum tail
    # is ~n*mean, so the next mean is ~0.8x the previous.
    post = lambda v: v * 1e-7
    if use_pallas_scan(x0, None):
        step = lambda v: pallas_cumsum(v, post=post)
    else:
        step = lambda v: post(jnp.cumsum(v))
    t = slope_seconds(step, x0, lo=16, hi=128)
    return n / t / 1e9, t


def bench_scan_inplace(n=1 << 24):
    """cumsum with dst=src (donated, input_output_aliases) — the library's
    in-place scan path (ops/scan.py:181-188; reference scan.hpp:332-458
    scans in place when output==input).  VERDICT r4 #6: measure the ~2x
    1r+1w lever and state the ceiling (docs/benchmarking.md)."""
    from vexcl_tpu.ops.pallas_scan import pallas_cumsum, use_pallas_scan

    x0 = jnp.asarray(np.random.rand(n).astype(np.float32))
    post = lambda v: v * 1e-7
    if use_pallas_scan(x0, None):
        step = lambda v: pallas_cumsum(v, post=post, donate=True)
    else:
        step = lambda v: post(jnp.cumsum(v))
    t = slope_seconds(step, x0, lo=16, hi=128)
    return n / t / 1e9, t


def bench_scan_max(n=1 << 24):
    """Running maximum, 16M f32 (the min/max monoid scan kernel,
    ops/pallas_monoid_scan.py; scan.hpp with a MAX functor analog)."""
    from vexcl_tpu.ops.pallas_monoid_scan import (
        pallas_cummax, use_pallas_monoid_scan)

    x0 = jnp.asarray(
        np.random.default_rng(5).standard_normal(n).astype(np.float32))
    if use_pallas_monoid_scan(x0, "max"):
        step = lambda v: pallas_cummax(v * -0.999)  # sign flip: no settling
    else:
        step = lambda v: jax.lax.associative_scan(jnp.maximum, v * -0.999)
    t = slope_seconds(step, x0, lo=16, hi=128)
    return n / t / 1e9, t


def bench_rng(n=1 << 24):
    from vexcl_tpu.ops.random import philox4x32

    x0 = jnp.arange(n, dtype=jnp.uint32)

    def step(idx):
        z = jnp.zeros_like(idx)
        b = philox4x32(idx, z, z, z, jnp.uint32(42), jnp.uint32(0))
        return b[0]  # feeds next iteration: fresh counters each time

    t = slope_seconds(step, x0, lo=16, hi=128)
    return n / t / 1e9, t


def bench_sort_by_key(n=1 << 24):
    """16M (u32 key, f32 val) pairs (BASELINE.md config; sort.hpp:2171 —
    the library's sort_by_key compiles to exactly this lax.sort)."""
    k0 = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, 1 << 30,
                            dtype=jnp.int32)
    v0 = jnp.asarray(np.random.rand(n).astype(np.float32))

    def step(k, v):
        k = (k * np.int32(-1640531535)) ^ (k >> 7)  # fresh keys per link
        k, v = jax.lax.sort((k, v), num_keys=1)
        return k, v

    # the carry is a (keys, vals) pytree; slope_seconds/fori_loop are
    # pytree-transparent
    t = slope_seconds(lambda kv: step(*kv), (k0, v0), lo=4, hi=24)
    return n / t / 1e6, t


def _segscan_step(n, seg, keys0, v0):
    """The library's scan_by_key core: Pallas single-pass segmented
    cumsum on TPU (ops/pallas_segscan.py), associative_scan fallback
    elsewhere.  The XLA fallback at 16M does not finish a measurement in
    10 min on the tunnel, so the fallback chain is shortened."""
    from vexcl_tpu.ops.pallas_segscan import (
        pallas_segmented_cumsum, use_pallas_segscan)

    if use_pallas_segscan(keys0, v0, None, None):
        def step(v, keys):
            return pallas_segmented_cumsum(keys, v) * (1.0 / seg)
        return step, (16, 128)

    def step(v, keys):
        kd = keys + (v[0] * 0).astype(keys.dtype)
        flags = jnp.concatenate([jnp.ones((1,), bool), kd[1:] != kd[:-1]])

        def combine(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, jnp.where(fb, vb, va + vb)

        _, incl = jax.lax.associative_scan(combine, (flags, v))
        return incl * (1.0 / seg)

    return step, (2, 8)


def bench_scan_by_key(n=1 << 24, seg=64):
    """Segmented inclusive scan, 16M f32, avg segment 64
    (scan_by_key.hpp:67-722 analog)."""
    keys0 = jnp.asarray((np.arange(n) // seg).astype(np.int32))
    v0 = jnp.asarray(np.random.rand(n).astype(np.float32))
    step, (lo, hi) = _segscan_step(n, seg, keys0, v0)
    t = slope_seconds(step, v0, lo=lo, hi=hi, extra=(keys0,))
    return n / t / 1e9, t


def bench_reduce_by_key(n=1 << 24, seg=64):
    """reduce_by_key of 16M f32 by i32 runs (reduce_by_key.hpp:435-580
    analog).  r3 TPU path (ops/reduce_by_key.py fused pipeline): ONE
    Pallas kernel does the segmented scan + per-row compaction
    (ops/pallas_rbk.py), then a rows x kpad_row sized sort assembles —
    replacing the r2 three-dispatch pipeline whose full-block bit-serial
    compaction alone cost 2.36 of 3.68 ms (exp/rbk_stage_probe.py; r1
    full-N sort compaction: 0.31 Gelem/s, XLA scatter: 0.14).  The
    chain assembles at the static kpad_row the library reaches after
    its single count sync — measured from a stage-1 probe outside the
    timed chain, exactly mirroring the library's bucket formula
    (seg=64 puts tails at lanes 63/127 of every row -> cmax_row 2 ->
    bucket 2; the r3 bench hardcoded 4 and sorted twice the elements,
    understating the shipped path — code-review r3 finding)."""
    keys0 = jnp.asarray((np.arange(n) // seg).astype(np.int32))
    v0 = jnp.asarray(np.random.rand(n).astype(np.float32))

    from vexcl_tpu.ops.pallas_rbk import (
        pallas_segscan_rowcompact, use_pallas_rbk)
    from vexcl_tpu.ops.pallas_segscan import use_pallas_segscan

    fused = use_pallas_rbk((keys0,), v0, n)
    pallas = use_pallas_segscan(keys0, v0, None, None)
    kpad_r = 2
    if fused:
        eq0 = keys0[:-1] == keys0[1:]
        tails0 = jnp.concatenate([(~eq0).astype(jnp.int8),
                                  jnp.ones((1,), jnp.int8)])
        pos0, _, _ = pallas_segscan_rowcompact(tails0, v0, keys0)
        cmax = int(jnp.max(jnp.sum((pos0 >= 0.0).astype(jnp.int32),
                                   axis=1)))
        kpad_r = min(128, max(2, -(-cmax // 2) * 2))  # reduce_by_key.py bucket

    def step(v, keys):
        kd = keys + (v[0] * 0).astype(keys.dtype)
        eq = kd[:-1] == kd[1:]
        tails = jnp.concatenate([(~eq).astype(jnp.int8),
                                 jnp.ones((1,), jnp.int8)])
        if fused:
            pos, incl_c, keys_c = pallas_segscan_rowcompact(tails, v, kd)
            rows = pos.shape[0]
            valid = pos[:, :kpad_r] >= 0.0
            flat = jnp.arange(rows * kpad_r, dtype=jnp.int32)
            sortkey = jnp.where(valid.reshape(-1), flat,
                                jnp.int32(2 ** 31 - 1))
            _, out, _k = jax.lax.sort(
                (sortkey, incl_c[:, :kpad_r].reshape(-1),
                 keys_c[:, :kpad_r].reshape(-1)), num_keys=1)
            M = min(n, rows * kpad_r)
            return (v + jnp.pad(out[:M], (0, n - M)) * 1e-7) % 1.0
        heads = jnp.concatenate([jnp.ones((1,), bool), ~eq])
        if pallas:
            from vexcl_tpu.ops.pallas_segscan import pallas_segmented_cumsum

            incl = pallas_segmented_cumsum(kd, v)
        else:
            def combine(a, b):
                fa, va = a
                fb, vb = b
                return fa | fb, jnp.where(fb, vb, va + vb)

            _, incl = jax.lax.associative_scan(
                combine, (heads, v))
        seg_id = jnp.cumsum(heads) - 1
        sk = jnp.where(tails > 0, seg_id, jnp.int32(2 ** 30))
        _, out = jax.lax.sort((sk, incl), num_keys=1)
        return out * (1.0 / seg)  # compacted sums feed the next link

    lo, hi = (8, 48) if fused else ((4, 16) if pallas else (2, 8))
    t = slope_seconds(step, v0, lo=lo, hi=hi, extra=(keys0,))
    return n / t / 1e9, t


def bench_rng_threefry(n=1 << 24):
    from vexcl_tpu.ops.random import threefry2x32

    x0 = jnp.arange(n, dtype=jnp.uint32)

    def step(idx):
        b = threefry2x32(idx, jnp.zeros_like(idx), jnp.uint32(42),
                         jnp.uint32(0))
        return b[0]

    # shorter chains than philox: 20 unrolled rounds per link make the
    # 128-link chain compile alone cost ~6 min on the tunnel
    t = slope_seconds(step, x0, lo=8, hi=48)
    return n / t / 1e9, t


def bench_mba(n=1 << 24, nsamp=4096):
    """2-D MBA scattered-interpolation evaluation at 16M query points
    (examples/mba_benchmark.cpp analog, 6-level fit).  r3 TPU design:
    the level hierarchy is flattened host-side into ONE control lattice
    (append_refined, mba.hpp:417-444) and the device fetches all 16
    taps of a query with ONE widened patch-row gather — TPU gathers are
    index-bound, so one 16-wide row gather beats 16 scalar gathers ~50x
    (probe: 369 vs 7.3 Mpts/s); the unflattened scalar-gather form
    measured 1.4 Mpts/s."""
    import vexcl_tpu as vex
    from vexcl_tpu.ops.mba import mba_device_eval

    rng_l = np.random.default_rng(7)
    sx, sy = rng_l.random(nsamp), rng_l.random(nsamp)
    sv = np.sin(7 * sx) * np.cos(5 * sy)
    surf = vex.mba(lo=(-0.01, -0.01), hi=(1.01, 1.01), coords=(sx, sy),
                   values=sv, grid=(8, 8), levels=6)
    patch = (surf._patch_dev.astype(jnp.float32)
             if surf._patch_dev is not None else None)
    q0 = jnp.asarray(rng_l.random(n, dtype=np.float32))
    qy0 = jnp.asarray(rng_l.random(n, dtype=np.float32))

    def step(q, qy, *tabs):
        if patch is not None:
            out = mba_device_eval(surf.lo, surf.hi, surf.grids, None,
                                  [q, qy], patch=tabs[0])
        else:
            out = mba_device_eval(surf.lo, surf.hi, surf.grids,
                                  list(tabs), [q, qy])
        # cheap bounded remap keeps queries in-domain without settling
        return (q * 0.993 + 0.003 + out * 1e-3) % 1.0

    tabs = ((patch,) if patch is not None
            else tuple(l.astype(jnp.float32) for l in surf._lattices_dev))
    t = slope_seconds(step, q0, lo=8, hi=40, extra=(qy0,) + tabs)
    return n / t / 1e6, t


def bench_lorenz(n=1 << 22):
    """Lorenz-ensemble RK4 — the reference's flagship SISC workload
    (examples/symbolic.cpp; the published claim is expression-template
    overhead within ~10-20% of hand-written CUDA).  Here: the
    generator-recorded kernel chained on device vs a hand-written jax
    RK4 — the overhead ratio is the framework-cost headline."""
    from vexcl_tpu.models import LorenzEnsemble

    m = LorenzEnsemble(n, dtype=np.float32)
    fn = m._step.as_function()
    R = m.R.array
    sigma, b, dt = 10.0, 8.0 / 3.0, 0.01

    def raw_step(s, R):
        def f(st):
            x, y, z = st
            return (sigma * (y - x), R * x - y - x * z, x * y - b * z)

        x, y, z = s
        k1 = f(s)
        s2 = tuple(v + 0.5 * dt * k for v, k in zip(s, k1))
        k2 = f(s2)
        s3 = tuple(v + 0.5 * dt * k for v, k in zip(s, k2))
        k3 = f(s3)
        s4 = tuple(v + dt * k for v, k in zip(s, k3))
        k4 = f(s4)
        return tuple(
            v + dt / 6.0 * (a + 2 * p + 2 * q + r)
            for v, a, p, q, r in zip(s, k1, k2, k3, k4)
        )

    s0 = (m.x.array, m.y.array, m.z.array)
    gen_step = lambda s, R_: tuple(fn(*s, R_))

    # the OVERHEAD RATIO is the headline: measure both chains
    # interleaved per rep so device-state drift cancels inside each
    # ratio sample (separate slope_seconds calls measured minutes apart
    # swung the ratio 0.99-1.19).  Chain lengths must put the
    # differential well above the +-20 ms RTT noise: one RK4 step on the
    # 4.2M ensemble is ~65 us, so hi-lo = 2048 steps gives a ~130 ms
    # signal (the r2 hi-lo = 448 gave ~29 ms — noise-scale, and the
    # ratio swung 0.97..1.26 across rounds because of it)
    lo, hi = 256, 2304
    runs = {}
    for tag, step in (("gen", gen_step), ("raw", raw_step)):
        for inner in (lo, hi):
            jf = jax.jit(lambda s, R_, inner=inner, step=step:
                         jax.lax.fori_loop(0, inner,
                                           lambda i, a: step(a, R_), s))
            _fetch(jf(s0, R))
            runs[tag, inner] = jf

    def one_slope(tag):
        t0 = time.perf_counter(); _fetch(runs[tag, lo](s0, R))
        tl = time.perf_counter() - t0
        t0 = time.perf_counter(); _fetch(runs[tag, hi](s0, R))
        th = time.perf_counter() - t0
        return (th - tl) / (hi - lo)

    ratios, gens = [], []
    for _ in range(5):
        tg = one_slope("gen")
        tr = one_slope("raw")
        if tg > 0 and tr > 0:
            ratios.append(tg / tr)
            gens.append(tg)
    if not gens:
        return 0.0, 1.0
    t_gen = sorted(gens)[len(gens) // 2]
    return n / t_gen / 1e9, sorted(ratios)[len(ratios) // 2]


def bench_fft(n=1 << 20):
    from vexcl_tpu.ops.fft import Plan

    # A/B the two engines explicitly: 2^20 sits inside the auto-route
    # window, so the "xla" row must pin the XLA FFT HLO
    os.environ["VEXTPU_FFT_AUTO"] = "0"
    plan = Plan((n,), None, False, np.complex64)          # xla engine
    os.environ.pop("VEXTPU_FFT_AUTO", None)
    plan_ct = Plan((n,), None, False, np.complex64, impl="ct")
    x0 = jax.jit(lambda r: r.astype(jnp.complex64))(
        jnp.asarray(np.random.rand(n).astype(np.float32)))
    # cheap chain bound: |FFT| grows ~N per link, so a 1e-7 scale contracts
    # (0.105x per link); the previous cos(abs(.)) bound cost an extra full
    # pass + transcendental per link
    # chain-length SNR (docs/benchmarking.md rule 7): the ct engine runs
    # ~0.11 ms/link at 2^20, so hi-lo must exceed ~200 links to put the
    # differential above the +-20 ms tunnel RTT noise
    t = slope_seconds(lambda v: plan(v) * 1e-7, x0, lo=16, hi=224)
    t_ct = slope_seconds(lambda v: plan_ct(v) * 1e-7, x0, lo=16, hi=224)
    gf = 5 * n * np.log2(n) / 1e9
    return gf / t, gf / t_ct


def bench_fft_sweep():
    """FFT size sweep per the reference contract (fft_benchmark.cpp:29-231):
    1-D powers of two 2^10..2^24, one 2-D, one non-pow2 (Bluestein), both
    engines at 2^20 (bench_fft).  GFLOPS = 5 N log2 N / t."""
    from vexcl_tpu.ops.fft import Plan

    out = {}

    def run_1d(n, lo, hi, impl=None):
        plan = Plan((n,), None, False, np.complex64,
                    **({"impl": impl} if impl else {}))
        x0 = jax.jit(lambda r: r.astype(jnp.complex64))(
            jnp.asarray(np.random.rand(n).astype(np.float32)))
        t = slope_seconds(lambda v: plan(v) * 1e-7, x0, lo=lo, hi=hi)
        return 5 * n * np.log2(n) / 1e9 / t

    # chain lengths: small transforms are ~us-class, need long chains to
    # rise above the tunnel RTT noise (docs/benchmarking.md rule 7)
    out["fft_2^10_GFLOPs"] = round(run_1d(1 << 10, 2048, 16384), 1)
    out["fft_2^16_GFLOPs"] = round(run_1d(1 << 16, 256, 2048), 1)
    out["fft_2^24_GFLOPs"] = round(run_1d(1 << 24, 4, 24), 1)
    # own engine at 2^24: the radix-256 3-stage plan (exp/fft_radix256)
    out["fft_2^24_ct_planner_GFLOPs"] = round(run_1d(1 << 24, 4, 24, "ct"), 1)

    # 2-D 1024x1024 (fft_benchmark.cpp 2-D leg).  The XLA 2-D FFT runs
    # ~7-35 us/link here, and r1/r2 chains of 8..96 links measured
    # anything from 463 to 9834 GFLOP/s — pure RTT noise (rule 7); a
    # 512..4096-link chain puts the differential at 25-125 ms.
    n2 = 1 << 10
    plan2 = Plan((n2, n2), None, False, np.complex64)
    x2 = jax.jit(lambda r: r.astype(jnp.complex64))(
        jnp.asarray(np.random.rand(n2, n2).astype(np.float32)))
    t = slope_seconds(lambda v: plan2(v) * 1e-7, x2, lo=512, hi=4096)
    out["fft2d_1024_GFLOPs"] = round(5 * n2 * n2 * np.log2(n2 * n2) / 1e9 / t, 1)

    # batched small transforms (VERDICT r2 missing #3): 4096 x 2^10 c64,
    # transform on the last axis — the realistic small-FFT workload.
    # Routed to the XLA FFT (r3 sweep with >=512-link chains: XLA wins
    # batched 1-D at EVERY size 2^10..2^16, 752-959 vs ct 538-737
    # GFLOP/s; the single-transform 2^17..2^20 ct window is unaffected —
    # kernel notes "Batched small FFTs").  ~0.27 ms/link -> 512-link
    # differential clears the RTT noise.
    nb_, bt_ = 1 << 10, 4096
    planb1 = Plan((bt_, nb_), dims=(1,), inverse=False, dtype=np.complex64)
    xb1 = jax.jit(lambda r: r.astype(jnp.complex64))(
        jnp.asarray(np.random.rand(bt_, nb_).astype(np.float32)))
    t = slope_seconds(lambda v: planb1(v) * 1e-7, xb1, lo=64, hi=576)
    out["fft_batched_2^10_GFLOPs"] = round(
        5 * bt_ * nb_ * np.log2(nb_) / 1e9 / t, 1)

    # non-pow2: prime length -> Bluestein/chirp-z (fft/kernels.hpp:344-520)
    np_n = 999983  # prime
    planb = Plan((np_n,), None, False, np.complex64)
    xb = jax.jit(lambda r: r.astype(jnp.complex64))(
        jnp.asarray(np.random.rand(np_n).astype(np.float32)))
    t = slope_seconds(lambda v: planb(v) * 1e-7, xb, lo=8, hi=96)
    out["fft_bluestein_999983_GFLOPs"] = round(
        5 * np_n * np.log2(np_n) / 1e9 / t, 1)
    return out


def bench_f64(n=1 << 24):
    """The reference contract rows at their contractual dtype: saxpy /
    fused / reduction at N=16M **f64** (benchmark.cpp:84-280 is `double`).
    v5e has no f64 ALU — XLA emulates in software (~3x slower per byte,
    measured docs/tpu_kernel_notes.md) — so both dtype rows are reported:
    f32 rows = the performance path, these = the contract dtype."""
    jax.config.update("jax_enable_x64", True)
    rng = np.random.default_rng(7)
    out = {}

    b = jnp.asarray(rng.random(n))            # f64 under x64
    x0 = jnp.asarray(rng.random(n))
    assert x0.dtype == jnp.float64
    t = slope_seconds(lambda v, b_: (2.0 * v + b_) % 1.0, x0,
                      lo=8, hi=48, extra=(b,))
    out["saxpy_f64_GBs"] = round(3 * n * 8 / t / 1e9, 1)

    c = jnp.asarray(rng.random(n))
    d = jnp.asarray(rng.random(n))
    t = slope_seconds(lambda v, b_, c_, d_: (v + b_ + c_ * d_) % 1.0,
                      x0, lo=8, hi=48, extra=(b, c, d))
    out["fused_elementwise_f64_GBs"] = round(5 * n * 8 / t / 1e9, 1)

    def red_step(v, b_):
        s = jnp.sum(v * b_)
        return (v + b_) % 1.0 + s * 1e-30

    t = slope_seconds(red_step, x0, lo=8, hi=48, extra=(b,))
    out["reduction_f64_GBs"] = round(5 * n * 8 / t / 1e9, 1)
    return out


_T0 = time.perf_counter()
# Global wall-clock budget: the harness must DELIVER its one JSON line
# under any termination (r4 lost every TPU number to the driver's outer
# timeout: rc 124, nothing printed — VERDICT r4 #1).  The r4 partial
# flush pinned the driver's outer window at ~1500 s (bench_partial.json
# froze at elapsed 1494.2 when the run got SIGKILLed), so the defaults
# must leave the slowest single sub-benchmark's guard worth of headroom
# BELOW that: benchmarks that would start after the budget is spent are
# recorded as SKIPPED_* instead of run.
BUDGET_S = float(os.environ.get("VEXTPU_BENCH_BUDGET_S", "1240"))
# Last-resort hard deadline: a wedged PJRT/C++ call is NOT interruptible
# by SIGALRM (the guard only fires when the interpreter regains control),
# so a watchdog thread prints the accumulated result line and exits 0 at
# this wall-clock — still inside the driver's ~1500 s outer timeout.
HARD_S = float(os.environ.get("VEXTPU_BENCH_HARD_S", "1380"))
_PARTIAL = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_partial.json")


def _elapsed():
    return time.perf_counter() - _T0


def _flush_partial(extra):
    """Persist everything measured so far: if the process is killed
    mid-benchmark, the round's numbers survive on disk (the honest-
    delivery spirit of the reference's profiler, profiler.hpp:249-266)."""
    try:
        with open(_PARTIAL, "w") as f:
            json.dump({"elapsed_s": round(_elapsed(), 1), "extra": extra},
                      f, indent=1)
    except OSError:
        pass


def _guarded(extra, fn, timeout_s=900):
    """Run one sub-benchmark with a hang guard: a single wedged tunnel
    call must not lose the whole JSON line for the round.  SIGALRM
    aborts the benchmark; its keys are simply absent from `extra`.
    After every sub-benchmark (pass or fail) the accumulated results are
    flushed to bench_partial.json.

    LIMIT: a Python signal only fires when the interpreter regains
    control — a hang inside a blocking PJRT/C++ call (worker crash) is
    not interruptible from within this process; the guard covers
    Python-level stalls and exceptions.  The driver's outer process
    timeout remains the hard backstop for C-level wedges — which is why
    the partials are flushed to disk, not just printed at the end."""
    import signal

    remaining = BUDGET_S - _elapsed()
    if remaining <= 60:
        extra[f"SKIPPED_{fn.__name__}"] = "budget"
        _flush_partial(extra)
        return
    timeout_s = int(min(timeout_s, remaining + 120))

    def _raise(sig, frm):
        raise TimeoutError(f"{fn.__name__} exceeded {timeout_s}s")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(timeout_s)
    t0 = time.perf_counter()
    try:
        fn(extra)
    except Exception as e:  # noqa: BLE001 - record and continue
        extra[f"FAILED_{fn.__name__}"] = str(e)[:200]
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
        # per-bench wall seconds: lets a post-mortem see where the budget
        # went (the r4 timeout could only be diagnosed by inference)
        extra.setdefault("_seconds", {})[fn.__name__] = round(
            time.perf_counter() - t0, 1)
        _flush_partial(extra)


def _result_dict(extra, fused_holder):
    """Assemble the single result line from whatever has been measured so
    far (shared by the final print and the watchdog's last-resort print).

    Headline denominator: the chip's MEASURED achievable rate for the
    fused row's 4-read+1-write mix (VERDICT r3 weak #1 reconciliation,
    exp/hbm_probe.py + docs/benchmarking.md).  Reads and writes stream
    at different rates (~1100 / ~445 GB/s fit), so the symmetric 819
    spec constant is the wrong roofline for a read-heavy mix; the bound
    is an adds-only kernel with the identical mix measured back-to-back
    in bench_fused_elementwise.  The bound is used DIRECTLY (no max
    with the spec constant): both sides share the process's device/
    tunnel state, so the ratio cancels the +-15% cross-process drift —
    flooring the denominator at 819 re-introduced exactly that drift
    (a slow-state run measured fused 624.9 / bound 680.9 = 91.8%, but
    the 819 floor reported 76.3%).  Falls back to the spec constant
    only if the bound row itself failed."""
    fused_gbs = fused_holder.get("gbs", 0.0)
    sol = fused_holder.get("bound", 0.0) * 1e9 or HBM_SOL
    pct = 100.0 * fused_gbs * 1e9 / sol
    return {
        "metric": "fused elementwise bandwidth, % of measured stream bound (v5e)",
        "value": round(pct, 1),
        "unit": "%",
        "vs_baseline": round(pct / 85.0, 3),  # target: >=85% (BASELINE.md)
        "extra": extra,
    }


def _watchdog(extra, fused_holder, done):
    """Hard-deadline backstop (VERDICT r4 #1): SIGALRM cannot interrupt a
    hang inside a blocking PJRT/C++ call, so at HARD_S this daemon thread
    prints the accumulated result line itself and exits the process with
    rc 0 — the driver records a parsed line instead of rc 124 / nothing."""
    import threading

    def run():
        while not done.wait(5.0):
            if _elapsed() >= HARD_S:
                extra["WATCHDOG"] = (f"hard deadline {HARD_S:.0f}s hit; "
                                     "a sub-benchmark wedged (C-level)")
                _flush_partial(extra)
                print(json.dumps(_result_dict(extra, fused_holder)),
                      flush=True)
                os._exit(0)

    t = threading.Thread(target=run, daemon=True)
    t.start()


def main():
    extra = {"timing": "two-point slope of on-device chains"}

    def b_init(extra):
        # guarded: a tunnel outage at startup must still yield the JSON
        # line (with FAILED_b_init) rather than hanging before the loop
        extra["device"] = str(jax.devices()[0].device_kind)

    fused_holder = {}

    def b_fused(extra):
        fused_gbs, bound_gbs = bench_fused_elementwise()
        fused_holder["gbs"] = fused_gbs
        fused_holder["bound"] = bound_gbs
        extra["fused_elementwise_GBs"] = round(fused_gbs, 1)
        extra["stream_mix_bound_GBs"] = round(bound_gbs, 1)

    def b_copy(extra):
        copy_gbs, _ = bench_copy()
        fused_holder["copy"] = copy_gbs
        extra["stream_copy_GBs"] = round(copy_gbs, 1)

    def b_saxpy(extra):
        saxpy_gbs = bench_saxpy()[0]
        fused_holder["saxpy"] = saxpy_gbs
        extra["saxpy_GBs"] = round(saxpy_gbs, 1)

    def b_red(extra):
        extra["reduction_GBs"] = round(bench_reduction()[0], 1)

    def b_stencil(extra):
        # r3: donation is default-ON, so the library's x[:] = x * s runs
        # the in-place (aliased) kernel — the HEADLINE row reflects that
        # default; the non-donated figure is kept for the r+w ceiling
        _, st_nd_gbs, st_ip_gbs = bench_stencil()
        extra["stencil_GBs"] = round(st_ip_gbs, 1)
        extra["stencil_nodonate_GBs"] = round(st_nd_gbs, 1)
        extra["stencil_inplace_GBs"] = round(st_ip_gbs, 1)

    def b_spmv64(extra):
        extra["spmv_poisson64_GFLOPs"] = round(bench_spmv()[0], 2)

    def b_spmv256(extra):  # BASELINE.md config
        extra["spmv_poisson256_GFLOPs"] = round(bench_spmv(m=256)[0], 2)

    def b_ccsr(extra):
        extra["spmv_ccsr64_GFLOPs"] = round(bench_spmv_ccsr()[0], 2)

    def b_spmv_random(extra):
        gf, t_construct = bench_spmv_random()
        extra["spmv_random_GFLOPs"] = round(gf, 2)
        extra["spmv_random_construct_s"] = round(t_construct, 1)

    def b_spmv_random_naive(extra):
        extra["spmv_random_naive_GFLOPs"] = round(
            bench_spmv_random_naive()[0], 3)

    def b_dist_pallas(extra):
        extra.update(bench_dist_pallas_local())

    def b_sort(extra):
        extra["sort_Mkeys_s"] = round(bench_sort()[0], 1)

    def b_scan(extra):
        extra["scan_Gelem_s"] = round(bench_scan()[0], 2)

    def b_scanip(extra):
        extra["scan_inplace_Gelem_s"] = round(bench_scan_inplace()[0], 2)

    def b_scanmax(extra):
        extra["scan_max_Gelem_s"] = round(bench_scan_max()[0], 2)

    def b_philox(extra):
        extra["philox_Grand_s"] = round(bench_rng()[0], 2)

    def b_threefry(extra):
        extra["threefry_Grand_s"] = round(bench_rng_threefry()[0], 2)

    def b_sbk(extra):
        extra["sort_by_key_Mpairs_s"] = round(bench_sort_by_key()[0], 1)

    def b_scank(extra):
        extra["scan_by_key_Gelem_s"] = round(bench_scan_by_key()[0], 2)

    def b_rbk(extra):
        extra["reduce_by_key_Gelem_s"] = round(bench_reduce_by_key()[0], 2)

    def b_mba(extra):
        extra["mba_Mpts_s"] = round(bench_mba()[0], 1)

    def b_lorenz(extra):
        g, ratio = bench_lorenz()
        extra["lorenz_rk4_Gsteps_s"] = round(g, 2)
        extra["lorenz_overhead_vs_raw_jax"] = round(ratio, 3)

    def b_fft(extra):
        fft_gflops, fft_ct_gflops = bench_fft()
        extra["fft_2^20_GFLOPs"] = round(fft_gflops, 1)
        extra["fft_2^20_ct_planner_GFLOPs"] = round(fft_ct_gflops, 1)

    def b_fft_sweep(extra):
        extra.update(bench_fft_sweep())

    def b_f64(extra):
        # LAST: flips jax_enable_x64 on; earlier benches compile under x32
        extra.update(bench_f64())

    import threading

    done = threading.Event()
    _watchdog(extra, fused_holder, done)
    # new/uncaptured rows run EARLY: if the budget forces skips, they
    # drop previously-recorded rows (BENCH_r03 has fft/sort/... numbers),
    # not the rows this round must capture.  b_f64 stays last (it flips
    # jax_enable_x64 for the whole process).
    for b in (b_init, b_fused, b_copy, b_saxpy, b_red, b_stencil,
              b_spmv_random, b_spmv_random_naive, b_dist_pallas, b_spmv64,
              b_spmv256, b_ccsr, b_scan, b_scanip, b_scanmax, b_sort,
              b_philox, b_threefry, b_sbk, b_scank, b_rbk, b_mba, b_lorenz,
              b_fft, b_fft_sweep, b_f64):
        _guarded(extra, b, timeout_s=600)

    done.set()
    print(json.dumps(_result_dict(extra, fused_holder)), flush=True)


if __name__ == "__main__":
    main()
