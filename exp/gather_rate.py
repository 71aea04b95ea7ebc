#!/usr/bin/env python
"""Gather-rate anatomy for the irregular SpMV design (VERDICT r4 #1).

Questions this answers (real chip, one process):

1. What does the naive random-ELL matvec (n=1M, lognormal rows mean ~16)
   actually run at?  (VERDICT expects the ~70 Melem/s take wall.)
2. How does jnp.take's index rate depend on TABLE SIZE?  (r3 notes:
   16M-element table -> 70 Melem/s; but the MBA patch table (~4 MB) ran
   287-369 M row-gathers/s.  If small tables gather fast, a column-block
   decomposition has a lever; if not, the ceiling is the index rate.)
3. Scalar vs ROW gathers: does a (m, k) patch-row gather pay per index
   or per byte?  (Decides whether x-reshaping tricks can help.)
4. One-hot matmul gather rate at small C (the known 10x substitute).
5. Sorted vs random indices at the 4 MB size (r3 measured no difference
   at 64 MB).

Each row prints Melem/s = indices resolved per second.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import slope_seconds  # noqa: E402

NIDX = 1 << 23  # 8M indices per link keeps links ~0.1s at 70M/s


def lognormal_rows(n, mean=16.0, sigma=0.8, seed=0):
    rng = np.random.default_rng(seed)
    mu = np.log(mean) - sigma * sigma / 2
    r = np.maximum(1, rng.lognormal(mu, sigma, n).astype(np.int64))
    return r


def rate(name, step, x0, extra=(), lo=2, hi=8, nidx=NIDX):
    t = slope_seconds(step, x0, lo=lo, hi=hi, extra=extra)
    print(f"{name:>44}: {nidx / t / 1e6:9.1f} Melem/s   ({t*1e3:.2f} ms/link)")
    return nidx / t / 1e6


def main():
    rng = np.random.default_rng(1)

    # --- 1. the naive random-ELL matvec baseline -------------------------
    n = 1 << 20
    rl = lognormal_rows(n)
    w = 24  # ELL width covering most of lognormal(16); clip the rest
    rl = np.minimum(rl, w)
    nnz = int(rl.sum())
    col = np.full((n, w), -1, np.int32)
    for i in range(n):  # fast enough at 1M for a probe
        col[i, : rl[i]] = rng.integers(0, n, rl[i])
    val = np.where(col >= 0, rng.random((n, w)), 0).astype(np.float32)
    colj = jnp.asarray(np.where(col >= 0, col, 0))
    maskj = jnp.asarray((col >= 0).astype(np.float32))
    valj = jnp.asarray(val)
    x0 = jnp.asarray(rng.random(n, dtype=np.float32))

    def ell_step(x, colj, valj, maskj):
        y = jnp.sum(valj * maskj * jnp.take(x, colj, axis=0), axis=1)
        return (y * 1e-3 + x * 0.9) % 1.0

    r = rate(f"naive ELL matvec nnz={nnz/1e6:.1f}M", ell_step, x0,
             extra=(colj, valj, maskj), lo=1, hi=4, nidx=n * w)
    print(f"        -> {2 * nnz * r / (n * w) / 1e3:.3f} GFLOP/s effective")

    # --- 2. take index rate vs table size --------------------------------
    idx_for = {}
    for tab_elems in (1 << 14, 1 << 17, 1 << 20, 1 << 22, 1 << 24):
        tab = jnp.asarray(rng.random(tab_elems, dtype=np.float32))
        idx = jnp.asarray(rng.integers(0, tab_elems, NIDX).astype(np.int32))
        idx_for[tab_elems] = idx

        def step(carry, tab_, idx_):
            g = jnp.take(tab_, idx_, axis=0)
            return (carry * 0.9 + g * 1e-3) % 1.0

        c0 = jnp.asarray(rng.random(NIDX, dtype=np.float32))
        rate(f"take 1-D table {tab_elems>>10}K elems", step, c0,
             extra=(tab, idx), lo=2, hi=8)

    # --- 3. row gathers: (m, k) tables, same BYTE size, fewer indices ----
    for k in (8, 16, 128):
        m = (1 << 22) // k  # 16 MB table total
        tab2 = jnp.asarray(rng.random((m, k)).astype(np.float32))
        nrow = NIDX // k  # same OUTPUT bytes as the 1-D case
        ridx = jnp.asarray(rng.integers(0, m, nrow).astype(np.int32))

        def step2(carry, tab_, idx_):
            g = jnp.take(tab_, idx_, axis=0)  # (nrow, k)
            return (carry * 0.9 + jnp.sum(g, axis=1) * 1e-3) % 1.0

        c0 = jnp.asarray(rng.random(nrow, dtype=np.float32))
        rate(f"row take (m,{k}) {nrow>>10}K rows", step2, c0,
             extra=(tab2, ridx), lo=2, hi=8, nidx=nrow)

    # --- 4. one-hot matmul gather, small tables --------------------------
    for C in (128, 512, 2048):
        tab = jnp.asarray(rng.random(C, dtype=np.float32))
        idx = jnp.asarray(rng.integers(0, C, NIDX).astype(np.int32))

        def oh_step(carry, tab_, idx_):
            oh = (idx_[:, None] == jnp.arange(C, dtype=jnp.int32)[None, :])
            g = jnp.dot(oh.astype(jnp.float32), tab_,
                        preferred_element_type=jnp.float32)
            return (carry * 0.9 + g * 1e-3) % 1.0

        c0 = jnp.asarray(rng.random(NIDX, dtype=np.float32))
        rate(f"one-hot matmul C={C}", oh_step, c0, extra=(tab, idx),
             lo=2, hi=8)

    # --- 5. sorted indices at the 4 MB size ------------------------------
    tab = jnp.asarray(rng.random(1 << 20, dtype=np.float32))
    idx_sorted = jnp.asarray(
        np.sort(rng.integers(0, 1 << 20, NIDX)).astype(np.int32))

    def step(carry, tab_, idx_):
        g = jnp.take(tab_, idx_, axis=0)
        return (carry * 0.9 + g * 1e-3) % 1.0

    c0 = jnp.asarray(rng.random(NIDX, dtype=np.float32))
    rate("take 1M-table SORTED idx", step, c0, extra=(tab, idx_sorted),
         lo=2, hi=8)


if __name__ == "__main__":
    main()
