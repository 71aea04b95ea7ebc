"""Randomized SELL-R robustness sweep against the CSR oracle (CPU).

The SELL-R planner (sparse/shuffle.py) is ~1.2k lines of host planning
with many interacting escapes — hot-column extraction, overloaded-element
duplicate copies, width-class trimming, spill-to-tail, balanced-packing
adoption, the uniform-shard premeter.  This fuzzer hammers random
shapes / skews / duplicate patterns / env knobs and compares every
matvec against a float64 CSR oracle; the uniform-shard builder is swept
at several device counts (the distributed SpMV's SPMD contract).
Test-discipline analog of the reference's randomized spmv suite
(tests/spmv.cpp:1-549).

Not part of the pytest suite (slow, random); run ad hoc:
    python exp/fuzz_sellr.py [seed] [trials]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from vexcl_tpu.sparse.shuffle import SELLR, sellr_uniform_shards  # noqa: E402


def random_csr(rng, n, m, style):
    """CSR with a randomized row-length law and column distribution."""
    if style == "lognormal":
        lens = rng.lognormal(rng.uniform(0.3, 2.5),
                             rng.uniform(0.3, 1.6), n).astype(np.int64)
    elif style == "uniform":
        lens = rng.integers(0, max(2, rng.integers(1, 40)), n)
    elif style == "spiky":        # a few enormous rows
        lens = rng.integers(0, 4, n)
        lens[rng.integers(0, n, max(1, n // 50))] = rng.integers(50, 400)
    elif style == "empty":        # mostly empty rows
        lens = np.where(rng.random(n) < 0.9, 0, rng.integers(1, 30, n))
    else:                         # constant width
        lens = np.full(n, rng.integers(1, 24))
    lens = np.minimum(lens, m)
    ptr = np.concatenate([[0], np.cumsum(lens)])
    nnz = int(ptr[-1])
    colstyle = rng.integers(0, 3)
    if colstyle == 0:             # uniform columns
        col = rng.integers(0, m, nnz)
    elif colstyle == 1:           # power-law (hot columns + duplicates)
        col = (m * rng.power(rng.uniform(0.15, 0.8), nnz)).astype(np.int64)
        col = np.minimum(col, m - 1)
    else:                         # near-banded with wraparound
        rows_of = np.repeat(np.arange(n), lens)
        col = (rows_of * m // max(1, n)
               + rng.integers(-8, 9, nnz)) % m
    val = rng.standard_normal(nnz).astype(np.float32)
    return ptr, col.astype(np.int64), val, nnz


def oracle(n, m, ptr, col, val, x):
    y = np.zeros(n, dtype=np.float64)
    np.add.at(y, np.repeat(np.arange(n), np.diff(ptr)),
              val.astype(np.float64) * x.astype(np.float64)[col])
    return y


def check(got, ref, tag):
    scale = max(1e-30, float(np.max(np.abs(ref))))
    err = float(np.max(np.abs(np.asarray(got, dtype=np.float64) - ref)))
    assert err / scale < 5e-5, (tag, err / scale)


def one_trial(rng, t):
    n = int(rng.choice([1, 2, 7, 100, 127, 128, 129, 1000, 4096, 9973,
                        1 << 14]))
    m = n if rng.random() < 0.5 else int(rng.choice(
        [1, 3, 130, 1000, 8192, 1 << 14]))
    style = rng.choice(["lognormal", "uniform", "spiky", "empty", "const"])
    ptr, col, val, nnz = random_csr(rng, n, m, style)
    # knob roulette: force the hot plane often, vary width sometimes
    hot = int(rng.choice([1, 8, 64, 2048]))
    os.environ["VEXTPU_SELLR_HOT_COL"] = str(hot)
    # r5 premultiply/DMA-reduce knobs: all four combinations must agree
    os.environ["VEXTPU_SELLR_PREMUL"] = str(int(rng.random() < 0.75))
    os.environ["VEXTPU_SELLR_DMAR"] = str(int(rng.random() < 0.75))
    width = int(rng.integers(1, 64)) if rng.random() < 0.25 else None
    tag = (t, n, m, style, nnz, hot, width,
           os.environ["VEXTPU_SELLR_PREMUL"] + os.environ["VEXTPU_SELLR_DMAR"])
    x = rng.standard_normal(m).astype(np.float32)
    ref = oracle(n, m, ptr, col, val, x)
    A = SELLR(n, m, ptr, col, val, width=width)
    check(A.apply(x), ref, tag)
    return tag


def one_uniform_trial(rng, t):
    ndev = int(rng.choice([1, 2, 4, 8]))
    S = int(rng.choice([64, 128, 500, 1024]))
    n = ndev * S
    m = int(rng.choice([n, 1000, 1 << 13]))
    style = rng.choice(["lognormal", "uniform", "spiky", "empty"])
    ptr, col, val, nnz = random_csr(rng, n, m, style)
    tag = ("uniform", t, ndev, S, m, style, nnz)
    x = rng.standard_normal(m).astype(np.float32)
    ref = oracle(n, m, ptr, col, val, x)
    tmpl, stacked = sellr_uniform_shards(S, m, ptr, col, val, ndev)
    got = np.concatenate([
        np.asarray(tmpl.apply_leaves([s[d] for s in stacked], x))
        for d in range(ndev)])
    check(got, ref, tag)
    return tag


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    rng = np.random.default_rng(seed)
    for t in range(trials):
        if t % 4 == 3:
            tag = one_uniform_trial(rng, t)
        else:
            tag = one_trial(rng, t)
        print("ok", tag, flush=True)
    print(f"PASSED {trials} trials (seed {seed})")


if __name__ == "__main__":
    main()
