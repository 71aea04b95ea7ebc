"""Randomized expression-tree sweep (CPU, 8-dev mesh).

Builds random nested elementwise expressions over sharded vectors —
binary arithmetic, unary builtins, scalar leaves, element_index, casts,
slice views — evaluates through the expression engine, and compares
against a numpy oracle built from the same tree.  Also fuzzes Reductor
over random subtrees.  Run ad hoc:  python exp/fuzz_expressions.py [seed]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np

import vexcl_tpu as vex

BINOPS = [
    (lambda a, b: a + b, lambda a, b: a + b),
    (lambda a, b: a - b, lambda a, b: a - b),
    (lambda a, b: a * b, lambda a, b: a * b),
    (lambda a, b: a / (b * b + 1.0), lambda a, b: a / (b * b + 1.0)),
    (lambda a, b: vex.fmax(a, b), np.fmax),
    (lambda a, b: vex.fmin(a, b), np.fmin),
    (lambda a, b: vex.pow(vex.fabs(a) + 0.5, b),
     lambda a, b: np.power(np.abs(a) + 0.5, b)),
]
# trig args clamped in tree AND oracle: XLA's f32 argument reduction
# legitimately diverges from numpy's for huge |x|
UNOPS = [
    (lambda e: vex.sin(vex.fmin(vex.fmax(e, -30.0), 30.0)),
     lambda a: np.sin(np.clip(a, -30.0, 30.0))),
    (lambda e: vex.cos(vex.fmin(vex.fmax(e, -30.0), 30.0)),
     lambda a: np.cos(np.clip(a, -30.0, 30.0))),
    (lambda e: vex.exp(vex.fmin(vex.fmax(e, -20.0), 20.0)),
     lambda a: np.exp(np.clip(a, -20.0, 20.0))),
    (lambda e: vex.sqrt(vex.fabs(e)), lambda a: np.sqrt(np.abs(a))),
    (vex.fabs, np.abs),
    (vex.tanh, np.tanh),
    (lambda e: -e, lambda a: -a),
    (lambda e: 2.5 * e + 1.0, lambda a: 2.5 * a + 1.0),
]


def build(rng, vecs, arrs, depth):
    """Return (expr, oracle_f32, oracle_f64): the two oracle precisions
    bound the rounding each subtree can legitimately accumulate — their
    disagreement is the per-element conditioning estimate."""
    if depth == 0 or rng.random() < 0.25:
        r = rng.random()
        if r < 0.6:
            i = rng.integers(0, len(vecs))
            return vecs[i], arrs[i], arrs[i].astype(np.float64)
        if r < 0.8:
            c = float(rng.normal())
            return c, np.float32(c), np.float64(c)
        n = len(arrs[0])
        # promote to float immediately: pure-integer index products wrap
        # mod 2^32 (i32 index; the reference wraps at 2^64) — documented
        # in expr/node.py:ElementIndex
        return (vex.element_index(0, n) * 1.0,
                np.arange(n, dtype=np.float32) * np.float32(1.0),
                np.arange(n, dtype=np.float64))
    if rng.random() < 0.5:
        f, g = UNOPS[rng.integers(0, len(UNOPS))]
        e, a32, a64 = build(rng, vecs, arrs, depth - 1)
        if isinstance(e, float):
            i = rng.integers(0, len(vecs))
            e, a32, a64 = vecs[i], arrs[i], arrs[i].astype(np.float64)
        return f(e), np.float32(g(a32)), g(a64)
    f, g = BINOPS[rng.integers(0, len(BINOPS))]
    e1, a1_32, a1_64 = build(rng, vecs, arrs, depth - 1)
    e2, a2_32, a2_64 = build(rng, vecs, arrs, depth - 1)
    if isinstance(e1, float) and isinstance(e2, float):
        e1, a1_32, a1_64 = vecs[0], arrs[0], arrs[0].astype(np.float64)
    return f(e1, e2), np.float32(g(a1_32, a2_32)), g(a1_64, a2_64)


def one_round(rng, n, depth):
    arrs = [rng.normal(size=n).astype(np.float32) for _ in range(3)]
    vecs = [vex.vector(data=a) for a in arrs]
    expr, o32, o64 = build(rng, vecs, arrs, depth)
    if isinstance(expr, float):
        return
    out = vex.vector(n, dtype=np.float32)
    out[:] = expr
    got = out.to_numpy().astype(np.float64)
    ref = np.asarray(o64, np.float64)
    cond = np.abs(np.asarray(o32, np.float64) - ref)  # rounding headroom
    if ref.ndim == 0:
        ref = np.full(n, ref)
        cond = np.full(n, cond)
    mask = np.isfinite(ref) & np.isfinite(cond) & (np.abs(ref) < 1e30)
    tol = 10.0 * cond[mask] + 1e-4 * np.maximum(np.abs(ref[mask]), 1.0)
    bad = np.abs(got[mask] - ref[mask]) > tol
    assert not bad.any(), (n, depth, int(bad.sum()),
                           float(np.abs(got[mask] - ref[mask]).max()))

    # reduce the same tree; scalar-only trees (no sized terminal) must
    # raise, not silently reduce one broadcast element
    try:
        s = vex.Reductor(vex.SUM)(expr)
    except vex.ExpressionError:
        return
    ref_sum = ref[np.isfinite(ref)].sum()
    slack = 10.0 * cond[mask].sum() + 1e-4 * max(1.0, abs(ref_sum)) + 0.3
    if np.isfinite(ref_sum) and abs(ref_sum) < 1e12 and mask.all():
        assert abs(float(s) - ref_sum) <= slack, (n, depth, float(s), ref_sum)

    # sliced-view source: expressions over vector slices (vector_view path)
    if n >= 8:
        lo, hi = n // 4, n // 4 + n // 2
        out2 = vex.vector(hi - lo, dtype=np.float32)
        out2[:] = vecs[0][lo:hi] * 2.0 + vecs[1][lo:hi]
        got2 = out2.to_numpy().astype(np.float64)
        sub = arrs[0][lo:hi].astype(np.float64) * 2.0 + arrs[1][lo:hi]
        assert np.abs(got2 - sub).max() < 1e-4 * max(1.0, np.abs(sub).max())


def main(seed=0):
    rng = np.random.default_rng(seed)
    ctx = vex.Context(vex.Filter.Count(8))
    print(ctx.size, "devices")
    rounds = 0
    for n in (64, 1000, 1003, 4096, 16384):
        for depth in (1, 2, 3, 4, 5):
            for _ in range(4):
                one_round(rng, n, depth)
                rounds += 1
        print(f"n={n}: ok ({rounds} trees so far)")
    print("expression fuzz passed:", rounds, "random trees")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
