"""A/B: merging two PRESORTED columns (the distributed sort's per-round
step, ops/sort_dist.py) — VERDICT r2 #4.

Candidates, merging two sorted m=2M blocks (f32 key + i32 gidx tiebreak
+ f32 payload — the sort_by_key column set):

  A. lax.sort over the concatenation (the r2 implementation): O(log^2)
     depth bitonic SORT of 2m elements that ignores the presortedness.
  B. bitonic MERGE: concat(a, reverse(b)) is bitonic; log2(2m)
     half-cleaner stages of static reshape + lexicographic
     compare-exchange — VPU shuffles, no gathers, no scatter.
  C. searchsorted ranks + gather (the merge the VERDICT sketched):
     ranks are O(log m) binary-search gathers; TPU gathers measured
     ~70 Melem/s, so this is expected to lose badly — measured for the
     record.

Run on the real chip: python exp/sort_merge_ab.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import slope_seconds

M = 1 << 21  # n/D for n=16M, D=8


def lex_less(ak, bk):
    """a < b lexicographically over aligned key column lists."""
    less = None
    eq = None
    for a, b in zip(ak, bk):
        l_ = a < b
        e_ = a == b
        if less is None:
            less, eq = l_, e_
        else:
            less = less | (eq & l_)
            eq = eq & e_
    return less


def bitonic_merge(a_cols, b_cols, nk):
    """Merge two sorted column tuples (each length m) -> sorted 2m."""
    m = a_cols[0].shape[0]
    cols = [jnp.concatenate([a, b[::-1]]) for a, b in zip(a_cols, b_cols)]
    L = 2 * m
    d = L // 2
    while d >= 1:
        r = [c.reshape(L // (2 * d), 2, d) for c in cols]
        lo = [c[:, 0, :] for c in r]
        hi = [c[:, 1, :] for c in r]
        swap = lex_less(hi[:nk], lo[:nk])
        new = [
            jnp.stack([jnp.where(swap, h, l), jnp.where(swap, l, h)], axis=1)
            for l, h in zip(lo, hi)
        ]
        cols = [c.reshape(L) for c in new]
        d //= 2
    return cols


def main():
    rng = np.random.default_rng(0)
    ka = np.sort(rng.random(M).astype(np.float32))
    kb = np.sort(rng.random(M).astype(np.float32))
    ga = np.arange(M, dtype=np.int32)
    gb = np.arange(M, 2 * M, dtype=np.int32)
    va = rng.random(M).astype(np.float32)
    vb = rng.random(M).astype(np.float32)

    arrs = tuple(jnp.asarray(x) for x in (ka, ga, va, kb, gb, vb))

    # correctness of B once
    out = jax.jit(lambda a, g, v, b, h, w: bitonic_merge(
        (a, g, v), (b, h, w), 2))(*arrs)
    ref = np.sort(np.concatenate([ka, kb]), kind="stable")
    np.testing.assert_allclose(np.asarray(out[0]), ref)
    print("bitonic merge correct")

    def step_A(x, b, h, w):
        a, g, v = x[:M], jnp.arange(M, dtype=jnp.int32), x[:M]
        out = jax.lax.sort(
            (jnp.concatenate([a, b]), jnp.concatenate([g, h]),
             jnp.concatenate([v, w])), num_keys=2)
        return (x + out[2][:M] * 1e-7) % 1.0

    def step_B(x, b, h, w):
        a, g, v = x[:M], jnp.arange(M, dtype=jnp.int32), x[:M]
        out = bitonic_merge((a, g, v), (b, h, w), 2)
        return (x + out[2][:M] * 1e-7) % 1.0

    def step_C(x, b, h, w):
        a = x[:M]
        v = x[:M]
        # ranks: a's destination = i + #(b < a[i]) (strict keys assumed)
        ra = jnp.arange(M) + jnp.searchsorted(b, a)
        rb = jnp.arange(M) + jnp.searchsorted(a, b, side="right")
        # gather-form output (avoids scatter): slot r holds a[ka] if
        # ra[ka] == r else b[r - ka], ka = #(ra < r)
        r = jnp.arange(2 * M)
        kaa = jnp.searchsorted(ra, r)
        akey = a[jnp.minimum(kaa, M - 1)]
        sel = (kaa < M) & (ra[jnp.minimum(kaa, M - 1)] == r)
        kbb = jnp.clip(r - kaa, 0, M - 1)
        outv = jnp.where(sel, v[jnp.minimum(kaa, M - 1)], w[kbb])
        del akey, rb
        return (x + outv[:M] * 1e-7) % 1.0

    x0 = jnp.asarray(np.sort(rng.random(M).astype(np.float32)))
    extra = arrs[3:]

    tA = slope_seconds(step_A, x0, lo=8, hi=48, extra=extra)
    print(f"A lax.sort concat : {tA*1e3:.3f} ms  "
          f"({2*M/tA/1e6:.1f} Melem/s)")
    tB = slope_seconds(step_B, x0, lo=8, hi=48, extra=extra)
    print(f"B bitonic merge   : {tB*1e3:.3f} ms  "
          f"({2*M/tB/1e6:.1f} Melem/s)")
    try:
        tC = slope_seconds(step_C, x0, lo=2, hi=8, extra=extra)
        print(f"C searchsorted    : {tC*1e3:.3f} ms  "
              f"({2*M/tC/1e6:.1f} Melem/s)")
    except Exception as e:
        print("C searchsorted failed:", e)


if __name__ == "__main__":
    main()
