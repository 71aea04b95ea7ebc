"""Donation fuzzer (r3: config.donate default ON).

Random expression DAGs are assigned back INTO one of their own operand
vectors (`x[:] = f(x, y, ...)`, `x += g(...)`), interleaved with
tie()/multivector fused assignments, swaps, borrowed buffers and
odd (padded) sizes — every shape that makes buffer donation hazardous.
After every step ALL live vectors are checked against a numpy mirror,
so a donated-buffer corruption of ANY bystander is caught, not just a
wrong assignment result.

    python exp/fuzz_donate.py [seed]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # exact f64 vs numpy mirror
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np

import vexcl_tpu as vex
from vexcl_tpu.config import config

assert config.donate, "this fuzzer targets the donate-ON default"


def build_expr(rng, pool, mirror):
    """Random expression over the pool; returns (lazy, numpy)."""

    def leaf():
        i = rng.integers(0, len(pool))
        if rng.random() < 0.15:
            c = float(rng.normal())
            return c, c
        return pool[i][:], mirror[i]

    def node(depth):
        if depth == 0 or rng.random() < 0.3:
            return leaf()
        a_l, a_n = node(depth - 1)
        b_l, b_n = node(depth - 1)
        op = rng.integers(0, 5)
        if op == 0:
            return a_l + b_l, a_n + b_n
        if op == 1:
            return a_l - b_l, a_n - b_n
        if op == 2:
            return a_l * b_l, a_n * b_n
        if op == 3:
            return vex.fmax(a_l, b_l), np.fmax(a_n, b_n)
        return a_l * 0.5 + b_l * 0.25, a_n * 0.5 + b_n * 0.25

    return node(int(rng.integers(1, 4)))


def main(seed=0):
    rng = np.random.default_rng(seed)
    ctx = vex.Context(vex.Filter.Env, set_current=True)
    for n in (1024, 1003, 4096):  # 1003: padded sharded storage
        pool = []
        mirror = []
        borrowed_srcs = []
        for i in range(5):
            h = rng.normal(size=n)
            if i == 3:  # one borrowed vector: donation must skip it
                arr = jax.device_put(
                    h, ctx.vector_sharding if n % ctx.size == 0
                    else ctx.devices[0])
                pool.append(vex.vector(data=arr, context=ctx))
                borrowed_srcs.append((arr, h.copy()))
            else:
                pool.append(vex.vector(data=h.copy(), context=ctx))
            mirror.append(h.copy())

        for step in range(120):
            tgt = int(rng.integers(0, len(pool)))
            lazy, ref = build_expr(rng, pool, mirror)
            kind = rng.random()
            if np.ndim(ref) == 0:
                ref = np.full(n, ref)
            if kind < 0.55:
                pool[tgt][:] = lazy          # SET (donates when safe)
                mirror[tgt] = ref
            elif kind < 0.8:
                pool[tgt] += lazy            # compound (donates old)
                mirror[tgt] = mirror[tgt] + ref
            elif kind < 0.9 and len(pool) >= 2:
                a, b = rng.choice(len(pool), 2, replace=False)
                pool[a].swap(pool[b])
                mirror[a], mirror[b] = mirror[b], mirror[a]
            else:
                a, b = rng.choice(len(pool), 2, replace=False)
                la, ra = build_expr(rng, pool, mirror)
                lb, rb = build_expr(rng, pool, mirror)
                vex.tie(pool[a], pool[b]).assign((la, lb))
                mirror[a] = np.broadcast_to(ra, (n,)).copy()
                mirror[b] = np.broadcast_to(rb, (n,)).copy()
            for v, m in zip(pool, mirror):
                np.testing.assert_allclose(
                    np.asarray(v), m, rtol=1e-10, atol=1e-10,
                    err_msg=f"n={n} step={step} seed={seed}")
            # keep magnitudes bounded: chained products overflow to inf
            # within ~100 steps, and inf/nan propagation through fused
            # rewrites is not the behavior under test (donation is)
            for i in range(len(pool)):
                if not np.all(np.abs(mirror[i]) < 1e6):
                    h = rng.normal(size=n)
                    pool[i][:] = vex.vector(data=h.copy(), context=ctx)[:] * 1.0
                    mirror[i] = h.copy()
        for arr, h in borrowed_srcs:
            np.testing.assert_allclose(
                np.asarray(arr), h, err_msg="borrowed buffer corrupted")
        print(f"n={n}: 120 steps OK")
    print(f"fuzz_donate seed={seed}: PASS")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
