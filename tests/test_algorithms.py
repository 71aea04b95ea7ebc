"""Ports of tests/{scan,scan_by_key,reduce_by_key,sort,gather}.cpp behavior."""

import numpy as np
import pytest

import vexcl_tpu as vex

N = 1 << 14


def test_inclusive_exclusive_scan(ctx, rng):
    hx = rng.integers(0, 100, N).astype(np.int64)
    x = vex.vector(data=hx, context=ctx)
    y = vex.inclusive_scan(x)
    np.testing.assert_array_equal(np.asarray(y), np.cumsum(hx))
    z = vex.exclusive_scan(x)
    np.testing.assert_array_equal(
        np.asarray(z), np.concatenate([[0], np.cumsum(hx)[:-1]])
    )


def test_scan_with_init_and_op(ctx, rng):
    import jax.numpy as jnp

    hx = rng.random(N)
    x = vex.vector(data=hx, context=ctx)
    y = vex.inclusive_scan(x, init=10.0)
    np.testing.assert_allclose(np.asarray(y), 10.0 + np.cumsum(hx), rtol=1e-12)
    # custom associative op: running maximum
    m = vex.inclusive_scan(x, op=jnp.maximum, op_name="max")
    np.testing.assert_allclose(np.asarray(m), np.maximum.accumulate(hx))
    # exclusive with init
    e = vex.exclusive_scan(x, init=5.0)
    expect = np.concatenate([[5.0], 5.0 + np.cumsum(hx)[:-1]])
    np.testing.assert_allclose(np.asarray(e), expect, rtol=1e-12)


def test_scan_by_key(ctx, rng):
    hk = np.sort(rng.integers(0, 32, N)).astype(np.int32)
    hv = rng.random(N)
    k = vex.vector(data=hk, context=ctx)
    v = vex.vector(data=hv, context=ctx)
    out = vex.inclusive_scan_by_key(k, v)
    # oracle
    expect = np.zeros(N)
    acc = 0.0
    for i in range(N):
        acc = hv[i] if i > 0 and hk[i] != hk[i - 1] else acc + hv[i]
        if i == 0:
            acc = hv[0]
        expect[i] = acc
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-10)

    exc = vex.exclusive_scan_by_key(k, v)
    expect_exc = np.zeros(N)
    for i in range(N):
        expect_exc[i] = 0.0 if (i == 0 or hk[i] != hk[i - 1]) else expect_exc[i - 1] + hv[i - 1]
    np.testing.assert_allclose(np.asarray(exc), expect_exc, rtol=1e-10)


def test_scan_by_key_tuple_keys(ctx, rng):
    hk1 = np.sort(rng.integers(0, 8, N)).astype(np.int32)
    hk2 = rng.integers(0, 2, N).astype(np.int32)
    hv = np.ones(N)
    k1 = vex.vector(data=hk1, context=ctx)
    k2 = vex.vector(data=hk2, context=ctx)
    v = vex.vector(data=hv, context=ctx)
    out = vex.inclusive_scan_by_key((k1, k2), v)
    expect = np.zeros(N)
    for i in range(N):
        new = i == 0 or hk1[i] != hk1[i - 1] or hk2[i] != hk2[i - 1]
        expect[i] = 1.0 if new else expect[i - 1] + 1.0
    np.testing.assert_allclose(np.asarray(out), expect)


def test_reduce_by_key(ctx, rng):
    hk = np.sort(rng.integers(0, 64, N)).astype(np.int32)
    hv = rng.random(N)
    k = vex.vector(data=hk, context=ctx)
    v = vex.vector(data=hv, context=ctx)
    ok, ov, m = vex.reduce_by_key(k, v)
    ukeys = np.unique(hk)
    assert m == len(ukeys)
    np.testing.assert_array_equal(np.asarray(ok), ukeys)
    sums = np.array([hv[hk == u].sum() for u in ukeys])
    np.testing.assert_allclose(np.asarray(ov), sums, rtol=1e-10)


def test_sort(ctx, rng):
    hk = rng.random(N).astype(np.float32)
    k = vex.vector(data=hk, context=ctx)
    vex.sort(k)
    got = np.asarray(k)
    np.testing.assert_allclose(got, np.sort(hk))


def test_sort_descending(ctx, rng):
    hk = rng.integers(0, 1 << 30, N).astype(np.uint32)
    k = vex.vector(data=hk, context=ctx)
    vex.sort(k, descending=True)
    np.testing.assert_array_equal(np.asarray(k), np.sort(hk)[::-1])


def test_sort_by_key(ctx, rng):
    hk = rng.integers(0, 1 << 20, N).astype(np.int32)
    hv = np.arange(N, dtype=np.float64)
    k = vex.vector(data=hk, context=ctx)
    v = vex.vector(data=hv, context=ctx)
    vex.sort_by_key(k, v)
    order = np.argsort(hk, kind="stable")
    np.testing.assert_array_equal(np.asarray(k), hk[order])
    np.testing.assert_allclose(np.asarray(v), hv[order])


def test_sort_tuple_keys(ctx, rng):
    """Fusion-tuple keys: lexicographic (sort.hpp:2120-2156)."""
    hk1 = rng.integers(0, 4, N).astype(np.int32)
    hk2 = rng.random(N)
    k1 = vex.vector(data=hk1, context=ctx)
    k2 = vex.vector(data=hk2, context=ctx)
    vex.sort((k1, k2))
    order = np.lexsort((hk2, hk1))
    np.testing.assert_array_equal(np.asarray(k1), hk1[order])
    np.testing.assert_allclose(np.asarray(k2), hk2[order])


def test_sort_key_fn(ctx, rng):
    """Comparator-by-key-transform: sort by |x - 0.5|."""
    import jax.numpy as jnp

    hk = rng.random(N)
    k = vex.vector(data=hk, context=ctx)
    vex.sort(k, key_fn=lambda x: jnp.abs(x - 0.5))
    got = np.asarray(k)
    assert np.all(np.diff(np.abs(got - 0.5)) >= -1e-12)
    np.testing.assert_allclose(np.sort(got), np.sort(hk))


def test_gather_scatter(ctx, rng):
    hx = rng.random(N)
    x = vex.vector(data=hx, context=ctx)
    idx = np.sort(rng.choice(N, size=100, replace=False))
    got = vex.gather(x, idx)
    np.testing.assert_allclose(got, hx[idx])
    vex.scatter(np.zeros(100), idx, x)
    hx2 = np.asarray(x)
    assert np.all(hx2[idx] == 0)
    mask = np.ones(N, bool)
    mask[idx] = False
    np.testing.assert_allclose(hx2[mask], hx[mask])


def test_sort_sharded_vector(ctx, rng):
    """Sort of a mesh-sharded vector: XLA redistributes device-side
    (replaces the reference's host k-way merge, sort.hpp:1924-2068)."""
    n = 1 << 13  # divisible by 8 -> sharded storage
    hk = rng.random(n)
    k = vex.vector(data=hk, context=ctx)
    assert k.nparts == ctx.size
    vex.sort(k)
    np.testing.assert_allclose(np.asarray(k), np.sort(hk))


def test_scan_sharded_vector(ctx, rng):
    n = 1 << 13
    hx = rng.random(n)
    x = vex.vector(data=hx, context=ctx)
    y = vex.inclusive_scan(x)
    np.testing.assert_allclose(np.asarray(y), np.cumsum(hx), rtol=1e-10)


def test_pallas_segscan_kernel_interpret(rng):
    """Segmented-cumsum Pallas kernel (interpret mode): in-kernel flag
    derivation, Hillis-Steele lane phase, matmul cross-row carries,
    cross-block (key, value) scalar carry (ops/pallas_segscan.py)."""
    import jax.numpy as jnp

    from vexcl_tpu.ops.pallas_segscan import pallas_segmented_cumsum

    for n, seg in [(1 << 19, 64), (300000, 13), (1 << 19, 1 << 19)]:
        keys = (np.arange(n) // seg).astype(np.int32)
        perm = rng.permutation(keys.max() + 1).astype(np.int32)
        keys = perm[keys]  # randomize key values, keep run structure
        x = rng.random(n).astype(np.float32)
        out = np.asarray(
            pallas_segmented_cumsum(jnp.asarray(keys), jnp.asarray(x)))
        heads = np.r_[True, keys[1:] != keys[:-1]]
        sid = np.cumsum(heads) - 1
        csum = np.cumsum(x.astype(np.float64))
        hpos = heads.nonzero()[0]
        start = np.zeros(sid.max() + 1)
        start[sid[hpos]] = csum[hpos] - x[hpos]
        ref = csum - start[sid]
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-3)


def test_scan_by_key_pallas_dispatch_variants(ctx, rng, monkeypatch):
    """Force the Pallas segscan dispatch (interpret-mode kernel) and check
    the exclusive/init derivations against the XLA monoid path."""
    import vexcl_tpu as vex
    import vexcl_tpu.ops.pallas_segscan as segscan

    n, seg = 1 << 13, 9
    hk = (np.arange(n) // seg).astype(np.int32)
    hv = rng.random(n).astype(np.float32)
    kv = vex.vector(data=hk, dtype=np.int32, context=ctx)
    vv = vex.vector(data=hv, context=ctx)

    ref_incl = np.asarray(vex.inclusive_scan_by_key(kv, vv))
    ref_excl = np.asarray(vex.exclusive_scan_by_key(kv, vv))
    ref_excl_i = np.asarray(vex.exclusive_scan_by_key(kv, vv, init=2.5))
    ref_incl_i = np.asarray(vex.inclusive_scan_by_key(kv, vv, init=2.5))

    monkeypatch.setattr(segscan, "use_pallas_segscan",
                        lambda *a, **k: True)
    np.testing.assert_allclose(
        np.asarray(vex.inclusive_scan_by_key(kv, vv)), ref_incl, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(vex.exclusive_scan_by_key(kv, vv)), ref_excl,
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(vex.exclusive_scan_by_key(kv, vv, init=2.5)),
        ref_excl_i, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(vex.inclusive_scan_by_key(kv, vv, init=2.5)),
        ref_incl_i, rtol=1e-5, atol=1e-5)

    rk, rv, m = vex.reduce_by_key(kv, vv)
    assert m == int(np.ceil(n / seg))


def test_pallas_monoid_scan_kernel_interpret(rng):
    """Min/max running-scan Pallas kernel in interpret mode
    (ops/pallas_monoid_scan.py) against numpy accumulate."""
    import jax.numpy as jnp

    from vexcl_tpu.ops.pallas_monoid_scan import pallas_cummax, pallas_cummin

    for n in (1 << 18, 300001):
        x = rng.standard_normal(n).astype(np.float32)
        got = np.asarray(pallas_cummax(jnp.asarray(x)))
        np.testing.assert_array_equal(got, np.maximum.accumulate(x))
        got = np.asarray(pallas_cummin(jnp.asarray(x)))
        np.testing.assert_array_equal(got, np.minimum.accumulate(x))


def test_scan_minmax_dispatch(ctx, rng, monkeypatch):
    """inclusive/exclusive min/max scans agree between the XLA monoid
    path and the forced Pallas monoid path (interpret kernel)."""
    import jax.numpy as jnp
    import vexcl_tpu as vex
    import vexcl_tpu.ops.pallas_monoid_scan as pms

    x = vex.vector(data=rng.standard_normal(1 << 13).astype(np.float32),
                   context=ctx)
    ref_i = np.asarray(vex.inclusive_scan(x, op=jnp.maximum, op_name="max"))
    np.testing.assert_array_equal(
        ref_i, np.maximum.accumulate(np.asarray(x)))

    monkeypatch.setattr(pms, "use_pallas_monoid_scan", lambda *a: True)
    got = np.asarray(vex.inclusive_scan(x, op=jnp.maximum, op_name="max"))
    np.testing.assert_array_equal(got, ref_i)
    got = np.asarray(vex.inclusive_scan(x, op=jnp.minimum, op_name="min"))
    np.testing.assert_array_equal(
        got, np.minimum.accumulate(np.asarray(x)))


def test_pallas_segscan_adversarial_keys(rng):
    """Keys colliding with the kernel's internal sentinels (-1 carry-key
    init, -2 pad key) must not change results."""
    import jax.numpy as jnp

    from vexcl_tpu.ops.pallas_segscan import pallas_segmented_cumsum

    n = 200000  # forces padding
    keys = (np.arange(n) // 17).astype(np.int32) - 5  # negative keys
    keys[0:17] = -1          # first segment key == carry-init sentinel
    keys[-23:] = -2          # last segment key == pad sentinel
    x = rng.random(n).astype(np.float32)
    out = np.asarray(pallas_segmented_cumsum(jnp.asarray(keys),
                                             jnp.asarray(x)))
    heads = np.r_[True, keys[1:] != keys[:-1]]
    sid = np.cumsum(heads) - 1
    csum = np.cumsum(x.astype(np.float64))
    hpos = heads.nonzero()[0]
    start = np.zeros(sid.max() + 1)
    start[sid[hpos]] = csum[hpos] - x[hpos]
    np.testing.assert_allclose(out, csum - start[sid], rtol=1e-5, atol=1e-3)


def test_scan_opname_only_and_custom_op_cache(ctx, rng):
    """Review fixes: op_name='max' with no op must compute a running max
    on every path, and two distinct anonymous ops must not share a
    cached kernel."""
    import vexcl_tpu as vex

    h = rng.standard_normal(4096).astype(np.float32)
    x = vex.vector(data=h, context=ctx)
    got = np.asarray(vex.inclusive_scan(x, op_name="max"))
    np.testing.assert_array_equal(got, np.maximum.accumulate(h))

    # two anonymous lambdas (same __name__) with different semantics
    a = np.asarray(vex.inclusive_scan(x, op=lambda p, q: p + q))
    import jax.numpy as jnp
    b = np.asarray(vex.inclusive_scan(x, op=lambda p, q: jnp.maximum(p, q)))
    np.testing.assert_allclose(a, np.cumsum(h.astype(np.float64)), rtol=1e-4)
    np.testing.assert_array_equal(b, np.maximum.accumulate(h))


def test_reduce_view_negative_axis(ctx, rng):
    """Review fix: reduce over axis -1 must size the output correctly."""
    import vexcl_tpu as vex

    h = rng.random((32, 16))
    m = vex.multi_array(None, data=h, context=ctx)
    out = np.asarray(vex.eval(vex.reduce_view("sum", m, -1)))
    np.testing.assert_allclose(out, h.sum(-1).ravel(), rtol=1e-12)


def test_multi_array_dtype_inference(ctx):
    """Review fix: multi_array infers the host data dtype like vector."""
    import vexcl_tpu as vex

    m32 = vex.multi_array(None, data=np.ones((2, 3), np.float32),
                          context=ctx)
    assert m32.dtype == np.float32
    m64 = vex.multi_array((4,), context=ctx)
    assert m64.dtype == np.float64


def test_reduce_by_key_compact_path(ctx1, rng):
    """End-to-end Pallas compact path (segscan + block compaction + sized
    assembly) in interpret mode, against the numpy oracle — including
    adversarial key patterns (single run, all-distinct, random runs,
    block-boundary straddles).  On TPU this path replaces the full-N sort
    compaction (VERDICT r2 item 1)."""
    import jax.numpy as jnp

    from vexcl_tpu.ops.reduce_by_key import _reduce_by_key_compact

    n = 300_000
    hv = rng.random(n).astype(np.float32)

    def oracle(hk):
        heads = np.concatenate([[True], hk[1:] != hk[:-1]])
        seg = np.cumsum(heads) - 1
        sums = np.zeros(seg[-1] + 1)
        np.add.at(sums, seg, hv.astype(np.float64))
        return hk[heads], sums

    patterns = {
        "runs64": (np.arange(n) // 64).astype(np.int32),
        "single": np.zeros(n, np.int32),
        "distinct": np.arange(n, dtype=np.int32),
        "random": np.sort(rng.integers(0, n // 50, n)).astype(np.int32),
        "unsorted_runs": rng.integers(0, 9, n).astype(np.int32),
    }
    for name, hk in patterns.items():
        v = vex.vector(data=hv, context=ctx1, sharded=False)
        karr = jnp.asarray(hk)
        ok, ov, m = _reduce_by_key_compact([karr], v, None, None, False)
        wk, wv = oracle(hk)
        assert m == len(wk), (name, m, len(wk))
        np.testing.assert_array_equal(np.asarray(ok), wk, err_msg=name)
        np.testing.assert_allclose(np.asarray(ov), wv, rtol=2e-5,
                                   err_msg=name)


def test_reduce_by_key_narrow_payloads_take_generic_path(ctx1, rng,
                                                         monkeypatch):
    """bf16 values / i16 keys pass the segscan guard but pallas_compact
    only transports 32/64-bit planes — the dispatch must FALL BACK to the
    generic path, not crash (code-review r2 finding)."""
    import importlib

    import jax.numpy as jnp

    rbk = importlib.import_module("vexcl_tpu.ops.reduce_by_key")
    segmod = importlib.import_module("vexcl_tpu.ops.pallas_segscan")
    cmpmod = importlib.import_module("vexcl_tpu.ops.pallas_compact")
    # force the guards open (on CPU they decline via interpret mode);
    # reduce_by_key imports them function-locally, so patch the sources
    monkeypatch.setattr(segmod, "use_pallas_segscan", lambda *a, **k: True)
    monkeypatch.setattr(cmpmod, "use_pallas_compact", lambda *a, **k: True)

    def boom(*a, **k):
        raise AssertionError("compact path must not run for narrow dtypes")

    monkeypatch.setattr(rbk, "_reduce_by_key_compact", boom)

    n = 4096
    hk = np.sort(rng.integers(0, 50, n)).astype(np.int16)
    hv = rng.random(n).astype(np.float32)
    heads = np.concatenate([[True], hk[1:] != hk[:-1]])
    seg = np.cumsum(heads) - 1
    sums = np.zeros(seg[-1] + 1)
    np.add.at(sums, seg, hv.astype(np.float64))

    # i16 keys + f32 values
    kv = vex.vector(data=hk, context=ctx1, sharded=False)
    vv = vex.vector(data=hv, context=ctx1, sharded=False)
    ok, ov, m = rbk.reduce_by_key(kv, vv)
    assert m == len(sums)
    np.testing.assert_allclose(np.asarray(ov), sums, rtol=2e-5)

    # i32 keys + bf16 values
    kv32 = vex.vector(data=hk.astype(np.int32), context=ctx1, sharded=False)
    vvb = vex.vector(data=jnp.asarray(hv).astype(jnp.bfloat16),
                     context=ctx1, sharded=False)
    ok2, ov2, m2 = rbk.reduce_by_key(kv32, vvb)
    assert m2 == len(sums)
    np.testing.assert_allclose(
        np.asarray(ov2.array).astype(np.float64), sums, rtol=3e-2)


def test_rbk_stage1_count_dtype_is_integer(ctx1, rng):
    """The synced (total, max) run-count stats must be integer: an f32
    total loses exactness past 2^24 runs (code-review r2 finding)."""
    import importlib

    import jax.numpy as jnp

    rbk = importlib.import_module("vexcl_tpu.ops.reduce_by_key")
    n = 300_000
    hv = rng.random(n).astype(np.float32)
    hk = (np.arange(n) // 64).astype(np.int32)
    jfn = rbk._rbk_stage1(1)
    out = jfn(jnp.asarray(hv), jnp.asarray(hk))
    stats = out[2]
    assert jnp.issubdtype(stats.dtype, jnp.integer), stats.dtype
    total, cmax = np.asarray(stats)
    assert total == -(-n // 64)      # 4688 runs (last one short)
    assert 0 < cmax <= total         # cmax = max per-BLOCK run count


def test_reduce_by_key_all_distinct_skips_assembly(ctx1, rng, monkeypatch):
    """Degenerate all-distinct keys: every element is its own run, so the
    compact path must return the inputs (copied) WITHOUT paying the
    stage-2 assembly sort (full-N cost, the r1 bottleneck)."""
    import importlib

    rbk = importlib.import_module("vexcl_tpu.ops.reduce_by_key")

    def boom(*a, **k):
        raise AssertionError("stage-2 assembly must be skipped when m == n")

    monkeypatch.setattr(rbk, "_rbk_stage2", boom)
    n = 200_000
    hv = rng.random(n).astype(np.float32)
    hk = np.arange(n, dtype=np.int32)
    v = vex.vector(data=hv, context=ctx1, sharded=False)
    import jax.numpy as jnp

    ok, ov, m = rbk._reduce_by_key_compact([jnp.asarray(hk)], v, None,
                                           None, False)
    assert m == n
    np.testing.assert_array_equal(np.asarray(ok), hk)
    np.testing.assert_allclose(np.asarray(ov), hv)
    # outputs own their buffers: mutating the input vector afterwards
    # (donation may invalidate its storage in place) must not affect them
    assert ov.array is not v.array


def test_reduce_by_key_compact_tuple_keys(ctx1, rng):
    """Tuple keys through the compact path (rbk_tuple analog,
    tests/reduce_by_key.cpp): combined head flags, both key arrays
    transported through the compaction."""
    import jax.numpy as jnp

    from vexcl_tpu.ops.reduce_by_key import _reduce_by_key_compact

    n = 200_000
    hv = rng.random(n).astype(np.float32)
    k1 = np.sort(rng.integers(0, 500, n)).astype(np.int32)
    k2 = (np.arange(n) // 97).astype(np.int64)

    heads = np.concatenate([[True], (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])])
    seg = np.cumsum(heads) - 1
    want = np.zeros(seg[-1] + 1)
    np.add.at(want, seg, hv.astype(np.float64))

    v = vex.vector(data=hv, context=ctx1, sharded=False)
    (ok1, ok2), ov, m = _reduce_by_key_compact(
        [jnp.asarray(k1), jnp.asarray(k2)], v, None, None, True)
    assert m == len(want)
    np.testing.assert_array_equal(np.asarray(ok1), k1[heads])
    np.testing.assert_array_equal(np.asarray(ok2), k2[heads])
    np.testing.assert_allclose(np.asarray(ov), want, rtol=2e-5)


def test_scan_by_key_tuple_and_keyeq_pallas_wiring(ctx1, rng, monkeypatch):
    """Tuple keys and custom key_eq now ride the Pallas segscan (flags
    derive in XLA; the kernel never sees keys).  Exercised in interpret
    mode by forcing the guard on."""
    import jax.numpy as jnp

    import vexcl_tpu.ops.pallas_segscan as ps

    monkeypatch.setattr(ps, "use_pallas_segscan_flags", lambda ks, x: True)

    n = 100_000
    hv = rng.random(n).astype(np.float32)
    k1 = (np.arange(n) // 64).astype(np.int32)
    k2 = (np.arange(n) // 1024).astype(np.int32)
    v = vex.vector(data=hv, context=ctx1, sharded=False)
    kv1 = vex.vector(data=k1, context=ctx1, sharded=False)
    kv2 = vex.vector(data=k2, context=ctx1, sharded=False)

    def oracle(heads):
        out = np.zeros(n)
        run = 0.0
        for i in range(n):
            run = hv[i] if heads[i] else run + hv[i]
            out[i] = run
        return out

    # tuple keys
    got = np.asarray(vex.inclusive_scan_by_key((kv1, kv2), v))
    heads = np.concatenate([[True], (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])])
    np.testing.assert_allclose(got, oracle(heads), rtol=2e-5)

    # custom key_eq: same-bucket-of-128 equivalence on k1
    key_eq = lambda a, b: (a // 2) == (b // 2)
    got2 = np.asarray(vex.inclusive_scan_by_key(kv1, v, key_eq=key_eq))
    heads2 = np.concatenate([[True], (k1[:-1] // 2) != (k1[1:] // 2)])
    np.testing.assert_allclose(got2, oracle(heads2), rtol=2e-5)

    # exclusive with init through the same path
    got3 = np.asarray(vex.exclusive_scan_by_key((kv1, kv2), v, init=2.5))
    excl = np.zeros(n)
    run = 0.0
    for i in range(n):
        excl[i] = 2.5 if heads[i] else run + 2.5
        run = hv[i] if heads[i] else run + hv[i]
    np.testing.assert_allclose(got3, excl, rtol=2e-5)


def test_scan_by_key_monoid_pallas(ctx1, rng, monkeypatch):
    """Segmented running max/min through the Pallas kernel (interpret
    mode, guard forced) vs the generic-path oracle — incl. negative data
    (a multiply-mask kernel form would pollute max with zeros)."""
    import jax.numpy as jnp

    import vexcl_tpu.ops.pallas_segscan as ps

    monkeypatch.setattr(ps, "use_pallas_segscan_flags", lambda ks, x: True)

    n = 150_000
    hv = (rng.random(n).astype(np.float32) - 0.7) * 5.0  # mostly negative
    k = (np.arange(n) // 37).astype(np.int32)
    v = vex.vector(data=hv, context=ctx1, sharded=False)
    kv = vex.vector(data=k, context=ctx1, sharded=False)

    def oracle(fn):
        out = np.empty(n, np.float64)
        run = None
        for i in range(n):
            run = hv[i] if (i == 0 or k[i] != k[i - 1]) else fn(run, hv[i])
            out[i] = run
        return out

    got = np.asarray(vex.inclusive_scan_by_key(kv, v, op_name="max"))
    np.testing.assert_allclose(got, oracle(max), rtol=1e-6)
    got = np.asarray(vex.inclusive_scan_by_key(kv, v, op=jnp.minimum,
                                               op_name="min"))
    np.testing.assert_allclose(got, oracle(min), rtol=1e-6)

    # exclusive max with init matches the generic path bit-for-bit
    got = np.asarray(vex.exclusive_scan_by_key(kv, v, init=-1.5,
                                               op_name="max"))
    monkeypatch.setattr(ps, "use_pallas_segscan_flags",
                        lambda ks, x: False)
    want = np.asarray(vex.exclusive_scan_by_key(kv, v, init=-1.5,
                                                op_name="max"))
    np.testing.assert_array_equal(got, want)

    # a CUSTOM op merely named "max" must NOT take the kernel path
    sneaky_calls = []
    def sneaky(a, b):
        sneaky_calls.append(1)
        return jnp.maximum(a, b)
    out2 = vex.inclusive_scan_by_key(kv, v, op=sneaky, op_name="max")
    assert sneaky_calls  # traced -> really used


def test_reduce_by_key_max(ctx1, rng):
    """reduce_by_key with the max monoid: compact path (interpret mode,
    direct) and generic path (op_name alone must mean max, not silently
    sum) against the numpy oracle."""
    from vexcl_tpu.ops.reduce_by_key import _reduce_by_key_compact

    n = 150_000
    hv = (rng.random(n).astype(np.float32) - 0.5) * 9.0
    hk = np.sort(rng.integers(0, n // 40, n)).astype(np.int32)
    heads = np.concatenate([[True], hk[1:] != hk[:-1]])
    seg = np.cumsum(heads) - 1
    want = np.full(seg[-1] + 1, -np.inf)
    np.maximum.at(want, seg, hv.astype(np.float64))

    import jax.numpy as jnp

    v = vex.vector(data=hv, context=ctx1, sharded=False)
    ok, ov, m = _reduce_by_key_compact(
        [jnp.asarray(hk)], v, None, None, False, "max")
    assert m == len(want)
    np.testing.assert_array_equal(np.asarray(ok), hk[heads])
    np.testing.assert_allclose(np.asarray(ov), want, rtol=1e-6)

    # generic path: op_name="max" with no op callable
    kv = vex.vector(data=hk, context=ctx1, sharded=False)
    ok2, ov2, m2 = vex.reduce_by_key(kv, v, op_name="max")
    assert m2 == len(want)
    np.testing.assert_allclose(np.asarray(ov2), want, rtol=1e-6)


def test_unrecognized_op_name_raises(ctx, rng):
    """op_name alone must select a known operation: op_name='prod' with no
    callable silently computed a SUM before the r2 review fix
    (ops/monoid.py shared dispatch)."""
    v = vex.vector(data=rng.random(64), context=ctx)
    k = vex.vector(data=np.zeros(64, np.int32), context=ctx)
    with pytest.raises(ValueError):
        vex.inclusive_scan(v, op_name="prod")
    with pytest.raises(ValueError):
        vex.inclusive_scan_by_key(k, v, op_name="prod")
    with pytest.raises(ValueError):
        vex.reduce_by_key(k, v, op_name="prod")
    # a callable with an unrecognized name still runs the generic path
    import jax.numpy as jnp

    out = vex.reduce_by_key(k, v, op=jnp.multiply, op_name="prod")
    np.testing.assert_allclose(np.asarray(out[1])[0],
                               np.prod(np.asarray(v)), rtol=1e-10)


def test_distributed_scan_engages_on_mesh(ctx, rng):
    """Sharded scans route to the shard_map three-phase scan (local scan
    + all_gather of D block tails + carry combine, ops/scan._scan_impl_dist)
    — the device-side version of the reference's host partial_sum fix-up
    (scan.hpp:426-458).  GSPMD alone all-gathers the whole signal for a
    cumulative op (measured: 3 all-gathers for a jitted sharded cumsum)."""
    import jax.numpy as jnp

    from vexcl_tpu.cache import kernel_cache

    n = 4096
    h = rng.standard_normal(n)
    x = vex.vector(data=h, context=ctx)
    y = vex.inclusive_scan(x)
    np.testing.assert_allclose(np.asarray(y), np.cumsum(h), rtol=1e-12)
    y = vex.exclusive_scan(x, init=5.0)
    ref = 5.0 + np.concatenate([[0], np.cumsum(h)[:-1]])
    ref[0] = 5.0
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-12)
    # custom associative op crosses shard boundaries correctly
    y = vex.inclusive_scan(x, op=lambda a, b: a + b + 1.0, op_name="addp1")
    ref = np.empty(n)
    acc = 0.0
    for i in range(n):
        acc = (acc + h[i] + 1.0) if i else h[i]
        ref[i] = acc
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-9)
    if ctx.size > 1:
        assert any(isinstance(k, tuple) and k and k[0] == "scan_dist"
                   for k in kernel_cache._store)


def test_distributed_scan_by_key_engages_on_mesh(ctx, rng):
    """Sharded segmented scans run the pair monoid as a shard_map
    three-phase scan: local pair scan, all_gather of the D block-tail
    pairs, carry combine gated on the shard's has-seen-a-head flag —
    segments spanning shard boundaries chain correctly."""
    n = 4096
    hk = (np.arange(n) // 700).astype(np.int64)  # runs cross shard edges
    hv = rng.standard_normal(n)
    k = vex.vector(data=hk, context=ctx)
    v = vex.vector(data=hv, context=ctx)

    def ref(exclusive, init=None):
        out = np.empty_like(hv)
        for i in range(n):
            head = i == 0 or hk[i] != hk[i - 1]
            if head:
                acc_prev = None
            out[i] = ((init or 0.0) if head else
                      (acc_prev if init is None else init + acc_prev)) \
                if exclusive else hv[i] if head else acc_prev + hv[i]
            acc_prev = hv[i] if head else acc_prev + hv[i]
            if not exclusive and init is not None:
                out[i] += init
        return out

    got = vex.inclusive_scan_by_key(k, v, op=lambda a, b: a + b,
                                    op_name="mysum")
    np.testing.assert_allclose(np.asarray(got), ref(False), rtol=1e-11)
    got = vex.exclusive_scan_by_key(k, v, init=2.5, op=lambda a, b: a + b,
                                    op_name="mysum")
    np.testing.assert_allclose(np.asarray(got), ref(True, 2.5), rtol=1e-11)
    if ctx.size > 1:
        from vexcl_tpu.cache import kernel_cache

        assert any(isinstance(kk, tuple) and kk and kk[0] == "scan_by_key"
                   and kk[-1] is not None for kk in kernel_cache._store)
