"""Port of the behavior covered by tests/vector_arithmetics.cpp (reference):
expression assignment, compound assignment, builtins, ternary, user
functions, tagged terminals, temporaries, constants, element_index."""

import numpy as np
import pytest

import vexcl_tpu as vex
from conftest import check_sample

N = 1024


def make(ctx, rng, n=N):
    a = rng.random(n)
    v = vex.vector(data=a, context=ctx)
    return a, v


def test_assign_expression(ctx, rng):
    ha, a = make(ctx, rng)
    hb, b = make(ctx, rng)
    hc, c = make(ctx, rng)
    x = vex.vector(N, dtype=np.float64, context=ctx)
    x[:] = 2 * a - vex.sin(b) * c
    check_sample(x, lambda i: 2 * ha[i] - np.sin(hb[i]) * hc[i])


def test_assign_scalar(ctx):
    x = vex.vector(N, dtype=np.float64, context=ctx)
    x[:] = 42.0
    assert np.all(np.asarray(x) == 42.0)


def test_compound_assignment(ctx, rng):
    ha, a = make(ctx, rng)
    hb, b = make(ctx, rng)
    x = vex.vector(N, dtype=np.float64, context=ctx)
    x[:] = 1.0
    x += a * b
    check_sample(x, lambda i: 1.0 + ha[i] * hb[i])
    x -= 2 * a
    check_sample(x, lambda i: 1.0 + ha[i] * hb[i] - 2 * ha[i])
    x *= 3.0
    check_sample(x, lambda i: 3 * (1.0 + ha[i] * hb[i] - 2 * ha[i]))
    x /= 3.0
    check_sample(x, lambda i: 1.0 + ha[i] * hb[i] - 2 * ha[i])


def test_cache_hits(ctx, rng):
    """Same expression structure with new data must reuse the compiled
    kernel (the sha1-keyed kernel cache analog, SURVEY §3.2)."""
    ha, a = make(ctx, rng)
    hb, b = make(ctx, rng)
    x = vex.vector(N, dtype=np.float64, context=ctx)
    x[:] = a + b
    before = len(vex.kernel_cache)
    hc, c = make(ctx, rng)
    hd, d = make(ctx, rng)
    x[:] = c + d
    assert len(vex.kernel_cache) == before
    check_sample(x, lambda i: hc[i] + hd[i])


def test_builtins(ctx, rng):
    ha, a = make(ctx, rng)
    x = vex.vector(N, dtype=np.float64, context=ctx)
    x[:] = vex.sqrt(a) + vex.exp(a) - vex.log(1 + a) + vex.floor(a * 10)
    check_sample(
        x,
        lambda i: np.sqrt(ha[i]) + np.exp(ha[i]) - np.log1p(ha[i]) + np.floor(ha[i] * 10),
    )
    x[:] = vex.pow(a, 2.5) + vex.atan2(a, 2 * a + 1)
    check_sample(x, lambda i: ha[i] ** 2.5 + np.arctan2(ha[i], 2 * ha[i] + 1))


def test_ternary(ctx, rng):
    ha, a = make(ctx, rng)
    x = vex.vector(N, dtype=np.float64, context=ctx)
    x[:] = vex.if_else(a > 0.5, a * 2, -a)
    check_sample(x, lambda i: ha[i] * 2 if ha[i] > 0.5 else -ha[i])


def test_user_function(ctx, rng):
    @vex.function
    def squared_radius(x, y):
        return x * x + y * y

    ha, a = make(ctx, rng)
    hb, b = make(ctx, rng)
    x = vex.vector(N, dtype=np.float64, context=ctx)
    x[:] = squared_radius(a, b) + 1
    check_sample(x, lambda i: ha[i] ** 2 + hb[i] ** 2 + 1)
    # dual functor: eager on scalars
    assert squared_radius(3.0, 4.0) == 25.0


def test_element_index(ctx):
    x = vex.vector(N, dtype=np.float64, context=ctx)
    x[:] = 0.5 * vex.element_index()
    check_sample(x, lambda i: 0.5 * i)
    x[:] = vex.element_index(offset=100) + 0.0
    check_sample(x, lambda i: i + 100.0)


def test_tagged_terminal(ctx, rng):
    ha, a = make(ctx, rng)
    x = vex.vector(N, dtype=np.float64, context=ctx)
    ta = vex.tag(1, a)
    x[:] = ta * ta + ta
    check_sample(x, lambda i: ha[i] ** 2 + ha[i])


def test_temporary(ctx, rng):
    ha, a = make(ctx, rng)
    x = vex.vector(N, dtype=np.float64, context=ctx)
    t = vex.make_temp(1, vex.sin(a) + 1)
    x[:] = t * t
    check_sample(x, lambda i: (np.sin(ha[i]) + 1) ** 2)


def test_constant(ctx, rng):
    ha, a = make(ctx, rng)
    x = vex.vector(N, dtype=np.float64, context=ctx)
    x[:] = vex.constant(np.pi, "pi") * a
    check_sample(x, lambda i: np.pi * ha[i])


def test_cast(ctx, rng):
    ha, a = make(ctx, rng)
    x = vex.vector(N, dtype=np.int32, context=ctx)
    x[:] = vex.cast(np.int32, a * 100)
    check_sample(x, lambda i: np.int32(ha[i] * 100), atol=1)


def test_size_mismatch_raises(ctx, rng):
    _, a = make(ctx, rng, n=N)
    _, b = make(ctx, rng, n=N // 2)
    x = vex.vector(N, dtype=np.float64, context=ctx)
    with pytest.raises(ValueError):
        x[:] = a + b


def test_vector_copy_readwrite(ctx, rng):
    ha, a = make(ctx, rng)
    b = a.copy()
    assert np.allclose(np.asarray(b), ha)
    b.write_data(np.zeros(10), offset=5)
    hb = np.asarray(b)
    assert np.all(hb[5:15] == 0)
    assert np.allclose(hb[:5], ha[:5])
    assert b[3] == pytest.approx(ha[3])
    b[3] = 7.0
    assert b[3] == 7.0


def test_reinterpret(ctx):
    a = vex.vector(data=np.arange(16, dtype=np.uint32), context=ctx)
    b = a.reinterpret(np.float32)
    back = b.reinterpret(np.uint32)
    assert np.array_equal(np.asarray(back), np.arange(16, dtype=np.uint32))


def test_comparison_and_logic(ctx, rng):
    ha, a = make(ctx, rng)
    x = vex.vector(N, dtype=np.float64, context=ctx)
    x[:] = vex.if_else((a > 0.25) & (a < 0.75), 1.0, 0.0)
    check_sample(x, lambda i: 1.0 if 0.25 < ha[i] < 0.75 else 0.0)


def test_compound_with_expression_rhs(ctx, rng):
    """x = 2*x + y pattern: LHS appears in RHS."""
    ha, a = make(ctx, rng)
    hx = np.linspace(0, 1, N)
    x = vex.vector(data=hx.copy(), context=ctx)
    x[:] = 2 * x + a
    check_sample(x, lambda i: 2 * hx[i] + ha[i])


def test_multi_device_partition(ctx):
    x = vex.vector(N, context=ctx)
    assert x.nparts == ctx.size
    p = x.partition()
    assert p[0] == 0 and p[-1] == N and len(p) == ctx.size + 1


def test_scalar_leaves_committed_once(ctx, rng):
    """Scalar expression leaves are committed to the device set once per
    distinct (value, type) and reused across calls (expr/compile
    _commit_scalars) — a per-call host->device scalar transfer is a
    tunnel-RTT-class cost on the real chip.  Committed scalars keep
    weak_type, so dtype promotion is unchanged."""
    from vexcl_tpu.expr.compile import _scalar_cache

    hx = rng.random(1024).astype(np.float32)
    x = vex.vector(data=hx, context=ctx)
    z = vex.vector(1024, dtype=np.float32, context=ctx)
    z[:] = 2 * x + 0.25
    np.testing.assert_allclose(np.asarray(z), 2 * hx + 0.25, rtol=1e-6)
    assert z.dtype == np.float32  # weak-typed scalars: no f64 upcast
    size0 = len(_scalar_cache)
    for _ in range(5):
        z[:] = 2 * x + 0.25
    assert len(_scalar_cache) == size0  # reused, not re-committed
    # distinct values/types get their own entries; results stay exact
    z[:] = 3 * x + np.float32(0.5)
    np.testing.assert_allclose(np.asarray(z), 3 * hx + 0.5, rtol=1e-6)
    assert len(_scalar_cache) >= size0 + 1
    vex.purge_caches()
    assert len(_scalar_cache) == 0
    z[:] = 2 * x + 0.25  # repopulates transparently
    np.testing.assert_allclose(np.asarray(z), 2 * hx + 0.25, rtol=1e-6)


def test_scalar_cache_signed_zero_and_nan(ctx, rng):
    """+0.0 and -0.0 are distinct committed scalars (0.0 == -0.0 would
    collapse them, breaking sign-of-zero semantics), and NaN scalars hit
    the cache (bit-pattern keys; nan != nan would miss every lookup)."""
    from vexcl_tpu.expr.compile import _scalar_cache

    hx = np.ones(512, np.float32)
    x = vex.vector(data=hx, context=ctx)
    z = vex.vector(512, dtype=np.float32, context=ctx)
    z[:] = x * 0.0
    assert not np.signbit(np.asarray(z)).any()
    z[:] = x * -0.0
    assert np.signbit(np.asarray(z)).all()
    n0 = len(_scalar_cache)
    for _ in range(3):
        z[:] = x * float("nan")
    assert np.isnan(np.asarray(z)).all()
    assert len(_scalar_cache) == n0 + 1  # one entry, reused


def test_odd_size_leafless_expression_assign(ctx, rng):
    # a leafless expression (element_index + scalars, no sharded array
    # leaves) compiles with no committed sharded inputs, so its result can
    # land on the default device; assigning it to an odd-size SHARDED
    # vector must still pad + reshard (fuzz regression, vector.py
    # _pad_and_place)
    n = 1003
    z = vex.vector(n, dtype=np.float32, context=ctx)
    z[:] = 1.0 * vex.element_index(0, n) + 2.0
    assert np.allclose(np.asarray(z), np.arange(n) + 2.0)
    # mixed tree: sharded leaf + logical-length index terminal
    ha = rng.random(n).astype(np.float32)
    a = vex.vector(data=ha, context=ctx)
    z[:] = vex.pow(vex.fabs(a) + 0.5, vex.element_index(0, n) * 1e-3)
    ref = np.power(np.abs(ha) + np.float32(0.5),
                   np.arange(n, dtype=np.float32) * np.float32(1e-3))
    assert np.allclose(np.asarray(z), ref, rtol=1e-5)


def test_user_functions_same_signature(ctx, rng):
    """tests/vector_arithmetics.cpp user_defined_functions_same_signature:
    two user functions with identical signatures must not share kernels."""
    ha, a = make(ctx, rng)
    x = vex.vector(N, dtype=np.float64, context=ctx)

    times2 = vex.Function("times2", lambda v: v * 2)
    times4 = vex.Function("times4", lambda v: v * 4)
    x[:] = times2(a)
    check_sample(x, lambda i: ha[i] * 2)
    x[:] = times4(a)
    check_sample(x, lambda i: ha[i] * 4)

    Sum = vex.Reductor(vex.SUM)
    assert Sum(times2(a)) == pytest.approx(2 * ha.sum())
    assert Sum(times4(a)) == pytest.approx(4 * ha.sum())


def test_equal_named_functions_compile_separately(ctx, rng):
    """Kernel-cache keying hazard: the reference keys compiled kernels on
    the generated SOURCE (opencl/compiler.hpp:127-149), so two functions
    both named "f" with different bodies can never collide.  The traced
    analog must key on the callable's identity, not its display name."""
    ha, a = make(ctx, rng)
    x = vex.vector(N, dtype=np.float64, context=ctx)

    f1 = vex.Function("f", lambda v: v + 1.0)
    f2 = vex.Function("f", lambda v: v - 1.0)
    x[:] = f1(a)
    check_sample(x, lambda i: ha[i] + 1.0)
    x[:] = f2(a)  # same name, same expression structure, different body
    check_sample(x, lambda i: ha[i] - 1.0)

    # redefinition pattern: drop and rebuild under the same name
    del f1, f2
    f3 = vex.Function("f", lambda v: v * 10.0)
    x[:] = f3(a)
    check_sample(x, lambda i: ha[i] * 10.0)

    # purge drops the token registry together with the evaluators
    vex.purge_caches()
    x[:] = f3(a)
    check_sample(x, lambda i: ha[i] * 10.0)
