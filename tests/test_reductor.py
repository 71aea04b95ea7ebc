"""Port of tests/reductor.cpp behavior: SUM/MIN/MAX over expressions,
Kahan, combined MIN_MAX, any_of/all_of."""

import numpy as np
import pytest

import vexcl_tpu as vex

N = 1 << 16


def test_sum_of_expression(ctx, rng):
    ha = rng.random(N)
    hb = rng.random(N)
    a = vex.vector(data=ha, context=ctx)
    b = vex.vector(data=hb, context=ctx)
    Sum = vex.Reductor(vex.SUM)
    s = Sum(a * b)
    assert s == pytest.approx(np.dot(ha, hb), rel=1e-8)
    # plain vector
    assert Sum(a) == pytest.approx(ha.sum(), rel=1e-8)
    # expression with scalars and builtins
    s2 = Sum(2 * a + vex.sin(b))
    assert s2 == pytest.approx((2 * ha + np.sin(hb)).sum(), rel=1e-8)


def test_min_max(ctx, rng):
    ha = rng.standard_normal(N)
    a = vex.vector(data=ha, context=ctx)
    assert vex.Reductor(vex.MIN)(a) == pytest.approx(ha.min())
    assert vex.Reductor(vex.MAX)(a) == pytest.approx(ha.max())
    # combined one-pass reduction (reductor.hpp:133-280)
    lo, hi = vex.Reductor(vex.MIN_MAX)(a)
    assert lo == pytest.approx(ha.min())
    assert hi == pytest.approx(ha.max())


def test_kahan(ctx):
    # many small values whose naive f32 sum drifts
    n = 1 << 20
    ha = np.full(n, 0.1, dtype=np.float32)
    a = vex.vector(data=ha, context=ctx)
    exact = 0.1 * n
    kahan = vex.Reductor(np.float32, vex.SUM_Kahan)(a)
    assert kahan == pytest.approx(exact, rel=1e-6)


def test_reduction_of_elem_index(ctx):
    a = vex.vector(N, dtype=np.float64, context=ctx)
    a[:] = 1.0
    Sum = vex.Reductor(vex.SUM)
    # expression containing element_index
    s = Sum(a * vex.element_index())
    assert s == pytest.approx(N * (N - 1) / 2)


def test_any_all(ctx, rng):
    ha = rng.random(N)
    a = vex.vector(data=ha, context=ctx)
    assert vex.any_of(a > 0.999999) == bool((ha > 0.999999).any())
    assert vex.all_of(a >= 0.0)
    assert not vex.any_of(a > 2.0)
    assert not vex.all_of(a > 0.5)


def test_reductor_dtype(ctx):
    ha = np.arange(N, dtype=np.int32)
    a = vex.vector(data=ha, context=ctx)
    s = vex.Reductor(np.int64, vex.SUM)(a)
    assert s == int(ha.astype(np.int64).sum())


def test_reductor_unsized_expression_raises(ctx):
    # a scalar-only tree has no sized terminal: reducing it must raise
    # (it used to silently reduce ONE broadcast element)
    with pytest.raises(vex.ExpressionError):
        vex.Reductor(vex.SUM)(2.5 * vex.element_index() + 1.0)
    # ... unless element_index carries an explicit length
    s = vex.Reductor(vex.SUM)(vex.element_index(0, 100))
    assert s == pytest.approx(100 * 99 / 2)
