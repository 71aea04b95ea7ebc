"""Port of tests/multivector_arithmetics.cpp + tie semantics: fused
multi-expression assignment."""

import numpy as np
import pytest

import vexcl_tpu as vex

N = 4096
M = 3


def test_multivector_expression(ctx, rng):
    hx = rng.random((M, N))
    hy = rng.random((M, N))
    x = vex.multivector(data=hx, context=ctx, dtype=np.float64)
    y = vex.multivector(data=hy, context=ctx, dtype=np.float64)
    z = vex.multivector(N, M, dtype=np.float64, context=ctx)
    z[:] = 2 * x - vex.cos(y)
    got = z.to_numpy()
    np.testing.assert_allclose(got, 2 * hx - np.cos(hy), rtol=1e-10)


def test_multivector_compound(ctx, rng):
    hx = rng.random((M, N))
    x = vex.multivector(data=hx, context=ctx, dtype=np.float64)
    x += x * 0.5
    np.testing.assert_allclose(x.to_numpy(), 1.5 * hx, rtol=1e-10)


def test_multivector_scalar_and_vector_broadcast(ctx, rng):
    hx = rng.random((M, N))
    hv = rng.random(N)
    x = vex.multivector(data=hx, context=ctx, dtype=np.float64)
    v = vex.vector(data=hv, context=ctx)
    x[:] = x + v  # vector broadcast across components
    np.testing.assert_allclose(x.to_numpy(), hx + hv, rtol=1e-10)
    x[:] = 7.0
    assert np.all(x.to_numpy() == 7.0)


def test_component_access(ctx, rng):
    hx = rng.random((M, N))
    x = vex.multivector(data=hx, context=ctx, dtype=np.float64)
    comp1 = x(1)
    np.testing.assert_allclose(np.asarray(comp1), hx[1], rtol=1e-14)
    elem = x[5]
    assert len(elem) == M
    assert elem[2] == pytest.approx(hx[2, 5])


def test_tie(ctx, rng):
    ha = rng.random(N)
    hb = rng.random(N)
    a = vex.vector(data=ha, context=ctx)
    b = vex.vector(data=hb, context=ctx)
    x = vex.vector(N, dtype=np.float64, context=ctx)
    y = vex.vector(N, dtype=np.float64, context=ctx)
    # one fused kernel computes both (operations.hpp tie :2251)
    vex.tie(x, y)[:] = (a + b, a - b)
    np.testing.assert_allclose(np.asarray(x), ha + hb, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(y), ha - hb, rtol=1e-10)


def test_tie_swap_idiom(ctx, rng):
    """tie(x, y) = (y, x) — classic use from the reference docs."""
    ha = rng.random(N)
    hb = rng.random(N)
    x = vex.vector(data=ha, context=ctx)
    y = vex.vector(data=hb, context=ctx)
    vex.tie(x, y)[:] = (y + 0.0, x + 0.0)
    np.testing.assert_allclose(np.asarray(x), hb)
    np.testing.assert_allclose(np.asarray(y), ha)
