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


def test_multivector_temporary(ctx, rng):
    """temporary.cpp multivector_temporary: make_temp lifts componentwise
    over multivector expressions."""
    hx = rng.random((M, N))
    x = vex.multivector(data=hx, context=ctx)
    y = vex.multivector(N, M, dtype=np.float64, context=ctx)
    t = vex.make_temp(1, x * 2)
    y[:] = t + t
    for i in range(M):
        np.testing.assert_allclose(np.asarray(y(i)), hx[i] * 4)
    # mixed with builtins
    t2 = vex.make_temp(2, vex.sin(x))
    y[:] = t2 * t2 + 1
    for i in range(M):
        np.testing.assert_allclose(np.asarray(y(i)), np.sin(hx[i]) ** 2 + 1)


def test_multivector_copy(ctx, rng):
    """multivector_create.cpp copy_constructor: deep copy."""
    hx = rng.random((M, N))
    x = vex.multivector(data=hx, context=ctx)
    y = x.copy()
    y += 1.0
    for i in range(M):
        np.testing.assert_allclose(np.asarray(x(i)), hx[i])
        np.testing.assert_allclose(np.asarray(y(i)), hx[i] + 1)


def test_enqueue_multiexpression(ctx, ctx1, rng):
    """events.cpp enqueue_multiexpression: redirect a fused tie /
    multivector assignment to another context."""
    n = 256
    ha = rng.random(n)
    a = vex.vector(data=ha, context=ctx)
    x = vex.vector(n, dtype=np.float64, context=ctx)
    y = vex.vector(n, dtype=np.float64, context=ctx)

    vex.enqueue(ctx1)(vex.tie(x, y))[:] = (a * 2, a * 3)
    np.testing.assert_allclose(np.asarray(x), ha * 2)
    np.testing.assert_allclose(np.asarray(y), ha * 3)
    # components migrated to the target context
    assert x.context is ctx1 and y.context is ctx1

    # compound through the proxy
    p = vex.enqueue(ctx1)(vex.tie(x, y))
    p += (a, a)
    np.testing.assert_allclose(np.asarray(x), ha * 3)
    np.testing.assert_allclose(np.asarray(y), ha * 4)

    # multivector form
    hm = rng.random((M, n))
    m = vex.multivector(data=hm, context=ctx)
    m2 = vex.multivector(n, M, dtype=np.float64, context=ctx)
    vex.enqueue(ctx1)(m2)[:] = m * 2 + 1
    for i in range(M):
        np.testing.assert_allclose(np.asarray(m2(i)), hm[i] * 2 + 1)
