"""raw_pointer (N-body pattern, vector_pointer.hpp) + util coverage."""

import numpy as np
import pytest

import vexcl_tpu as vex


def test_raw_pointer_nbody(ctx, rng):
    """The reference's raw_pointer use-case: each output i reads arbitrary
    positions of x computed from i."""
    n = 512
    hx = rng.random(n)
    x = vex.vector(data=hx, context=ctx)
    p = vex.raw_pointer(x)
    i = vex.element_index(0, n)
    y = vex.vector(n, dtype=np.float64, context=ctx)
    # y[i] = x[(i*7+3) mod n] + x[i]
    y[:] = p[(i * 7 + 3) % n] + x
    np.testing.assert_allclose(
        np.asarray(y), hx[(np.arange(n) * 7 + 3) % n] + hx, rtol=1e-12
    )


def test_constant_pointer(ctx, rng):
    hx = rng.random(16)
    c = vex.vector(data=hx, context=ctx)
    p = vex.constant_pointer(c)
    i = vex.element_index(0, 64)
    y = vex.vector(64, dtype=np.float64, context=ctx)
    y[:] = p[i % 16]
    np.testing.assert_allclose(np.asarray(y), hx[np.arange(64) % 16], rtol=1e-12)


def test_util_functions():
    assert vex.nextpow2(1) == 1
    assert vex.nextpow2(17) == 32
    assert vex.alignup(10, 8) == 16
    with pytest.raises(ValueError):
        vex.precondition(False, "boom")


def test_manual_stencil_pointer_arithmetic(ctx, rng):
    """vector_pointer.cpp manual_stencil: raw-pointer arithmetic with
    temporaries, tags, and constants composing one kernel."""
    n = 1024
    hx = rng.random(n)
    x = vex.vector(data=hx, context=ctx)
    p = vex.raw_pointer(x)

    i = vex.make_temp(1, vex.element_index(length=n))
    left = vex.make_temp(2, vex.if_else(i > 0, i - 1, i))
    right = vex.make_temp(3, vex.if_else(i + 1 < n, i + 1, i))

    y = vex.vector(n, dtype=np.float64, context=ctx)
    y[:] = p[i] * 2 - p[left] - p[right]

    xl = hx[np.maximum(np.arange(n) - 1, 0)]
    xr = hx[np.minimum(np.arange(n) + 1, n - 1)]
    np.testing.assert_allclose(np.asarray(y), 2 * hx - xl - xr, rtol=1e-12)
