"""Ports of tests/{vector_create,vector_copy,vector_io,deduce,types,
reinterpret,constants}.cpp behaviors."""

import numpy as np
import pytest

import vexcl_tpu as vex


def test_create_variants(ctx):
    v1 = vex.vector(100, context=ctx)  # size only
    assert v1.size == 100 and v1.dtype == np.float32
    v2 = vex.vector(100, dtype="double", context=ctx)
    assert v2.dtype == np.float64
    v3 = vex.vector(data=[1, 2, 3], context=ctx)  # host iterable
    assert v3.size == 3
    v4 = vex.vector(np.arange(5.0), context=ctx)  # positional host data
    assert v4.size == 5 and v4[4] == 4.0
    v5 = vex.vector(10, fill=7.5, context=ctx)
    assert np.all(np.asarray(v5) == 7.5)
    v6 = vex.vector(0, context=ctx)  # empty
    assert v6.size == 0
    v6.resize(4, fill=1.0)
    assert v6.size == 4 and np.all(np.asarray(v6) == 1.0)


def test_copy_semantics(ctx, rng):
    ha = rng.random(64)
    a = vex.vector(data=ha, context=ctx)
    b = a.copy()
    b += 1.0  # deep copy: a unchanged
    np.testing.assert_allclose(np.asarray(a), ha)
    np.testing.assert_allclose(np.asarray(b), ha + 1)
    # vex.copy host<->device family (vector.hpp:998-1228)
    host = vex.copy(a)
    np.testing.assert_allclose(host, ha)
    c = vex.vector(64, dtype=np.float64, context=ctx)
    vex.copy(a, c)
    np.testing.assert_allclose(np.asarray(c), ha)
    buf = np.zeros(64)
    vex.copy(a, buf)
    np.testing.assert_allclose(buf, ha)
    vex.copy(np.ones(64), c)
    assert np.all(np.asarray(c) == 1.0)
    # swap
    a.swap(c)
    assert np.all(np.asarray(a) == 1.0)


def test_io_repr(ctx):
    v = vex.vector(data=np.arange(5.0), context=ctx)
    s = repr(v)
    assert "0" in s and "4" in s and "vector" in s
    long = vex.vector(1000, context=ctx)
    assert "..." in repr(long)
    # iteration protocol
    assert list(v) == [0, 1, 2, 3, 4]


def test_deduction(ctx):
    """Type deduction through expressions (deduce.cpp analog)."""
    a = vex.vector(data=np.arange(8, dtype=np.int32), context=ctx)
    b = vex.vector(data=np.arange(8, dtype=np.float64), context=ctx)
    out = vex.eval(a + b)
    assert np.asarray(out).dtype == np.float64
    out2 = vex.eval(a / 2)  # int / int-scalar -> float (numpy semantics)
    assert np.issubdtype(np.asarray(out2).dtype, np.floating)
    out3 = vex.eval(a & 3)
    assert np.asarray(out3).dtype == np.int32


def test_reinterpret_roundtrip(ctx):
    a = vex.vector(data=np.arange(8, dtype=np.float64), context=ctx)
    bits = a.reinterpret(np.uint64)
    back = bits.reinterpret(np.float64)
    np.testing.assert_array_equal(np.asarray(back), np.arange(8.0))
    # width-changing reinterpret: f64 -> 2x u32
    halves = a.reinterpret(np.uint32)
    assert halves.size == 16


def test_math_constants(ctx):
    """VEX_CONSTANT math catalog (constants.hpp:167-240)."""
    x = vex.vector(4, dtype=np.float64, context=ctx)
    x[:] = vex.constant(np.pi, "pi") + 0 * vex.element_index()
    assert np.allclose(np.asarray(x), np.pi)


def test_enqueue_expressions_numpy_interop(ctx):
    """multi_array.cpp analog: numpy arrays participate directly."""
    h = np.linspace(0, 1, 32)
    out = vex.eval(vex.as_expr(h) * 2 + 1)
    np.testing.assert_allclose(np.asarray(out), h * 2 + 1)


def test_map_write_back(ctx):
    """vector::map as context manager: mutations written back on exit
    (vector.hpp:805 map/unmap semantics)."""
    a = vex.vector(data=np.arange(24.0), context=ctx)
    with a.map(1) as m:
        m[:] = -1.0
    p = a.partition()
    h = np.asarray(a)
    assert np.all(h[p[1]:p[2]] == -1.0)
    assert h[p[1] - 1] != -1.0
    # plain read form still works
    np.testing.assert_allclose(a.map(0), h[p[0]:p[1]])


def test_vector_smaller_than_mesh(ctx, rng):
    """some_devices_are_empty (tests/vector_create.cpp): a vector with
    fewer elements than devices still constructs, computes, and reads
    back (the reference leaves trailing devices with empty partitions;
    here the padded storage covers the slack)."""
    import jax

    ndev = len(jax.devices())
    for n in (1, max(2, ndev - 1)):
        ha = rng.random(n)
        a = vex.vector(data=ha, context=ctx)
        out = vex.vector(n, dtype=np.float64, context=ctx)
        out[:] = 2 * a + 1
        np.testing.assert_allclose(np.asarray(out), 2 * ha + 1, rtol=1e-12)
        s = vex.Reductor(vex.SUM)(a)
        np.testing.assert_allclose(s, ha.sum(), rtol=1e-12)


def test_deduction_extended(ctx):
    """deduce.cpp corners: logical exprs, ternary, cast, element_index,
    user-function return type, view-reduce dtype."""
    a = vex.vector(data=np.arange(8, dtype=np.int32), context=ctx)
    x = vex.vector(data=np.arange(8, dtype=np.float64), context=ctx)

    # logical_expr: comparisons deduce boolean (reference: cl_long)
    out = vex.eval(a < x)
    assert np.asarray(out).dtype == np.bool_
    out = vex.eval(~(a > 2))
    assert np.asarray(out).dtype == np.bool_

    # ternary_operator: if_else(cond, int, double) -> double
    out = vex.eval(vex.if_else(a < 4, a, x))
    assert np.asarray(out).dtype == np.float64

    # casted_terminals
    out = vex.eval(vex.cast(np.int32, x) + a)
    assert np.asarray(out).dtype == np.int32

    # element_index deduces an integer type
    out = vex.eval(vex.element_index(length=8) * 1)
    assert np.issubdtype(np.asarray(out).dtype, np.integer)

    # user_functions: the function body's result dtype wins over the
    # argument dtypes (deduce.cpp user_functions: f returning int from
    # double args deduces int)
    f = vex.Function("f42i", lambda u: (u * 0 + 42).astype(np.int32))
    out = vex.eval(f(x))
    assert np.asarray(out).dtype == np.int32

    # reduced_view keeps the element dtype
    from vexcl_tpu.expr.view import slicer

    hz = np.arange(32 * 32, dtype=np.float64)
    z = vex.vector(data=hz, context=ctx)
    s = slicer((32, 32))
    out = vex.eval(vex.reduce_view("sum", s[:, :](z), 1))
    assert np.asarray(out).dtype == np.float64
