"""Port of tests/vector_view.cpp + tensordot.cpp behavior: slicing,
permutation, reshape, slice-reduce, tensordot."""

import numpy as np
import pytest

import vexcl_tpu as vex

N = 32  # N x N matrix as flat vector, like the reference tests


def test_slice_rows_cols(ctx, rng):
    hx = rng.random(N * N)
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(N, dtype=np.float64, context=ctx)
    slc = vex.slicer((N, N))
    y[:] = slc[5](x)  # row 5
    np.testing.assert_allclose(np.asarray(y), hx.reshape(N, N)[5], rtol=1e-12)
    y[:] = slc[:, 7](x)  # column 7
    np.testing.assert_allclose(np.asarray(y), hx.reshape(N, N)[:, 7], rtol=1e-12)


def test_slice_range_stride(ctx, rng):
    hx = rng.random(N * N)
    x = vex.vector(data=hx, context=ctx)
    slc = vex.slicer((N, N))
    sub = vex.vector(8 * N, dtype=np.float64, context=ctx)
    sub[:] = slc[vex.r(0, 2, 16)](x)  # rows 0,2,...,14
    np.testing.assert_allclose(
        np.asarray(sub), hx.reshape(N, N)[0:16:2].ravel(), rtol=1e-12
    )


def test_1d_slice_of_vector(ctx, rng):
    hx = rng.random(N * N)
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(100, dtype=np.float64, context=ctx)
    y[:] = x[200:300]
    np.testing.assert_allclose(np.asarray(y), hx[200:300], rtol=1e-12)


def test_permutation(ctx, rng):
    hx = rng.random(N * N)
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(N * N, dtype=np.float64, context=ctx)
    # reverse permutation via index expression (expr_permutation)
    idx = vex.element_index(0, N * N)
    y[:] = vex.permutation(N * N - 1 - idx)(x)
    np.testing.assert_allclose(np.asarray(y), hx[::-1], rtol=1e-12)
    # explicit index vector
    hperm = rng.permutation(N * N)
    p = vex.vector(data=hperm.astype(np.int64), context=ctx)
    y[:] = vex.permutation(p)(x)
    np.testing.assert_allclose(np.asarray(y), hx[hperm], rtol=1e-12)


def test_reshape_transpose(ctx, rng):
    """vex::reshape with order (1,0): matrix transpose
    (vector_view.hpp:1099-1125)."""
    n, m = 12, 17
    hx = rng.random(n * m)
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(n * m, dtype=np.float64, context=ctx)
    y[:] = vex.reshape(x, (m, n), order=(1, 0))
    np.testing.assert_allclose(
        np.asarray(y).reshape(m, n), hx.reshape(n, m).T, rtol=1e-12
    )


def test_reshape_broadcast(ctx, rng):
    """order a subset of dims -> broadcast along the missing dim."""
    n, m = 8, 6
    hv = rng.random(m)
    v = vex.vector(data=hv, context=ctx)
    y = vex.vector(n * m, dtype=np.float64, context=ctx)
    y[:] = vex.reshape(v, (n, m), order=(1,))
    np.testing.assert_allclose(
        np.asarray(y).reshape(n, m), np.tile(hv, (n, 1)), rtol=1e-12
    )


def test_slice_reduce(ctx, rng):
    """vex::reduce<SUM>(slicer[...](x), dims) (reduced_vector_view)."""
    hx = rng.random(N * N)
    x = vex.vector(data=hx, context=ctx)
    slc = vex.slicer((N, N))
    rowsum = vex.vector(N, dtype=np.float64, context=ctx)
    rowsum[:] = vex.reduce_view("sum", slc[:, :](x), 1)
    np.testing.assert_allclose(
        np.asarray(rowsum), hx.reshape(N, N).sum(axis=1), rtol=1e-10
    )
    colmax = vex.vector(N, dtype=np.float64, context=ctx)
    colmax[:] = vex.reduce_view("max", slc[:, :](x), 0)
    np.testing.assert_allclose(
        np.asarray(colmax), hx.reshape(N, N).max(axis=0), rtol=1e-12
    )


def test_tensordot_matmul(ctx, rng):
    """tensordot == matrix product (tensordot.hpp docs example)."""
    n = 16
    ha = rng.random(n * n)
    hb = rng.random(n * n)
    a = vex.vector(data=ha, context=ctx)
    b = vex.vector(data=hb, context=ctx)
    c = vex.vector(n * n, dtype=np.float64, context=ctx)
    slc = vex.slicer((n, n))
    c[:] = vex.tensordot(slc[:, :](a), slc[:, :](b), vex.axes_pairs(1, 0))
    np.testing.assert_allclose(
        np.asarray(c).reshape(n, n),
        ha.reshape(n, n) @ hb.reshape(n, n),
        rtol=1e-10,
    )


def test_tensordot_mat_vec_and_vec_mat(ctx, rng):
    """tensordot.cpp mat_vec / vec_mat: rank-mixed contractions, with
    both plain-view and expression operands."""
    n, m = 32, 24
    hA = rng.random(n * m)
    hv = rng.random(m)
    A = vex.vector(data=hA, context=ctx)
    v = vex.vector(data=hv, context=ctx)
    slcA = vex.slicer((n, m))
    slcv = vex.slicer((m,))

    y = vex.vector(n, dtype=np.float64, context=ctx)
    y[:] = vex.tensordot(slcA[:, :](A), slcv[:](v), vex.axes_pairs(1, 0))
    np.testing.assert_allclose(np.asarray(y), hA.reshape(n, m) @ hv,
                               rtol=1e-10)

    x = vex.vector(n, dtype=np.float64, context=ctx)
    x[:] = vex.tensordot(slcv[:](v), slcA[:, :](A), vex.axes_pairs(0, 1))
    np.testing.assert_allclose(np.asarray(x), hv @ hA.reshape(n, m).T,
                               rtol=1e-10)
    # expression operand (beyond the reference: lazy operand trees)
    x[:] = vex.tensordot(2 * slcv[:](v), slcA[:, :](A), vex.axes_pairs(0, 1))
    np.testing.assert_allclose(np.asarray(x), 2 * hv @ hA.reshape(n, m).T,
                               rtol=1e-10)


def test_view_in_expression(ctx, rng):
    hx = rng.random(N * N)
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(N, dtype=np.float64, context=ctx)
    slc = vex.slicer((N, N))
    y[:] = 2 * slc[3](x) + vex.sin(slc[:, 4](x))
    expect = 2 * hx.reshape(N, N)[3] + np.sin(hx.reshape(N, N)[:, 4])
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-12)


def test_tensordot_size_hint_standalone(ctx, rng):
    """Bare eval(tensordot(...)) must size itself from the view shapes
    (VERDICT r1 weak 8: size_hint returned None)."""
    n, m, k = 12, 8, 5
    ha = rng.random(n * m)
    hb = rng.random(m * k)
    x = vex.vector(data=ha, context=ctx)
    y = vex.vector(data=hb, context=ctx)
    A = vex.slicer((n, m))
    B = vex.slicer((m, k))
    expr = vex.tensordot(A[:, :](x), B[:, :](y), vex.axes_pairs(1, 0))
    assert expr.size_hint() == n * k
    got = np.asarray(vex.eval(expr))
    np.testing.assert_allclose(
        got.reshape(n, k), ha.reshape(n, m) @ hb.reshape(m, k), rtol=1e-10)


def test_tensordot_size_hint_negative_axes(ctx, rng):
    """Negative contraction axes (accepted by jnp.tensordot) must be
    normalized in size_hint (code-review r2 finding: the contracted dim
    was wrongly counted in the output size)."""
    n, m, k = 12, 8, 5
    ha = rng.random(n * m)
    hb = rng.random(m * k)
    x = vex.vector(data=ha, context=ctx)
    y = vex.vector(data=hb, context=ctx)
    A = vex.slicer((n, m))
    B = vex.slicer((m, k))
    expr = vex.tensordot(A[:, :](x), B[:, :](y), vex.axes_pairs(-1, 0))
    assert expr.size_hint() == n * k
    got = np.asarray(vex.eval(expr))
    np.testing.assert_allclose(
        got.reshape(n, k), ha.reshape(n, m) @ hb.reshape(m, k), rtol=1e-10)


def test_two_int_slicer_view_is_scalar_like(ctx, rng):
    # a slicer key of all-ints yields a size-1 view with EXTRA dims
    # relative to the 1-D destination; the evaluator must collapse it
    # (fuzz regression, expr/compile.py post broadcast)
    n, m = 8, 16
    ha = rng.random(n * m).astype(np.float32)
    x = vex.vector(data=ha, context=ctx)
    s = vex.slicer((n, m))
    out = vex.vector(1, dtype=np.float32, context=ctx)
    out[:] = s[3, 5](x) * 2.0 + 1.0
    assert np.allclose(out.to_numpy(), ha.reshape(n, m)[3, 5] * 2.0 + 1.0)
