"""Reference-parity edge cases: non-square / empty-row / vector-valued
sparse matrices (tests/spmv.cpp:61-146,440-530), SpMat x multivector
products (:200-260), atomic eval (tests/eval.cpp:10-28), and view edge
cases (tests/vector_view.cpp: negative_stride, check_zero_size_perm,
nested_reduce)."""

import numpy as np
import pytest

import vexcl_tpu as vex


def random_csr(rng, n, m, row_nnz=8):
    """Dense-random CSR like the reference's random_matrix helper."""
    dens = (rng.random((n, m)) < row_nnz / m) * rng.random((n, m))
    ptr = [0]
    col = []
    val = []
    for i in range(n):
        nz = np.flatnonzero(dens[i])
        col.extend(nz.tolist())
        val.extend(dens[i, nz].tolist())
        ptr.append(len(col))
    return (
        np.asarray(ptr, np.int64),
        np.asarray(col, np.int32),
        np.asarray(val, np.float64),
        dens,
    )


def test_non_square_matrix(ctx, rng):
    n, m = 96, 192
    ptr, col, val, dens = random_csr(rng, n, m)
    A = vex.SpMat(n, m, ptr, col, val, context=ctx)
    x = vex.vector(data=rng.random(m), context=ctx)
    y = vex.vector(n, dtype=np.float64, context=ctx)
    y[:] = A * x
    np.testing.assert_allclose(np.asarray(y), dens @ np.asarray(x), rtol=1e-10)

    # wide-and-short too (offsets biased the other way)
    ptr, col, val, dens = random_csr(rng, m, n)
    A = vex.SpMat(m, n, ptr, col, val, context=ctx)
    x2 = vex.vector(data=rng.random(n), context=ctx)
    y2 = vex.vector(m, dtype=np.float64, context=ctx)
    y2[:] = A * x2
    np.testing.assert_allclose(np.asarray(y2), dens @ np.asarray(x2), rtol=1e-10)


def test_non_square_dia(ctx):
    # bidiagonal rectangular matrix forced through the DIA build
    n, m = 64, 128
    rows = np.arange(n)
    ptr = np.arange(0, 2 * n + 1, 2)
    col = np.stack([rows, rows + 64], 1).ravel()
    val = np.stack([np.full(n, 2.0), np.full(n, -1.0)], 1).ravel()
    A = vex.SpMat(n, m, ptr, col, val, fmt="dia", context=ctx)
    assert A.device.format == "dia"
    x = vex.vector(data=np.arange(m, dtype=np.float64), context=ctx)
    y = vex.vector(n, dtype=np.float64, context=ctx)
    y[:] = A * x
    expect = 2.0 * np.arange(n) - 1.0 * (np.arange(n) + 64)
    np.testing.assert_allclose(np.asarray(y), expect)


def test_empty_rows(ctx, rng):
    n = 128
    ptr, col, val, dens = random_csr(rng, 32, n)
    ptr = np.concatenate([ptr, np.full(n - 32, ptr[-1], np.int64)])
    dens = np.vstack([dens, np.zeros((n - 32, n))])
    A = vex.SpMat(n, n, ptr, col, val, context=ctx)
    x = vex.vector(data=rng.random(n), context=ctx)
    y = vex.vector(n, dtype=np.float64, context=ctx)
    y[:] = A * x
    np.testing.assert_allclose(np.asarray(y), dens @ np.asarray(x), rtol=1e-10)


def test_spmat_times_multivector(ctx, rng):
    """Scalar matrix x multivector: same matrix on each component
    (tests/spmv.cpp multivector_product)."""
    n = 96
    ptr, col, val, dens = random_csr(rng, n, n)
    A = vex.SpMat(n, n, ptr, col, val, context=ctx)
    X = vex.multivector(n, 2, dtype=np.float64, context=ctx)
    hx = rng.random((2, n))
    X(0)[:] = vex.vector(data=hx[0], context=ctx)
    X(1)[:] = vex.vector(data=hx[1], context=ctx)
    Y = vex.multivector(n, 2, dtype=np.float64, context=ctx)
    Y[:] = A * X
    for c in range(2):
        np.testing.assert_allclose(np.asarray(Y(c)), dens @ hx[c], rtol=1e-10)
    # inline in an expression: one fused kernel per component
    Y[:] = 0.5 * (A * X) + X
    for c in range(2):
        np.testing.assert_allclose(
            np.asarray(Y(c)), 0.5 * (dens @ hx[c]) + hx[c], rtol=1e-10
        )


def test_vector_valued_matrix(ctx, rng):
    """cl_double2-valued matrix (tests/spmv.cpp:440-466): values are
    2-component, product is componentwise."""
    n = 96
    ptr, col, val, dens = random_csr(rng, n, n)
    val2 = np.stack([val, 2.0 * val], axis=1)  # (nnz, 2)
    A = vex.SpMat(n, n, ptr, col, val2, context=ctx)
    hx = rng.random((2, n))
    X = vex.multivector(n, 2, dtype=np.float64, context=ctx)
    X(0)[:] = vex.vector(data=hx[0], context=ctx)
    X(1)[:] = vex.vector(data=hx[1], context=ctx)
    Y = vex.multivector(n, 2, dtype=np.float64, context=ctx)
    Y[:] = A * X
    np.testing.assert_allclose(np.asarray(Y(0)), dens @ hx[0], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(Y(1)), 2.0 * (dens @ hx[1]), rtol=1e-10)
    with pytest.raises(TypeError):
        A * vex.vector(n, dtype=np.float64, context=ctx)


def test_vector_valued_ccsr(ctx):
    """Vector-valued CCSR (tests/spmv.cpp:473-530): 1-D Poisson patterns
    with 2-component values."""
    n = 32
    h2i = (n - 1) * (n - 1)
    idx = np.array([0] + [1] * (n - 2) + [2])
    row = np.array([0, 2, 5, 8])
    col = np.array([0, 1, -1, 0, 1, -1, 0, 0])
    base = np.array([1.0, 0.0, -h2i, 2 * h2i, -h2i, 0.0, 1.0, 0.0])
    val2 = np.stack([base, 3.0 * base], axis=1)
    A = vex.SpMatCCSR(n, n, idx, row, col, val2, context=ctx)
    hx = np.random.default_rng(7).random(n)
    X = vex.multivector(n, 2, dtype=np.float64, context=ctx)
    X(0)[:] = vex.vector(data=hx, context=ctx)
    X(1)[:] = vex.vector(data=hx, context=ctx)
    Y = vex.multivector(n, 2, dtype=np.float64, context=ctx)
    Y[:] = A * X

    dense = np.zeros((n, n))
    for i in range(n):
        p = idx[i]
        for j in range(row[p], row[p + 1]):
            c = i + col[j]
            if 0 <= c < n:
                dense[i, c] += base[j]
    np.testing.assert_allclose(np.asarray(Y(0)), dense @ hx, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(Y(1)), 3.0 * (dense @ hx), rtol=1e-8)


def test_eval_atomic(ctx):
    """vex::eval(atomic_add(&permutation(x)(y), 1)) histograms into y
    (tests/eval.cpp:10-28); duplicate indices accumulate exactly."""
    M, C = 16, 64
    N = M * C
    x = vex.vector(N, dtype=np.int32, context=ctx)
    y = vex.vector(M, dtype=np.int32, context=ctx)
    y[:] = 0
    x[:] = vex.element_index() % M
    vex.eval(vex.atomic_add(vex.permutation(x)(y), 1))
    np.testing.assert_array_equal(np.asarray(y), np.full(M, C))
    vex.eval(vex.atomic_sub(vex.permutation(x)(y), 1))
    np.testing.assert_array_equal(np.asarray(y), np.zeros(M))


def test_atomic_min_max_and_expr_values(ctx, rng):
    n = 256
    idx_h = rng.integers(0, 8, n)
    vals_h = rng.random(n)
    idx = vex.vector(data=idx_h.astype(np.int32), context=ctx)
    v = vex.vector(data=vals_h, context=ctx)
    lo = vex.vector(8, dtype=np.float64, fill=np.inf, context=ctx)
    hi = vex.vector(8, dtype=np.float64, fill=-np.inf, context=ctx)
    vex.eval(vex.atomic_min(vex.permutation(idx)(lo), 2 * v))
    vex.eval(vex.atomic_max(vex.permutation(idx)(hi), 2 * v))
    for b in range(8):
        sel = vals_h[idx_h == b]
        np.testing.assert_allclose(np.asarray(lo)[b], 2 * sel.min())
        np.testing.assert_allclose(np.asarray(hi)[b], 2 * sel.max())


def test_negative_stride_views(ctx):
    """negative_stride (tests/vector_view.cpp): reversed/strided slices."""
    v = vex.vector(data=np.arange(64, dtype=np.float64), context=ctx)
    w = vex.vector(32, dtype=np.float64, context=ctx)
    w[:] = v[::-2]
    np.testing.assert_allclose(np.asarray(w), np.arange(64)[::-2])
    w[:] = 2.0 * v[62::-2] + 1.0
    np.testing.assert_allclose(np.asarray(w), 2.0 * np.arange(64)[62::-2] + 1)


def test_zero_size_permutation(ctx):
    """check_zero_size_perm: empty index set yields an empty result."""
    v = vex.vector(data=np.arange(16, dtype=np.float64), context=ctx)
    idx = vex.vector(data=np.zeros(0, dtype=np.int32), context=ctx)
    z = vex.vector(0, dtype=np.float64, context=ctx)
    z[:] = vex.permutation(idx)(v)
    assert z.size == 0


def test_nested_reduce(ctx, rng):
    """nested_reduce (tests/vector_view.cpp): reduce over one axis of a
    2-D view, then reduce the result again inside an expression."""
    n = 32
    h = rng.random((n, n))
    x = vex.vector(data=h.ravel(), context=ctx)
    slc = vex.slicer(n, n)
    rowsum = vex.reduce_view("SUM", slc[:, :](x), 1)
    y = vex.vector(n, dtype=np.float64, context=ctx)
    y[:] = rowsum
    np.testing.assert_allclose(np.asarray(y), h.sum(1), rtol=1e-10)
    # nested: reduce the reduced view again
    z = vex.vector(1, dtype=np.float64, context=ctx)
    z[:] = vex.reduce_view("SUM", rowsum, 0)
    np.testing.assert_allclose(np.asarray(z)[0], h.sum(), rtol=1e-10)


def test_assign_to_view(ctx, rng):
    """assign_to_view (tests/vector_view.cpp): write through slicer /
    slice / permutation views with = and compound ops."""
    n = 32
    h = np.zeros((n, n))
    X = vex.vector(data=h.ravel(), context=ctx)
    x = vex.vector(data=rng.random(n), context=ctx)
    slc = vex.slicer(n, n)
    for i in range(n):
        slc[i](X).assign(x)  # slc[i](X) = x
    expect = np.tile(np.asarray(x), (n, 1))
    np.testing.assert_allclose(np.asarray(X).reshape(n, n), expect)
    # compound through a view
    slc[3](X).assign(2.0 * x, "+=")
    expect[3] += 2.0 * np.asarray(x)
    np.testing.assert_allclose(np.asarray(X).reshape(n, n), expect)
    # strided 1-D slice write
    v = vex.vector(data=np.zeros(16), context=ctx)
    v[:] = 0.0
    w = vex.vector(data=np.arange(8, dtype=np.float64), context=ctx)
    v[1::2].assign(w)
    out = np.zeros(16)
    out[1::2] = np.arange(8)
    np.testing.assert_allclose(np.asarray(v), out)


def test_assign_to_permutation(ctx, rng):
    """Scatter-assign through a permutation view (reversed write)."""
    n = 64
    y = vex.vector(n, dtype=np.float64, context=ctx)
    y[:] = 0.0
    x = vex.vector(data=rng.random(n), context=ctx)
    idx = vex.vector(data=np.arange(n - 1, -1, -1, dtype=np.int32), context=ctx)
    vex.permutation(idx)(y).assign(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x)[::-1])
    vex.permutation(idx)(y).assign(x, "+=")
    np.testing.assert_allclose(np.asarray(y), 2 * np.asarray(x)[::-1])


def test_initialize_with_expression(ctx, rng):
    """initialize_with_expression (tests/vector_create.cpp): construct a
    vector directly from a lazy expression."""
    h = rng.random(64)
    x = vex.vector(data=h, context=ctx)
    y = vex.vector(2 * x + 1, context=ctx)
    np.testing.assert_allclose(np.asarray(y), 2 * h + 1, rtol=1e-12)
    z = vex.vector(data=vex.sin(x), dtype=np.float32, context=ctx)
    assert z.dtype == np.float32
    np.testing.assert_allclose(np.asarray(z), np.sin(h), rtol=1e-6)


def test_nested_temporary(ctx, rng):
    """nested_temporary (tests/temporary.cpp): a temp built from another
    temp evaluates once and composes."""
    h = rng.random(128)
    x = vex.vector(data=h, context=ctx)
    t1 = vex.make_temp(1, x * 2)
    t2 = vex.make_temp(2, t1 + 1)
    y = vex.vector(128, dtype=np.float64, context=ctx)
    y[:] = t2 * t2 - t1
    expect = (h * 2 + 1) ** 2 - h * 2
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-12)


def test_reduce_temporary(ctx, rng):
    """reduce_temporary (tests/temporary.cpp): Reductor over an expression
    containing make_temp."""
    h = rng.random(256)
    x = vex.vector(data=h, context=ctx)
    t = vex.make_temp("t", x - 0.5)
    Sum = vex.Reductor(vex.SUM, context=ctx)
    got = Sum(t * t)
    np.testing.assert_allclose(got, ((h - 0.5) ** 2).sum(), rtol=1e-10)


def test_temporary_inside_tag(ctx, rng):
    """temporary_inside_tag (tests/tagged_terminal.cpp)."""
    h = rng.random(64)
    x = vex.vector(data=h, context=ctx)
    t = vex.make_temp(7, vex.tag(1, x) + vex.tag(1, x))
    y = vex.vector(64, dtype=np.float64, context=ctx)
    y[:] = t + t
    np.testing.assert_allclose(np.asarray(y), 4 * h, rtol=1e-12)


def test_multivector_from_stl(ctx, rng):
    """stl_container_of_multivector analog: build from a list of arrays /
    interleaved host data (multivector_create.cpp)."""
    h = rng.random((3, 32))
    mv = vex.multivector(data=h.ravel(), m=3, dtype=np.float64, context=ctx)
    for c in range(3):
        np.testing.assert_allclose(np.asarray(mv(c)), h[c])


def test_complex_spmv(ctx, rng):
    """Complex-semantics SpMV (reference examples/complex_spmv.cpp): true
    complex multiply inside the SpMV kernel."""
    n = 128
    dens = (
        (rng.random((n, n)) < 0.05)
        * (rng.random((n, n)) + 1j * rng.random((n, n)))
    ).astype(np.complex128)
    ptr = [0]
    col, val = [], []
    for i in range(n):
        nz = np.flatnonzero(dens[i])
        col.extend(nz.tolist())
        val.extend(dens[i, nz].tolist())
        ptr.append(len(col))
    A = vex.SpMat(n, n, np.array(ptr), np.array(col), np.array(val), context=ctx)
    x = vex.vector(
        data=(rng.random(n) + 1j * rng.random(n)).astype(np.complex128),
        context=ctx,
    )
    y = vex.vector(n, dtype=np.complex128, context=ctx)
    y[:] = A * x
    np.testing.assert_allclose(np.asarray(y), dens @ np.asarray(x), rtol=1e-12)
    # complex DIA (tridiagonal forces the banded build)
    rows = np.arange(n)
    p2 = np.arange(0, 2 * n + 1, 2)
    c2 = np.stack([rows, np.minimum(rows + 1, n - 1)], 1).ravel()
    v2 = np.stack([np.full(n, 2 + 1j), np.full(n, -1 + 0.5j)], 1).ravel()
    B = vex.SpMat(n, n, p2, c2, v2, fmt="dia", context=ctx)
    yb = vex.vector(n, dtype=np.complex128, context=ctx)
    yb[:] = B * x
    db = np.zeros((n, n), np.complex128)
    for i in range(n):
        db[i, c2[2 * i]] += v2[2 * i]
        db[i, c2[2 * i + 1]] += v2[2 * i + 1]
    np.testing.assert_allclose(np.asarray(yb), db @ np.asarray(x), rtol=1e-12)


def test_odd_size_padded_sharding(ctx, rng):
    """Sizes that do not divide the mesh now shard via zero-padded storage
    (logical size sliced off in-kernel) instead of replicating."""
    n = 1003
    h = rng.random(n)
    x = vex.vector(data=h, context=ctx)
    if ctx.size > 1:
        assert x.storage.shape[0] % ctx.size == 0
        assert len(x.storage.sharding.device_set) == ctx.size
    assert x.size == n
    y = vex.vector(n, dtype=np.float64, context=ctx)
    y[:] = 2 * x + vex.sin(x)
    np.testing.assert_allclose(np.asarray(y), 2 * h + np.sin(h), rtol=1e-12)
    y += x * x
    np.testing.assert_allclose(np.asarray(y), 2 * h + np.sin(h) + h * h,
                               rtol=1e-12)
    S = vex.Reductor(vex.SUM, context=ctx)
    np.testing.assert_allclose(
        float(S(y * y)), float(((2 * h + np.sin(h) + h * h) ** 2).sum()),
        rtol=1e-10,
    )
    sc = vex.vector(n, dtype=np.float64, context=ctx)
    vex.inclusive_scan(x, sc)
    np.testing.assert_allclose(np.asarray(sc), np.cumsum(h), rtol=1e-10)
    w = vex.vector((n - 1) // 2, dtype=np.float64, context=ctx)
    w[:] = x[1::2]
    np.testing.assert_allclose(np.asarray(w), h[1::2])
    # host IO + element access + swap keep logical semantics
    assert abs(x[17] - h[17]) < 1e-12
    x[17] = 3.25
    assert x[17] == 3.25
    v2 = vex.vector(5, dtype=np.float64, context=ctx)
    v2.swap(x)
    assert v2.size == n and x.size == 5
    v2.swap(x)
    np.testing.assert_allclose(x.to_numpy()[16:19], [h[16], 3.25, h[18]])
