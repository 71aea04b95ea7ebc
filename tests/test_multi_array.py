"""Port of tests/multi_array.cpp (create / arithmetics / slicing /
reducing) against vexcl_tpu.ndarray.multi_array."""

import numpy as np

import vexcl_tpu as vex


def test_create(ctx):
    x = vex.multi_array(vex.extents[1024][1024], dtype=np.float64,
                        context=ctx)
    assert x.size(0) == 1024 and x.size(1) == 1024
    assert x.size() == 1024 * 1024

    view = x[vex.indices[5][vex.range_(0, 100)]]
    assert view.size_hint() == 100


def test_arithmetics(ctx):
    x = vex.multi_array(vex.extents[32][32][32], dtype=np.float64,
                        context=ctx)
    y = vex.multi_array((32, 32, 32), dtype=np.float64, context=ctx)

    x.vec()[:] = 2 * np.pi * vex.element_index() / x.size()
    y.vec()[:] = vex.sin(x.vec()) ** 2 + vex.cos(x.vec()) ** 2

    np.testing.assert_allclose(np.asarray(y.vec()), 1.0, atol=1e-12)


def test_slicing(ctx):
    _ = vex._
    x = vex.multi_array(vex.extents[32][32][32], dtype=np.float64,
                        context=ctx)
    y = vex.multi_array(vex.extents[32][32][32], dtype=np.float64,
                        context=ctx)
    x.vec()[:] = 0.0
    y.vec()[:] = 0.0

    for i in range(x.size(0)):
        x[vex.indices[i][_][_]].assign(float(i))

    for i in range(x.size(2)):
        y[vex.indices[_][_][i]] = x[vex.indices[i][_][_]]

    hy = np.asarray(y)
    idx = np.arange(32 ** 3).reshape(32, 32, 32)
    np.testing.assert_allclose(hy, (idx % 32).astype(np.float64))


def test_reducing(ctx):
    x = vex.multi_array(vex.extents[32][32][32], dtype=np.int32,
                        context=ctx)
    x.vec()[:] = 1

    for _rep in range(3):
        y = vex.eval(vex.reduce_view("SUM", x, 0))
        assert np.all(np.asarray(y) == 32)


def test_from_host_data_and_setitem(ctx):
    h = np.arange(24.0).reshape(2, 3, 4)
    m = vex.multi_array(None, data=h, context=ctx)
    assert m.shape == (2, 3, 4)
    np.testing.assert_allclose(np.asarray(m), h)

    m[1, vex._, vex._] = 0.0
    h[1] = 0.0
    np.testing.assert_allclose(np.asarray(m), h)

    sub = vex.eval(m[vex.indices[vex._][1][vex.range_(0, 2)]])
    np.testing.assert_allclose(np.asarray(sub), h[:, 1, :2].ravel())
