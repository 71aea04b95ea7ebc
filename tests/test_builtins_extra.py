"""Parity tests for the builtin-catalog additions (function.hpp catalog
rows not previously covered): saturating/carry-less integer arithmetic,
mul_hi, bitselect, fract/ilogb/classification, pair-returning math
(sincos/modf/frexp/remquo/lgamma_r), and the geometric functions over
multivectors (OpenCL geometric chapter)."""

import numpy as np
import pytest

import vexcl_tpu as vex


def _eval1(fn, *host):
    vecs = [vex.vector(data=h) for h in host]
    return np.asarray(vex.eval(fn(*vecs)))


def test_saturating_int_ops(ctx, rng):
    a = rng.integers(-(2 ** 31), 2 ** 31, 4096, dtype=np.int32)
    b = rng.integers(-(2 ** 31), 2 ** 31, 4096, dtype=np.int32)
    wide_a, wide_b = a.astype(np.int64), b.astype(np.int64)

    got = _eval1(vex.add_sat, a, b)
    ref = np.clip(wide_a + wide_b, -(2 ** 31), 2 ** 31 - 1).astype(np.int32)
    np.testing.assert_array_equal(got, ref)

    got = _eval1(vex.sub_sat, a, b)
    ref = np.clip(wide_a - wide_b, -(2 ** 31), 2 ** 31 - 1).astype(np.int32)
    np.testing.assert_array_equal(got, ref)

    ua = a.view(np.uint32)
    ub = b.view(np.uint32)
    got = _eval1(vex.add_sat, ua, ub)
    ref = np.minimum(ua.astype(np.uint64) + ub.astype(np.uint64),
                     2 ** 32 - 1).astype(np.uint32)
    np.testing.assert_array_equal(got, ref)

    got = _eval1(vex.sub_sat, ua, ub)
    ref = np.where(ub > ua, 0, ua - ub).astype(np.uint32)
    np.testing.assert_array_equal(got, ref)


def test_mul_hi_hadd_mad_sat(ctx, rng):
    a = rng.integers(-(2 ** 31), 2 ** 31, 4096, dtype=np.int32)
    b = rng.integers(-(2 ** 31), 2 ** 31, 4096, dtype=np.int32)
    c = rng.integers(-(2 ** 31), 2 ** 31, 4096, dtype=np.int32)

    got = _eval1(vex.mul_hi, a, b)
    ref = ((a.astype(np.int64) * b.astype(np.int64)) >> 32).astype(np.int32)
    np.testing.assert_array_equal(got, ref)

    ua, ub = a.view(np.uint32), b.view(np.uint32)
    got = _eval1(vex.mul_hi, ua, ub)
    ref = ((ua.astype(np.uint64) * ub.astype(np.uint64)) >> 32).astype(
        np.uint32)
    np.testing.assert_array_equal(got, ref)

    got = _eval1(vex.hadd, a, b)
    ref = ((a.astype(np.int64) + b.astype(np.int64)) >> 1).astype(np.int32)
    np.testing.assert_array_equal(got, ref)

    got = _eval1(vex.rhadd, a, b)
    ref = ((a.astype(np.int64) + b.astype(np.int64) + 1) >> 1).astype(
        np.int32)
    np.testing.assert_array_equal(got, ref)

    got = _eval1(vex.mad_sat, a, b, c)
    wide = a.astype(object) * b.astype(object) + c.astype(object)
    ref = np.array([min(max(int(w), -(2 ** 31)), 2 ** 31 - 1) for w in wide],
                   dtype=np.int32)
    np.testing.assert_array_equal(got, ref)


def test_bit_ops(ctx, rng):
    a = rng.integers(0, 2 ** 32, 1024, dtype=np.uint32)
    b = rng.integers(0, 2 ** 32, 1024, dtype=np.uint32)
    m = rng.integers(0, 2 ** 32, 1024, dtype=np.uint32)
    got = _eval1(vex.bitselect, a, b, m)
    np.testing.assert_array_equal(got, (a & ~m) | (b & m))

    hi = rng.integers(-(2 ** 15), 2 ** 15, 1024, dtype=np.int16)
    lo = rng.integers(0, 2 ** 16, 1024, dtype=np.uint16)
    got = _eval1(vex.upsample, hi, lo)
    ref = (hi.astype(np.int32) << 16) | lo.astype(np.int32)
    np.testing.assert_array_equal(got, ref)

    x = rng.integers(0, 2 ** 32, 1024, dtype=np.uint32)
    got = _eval1(vex.__popc, x)
    ref = np.array([bin(v).count("1") for v in x], dtype=np.uint32)
    np.testing.assert_array_equal(got, ref)


def test_float_decompositions(ctx, rng):
    x = (rng.random(2048).astype(np.float64) - 0.5) * 100
    x[0] = 2.5
    x[1] = -2.5

    got = _eval1(vex.fract, x)
    np.testing.assert_allclose(got, np.minimum(x - np.floor(x),
                                               np.nextafter(1.0, 0)),
                               rtol=1e-12)

    got = _eval1(vex.ilogb, np.abs(x) + 0.01)
    ref = np.frexp(np.abs(x) + 0.01)[1] - 1
    np.testing.assert_array_equal(got, ref)

    xv = vex.vector(data=x)
    s, c = vex.sincos(xv)
    np.testing.assert_allclose(np.asarray(vex.eval(s)), np.sin(x),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(vex.eval(c)), np.cos(x),
                               rtol=1e-12)

    fr, ip = vex.modf(xv)
    np.testing.assert_allclose(np.asarray(vex.eval(ip)), np.trunc(x))
    np.testing.assert_allclose(np.asarray(vex.eval(fr)), x - np.trunc(x),
                               rtol=1e-12)

    mant, expo = vex.frexp(xv)
    m_ref, e_ref = np.frexp(x)
    np.testing.assert_allclose(np.asarray(vex.eval(mant)), m_ref, rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(vex.eval(expo)), e_ref)

    y = rng.random(2048).astype(np.float64) + 0.5
    yv = vex.vector(data=y)
    rem, quo = vex.remquo(xv, yv)
    np.testing.assert_allclose(np.asarray(vex.eval(rem)),
                               x - np.round(x / y) * y, atol=1e-9)

    lg, sg = vex.lgamma_r(vex.vector(data=np.abs(x) + 0.1))
    import scipy.special as sp
    np.testing.assert_allclose(np.asarray(vex.eval(lg)),
                               sp.gammaln(np.abs(x) + 0.1), rtol=1e-9)
    assert np.all(np.asarray(vex.eval(sg)) == 1)

    o = _eval1(vex.isordered, x, y)
    assert np.all(o)
    u = _eval1(vex.isunordered, x, y)
    assert not np.any(u)


def test_geometric_functions(ctx, rng):
    h = rng.random((3, 512)).astype(np.float64)
    g = rng.random((3, 512)).astype(np.float64)
    a = vex.multivector(data=h, context=ctx)
    b = vex.multivector(data=g, context=ctx)

    got = np.asarray(vex.eval(vex.dot(a, b)))
    np.testing.assert_allclose(got, (h * g).sum(0), rtol=1e-12)

    got = np.asarray(vex.eval(vex.length(a)))
    np.testing.assert_allclose(got, np.sqrt((h * h).sum(0)), rtol=1e-12)

    got = np.asarray(vex.eval(vex.distance(a, b)))
    np.testing.assert_allclose(got, np.sqrt(((h - g) ** 2).sum(0)),
                               rtol=1e-12)

    nrm = vex.normalize(a)
    got = np.stack([np.asarray(vex.eval(c)) for c in nrm.components])
    np.testing.assert_allclose(got, h / np.sqrt((h * h).sum(0)), rtol=1e-7)

    crs = vex.cross(a, b)
    got = np.stack([np.asarray(vex.eval(c)) for c in crs.components])
    np.testing.assert_allclose(got, np.cross(h.T, g.T).T, rtol=1e-12)

    sh = vex.shuffle(a, (2, 0, 1))
    got = np.stack([np.asarray(vex.eval(c)) for c in sh.components])
    np.testing.assert_allclose(got, h[[2, 0, 1]])

    sh2 = vex.shuffle2(a, b, (0, 3, 5))
    got = np.stack([np.asarray(vex.eval(c)) for c in sh2.components])
    np.testing.assert_allclose(got, np.stack([h[0], g[0], g[2]]))
