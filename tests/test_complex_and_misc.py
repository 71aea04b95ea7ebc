"""Complex vectors, multivector reductions, eval, purge_caches, context
filters — parity odds and ends."""

import numpy as np
import pytest

import vexcl_tpu as vex


def test_complex_vector_expressions(ctx, rng):
    n = 1024
    ha = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    a = vex.vector(data=ha, dtype=np.complex128, context=ctx)
    x = vex.vector(n, dtype=np.complex128, context=ctx)
    x[:] = 2 * a + vex.conj(a)
    np.testing.assert_allclose(np.asarray(x), 2 * ha + np.conj(ha), rtol=1e-12)
    y = vex.vector(n, dtype=np.float64, context=ctx)
    y[:] = vex.real(a * vex.conj(a))
    np.testing.assert_allclose(np.asarray(y), np.abs(ha) ** 2, rtol=1e-12)


def test_multivector_reductor(ctx, rng):
    """Reductor over a multivector returns per-component results."""
    hx = rng.random((3, 512))
    mv = vex.multivector(data=hx, context=ctx, dtype=np.float64)
    Sum = vex.Reductor(vex.SUM)
    res = Sum(mv)
    assert len(res) == 3
    np.testing.assert_allclose(res, hx.sum(axis=1), rtol=1e-10)
    res2 = Sum(mv * mv)
    np.testing.assert_allclose(res2, (hx * hx).sum(axis=1), rtol=1e-10)


def test_eval(ctx, rng):
    ha = rng.random(256)
    a = vex.vector(data=ha, context=ctx)
    out = vex.eval(2 * a + 1)
    np.testing.assert_allclose(np.asarray(out), 2 * ha + 1, rtol=1e-12)


def test_purge_caches(ctx, rng):
    a = vex.vector(data=rng.random(128), context=ctx)
    x = vex.vector(128, dtype=np.float64, context=ctx)
    x[:] = a * 3
    assert len(vex.kernel_cache) > 0
    vex.purge_caches()
    assert len(vex.kernel_cache) == 0
    x[:] = a * 3  # recompiles fine
    np.testing.assert_allclose(np.asarray(x), np.asarray(a) * 3)


def test_filters(ctx):
    import jax

    devs = jax.devices()
    assert vex.Filter.All.select(devs) == list(devs)
    assert len(vex.Filter.Count(2).select(devs)) == min(2, len(devs))
    assert len(vex.Filter.Position(0).select(devs)) == 1
    combined = vex.Filter.CPU & vex.Filter.Count(3)
    assert len(combined.select(devs)) <= 3
    inverted = ~vex.Filter.GPU
    assert len(inverted.select(devs)) == len(devs)  # no GPUs here
    named = vex.Filter.Platform("cpu")
    assert named.select(devs)


def test_context_repr_and_finish(ctx):
    s = repr(ctx)
    assert "device" in s.lower()
    ctx.finish()


def test_partition_weights():
    from vexcl_tpu.parallel.partition import partition_points

    p = partition_points(100, 4, weights=np.array([1, 1, 2, 4]))
    assert p[0] == 0 and p[-1] == 100
    sizes = np.diff(p)
    assert sizes[3] > sizes[0]


def test_type_names():
    assert vex.type_name(np.float64) == "double"
    assert vex.type_name("uint") == "uint"
    assert vex.dtype_of("float") == np.float32
    assert vex.promote(np.float32, np.int32) == np.float32
