"""Complex vectors, multivector reductions, eval, purge_caches, context
filters — parity odds and ends."""

import os

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


def test_exclusive_filter_two_processes(tmp_path, monkeypatch):
    """Cross-process Filter.Exclusive (opencl/filter.hpp:214-330): with a
    shared VEXTPU_LOCK_DIR, a device locked by this process must be
    filtered out in a second process, and must come back after
    release_exclusive_locks()."""
    import subprocess
    import sys

    import jax

    from vexcl_tpu.context import release_exclusive_locks

    monkeypatch.setenv("VEXTPU_LOCK_DIR", str(tmp_path))
    ndev = len(jax.devices())

    # This process takes the exclusive lock on device 0.
    mine = vex.Filter.Exclusive(vex.Filter.Position(0)).select(jax.devices())
    assert len(mine) == 1

    child_src = (
        "import os\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "flags = os.environ.get('XLA_FLAGS', '')\n"
        "if 'xla_force_host_platform_device_count' not in flags:\n"
        "    os.environ['XLA_FLAGS'] = (flags +"
        " ' --xla_force_host_platform_device_count=8').strip()\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import vexcl_tpu as vex\n"
        "sel = vex.Filter.Exclusive(vex.Filter.All).select(jax.devices())\n"
        "print('GOT', len(sel))\n"
    )
    env = dict(os.environ, VEXTPU_LOCK_DIR=str(tmp_path))

    out = subprocess.run([sys.executable, "-c", child_src], env=env,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    # Device 0 is held here; the child gets everything else.
    assert f"GOT {ndev - 1}" in out.stdout, out.stdout

    release_exclusive_locks()
    out = subprocess.run([sys.executable, "-c", child_src], env=env,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert f"GOT {ndev}" in out.stdout, out.stdout


def test_context_create_destroy_exclusive(tmp_path, monkeypatch):
    """context.cpp create_destroy: two back-to-back Context(Exclusive(Env))
    in one process must both succeed (the lock is re-entrant within the
    owning process and released with the caches)."""
    monkeypatch.setenv("VEXTPU_LOCK_DIR", str(tmp_path))
    from vexcl_tpu.context import release_exclusive_locks

    for _ in range(2):
        c = vex.Context(vex.Filter.Exclusive(vex.Filter.Env),
                        set_current=False)
        assert len(c.devices) >= 1
        a = vex.vector(data=np.zeros(16), context=c)
        assert np.asarray(a)[0] == 0
    release_exclusive_locks()
