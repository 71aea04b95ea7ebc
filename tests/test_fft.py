"""Port of tests/fft.cpp behavior: known transforms, inverse-identity,
non-power-of-two (Bluestein), 2-D, batched."""

import numpy as np
import pytest

import vexcl_tpu as vex

ATOL = 1e-8  # complex128 on the CPU test mesh


def _roundtrip(ctx, n):
    rng = np.random.default_rng(n)
    hx = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    x = vex.vector(data=hx, dtype=np.complex128, context=ctx)
    y = vex.vector(n, dtype=np.complex128, context=ctx)
    f = vex.FFT(n)
    y[:] = f(x)
    np.testing.assert_allclose(np.asarray(y), np.fft.fft(hx), rtol=1e-7, atol=ATOL)
    # inverse identity (reference oracle when FFTW absent, tests/fft.cpp)
    z = vex.vector(n, dtype=np.complex128, context=ctx)
    z[:] = vex.FFT(n, inverse=True)(y)
    np.testing.assert_allclose(np.asarray(z), hx, rtol=1e-7, atol=ATOL)


@pytest.mark.parametrize("n", [64, 1024, 4096])
def test_pow2(ctx, n):
    _roundtrip(ctx, n)


@pytest.mark.parametrize("n", [3 * 5 * 7, 729, 1000, 1536])
def test_mixed_radix(ctx, n):
    _roundtrip(ctx, n)


@pytest.mark.parametrize("n", [17, 97, 1009])
def test_prime_bluestein(ctx, n):
    _roundtrip(ctx, n)


def test_real_input(ctx, rng):
    n = 512
    hx = rng.standard_normal(n)
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(n, dtype=np.complex128, context=ctx)
    y[:] = vex.FFT(n)(x)
    np.testing.assert_allclose(np.asarray(y), np.fft.fft(hx), rtol=1e-7, atol=ATOL)


def test_2d(ctx, rng):
    rows, cols = 32, 48
    hx = rng.standard_normal((rows, cols)) + 1j * rng.standard_normal((rows, cols))
    x = vex.vector(data=hx.ravel(), dtype=np.complex128, context=ctx)
    y = vex.vector(rows * cols, dtype=np.complex128, context=ctx)
    y[:] = vex.FFT((rows, cols))(x)
    np.testing.assert_allclose(
        np.asarray(y).reshape(rows, cols), np.fft.fft2(hx), rtol=1e-7, atol=ATOL
    )


def test_batched(ctx, rng):
    """fft::none batch dims (fft.hpp dims)."""
    batch, n = 16, 128
    hx = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    x = vex.vector(data=hx.ravel(), dtype=np.complex128, context=ctx)
    y = vex.vector(batch * n, dtype=np.complex128, context=ctx)
    y[:] = vex.FFT((batch, n), dims=(1,))(x)
    np.testing.assert_allclose(
        np.asarray(y).reshape(batch, n), np.fft.fft(hx, axis=1), rtol=1e-7, atol=ATOL
    )


def test_fft_in_expression(ctx, rng):
    """FFT terminals compose with expressions: y = fft(x) * conj(fft(x))."""
    n = 256
    hx = rng.standard_normal(n)
    x = vex.vector(data=hx, context=ctx)
    f = vex.FFT(n)
    p = vex.vector(n, dtype=np.complex128, context=ctx)
    fx = vex.make_temp(1, f(x))
    p[:] = fx * vex.conj(fx)
    np.testing.assert_allclose(
        np.asarray(p), np.abs(np.fft.fft(hx)) ** 2, rtol=1e-6, atol=ATOL
    )


def test_plan_cache(ctx):
    from vexcl_tpu.ops.fft import plan_cache

    vex.FFT(2048)
    a = len(plan_cache)
    vex.FFT(2048)
    assert len(plan_cache) == a


def test_batched_fft_sharded(ctx, rng):
    """Batched FFT over a mesh-sharded vector (beyond the reference's
    single-device restriction, fft/plan.hpp:218-220)."""
    batch, n = 16, 64  # batch divisible by the 8-device mesh
    hx = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    x = vex.vector(data=hx.ravel(), dtype=np.complex128, context=ctx)
    assert x.nparts == ctx.size
    y = vex.vector(batch * n, dtype=np.complex128, context=ctx)
    y[:] = vex.FFT((batch, n), dims=(1,))(x)
    np.testing.assert_allclose(
        np.asarray(y).reshape(batch, n), np.fft.fft(hx, axis=1),
        rtol=1e-7, atol=1e-8,
    )


@pytest.mark.parametrize("n", [4096, 729, 1009])
def test_ct_engine_matches_xla_engine(ctx, rng, n):
    """Both FFT engines agree (impl='ct' is the from-scratch planner)."""
    hx = rng.standard_normal(n)
    x = vex.vector(data=hx, context=ctx)
    y1 = vex.vector(n, dtype=np.complex128, context=ctx)
    y1[:] = vex.FFT(n, impl="xla")(x)
    y2 = vex.vector(n, dtype=np.complex128, context=ctx)
    y2[:] = vex.FFT(n, impl="ct")(x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-7, atol=1e-8)


def test_large_prime_routes_to_own_engine(ctx):
    """The XLA FFT HLO lowers large-prime lengths as a DIRECT n x n DFT
    matmul on TPU (a 999983-point FFT tried to allocate ~4 TB and
    AOT-rejected — exp/fft_size_sweep.py).  Plan must route such axes to
    the own Bluestein engine."""
    from vexcl_tpu.ops.fft import Plan

    assert Plan((999983,), None, False, np.complex64)._route_ct
    assert Plan((512, 999983), (1,), False, np.complex64)._route_ct
    assert not Plan((1 << 20,), None, False, np.complex64)._route_ct
    assert not Plan((521, 521), None, False, np.complex64)._route_ct

    n = 65537  # prime > 4096: routed; Bluestein pads to 2^18
    rng = np.random.default_rng(0)
    hx = (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    x = vex.vector(data=hx, dtype=np.complex128, context=ctx)
    y = vex.vector(n, dtype=np.complex128, context=ctx)
    y[:] = vex.FFT(n)(x)
    np.testing.assert_allclose(
        np.asarray(y), np.fft.fft(hx), rtol=1e-8, atol=1e-6)


def test_auto_ct_window(ctx, rng):
    """1-D c64 smooth lengths 2^17..2^20 auto-route to the own engine
    (measured faster there in every process sample); everything else
    stays on xla.  Results must match either way."""
    from vexcl_tpu.ops.fft import Plan

    assert Plan((1 << 18,), None, False, np.complex64)._auto_ct
    assert Plan((1 << 20,), None, False, np.complex64)._auto_ct
    assert not Plan((1 << 16,), None, False, np.complex64)._auto_ct
    assert not Plan((1 << 21,), None, False, np.complex64)._auto_ct
    assert not Plan((1 << 18,), None, False, np.complex128)._auto_ct
    assert not Plan((512, 512), None, False, np.complex64)._auto_ct

    n = 1 << 17
    hx = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    import jax

    got = np.asarray(jax.jit(Plan((n,), None, False, np.complex64))(hx))
    ref = np.fft.fft(hx)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 5e-7
    # inverse roundtrip through the same auto plan
    inv = np.asarray(jax.jit(Plan((n,), None, True, np.complex64))(got))
    assert np.linalg.norm(inv - hx) / np.linalg.norm(hx) < 5e-7


def test_fft_expr_sig_separates_engines(ctx):
    """xla- and ct-engine plans of identical geometry must have distinct
    expression signatures, or the kernel cache serves the wrong engine
    (code-review r2 finding)."""
    from vexcl_tpu.ops.fft import FFT, Plan, FFTExpr

    n = 4096
    px = Plan((n,), None, False, np.complex64)
    pc = Plan((n,), None, False, np.complex64, impl="ct")
    x = vex.vector(n, dtype=np.complex64, context=ctx)
    sx = FFTExpr(px, x).extra_sig()
    sc = FFTExpr(pc, x).extra_sig()
    assert sx != sc


def test_dot_alg_f64_is_full_precision():
    """The bf16 MXU presets accept f32 only and silently downcast f64;
    f64 stages must use Precision.HIGHEST (code-review r2 finding)."""
    import jax

    from vexcl_tpu.ops.fft import _dot_alg

    assert _dot_alg(np.float64) == jax.lax.Precision.HIGHEST
    assert _dot_alg(np.dtype(np.float64)) == jax.lax.Precision.HIGHEST


def test_distributed_1d_fft(ctx, rng):
    """Mesh-distributed four-step 1-D FFT (ops/fft_dist.py): a SHARDED
    vector transforms via all_to_all transposes + local MXU stages,
    never gathering the signal on one device (the reference forbids
    multi-device FFT outright, fft/plan.hpp:218-220).  Auto-selected
    when n decomposes as n1*n2 with D | n1, D | n2."""
    from vexcl_tpu.ops.fft import plan_cache
    from vexcl_tpu.ops.fft_dist import split_1d

    for n in (1 << 12, 192 * 64):
        hx = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex128)
        x = vex.vector(data=hx, context=ctx)
        y = vex.vector(n, dtype=np.complex128, context=ctx)
        y[:] = vex.fft(x)
        ref = np.fft.fft(hx)
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-11,
                                   atol=1e-10 * np.abs(ref).max())
        z = vex.vector(n, dtype=np.complex128, context=ctx)
        z[:] = vex.ifft(y)
        np.testing.assert_allclose(np.asarray(z), hx, rtol=1e-11, atol=1e-11)
    if ctx.size > 1:
        assert any("dist" in str(k) for k in plan_cache._store)
        assert split_1d(1 << 12, ctx.size) is not None


def test_distributed_fft_fallback_and_gate(ctx, rng):
    """Sizes with no D^2-divisible smooth split fall through to the
    plain engines; VEXTPU_FFT_DIST=0 disables routing entirely."""
    import os

    from vexcl_tpu.ops.fft import FFT

    n = 1009 * 8  # 8072 = 2^3 * 1009: no split with D | n1 and D | n2
    hx = (rng.standard_normal(n)
          + 1j * rng.standard_normal(n)).astype(np.complex128)
    x = vex.vector(data=hx, context=ctx)
    plan = FFT(n)._route(x)
    assert plan.impl != "dist"
    y = vex.vector(n, dtype=np.complex128, context=ctx)
    y[:] = vex.fft(x)
    ref = np.fft.fft(hx)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-9,
                               atol=1e-9 * np.abs(ref).max())

    os.environ["VEXTPU_FFT_DIST"] = "0"
    try:
        x2 = vex.vector(data=rng.standard_normal(4096).astype(np.complex128),
                        context=ctx)
        assert FFT(4096)._route(x2).impl != "dist"
    finally:
        os.environ.pop("VEXTPU_FFT_DIST", None)


def test_distributed_2d_fft(ctx, rng):
    """Full 2-D transforms of sharded images distribute too: separable,
    so two local batched stage sets around two all_to_all transposes —
    no twiddle step (ops/fft_dist.make_distributed_2d)."""
    r, c = 64, 128
    hx = (rng.standard_normal((r, c))
          + 1j * rng.standard_normal((r, c))).astype(np.complex128)
    x = vex.vector(data=hx.ravel(), context=ctx)
    y = vex.vector(r * c, dtype=np.complex128, context=ctx)
    y[:] = vex.FFT((r, c))(x)
    ref = np.fft.fft2(hx)
    np.testing.assert_allclose(np.asarray(y).reshape(r, c), ref,
                               rtol=1e-11, atol=1e-10 * np.abs(ref).max())
    z = vex.vector(r * c, dtype=np.complex128, context=ctx)
    z[:] = vex.FFT((r, c), inverse=True)(y)
    np.testing.assert_allclose(np.asarray(z).reshape(r, c), hx,
                               rtol=1e-11, atol=1e-11)
    # batch-dims transforms (fft::none axes) are NOT the full-2-D case:
    # they shard over the batch axis with no comm at all
    from vexcl_tpu.ops.fft import FFT

    xb = vex.vector(data=hx.ravel(), context=ctx)
    assert FFT((r, c), dims=(1,))._route(xb).impl != "dist"


def test_flat_stage_form_matches(ctx, rng, monkeypatch):
    """VEXTPU_FFT_FORM=flat selects the flat-cube CT stage engine
    (contract cube axes, one final reversal transpose) — identical math
    to the recursive form, pinned here across plan shapes."""
    import importlib

    F = importlib.import_module("vexcl_tpu.ops.fft")
    for n in (4096, 3840, 729):
        hx = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex128)
        import jax.numpy as jnp

        xr = jnp.asarray(hx.real)
        xi = jnp.asarray(hx.imag)
        plan = F._radix_plan(n, F._MAX_CODELET)
        yr, yi = F._fft_planar_flat(xr, xi, -1.0, plan)
        ref = np.fft.fft(hx)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        np.testing.assert_allclose(got, ref, rtol=1e-11,
                                   atol=1e-10 * np.abs(ref).max())
    # batched form
    hb = (rng.standard_normal((4, 1024))
          + 1j * rng.standard_normal((4, 1024)))
    import jax.numpy as jnp

    yr, yi = F._fft_planar_flat(jnp.asarray(hb.real), jnp.asarray(hb.imag),
                                -1.0, F._radix_plan(1024, F._MAX_CODELET))
    ref = np.fft.fft(hb, axis=-1)
    np.testing.assert_allclose(np.asarray(yr) + 1j * np.asarray(yi), ref,
                               rtol=1e-11, atol=1e-10 * np.abs(ref).max())
    # env knob routes the engine selector
    monkeypatch.setenv("VEXTPU_FFT_FORM", "flat")
    assert F._planar_engine() is F._fft_planar_flat
    monkeypatch.delenv("VEXTPU_FFT_FORM")
    assert F._planar_engine() is F._fft_planar
