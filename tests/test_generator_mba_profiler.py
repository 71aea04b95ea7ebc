"""Ports of tests/generator.cpp (symbolic kernel recording), tests/mba.cpp
(B-spline scattered interpolation), and profiler smoke tests."""

import numpy as np
import pytest

import vexcl_tpu as vex
from vexcl_tpu import generator


def test_symbolic_euler_kernel(ctx, rng):
    """Record 4 Euler steps of dx/dt = -x on the host, replay as ONE
    fused kernel (examples/symbolic.cpp pattern)."""
    dt = 0.01
    x = generator.symbolic()
    for _ in range(4):
        x.assign(x - dt * x)
    step = generator.build_kernel("euler4", [x], params=[x])

    hx = rng.random(1024)
    X = vex.vector(data=hx, context=ctx)
    step(X)
    np.testing.assert_allclose(np.asarray(X), hx * (1 - dt) ** 4, rtol=1e-12)
    # kernel is reusable
    step(X)
    np.testing.assert_allclose(np.asarray(X), hx * (1 - dt) ** 8, rtol=1e-12)


def test_symbolic_rk4_lorenz(ctx, rng):
    """The reference's flagship demo: record an RK4 step of the Lorenz
    system over symbolic state; one kernel per ensemble step."""
    sigma, b = 10.0, 8.0 / 3.0
    dt = 0.01

    def lorenz(x, y, z, R):
        return (sigma * (y - x), R * x - y - x * z, x * y - b * z)

    def rk4(sys, x, y, z, R):
        k1 = sys(x, y, z, R)
        k2 = sys(x + 0.5 * dt * k1[0], y + 0.5 * dt * k1[1], z + 0.5 * dt * k1[2], R)
        k3 = sys(x + 0.5 * dt * k2[0], y + 0.5 * dt * k2[1], z + 0.5 * dt * k2[2], R)
        k4 = sys(x + dt * k3[0], y + dt * k3[1], z + dt * k3[2], R)
        return (
            x + dt / 6 * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0]),
            y + dt / 6 * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1]),
            z + dt / 6 * (k1[2] + 2 * k2[2] + 2 * k3[2] + k4[2]),
        )

    sx, sy, sz, sR = (generator.symbolic() for _ in range(4))
    nx, ny, nz = rk4(lorenz, sx, sy, sz, sR)
    sx.assign(nx)
    sy.assign(ny)
    sz.assign(nz)
    step = generator.build_kernel("lorenz_rk4", [sx, sy, sz], params=[sx, sy, sz, sR])

    n = 256
    hx, hy, hz = (rng.random(n) for _ in range(3))
    hR = np.linspace(10, 30, n)
    X = vex.vector(data=hx, context=ctx)
    Y = vex.vector(data=hy, context=ctx)
    Z = vex.vector(data=hz, context=ctx)
    R = vex.vector(data=hR, context=ctx)
    step(X, Y, Z, R)

    # numpy oracle of the same RK4 step
    ex, ey, ez = rk4(lorenz, hx, hy, hz, hR)
    np.testing.assert_allclose(np.asarray(X), ex, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(Y), ey, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(Z), ez, rtol=1e-10)


def test_make_function(ctx, rng):
    f = generator.make_function(lambda a, b: a * a + b)
    hx = rng.random(512)
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(512, dtype=np.float64, context=ctx)
    y[:] = f(x, 1.0)
    np.testing.assert_allclose(np.asarray(y), hx ** 2 + 1, rtol=1e-12)


def test_mba_1d(ctx, rng):
    """1-D scattered fit: interpolant reproduces smooth data."""
    pts = rng.random(400)
    vals = np.sin(2 * np.pi * pts)
    interp = vex.mba([-0.01], [1.01], [pts], vals, grid=[8], levels=8)
    hq = np.linspace(0.05, 0.95, 200)
    q = vex.vector(data=hq, context=ctx)
    z = vex.vector(200, dtype=np.float64, context=ctx)
    z[:] = interp(q)
    np.testing.assert_allclose(np.asarray(z), np.sin(2 * np.pi * hq), atol=5e-3)


def test_mba_2d(ctx, rng):
    """2-D fit (tests/mba.cpp pattern): f(x,y) = x*y."""
    n = 4000
    px, py = rng.random(n), rng.random(n)
    vals = px * py
    interp = vex.mba([-0.01, -0.01], [1.01, 1.01], [px, py], vals,
                     grid=[4, 4], levels=9)
    m = 300
    qx, qy = rng.random(m), rng.random(m)
    X = vex.vector(data=qx, context=ctx)
    Y = vex.vector(data=qy, context=ctx)
    z = vex.vector(m, dtype=np.float64, context=ctx)
    z[:] = interp(X, Y)
    np.testing.assert_allclose(np.asarray(z), qx * qy, atol=2e-2)
    # in-expression use (docs: mba composes with expressions)
    z[:] = 1.0 + interp(X, Y)
    np.testing.assert_allclose(np.asarray(z), 1 + qx * qy, atol=2e-2)


def test_mba_refinement_exact(rng):
    """The flattening refinement (append_refined analog, mba.hpp:417) is
    EXACT: a lattice refined onto the doubled grid evaluates identically,
    so the single flattened lattice equals the summed hierarchy."""
    from vexcl_tpu.ops.mba import _eval_level_host, _refine_np

    lo, hi = (-0.01, -0.01), (1.01, 1.01)
    g = (8, 6)
    lat = rng.standard_normal((g[0] + 3, g[1] + 3))
    pts = (rng.random(2000), rng.random(2000))
    a = _eval_level_host(lo, hi, g, lat, pts)
    b = _eval_level_host(lo, hi, tuple(2 * x for x in g),
                         _refine_np(lat, g), pts)
    np.testing.assert_allclose(b, a, rtol=0, atol=1e-12)


def test_mba_patch_path_matches_lattice(rng):
    """The widened patch-row gather + separable weight contraction (the
    TPU fast path) agrees with the scalar-tap lattice form in 1/2/3-D
    (different summation order -> tiny fp difference only)."""
    import jax.numpy as jnp

    from vexcl_tpu.ops.mba import mba_device_eval

    for d, grid in ((1, (8,)), (2, (8, 6)), (3, (4, 4, 4))):
        sc = [rng.random(1500) for _ in range(d)]
        sv = sum(np.sin(3 * c) for c in sc)
        surf = vex.mba(lo=(-0.01,) * d, hi=(1.01,) * d, coords=sc,
                       values=sv, grid=grid, levels=3)
        assert surf._patch_dev is not None
        q = [jnp.asarray(rng.random(4000)) for _ in range(d)]
        a = mba_device_eval(surf.lo, surf.hi, surf.grids,
                            surf._lattices_dev, q)
        b = mba_device_eval(surf.lo, surf.hi, surf.grids, None, q,
                            patch=surf._patch_dev)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=1e-12)


def test_mba_distinct_domains_not_shared(ctx, rng):
    """r3 code-review regression: lo/hi are baked into the compiled
    evaluator, so two interpolants with equal ndim/grids but different
    domains must not share a kernel."""
    pts = rng.random(2000)
    a = vex.mba([-0.01], [1.01], [pts], np.sin(pts), grid=[8], levels=6)
    pts10 = pts * 10
    b = vex.mba([-0.1], [10.1], [pts10], np.sin(pts10 / 10), grid=[8],
                levels=6)
    q = rng.random(200)
    Q = vex.vector(data=q, context=ctx)
    Q10 = vex.vector(data=q * 10, context=ctx)
    za = vex.vector(200, dtype=np.float64, context=ctx)
    zb = vex.vector(200, dtype=np.float64, context=ctx)
    za[:] = a(Q)
    zb[:] = b(Q10)   # same structure, different domain
    np.testing.assert_allclose(np.asarray(za), np.sin(q), atol=5e-3)
    np.testing.assert_allclose(np.asarray(zb), np.sin(q), atol=5e-3)


def test_mba_levels_zero_raises():
    with pytest.raises(ValueError, match="levels"):
        vex.mba([0.0], [1.0], [np.array([0.5])], np.array([1.0]),
                grid=[4], levels=0)


def test_profiler(ctx):
    prof = vex.profiler("test")
    prof.tic_cpu("outer")
    prof.tic_cl("inner")
    x = vex.vector(1024, context=ctx)
    x[:] = 1.0
    prof.toc("inner")
    prof.toc("outer")
    rep = str(prof)
    assert "outer" in rep and "inner" in rep


def test_stopwatch():
    w = vex.stopwatch()
    w.tic()
    lap = w.toc()
    assert lap >= 0 and w.laps == 1
    with pytest.raises(RuntimeError):
        w.toc()


def test_kernel_as_function(ctx):
    """Kernel.as_function(): pure jittable form chains in fori_loop and
    matches per-step host dispatch."""
    import jax
    import jax.numpy as jnp

    from vexcl_tpu.models import LorenzEnsemble

    m = LorenzEnsemble(64, dtype=np.float64, context=ctx)
    x0, y0, z0 = (np.array(np.asarray(v.array)) for v in (m.x, m.y, m.z))
    fn = m._step.as_function()

    @jax.jit
    def run(x, y, z, R):
        return jax.lax.fori_loop(0, 3, lambda i, s: tuple(fn(*s, R)),
                                 (x, y, z))

    xs, _, _ = run(jnp.asarray(x0), jnp.asarray(y0), jnp.asarray(z0),
                   m.R.array)
    m.step(3)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(m.x), rtol=1e-10)


def test_lazy_evaluation_rk2(ctx, rng):
    """generator.cpp lazy_evaluation: an RK2 step written over tagged
    lazy expressions compiles ONE kernel and reuses it for every call."""
    from vexcl_tpu.cache import kernel_cache

    n, dt = 1024, 0.01
    hx = rng.random(n)
    X = vex.vector(data=hx, context=ctx)

    def rk2(x, h):
        Xt = vex.tag(1, x)
        DT = vex.tag(2, h)
        k1 = DT * vex.sin(Xt)
        x1 = Xt + 0.5 * k1
        k2 = DT * vex.sin(x1)
        x[:] = Xt + k2

    n0 = len(kernel_cache)
    for _ in range(100):
        rk2(X, dt)
    assert len(kernel_cache) - n0 == 1  # warm path: cache find only

    s = hx.copy()
    for _ in range(100):
        k1 = dt * np.sin(s)
        k2 = dt * np.sin(s + 0.5 * k1)
        s = s + k2
    np.testing.assert_allclose(np.asarray(X), s, rtol=1e-8)


def test_generator_kernel_composes_with_grad_and_vmap(ctx, rng):
    """Beyond the reference: a recorded kernel's pure-function form is a
    first-class JAX function, so jax.grad / jax.vmap compose through it
    (the reference's generated kernel is an opaque OpenCL string,
    generator.hpp:547-720 — no autodiff possible)."""
    import jax
    import jax.numpy as jnp

    x = generator.symbolic(np.float64)
    a = generator.symbolic(np.float64)
    y = generator.symbolic(np.float64)
    y[:] = vex.sin(x) * a + x * x
    fn = generator.build_kernel("g", [y], [x, a]).as_function()

    hx = rng.random(16)

    def loss(xv, av):
        (out,) = fn(xv, av)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(jnp.asarray(hx), 2.0)
    f = np.sin(hx) * 2.0 + hx * hx
    expect = 2 * f * (np.cos(hx) * 2.0 + 2 * hx)
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-10)

    batched = jax.vmap(lambda xv: fn(xv, 2.0)[0])(
        jnp.asarray(rng.random((4, 16))))
    assert batched.shape == (4, 16)
