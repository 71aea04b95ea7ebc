"""Port of tests/stencil.cpp behavior: convolution vs host oracle with edge
replication, user-body StencilOperator, multi-device halo exchange."""

import numpy as np
import pytest

import vexcl_tpu as vex

N = 4096


def host_stencil(x, s, center):
    n = len(x)
    w = len(s)
    xp = np.pad(x, (center, w - 1 - center), mode="edge")
    y = np.zeros(n)
    for k in range(w):
        y += s[k] * xp[k : k + n]
    return y


def test_stencil_convolution(ctx, rng):
    hx = rng.random(N)
    s = [0.1, 0.2, 0.4, 0.2, 0.1]
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(N, dtype=np.float64, context=ctx)
    st = vex.stencil(s, center=2)
    y[:] = x * st
    np.testing.assert_allclose(np.asarray(y), host_stencil(hx, s, 2), rtol=1e-10)


def test_asymmetric_stencil(ctx, rng):
    hx = rng.random(N)
    s = [1.0, -2.0, 1.0, 0.5]
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(N, dtype=np.float64, context=ctx)
    st = vex.stencil(s, center=0)
    y[:] = x * st
    np.testing.assert_allclose(np.asarray(y), host_stencil(hx, s, 0), rtol=1e-10)


def test_stencil_in_expression(ctx, rng):
    """y = x*s + 2*x fuses into one kernel (stencil terminals compose)."""
    hx = rng.random(N)
    s = [1 / 3, 1 / 3, 1 / 3]
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(N, dtype=np.float64, context=ctx)
    st = vex.stencil(s, center=1)
    y[:] = x * st + 2 * x
    np.testing.assert_allclose(
        np.asarray(y), host_stencil(hx, s, 1) + 2 * hx, rtol=1e-10
    )


def test_stencil_operator(ctx, rng):
    """User-body stencil: the docs' canonical X[0] + pow3(X[-1]+X[1])."""
    hx = rng.random(N)

    @vex.stencil_operator(width=3, center=1)
    def op(X):
        return X[0] + (X[-1] + X[1]) ** 3

    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(N, dtype=np.float64, context=ctx)
    y[:] = op(x)

    xp = np.pad(hx, (1, 1), mode="edge")
    expect = hx + (xp[:-2] + xp[2:]) ** 3
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-10)


def test_halo_exchange_shard_map(ctx, rng):
    """parallel.halo on the 8-device mesh vs numpy edge-pad oracle."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vexcl_tpu.parallel.halo import with_halo

    n = 64 * ctx.size
    hx = rng.random(n)
    xs = jax.device_put(hx, ctx.vector_sharding)

    def f(blk):
        padded = with_halo(blk, ctx.axis, 2, 1)
        # simple 4-tap stencil over the padded block
        nb = blk.shape[0]
        return padded[0:nb] + padded[1 : nb + 1] + padded[2 : nb + 2] + padded[3 : nb + 3]

    y = jax.jit(
        jax.shard_map(
            f, mesh=ctx.mesh, in_specs=P(ctx.axis), out_specs=P(ctx.axis)
        )
    )(xs)
    xp = np.pad(hx, (2, 1), mode="edge")
    expect = xp[:n] + xp[1 : n + 1] + xp[2 : n + 2] + xp[3 : n + 3]
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-12)


def test_bad_center_raises(ctx):
    with pytest.raises(ValueError):
        vex.stencil([1, 2, 3], center=5)


def test_distributed_scan(ctx, rng):
    """Device-side shard scan + ICI tail propagation
    (parallel/collectives.py, scan.hpp:426-458 analog)."""
    import jax
    from vexcl_tpu.parallel.collectives import distributed_scan

    n = 128 * ctx.size
    hx = rng.random(n)
    xs = jax.device_put(hx, ctx.vector_sharding)
    inc = jax.jit(
        lambda v: distributed_scan(v, ctx.mesh, ctx.axis, exclusive=False)
    )(xs)
    np.testing.assert_allclose(np.asarray(inc), np.cumsum(hx), rtol=1e-10)
    exc = jax.jit(
        lambda v: distributed_scan(v, ctx.mesh, ctx.axis, exclusive=True)
    )(xs)
    np.testing.assert_allclose(
        np.asarray(exc), np.concatenate([[0], np.cumsum(hx)[:-1]]), rtol=1e-10
    )


def test_pallas_stencil_kernel_interpret(rng):
    """The roll-based Pallas stencil kernel (interpret mode): flat shifts
    as lane rolls + row-slice selects, in-kernel edge replication, fused
    post-op.  Covers cross-row taps (width > 128) and both edges."""
    import jax
    import jax.numpy as jnp

    from vexcl_tpu.ops.pallas_stencil import stencil_pallas

    for n, w, c in [(1 << 16, 5, 2), (1 << 16, 3, 0), (1 << 16, 129, 64)]:
        hx = rng.random(n).astype(np.float32)
        s = (rng.random(w).astype(np.float32) - 0.5) / w
        got = np.asarray(
            jax.jit(lambda v: stencil_pallas(v, s, c))(jnp.asarray(hx))
        )
        ref = host_stencil(hx, s, c)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)

    # in-place (donated): taps still read pre-update values
    hx = rng.random(1 << 17).astype(np.float32)
    s = (rng.random(7).astype(np.float32) - 0.5) / 7
    got = np.asarray(
        jax.jit(lambda v: stencil_pallas(v, s, 3, donate=True))(
            jnp.asarray(hx)
        )
    )
    np.testing.assert_allclose(got, host_stencil(hx, s, 3), rtol=2e-5,
                               atol=2e-6)

    # fused post-op
    hx = rng.random(1 << 16).astype(np.float32)
    s = np.asarray([0.25, 0.5, 0.25], np.float32)
    got = np.asarray(
        jax.jit(
            lambda v: stencil_pallas(v, s, 1, post=lambda a: 2.0 * a + 1.0)
        )(jnp.asarray(hx))
    )
    np.testing.assert_allclose(
        got, 2.0 * host_stencil(hx, s, 1) + 1.0, rtol=2e-5, atol=2e-6
    )


def test_equal_named_stencil_operators_compile_separately(ctx, rng):
    """Same keying hazard as user functions: two StencilOperators with
    equal (name, width, center) but different bodies must not share a
    compiled evaluator (reference keys on generated source)."""
    hx = rng.random(N)
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(N, dtype=np.float64, context=ctx)

    op1 = vex.StencilOperator(3, 1, lambda X: X[0] + X[1], name="dup")
    op2 = vex.StencilOperator(3, 1, lambda X: X[0] - X[-1], name="dup")

    xp = np.pad(hx, (1, 1), mode="edge")
    y[:] = op1(x)
    np.testing.assert_allclose(np.asarray(y), hx + xp[2:], rtol=1e-10)
    y[:] = op2(x)
    np.testing.assert_allclose(np.asarray(y), hx - xp[:-2], rtol=1e-10)
