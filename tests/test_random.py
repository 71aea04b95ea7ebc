"""Port of tests/random.cpp behavior: statistical bounds on mean/variance,
determinism, independence of streams, normal distribution."""

import numpy as np
import pytest

import vexcl_tpu as vex

N = 1 << 16


@pytest.mark.parametrize("gen", ["philox", "threefry"])
def test_uniform_statistics(ctx, gen):
    rnd = vex.Random(np.float64, gen)
    x = vex.vector(N, dtype=np.float64, context=ctx)
    x[:] = rnd(vex.element_index(), 42)
    h = np.asarray(x)
    assert 0.0 <= h.min() and h.max() < 1.0
    assert abs(h.mean() - 0.5) < 0.01
    assert abs(h.var() - 1.0 / 12) < 0.005


@pytest.mark.parametrize("gen", ["philox", "threefry"])
def test_determinism_and_seed(ctx, gen):
    rnd = vex.Random(np.float32, gen)
    x = vex.vector(N, dtype=np.float32, context=ctx)
    y = vex.vector(N, dtype=np.float32, context=ctx)
    x[:] = rnd(vex.element_index(), 7)
    y[:] = rnd(vex.element_index(), 7)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    y[:] = rnd(vex.element_index(), 8)
    assert not np.array_equal(np.asarray(x), np.asarray(y))


def test_normal_statistics(ctx):
    rnd = vex.RandomNormal(np.float64)
    x = vex.vector(N, dtype=np.float64, context=ctx)
    x[:] = rnd(vex.element_index(), 123)
    h = np.asarray(x)
    assert abs(h.mean()) < 0.02
    assert abs(h.std() - 1.0) < 0.02
    # roughly symmetric tails
    assert 0.1 < (h > 1.0).mean() / 0.1587 < 1.9


def test_random_in_expression(ctx):
    """RNG terminals compose with arbitrary expressions (MC use-case)."""
    rnd = vex.Random(np.float64)
    x = vex.vector(N, dtype=np.float64, context=ctx)
    x[:] = 2.0 * rnd(vex.element_index(), 1) - 1.0
    h = np.asarray(x)
    assert -1.0 <= h.min() and h.max() < 1.0
    assert abs(h.mean()) < 0.02


def test_monte_carlo_pi(ctx):
    """The reference's canonical RNG example: MC estimate of pi
    (README.md / doc examples)."""
    n = 1 << 20
    rnd = vex.Random(np.float64)
    i = vex.element_index(0, n)
    x = rnd(i, 10)
    y = rnd(i, 20)
    Sum = vex.Reductor(vex.SUM)
    inside = Sum(vex.if_else(x * x + y * y < 1.0, 1.0, 0.0))
    pi = 4.0 * inside / n
    assert abs(pi - np.pi) < 0.01


def test_philox_reference_vector():
    """Philox4x32-10 known-answer test from Random123:
    counter=(0,0,0,0), key=(0,0) -> 6627e8d5 e169c58d bc57ac4c 9b00dbd8."""
    import jax.numpy as jnp
    from vexcl_tpu.ops.random import philox4x32

    c = [jnp.zeros(1, jnp.uint32) for _ in range(4)]
    out = philox4x32(c[0], c[1], c[2], c[3], 0, 0)
    got = [int(o[0]) for o in out]
    assert got == [0x6627E8D5, 0xE169C58D, 0xBC57AC4C, 0x9B00DBD8]


def test_threefry_reference_vector():
    """Threefry2x32-20 KAT: ctr=(0,0), key=(0,0) -> 6b200159 99ba4efe."""
    import jax.numpy as jnp
    from vexcl_tpu.ops.random import threefry2x32

    out = threefry2x32(jnp.zeros(1, jnp.uint32), jnp.zeros(1, jnp.uint32), 0, 0)
    got = [int(o[0]) for o in out]
    assert got == [0x6B200159, 0x99BA4EFE]


def test_pltpu_generator_fallback(ctx):
    """The hardware-PRNG generator falls back to philox off-TPU and keeps
    the statistical contract."""
    rnd = vex.Random(np.float32, "pltpu")
    x = vex.vector(N, dtype=np.float32, context=ctx)
    x[:] = rnd(vex.element_index(), 3)
    h = np.asarray(x)
    assert 0 <= h.min() and h.max() < 1
    assert abs(h.mean() - 0.5) < 0.02
