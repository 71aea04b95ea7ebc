"""Destination-buffer donation (config.donate, VEXTPU_DONATE).

The TPU lever: for x = f(x) shapes the destination's storage is donated so
XLA aliases the kernel output onto it (in-place update, ~2x streaming
bandwidth for 1r+1w kernels — docs/tpu_kernel_notes.md).  These tests pin
the dispatch rules on the CPU mesh:

  * x = f(x)   donates x's buffer (old buffer becomes invalid, the vector
               swaps in the result — externally invisible),
  * x += expr  donates `old` — UNLESS the same buffer is also an
               expression leaf (x += x*y), where donation would alias the
               output over memory another parameter still reads,
  * the kernel cache keys on the donated-slot tuple, so y = f(x) compiled
    after x = f(x) (same structural signature) must NOT donate x.
"""

import numpy as np
import pytest

import vexcl_tpu as vex
from vexcl_tpu.config import config


@pytest.fixture
def donate_on():
    old = config.donate
    config.donate = True
    try:
        yield
    finally:
        config.donate = old


def test_self_assign_donates_and_result_correct(ctx, rng, donate_on):
    hx = rng.random(4096)
    hy = rng.random(4096)
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(data=hy, context=ctx)
    x[:] = 2 * x + y
    np.testing.assert_allclose(np.asarray(x), 2 * hx + hy)
    # warm path: second call hits the cached donated kernel
    x[:] = 2 * x + y
    np.testing.assert_allclose(np.asarray(x), 2 * (2 * hx + hy) + hy)


def test_cache_separates_donated_and_plain(ctx, rng, donate_on):
    """Same signature, different destination: z = 2*x + y must not donate
    x's buffer even when x = 2*x + y (a donating kernel) compiled first."""
    hx = rng.random(2048)
    hy = rng.random(2048)
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(data=hy, context=ctx)
    x[:] = 2 * x + y  # compiles the donated variant
    z = vex.vector(2048, dtype=np.float64, context=ctx)
    z[:] = 2 * x + y  # same sig; x's slot must NOT be donated here
    np.testing.assert_allclose(np.asarray(z), 2 * np.asarray(x) + hy)
    # x survives: its buffer was not donated by z's assignment
    np.testing.assert_allclose(np.asarray(x), 2 * hx + hy)


def test_compound_self_leaf_suppresses_donation(ctx, rng, donate_on):
    """x += x*y passes x's buffer both as `old` and as a leaf — donation
    must be suppressed (aliased output would corrupt the leaf read)."""
    hx = rng.random(1024)
    hy = rng.random(1024)
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(data=hy, context=ctx)
    x += x * y
    np.testing.assert_allclose(np.asarray(x), hx + hx * hy)


def test_compound_plain_donates_old(ctx, rng, donate_on):
    hx = rng.random(1024)
    hy = rng.random(1024)
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(data=hy, context=ctx)
    x += 3 * y
    np.testing.assert_allclose(np.asarray(x), hx + 3 * hy)
    x -= y
    np.testing.assert_allclose(np.asarray(x), hx + 2 * hy)


def test_donate_padded_odd_size(ctx, rng, donate_on):
    """Odd sizes ship padded storage; the result is logical-length so no
    aliasing happens — but the path must stay correct."""
    hx = rng.random(1003)
    x = vex.vector(data=hx, context=ctx)
    x[:] = x * 2 + 1
    np.testing.assert_allclose(np.asarray(x), hx * 2 + 1)
    assert x[-1] == pytest.approx(hx[-1] * 2 + 1)


def test_tie_compound_donates_olds(ctx, rng, donate_on):
    """Fused multivector compound assignment donates the olds tuple —
    unless a destination buffer is also an expression leaf."""
    ha = rng.random(512)
    hb = rng.random(512)
    hx = rng.random(512)
    hy = rng.random(512)
    a = vex.vector(data=ha, context=ctx)
    b = vex.vector(data=hb, context=ctx)
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(data=hy, context=ctx)
    vex.tie(x, y).assign((a + b, a - b), op="+=")  # plain: olds donated
    np.testing.assert_allclose(np.asarray(x), hx + ha + hb)
    np.testing.assert_allclose(np.asarray(y), hy + ha - hb)
    # hazard: destinations appear as leaves -> donation suppressed
    vex.tie(x, y).assign((y * 2, x * 3), op="+=")
    ex = (hx + ha + hb) + 2 * (hy + ha - hb)
    ey = (hy + ha - hb) + 3 * (hx + ha + hb)
    np.testing.assert_allclose(np.asarray(x), ex)
    np.testing.assert_allclose(np.asarray(y), ey)


def test_tie_plain_assign_donates_destinations(ctx, rng, donate_on):
    """tie(x, y) = (f(x), g(y)): each destination storage occupying one
    leaf slot is donated (evaluate_multi donate_buffers)."""
    hx = rng.random(1024)
    hy = rng.random(1024)
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(data=hy, context=ctx)
    vex.tie(x, y).assign((2 * x + y, x - y))
    np.testing.assert_allclose(np.asarray(x), 2 * hx + hy)
    np.testing.assert_allclose(np.asarray(y), hx - hy)
    # swap through the fused kernel: donation must still read old values
    vex.tie(x, y).assign((y * 1, x * 1))
    np.testing.assert_allclose(np.asarray(x), hx - hy)
    np.testing.assert_allclose(np.asarray(y), 2 * hx + hy)


def test_multivector_plain_assign_donates(ctx, rng, donate_on):
    h = rng.random((3, 512))
    m = vex.multivector(data=h, context=ctx)
    m[:] = m * 2 + 1
    np.testing.assert_allclose(m.to_numpy(), h * 2 + 1)
    m[:] = m * 2 + 1  # warm path replays the donated kernel
    np.testing.assert_allclose(m.to_numpy(), (h * 2 + 1) * 2 + 1)


def test_tagged_multi_slot_suppresses_donation(ctx, rng, donate_on):
    """x = x - tag(0, x): the same storage occupies TWO leaf slots (one
    buffer-identity keyed, one tag keyed).  Donating both would crash at
    execute time; donating one would corrupt the other slot's read.  The
    dispatch must decline donation entirely (compile._donate_slots)."""
    hx = rng.random(1024)
    x = vex.vector(data=hx, context=ctx)
    x[:] = x - vex.tag(0, x) + 1.0
    np.testing.assert_allclose(np.asarray(x), np.ones_like(hx))
    # warm path replays the non-donated cached kernel
    x[:] = x - vex.tag(0, x) + 1.0
    np.testing.assert_allclose(np.asarray(x), np.ones_like(hx))


def test_copy_does_not_share_storage_with_donation(ctx, rng, donate_on):
    """copy()/assign(vector) must produce a distinct device buffer: if the
    two vectors shared storage, a donated x = f(x) on one would delete the
    other's data out from under it."""
    hx = rng.random(2048)
    x = vex.vector(data=hx, context=ctx)
    y = x.copy()
    x[:] = x * 2  # donates x's buffer
    np.testing.assert_allclose(np.asarray(y), hx)  # y unharmed
    np.testing.assert_allclose(np.asarray(x), hx * 2)

    z = vex.vector(2048, dtype=x.dtype, context=ctx)
    z.assign(y)  # same-dtype assign: astype() is a no-op short-circuit
    y[:] = y + 1  # donates y's buffer
    np.testing.assert_allclose(np.asarray(z), hx)  # z unharmed


def test_padded_destination_buffer_survives(ctx, rng, donate_on):
    """Odd (padded) destinations never alias output onto storage, so the
    dispatch must not request donation — the old padded buffer stays
    readable after the assignment."""
    hx = rng.random(1003)
    x = vex.vector(data=hx, context=ctx)
    keep = x.storage  # padded device buffer
    x[:] = x * 2
    np.testing.assert_allclose(np.asarray(x), hx * 2)
    assert np.asarray(keep).shape[0] >= 1003  # still readable, not donated


def test_donate_off_by_default(ctx, rng):
    assert config.donate in (False, True)  # env-driven; just exercise off
    old = config.donate
    config.donate = False
    try:
        hx = rng.random(512)
        x = vex.vector(data=hx, context=ctx)
        keep = x.array  # user-held handle to the current buffer
        x[:] = x + 1
        np.testing.assert_allclose(np.asarray(x), hx + 1)
        # without donation the old buffer must remain readable
        np.testing.assert_allclose(np.asarray(keep), hx)
    finally:
        config.donate = old


def test_constructed_from_jax_array_is_borrowed(ctx, rng, donate_on):
    """vector(data=<jax.Array>) may alias the caller's buffer (device_put
    is a no-copy when placement already matches), so the first assignment
    must not donate it: donation would delete the caller's array and any
    sibling vector built from the same buffer (r2 review finding)."""
    import jax

    host = rng.random(4096).astype(np.float64)
    arr = jax.device_put(host, ctx.vector_sharding)  # placement matches
    a = vex.vector(data=arr, context=ctx)
    b = vex.vector(data=arr, context=ctx)
    a[:] = 2 * a + 1  # must NOT donate the shared buffer
    np.testing.assert_allclose(np.asarray(a), 2 * host + 1)
    np.testing.assert_allclose(np.asarray(b), host)   # sibling intact
    np.testing.assert_allclose(np.asarray(arr), host)  # caller intact
    # the result buffer is fresh and exclusively owned: donation resumes
    a[:] = a * 2
    np.testing.assert_allclose(np.asarray(a), (2 * host + 1) * 2)


def test_tie_with_borrowed_storage_does_not_donate(ctx, rng, donate_on):
    """Fused tie assignment skips donation for components whose storage is
    still shared with a caller-held jax.Array."""
    import jax

    hx = rng.random(2048)
    hy = rng.random(2048)
    ax = jax.device_put(hx, ctx.vector_sharding)
    x = vex.vector(data=ax, context=ctx)
    y = vex.vector(data=hy, context=ctx)
    vex.tie(x, y).assign((x * 2, y + 1))
    np.testing.assert_allclose(np.asarray(x), hx * 2)
    np.testing.assert_allclose(np.asarray(ax), hx)  # caller's array intact
    np.testing.assert_allclose(np.asarray(y), hy + 1)


def test_swap_carries_borrowed_flag(ctx, rng, donate_on):
    import jax

    hx = rng.random(1024)
    ax = jax.device_put(hx, ctx.vector_sharding)
    x = vex.vector(data=ax, context=ctx)  # borrowed
    y = vex.vector(data=rng.random(1024), context=ctx)  # owned
    x.swap(y)
    y[:] = y * 3  # y now holds the borrowed buffer: must not donate
    np.testing.assert_allclose(np.asarray(ax), hx)


def test_compound_on_borrowed_does_not_donate_old(ctx, rng, donate_on):
    """x += expr donates the old value — but NOT when x's storage is a
    buffer the caller handed in (vector._borrowed): donating it would
    delete the caller's jax.Array (r2 review finding, compile.evaluate
    old_donatable)."""
    import jax

    host = rng.random(4096)
    arr = jax.device_put(host, ctx.vector_sharding)
    x = vex.vector(data=arr, context=ctx)
    x += 1
    np.testing.assert_allclose(np.asarray(x), host + 1)
    np.testing.assert_allclose(np.asarray(arr), host)  # caller intact
    # the fresh result buffer is owned: old-donation resumes next time
    x += 1
    np.testing.assert_allclose(np.asarray(x), host + 2)


def test_tie_compound_on_borrowed_does_not_donate_olds(ctx, rng, donate_on):
    """Fused compound (tie += / multivector +=) skips olds donation when
    ANY destination storage is borrowed (donation of the olds tuple is
    all-or-nothing)."""
    import jax

    hx = rng.random(2048)
    hy = rng.random(2048)
    ax = jax.device_put(hx, ctx.vector_sharding)
    x = vex.vector(data=ax, context=ctx)
    y = vex.vector(data=hy, context=ctx)
    vex.tie(x, y).assign((1.0, 2.0), "+=")
    np.testing.assert_allclose(np.asarray(x), hx + 1)
    np.testing.assert_allclose(np.asarray(y), hy + 2)
    np.testing.assert_allclose(np.asarray(ax), hx)  # caller intact


def test_assign_value_guards_borrowed(ctx, rng, donate_on):
    """The exported compile.assign_value must apply the same borrowed
    guards as vector.assign (both '=' donate_buffer and compound old)."""
    import jax

    from vexcl_tpu.expr.compile import assign_value

    host = rng.random(1024)
    arr = jax.device_put(host, ctx.vector_sharding)
    v = vex.vector(data=arr, context=ctx)
    assign_value(v, 2.0 * v)
    np.testing.assert_allclose(np.asarray(v), 2 * host)
    np.testing.assert_allclose(np.asarray(arr), host)
    w = vex.vector(data=jax.device_put(host, ctx.vector_sharding), context=ctx)
    warr = w._array
    assign_value(w, 1.0, op="+=")
    np.testing.assert_allclose(np.asarray(w), host + 1)
    np.testing.assert_allclose(np.asarray(warr), host)


def test_slot_single_use_detection(ctx, rng, donate_on):
    """_slot_single_use: the Pallas in-place gate.  x appearing once ->
    True; twice (two VectorTerminals deduped onto one slot) -> False."""
    from vexcl_tpu.expr.compile import _slot_single_use
    from vexcl_tpu.expr.node import analyze

    x = vex.vector(data=rng.random(1024), context=ctx)
    y = vex.vector(data=rng.random(1024), context=ctx)

    e1 = 2.0 * x[:] + y[:]
    a1 = analyze(e1)
    sx = next(i for i, l in enumerate(a1.leaves) if l is x.storage)
    assert _slot_single_use((e1,), a1, sx)

    e2 = x[:] * 1.0 + 2.0 * x[:]  # x referenced twice, one slot
    a2 = analyze(e2)
    sx2 = next(i for i, l in enumerate(a2.leaves) if l is x.storage)
    assert not _slot_single_use((e2,), a2, sx2)


def test_stencil_inplace_flag_reaches_kernel(ctx, rng, monkeypatch, donate_on):
    """x[:] = x * s must reach stencil_pallas with donate=True (the
    input_output_aliases in-place path); y[:] = x * s and multi-read
    expressions must not.  The Pallas guard/kernel are stubbed (interpret
    mode declines the real kernel) — this pins the env.inplace wiring."""
    import jax.numpy as jnp

    import vexcl_tpu.ops.pallas_stencil as ps

    recorded = []

    def fake_guard(n, width, dtype, expr=None):
        from vexcl_tpu.ops.dispatch import expr_on_multiple_devices

        return expr is None or not expr_on_multiple_devices(expr)

    def fake_kernel(x, coeffs, center, post=None, donate=False):
        recorded.append(bool(donate))
        n = x.shape[0]
        xp = jnp.pad(x, (center, len(coeffs) - 1 - center), mode="edge")
        y = jnp.zeros(n, dtype=x.dtype)
        for k in range(len(coeffs)):
            y = y + float(coeffs[k]) * xp[k : k + n]
        return y if post is None else post(y)

    monkeypatch.setattr(ps, "use_pallas_stencil", fake_guard)
    monkeypatch.setattr(ps, "stencil_pallas", fake_kernel)

    # unsharded single-device vectors (donation declines padded storage)
    c1 = vex.Context(vex.Filter.Position(0), set_current=False)
    hx = rng.random(512)
    s = vex.stencil([0.25, 0.5, 0.25], center=1)

    x = vex.vector(data=hx, context=c1)
    x[:] = x * s                       # in-place shape
    assert recorded[-1] is True
    ref = np.pad(hx, 1, mode="edge")
    np.testing.assert_allclose(
        np.asarray(x), 0.25 * ref[:-2] + 0.5 * ref[1:-1] + 0.25 * ref[2:])

    y = vex.vector(512, dtype=np.float64, context=c1)
    y[:] = x * s                       # different destination: no in-place
    assert recorded[-1] is False

    z = vex.vector(data=rng.random(512), context=c1)
    z[:] = z * s + 0.5 * z             # z read twice: no in-place
    assert recorded[-1] is False


def test_inplace_scan_donates_and_is_correct(ctx1, rng, donate_on):
    """inclusive_scan(x, x) donates x's buffer (dst IS src) on the XLA
    path too; result correct and repeatable (fresh buffer installed)."""
    h = rng.random(4096).astype(np.float64)
    x = vex.vector(data=h.copy(), context=ctx1)
    vex.inclusive_scan(x, x)
    np.testing.assert_allclose(np.asarray(x), np.cumsum(h), rtol=1e-12)
    vex.inclusive_scan(x, x)  # warm path, donated again
    np.testing.assert_allclose(np.asarray(x), np.cumsum(np.cumsum(h)),
                               rtol=1e-12)
    # exclusive in-place with init
    y = vex.vector(data=h.copy(), context=ctx1)
    vex.exclusive_scan(y, y, init=2.0)
    ref = 2.0 + np.concatenate([[0], np.cumsum(h)[:-1]])
    ref[0] = 2.0
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-12)


def test_inplace_scan_borrowed_not_donated(ctx1, rng, donate_on):
    """dst is src but the storage is a caller-held jax.Array: the scan
    must NOT delete the caller's buffer."""
    import jax

    h = rng.random(2048)
    arr = jax.device_put(h, ctx1.devices[0])
    x = vex.vector(data=arr, context=ctx1)
    vex.inclusive_scan(x, x)
    np.testing.assert_allclose(np.asarray(x), np.cumsum(h), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(arr), h)  # caller intact
