"""Port of tests/spmv.cpp behavior: dense-random and Poisson matrices vs
host oracle, hybrid/csr/ell formats, inline spmv in expressions, CCSR,
distributed ghost-exchange SpMV."""

import numpy as np
import pytest

import vexcl_tpu as vex
from vexcl_tpu import sparse


def random_csr(rng, n, m, density=0.05):
    nnz_row = rng.integers(1, max(2, int(m * density)), size=n)
    ptr = np.concatenate([[0], np.cumsum(nnz_row)])
    col = np.concatenate([
        np.sort(rng.choice(m, size=k, replace=False)) for k in nnz_row
    ]).astype(np.int32)
    val = rng.standard_normal(ptr[-1])
    return ptr, col, val


def csr_matvec(ptr, col, val, x):
    y = np.zeros(len(ptr) - 1, dtype=np.result_type(val, x))
    for i in range(len(ptr) - 1):
        y[i] = val[ptr[i]:ptr[i + 1]] @ x[col[ptr[i]:ptr[i + 1]]]
    return y


def poisson_7pt(n):
    """64^3-style 7-point Poisson CSR (tests/spmv.cpp, benchmark.cpp:353-478)."""
    idx = lambda i, j, k: (i * n + j) * n + k
    ptr, col, val = [0], [], []
    for i in range(n):
        for j in range(n):
            for k in range(n):
                for (di, dj, dk, v) in (
                    (0, 0, 0, 6.0), (-1, 0, 0, -1.0), (1, 0, 0, -1.0),
                    (0, -1, 0, -1.0), (0, 1, 0, -1.0),
                    (0, 0, -1, -1.0), (0, 0, 1, -1.0),
                ):
                    ii, jj, kk = i + di, j + dj, k + dk
                    if 0 <= ii < n and 0 <= jj < n and 0 <= kk < n:
                        col.append(idx(ii, jj, kk))
                        val.append(v)
                ptr.append(len(col))
    return (np.asarray(ptr), np.asarray(col, np.int32), np.asarray(val))


N = 512
M = 512


@pytest.mark.parametrize("fmt", ["csr", "ell", "hyb"])
def test_spmv_formats(ctx, rng, fmt):
    ptr, col, val = random_csr(rng, N, M)
    hx = rng.random(M)
    A = vex.SpMat(N, M, ptr, col, val, fmt=fmt, context=ctx)
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(N, dtype=np.float64, context=ctx)
    y[:] = A * x
    np.testing.assert_allclose(np.asarray(y), csr_matvec(ptr, col, val, hx), rtol=1e-10)


def test_spmv_in_expression(ctx, rng):
    """Inline SpMV: y = alpha*(A*x) + beta*z in ONE kernel
    (spmat/inline_spmv.hpp semantics)."""
    ptr, col, val = random_csr(rng, N, M)
    hx = rng.random(M)
    hz = rng.random(N)
    A = vex.SpMat(N, M, ptr, col, val, context=ctx)
    x = vex.vector(data=hx, context=ctx)
    z = vex.vector(data=hz, context=ctx)
    y = vex.vector(N, dtype=np.float64, context=ctx)
    y[:] = 2.0 * vex.make_inline(A * x) + 0.5 * z
    expect = 2.0 * csr_matvec(ptr, col, val, hx) + 0.5 * hz
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-10)


def test_spmv_apply_append(ctx, rng):
    ptr, col, val = random_csr(rng, N, M)
    hx = rng.random(M)
    A = vex.SpMat(N, M, ptr, col, val, context=ctx)
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(N, dtype=np.float64, context=ctx)
    y[:] = 1.0
    A.apply(x, y, alpha=3.0, append=True)
    np.testing.assert_allclose(
        np.asarray(y), 1.0 + 3.0 * csr_matvec(ptr, col, val, hx), rtol=1e-10
    )


def test_poisson_spmv(ctx):
    n = 16
    ptr, col, val = poisson_7pt(n)
    nn = n ** 3
    hx = np.random.default_rng(1).random(nn)
    A = vex.SpMat(nn, nn, ptr, col, val, fmt="hyb", context=ctx)
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(nn, dtype=np.float64, context=ctx)
    y[:] = A * x
    np.testing.assert_allclose(np.asarray(y), csr_matvec(ptr, col, val, hx), rtol=1e-10)


def test_ccsr(ctx):
    """Compressed CSR on a 1-D Laplacian: interior rows share one pattern."""
    n = 256
    # unique patterns: row 0 [0,1], interior [-1,0,1], row n-1 [-1,0]
    idx = np.full(n, 1, np.int32)
    idx[0] = 0
    idx[-1] = 2
    row = np.array([0, 2, 5, 7])
    col = np.array([0, 1, -1, 0, 1, -1, 0], np.int32)
    val = np.array([2.0, -1.0, -1.0, 2.0, -1.0, -1.0, 2.0])
    A = vex.SpMatCCSR(n, n, idx, row, col, val, context=None)
    hx = np.random.default_rng(2).random(n)
    x = vex.vector(data=hx)
    y = vex.vector(n, dtype=np.float64)
    y[:] = A * x
    expect = 2 * hx
    expect[:-1] -= hx[1:]
    expect[1:] -= hx[:-1]
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-10)


def test_distributed_spmv(ctx, rng):
    """Ghost exchange over the 8-device mesh (sparse/distributed.hpp)."""
    n = 1000  # deliberately not divisible by 8
    ptr, col, val = random_csr(rng, n, n, density=0.01)
    hx = rng.random(n)
    A = sparse.distributed(n, n, ptr, col, val, context=ctx)
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(n, dtype=np.float64, context=ctx)
    y[:] = A * x
    np.testing.assert_allclose(np.asarray(y), csr_matvec(ptr, col, val, hx), rtol=1e-10)
    # in-expression use
    y[:] = A * x + 1.0
    np.testing.assert_allclose(
        np.asarray(y), csr_matvec(ptr, col, val, hx) + 1.0, rtol=1e-10
    )


def test_dia_autodetect_and_correctness(ctx):
    """TPU-first DIA format: Poisson is banded -> auto-picks DIA."""
    from vexcl_tpu.utils.poisson import poisson_7pt

    n = 12
    ptr, col, val = poisson_7pt(n)
    nn = n ** 3
    A = vex.SpMat(nn, nn, ptr, col, val, fmt=None, context=ctx)
    assert A.device.format == "dia"
    hx = np.random.default_rng(3).random(nn)
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(nn, dtype=np.float64, context=ctx)
    y[:] = A * x
    np.testing.assert_allclose(np.asarray(y), csr_matvec(ptr, col, val, hx), rtol=1e-10)
    # rectangular slice still works through explicit dia
    B = vex.SpMat(nn, nn, ptr, col, val, fmt="dia", context=ctx)
    y[:] = 0.5 * (B * x) + 1.0
    np.testing.assert_allclose(
        np.asarray(y), 0.5 * csr_matvec(ptr, col, val, hx) + 1.0, rtol=1e-10
    )


def test_random_matrix_not_dia(ctx, rng):
    """Scattered sparsity must fall back to ELL/CSR."""
    ptr, col, val = random_csr(rng, 256, 256, density=0.05)
    A = vex.SpMat(256, 256, ptr, col, val, fmt=None, context=ctx)
    assert A.device.format in ("csr", "ell", "hyb")


def test_sellr_fallback_warns(ctx, rng, monkeypatch):
    """A >1M-nnz irregular matrix silently degrading to the gather hybrid
    (~0.14 Gelem/s on TPU) must warn loudly (VERDICT r4 #3); the SELL-R
    default is only capped by VEXTPU_SELLR_AUTO_MAX."""
    import jax

    n, w = 1 << 16, 17  # nnz just above the 1M warning threshold
    ptr = np.arange(n + 1, dtype=np.int64) * w
    col = rng.integers(0, n, n * w).astype(np.int32)
    val = np.ones(n * w, dtype=np.float32)
    monkeypatch.setenv("VEXTPU_SELLR_AUTO_MAX", "1000")
    # the warning fires on the accelerator path; the CPU backend routes
    # to CSR before the cap check, so drive the policy branch directly
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pytest.warns(UserWarning, match="gather hybrid"):
        A = vex.SpMat(n, n, ptr, col, val, fmt=None, context=ctx)
    assert A.device.format == "hyb"


def test_sellr_f64_contract_dtype_guard(ctx, rng, monkeypatch):
    """f64 (the reference contract dtype, examples/benchmark.cpp:353-478)
    routes to the XLA gather hybrid on accelerators: Mosaic does not
    compile the shuffle kernels at f64 on v5e (VERDICT r4 #4).  The
    product stays correct through software-emulated f64; VEXTPU_SELLR_F64
    forces SELL-R (interpret-mode oracles use it)."""
    import jax

    n, w = 256, 5
    ptr = np.arange(n + 1, dtype=np.int64) * w
    col = rng.integers(0, n, n * w).astype(np.int32)
    val = rng.standard_normal(n * w)          # float64
    # patch the backend only for FORMAT SELECTION — the matvecs below
    # must still see the CPU backend so Pallas runs interpret mode
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(jax, "default_backend", lambda: "tpu")
        A = vex.SpMat(n, n, ptr, col, val, fmt=None, context=ctx)
        mp.setenv("VEXTPU_SELLR_F64", "1")
        B = vex.SpMat(n, n, ptr, col, val, fmt=None, context=ctx)
    assert A.device.format == "hyb"
    assert A.dtype == np.float64
    assert B.device.format == "sellr"
    x = rng.standard_normal(n)
    ref = csr_matvec(ptr, col, val, x)
    for M in (A, B):
        y = vex.vector(n, dtype=np.float64, context=ctx)
        y[:] = M * vex.vector(data=x, context=ctx)
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-12)


def test_distributed_banded_halo_exchange(ctx):
    """Banded distributed SpMV: ghost exchange is neighbor-only ppermute
    halos (minimal ghost sets, like spmat.hpp setup_exchange) instead of
    all-gather."""
    from vexcl_tpu.utils.poisson import poisson_7pt

    nd = 8
    ptr, col, val = poisson_7pt(nd)
    n = nd ** 3  # 512, divisible by 8; band = +-64 < shard 64? no: == 64
    A = sparse.distributed(n, n, ptr, col, val, context=ctx)
    hx = np.random.default_rng(5).random(n)
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(n, dtype=np.float64, context=ctx)
    y[:] = A * x
    np.testing.assert_allclose(np.asarray(y), csr_matvec(ptr, col, val, hx), rtol=1e-10)


def test_distributed_1d_laplace_halo(ctx):
    n = 1024
    ptr, col, val = [0], [], []
    for i in range(n):
        for j, v in ((i - 1, -1.0), (i, 2.0), (i + 1, -1.0)):
            if 0 <= j < n:
                col.append(j)
                val.append(v)
        ptr.append(len(col))
    ptr, col, val = np.asarray(ptr), np.asarray(col, np.int32), np.asarray(val)
    A = sparse.distributed(n, n, ptr, col, val, context=ctx)
    assert A.mode == "dia_halo"
    hx = np.random.default_rng(6).random(n)
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(n, dtype=np.float64, context=ctx)
    y[:] = 2.0 * (A * x) + 1.0
    np.testing.assert_allclose(
        np.asarray(y), 2 * csr_matvec(ptr, col, val, hx) + 1, rtol=1e-10
    )


def test_ccsr_poisson(ctx):
    """CCSR on the canonical Poisson workload (benchmark.cpp:481-607)."""
    from vexcl_tpu.utils.poisson import poisson_7pt, poisson_7pt_ccsr

    n = 10
    idx, row, col, val = poisson_7pt_ccsr(n)
    A = vex.SpMatCCSR(n ** 3, n ** 3, idx, row, col, val, context=ctx)
    ptr2, col2, val2 = poisson_7pt(n)
    hx = np.random.default_rng(9).random(n ** 3)
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(n ** 3, dtype=np.float64, context=ctx)
    y[:] = A * x
    np.testing.assert_allclose(
        np.asarray(y), csr_matvec(ptr2, col2, val2, hx), rtol=1e-10
    )


def test_pallas_dia_roll_kernel_interpret(rng):
    """Roll-based DIA kernel (interpret mode): lane-roll shifts, window
    DMA, zero-pad boundary semantics."""
    import jax
    import jax.numpy as jnp

    from vexcl_tpu.sparse.pallas_dia import dia_matvec_pallas_roll

    n = 1 << 18
    for offs in [(-1, 0, 1), (-4096, -64, -1, 0, 1, 64, 4096)]:
        d = len(offs)
        vals = rng.random((d, n)).astype(np.float32)
        i = np.arange(n)
        for k, o in enumerate(offs):
            vals[k, (i + o < 0) | (i + o >= n)] = 0
        x = rng.random(n).astype(np.float32)
        ref = np.zeros(n)
        for k, o in enumerate(offs):
            msk = (i + o >= 0) & (i + o < n)
            ref[msk] += vals[k, msk].astype(np.float64) * x[(i + o)[msk]]
        got = np.asarray(
            jax.jit(
                lambda v, xx, offs=offs: dia_matvec_pallas_roll(
                    n, n, offs, v, xx
                )
            )(jnp.asarray(vals), jnp.asarray(x))
        )
        np.testing.assert_allclose(got, ref, rtol=3e-5, atol=3e-5)


def test_pallas_dia_ring_kernel_interpret(rng):
    """Ring DIA kernel (interpret mode): plane offsets as whole neighbor
    core blocks in a 4-ring, small taps via halo concat."""
    import jax
    import jax.numpy as jnp

    from vexcl_tpu.sparse.pallas_dia import dia_matvec_pallas_ring

    n = 8 * 512 * 128
    offs = (-65536, -256, -1, 0, 1, 256, 65536)
    d = len(offs)
    vals = rng.random((d, n)).astype(np.float32)
    i = np.arange(n)
    for k, o in enumerate(offs):
        vals[k, (i + o < 0) | (i + o >= n)] = 0
    x = rng.random(n).astype(np.float32)
    ref = np.zeros(n)
    for k, o in enumerate(offs):
        msk = (i + o >= 0) & (i + o < n)
        ref[msk] += vals[k, msk].astype(np.float64) * x[(i + o)[msk]]
    got = np.asarray(
        jax.jit(lambda v, xx: dia_matvec_pallas_ring(n, n, offs, v, xx))(
            jnp.asarray(vals), jnp.asarray(x)
        )
    )
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=3e-5)


def test_distributed_a2a_minimal_ghost(ctx, rng):
    """General sparse coupling: minimal per-pair ghost sets exchanged with
    one all-to-all (the setup_exchange analog, spmat.hpp:291-378) instead
    of a full all-gather."""
    n = 4096
    nnz_per_row = 5
    col = np.zeros((n, nnz_per_row), np.int64)
    for r in range(n):
        base = (r // 512) * 512
        local = rng.integers(base, base + 512, 3)
        remote = rng.integers(0, n, 2)
        col[r] = np.concatenate([local, remote])
    colf = np.sort(col, axis=1).ravel()
    val = rng.random(n * nnz_per_row)
    ptr = np.arange(n + 1) * nnz_per_row

    A = sparse.distributed(n, n, ptr, colf, val, context=ctx)
    assert A.mode == "ell_a2a"
    hx = rng.random(n)
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(n, dtype=np.float64, context=ctx)
    y[:] = A * x
    np.testing.assert_allclose(
        np.asarray(y), csr_matvec(ptr, colf, val, hx), rtol=1e-6
    )


def test_distributed_a2a_dense_falls_back(ctx, rng):
    """Densely coupled matrices keep the all-gather exchange."""
    n = 1024
    nnz_per_row = 4
    col = rng.integers(0, n, (n, nnz_per_row))  # uniformly random: dense
    colf = np.sort(col, axis=1).ravel()
    val = rng.random(n * nnz_per_row)
    ptr = np.arange(n + 1) * nnz_per_row
    A = sparse.distributed(n, n, ptr, colf, val, context=ctx)
    assert A.mode == "ell_allgather"
    hx = rng.random(n)
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(n, dtype=np.float64, context=ctx)
    y[:] = A * x
    np.testing.assert_allclose(
        np.asarray(y), csr_matvec(ptr, colf, val, hx), rtol=1e-6
    )


def test_ccsr_cache_expansion(ctx, rng):
    """SpMatCCSR(cache_expansion=True): coefficient planes precomputed at
    construction, applies match the per-apply-expansion path exactly."""
    from vexcl_tpu.utils.poisson import poisson_7pt_ccsr

    m = 8
    idx, row, col, val = poisson_7pt_ccsr(m, dtype=np.float64)
    n = m ** 3
    A = vex.SpMatCCSR(n, n, idx, row, col, val)
    B = vex.SpMatCCSR(n, n, idx, row, col, val, cache_expansion=True)
    assert B._cached_coeffs is not None

    hx = rng.random(n)
    x = vex.vector(data=hx, context=ctx)
    ya = vex.vector(n, dtype=np.float64, context=ctx)
    yb = vex.vector(n, dtype=np.float64, context=ctx)
    ya[:] = A * x
    yb[:] = 2.0 * (B * x) - (B * x)  # cached path, inside an expression
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya), rtol=1e-12)


def test_ccsr_auto_cache_expansion(ctx, monkeypatch):
    """r3: cache_expansion defaults to AUTO — expanded when the planes
    fit VEXTPU_CCSR_CACHE_MB, compressed (memory-bound fallback) when
    they don't; both bit-agree with the explicit forms."""
    from vexcl_tpu.utils.poisson import poisson_7pt, poisson_7pt_ccsr

    nd = 8
    idx, row, col, val = poisson_7pt_ccsr(nd, dtype=np.float32)
    n = nd ** 3
    hx = np.random.default_rng(9).random(n).astype(np.float32)

    A_auto = vex.SpMatCCSR(n, n, idx, row, col, val, context=ctx)
    assert A_auto._cached_coeffs is not None  # 7*512*2 B << budget

    monkeypatch.setenv("VEXTPU_CCSR_CACHE_MB", "0")
    A_small = vex.SpMatCCSR(n, n, idx, row, col, val, context=ctx)
    assert A_small._cached_coeffs is None     # budget exceeded: fallback

    x = vex.vector(data=hx, context=ctx)
    ya = vex.vector(n, dtype=np.float32, context=ctx)
    yb = vex.vector(n, dtype=np.float32, context=ctx)
    ya[:] = A_auto * x
    yb[:] = A_small * x
    ptr, ccol, cval = poisson_7pt(nd)
    ref = csr_matvec(ptr, ccol, cval, hx.astype(np.float64))
    np.testing.assert_allclose(np.asarray(ya), ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(yb), ref, rtol=1e-5)


def test_distributed_spmv_sellr_mode(ctx, rng, monkeypatch):
    """r4: SELL-R as the distributed local phase — per-shard uniform
    shuffle-route plans stacked under one shard_map, all-gathered x; no
    XLA gathers in the local compute (vs the ~0.14 Gelem/s take path)."""
    monkeypatch.setenv("VEXTPU_DSPMV_SELLR", "1")
    n = 1000  # not divisible by 8: pad rows must stay inert
    ptr, col, val = random_csr(rng, n, n, density=0.01)
    hx = rng.random(n)
    A = sparse.distributed(n, n, ptr, col, val, context=ctx)
    assert A.mode == "sellr"
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(n, dtype=np.float64, context=ctx)
    y[:] = A * x
    np.testing.assert_allclose(np.asarray(y), csr_matvec(ptr, col, val, hx),
                               rtol=1e-10)
    y[:] = 2.0 * (A * x) + 1.0
    np.testing.assert_allclose(
        np.asarray(y), 2.0 * csr_matvec(ptr, col, val, hx) + 1.0, rtol=1e-10)


def test_distributed_spmv_sellr_skewed(ctx, rng, monkeypatch):
    """Skewed row lengths: shards with very different overflow must still
    produce identical leaf structures (padded tails / src_rows)."""
    monkeypatch.setenv("VEXTPU_DSPMV_SELLR", "1")
    n = 512
    lens = np.where(np.arange(n) < 32, 200, 3)  # heavy rows in shard 0
    ptr = np.concatenate([[0], np.cumsum(lens)])
    col = rng.integers(0, n, ptr[-1])
    val = rng.standard_normal(ptr[-1])
    A = sparse.distributed(n, n, ptr, col, val, context=ctx)
    assert A.mode == "sellr"
    hx = rng.random(n)
    x = vex.vector(data=hx, context=ctx)
    y = vex.vector(n, dtype=np.float64, context=ctx)
    y[:] = A * x
    np.testing.assert_allclose(np.asarray(y), csr_matvec(ptr, col, val, hx),
                               rtol=1e-10)
