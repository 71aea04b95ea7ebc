"""SELL-R shuffle-routed irregular SpMV (sparse/shuffle.py) — the TPU-first
replacement for the reference's hybrid-ELL kernel
(vexcl/spmat/hybrid_ell.inl:1-403)."""

import numpy as np
import pytest

import vexcl_tpu as vex
from vexcl_tpu.sparse.shuffle import SELLR
from vexcl_tpu.sparse.shuffle_plan import (apply_plan_numpy, pick_R,
                                           plan_route)


def random_csr(n, m, mean_len, seed=0, hot_col=None):
    r = np.random.default_rng(seed)
    lens = np.maximum(1, r.poisson(mean_len, n))
    ptr = np.concatenate([[0], np.cumsum(lens)])
    col = r.integers(0, m, int(ptr[-1]))
    if hot_col is not None:
        col[r.random(len(col)) < 0.3] = hot_col
    val = r.standard_normal(int(ptr[-1]))
    return ptr, col, val


def csr_matvec_ref(n, ptr, col, val, x):
    y = np.zeros(n, dtype=np.result_type(val, x))
    for i in range(n):
        s, e = ptr[i], ptr[i + 1]
        y[i] = (val[s:e] * x[col[s:e]]).sum()
    return y


@pytest.mark.parametrize("R", [1, 8, 32, 128, 1024, 2048])
def test_plan_route_random_perm(R, rng):
    M = R * 128
    perm = rng.permutation(M)
    ops = plan_route(perm, R)
    x = rng.standard_normal(M)
    got = apply_plan_numpy(x, ops)
    exp = np.empty(M)
    exp[perm] = x
    np.testing.assert_array_equal(got, exp)


def test_pick_R_covers_sizes():
    from vexcl_tpu.sparse.shuffle_plan import _BOTTOMS

    for M, expect in ((1, 1), (128, 1), (1024, 8), (4096, 32),
                      (1 << 20, 8192), ((1 << 20) + 1, 16384),
                      ((1 << 24) + 1, 16384 * 16)):
        assert pick_R(M) * 128 >= M
        assert pick_R(M) == expect
    # every reachable recursion bottom must be in the cheap set
    for M in (1, 100, 10**3, 10**4, 10**5, 10**6, 3 * 10**6, 10**7,
              3 * 10**7, 10**8, 2 * 10**8, 10**9):
        R = pick_R(M)
        assert R * 128 >= M
        b = R
        while b > 128:
            assert b % 128 == 0
            b //= 128
        assert b in _BOTTOMS or b == 1


@pytest.mark.parametrize("R", [16, 24, 32, 2048, 3072, 4096])
def test_plan_route_subk_bottoms(R, rng):
    """Sizes whose recursion bottoms at K in {16,24,32} use the one-pass
    subk op (not the 128/K-padded t128)."""
    M = R * 128
    perm = rng.permutation(M)
    ops = plan_route(perm, R)
    kinds = [op[0] for op in ops]
    assert "subk" in kinds and "t128" not in kinds
    x = rng.standard_normal(M)
    got = apply_plan_numpy(x, ops)
    exp = np.empty(M)
    exp[perm] = x
    np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("R", [16, 32, 2048, 3072])
def test_subk_pallas_matches_numpy(R, rng):
    """The fused subk/lslk Pallas executors reproduce the numpy oracle."""
    from vexcl_tpu.sparse.shuffle import _apply_route, fuse_stages

    M = R * 128
    perm = rng.permutation(M)
    ops = plan_route(perm, R)
    fused = fuse_stages(ops)
    if R >= 2048:
        assert "lslk" in [op[0] for op in fused]
    x = rng.standard_normal(M).astype(np.float32)
    exp = np.empty(M, dtype=np.float32)
    exp[perm] = x
    got = np.asarray(
        _apply_route(np.reshape(x, (-1, 128)), fused, interpret=True)
    ).reshape(-1)
    np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("shape", [(128, 128, 3), (1000, 1000, 8),
                                   (4096, 4096, 16), (513, 2049, 5)])
def test_sellr_matvec_matches_reference(shape, rng):
    n, m, mean = shape
    ptr, col, val = random_csr(n, m, mean, seed=n + mean)
    A = SELLR(n, m, ptr, col, val)
    x = rng.standard_normal(m)
    y = np.asarray(A.apply(x))
    ref = csr_matvec_ref(n, ptr, col, val, x)
    np.testing.assert_allclose(y, ref, rtol=1e-12, atol=1e-12)


def test_sellr_hot_column_dense_plane(rng):
    """A column referenced by 30% of all entries becomes a dense
    rank-k plane (y += W @ x[hot]) and the product stays exact."""
    n = m = 1000
    ptr, col, val = random_csr(n, m, 8, seed=7, hot_col=7)
    A = SELLR(n, m, ptr, col, val)
    assert A._hot_W is not None and A._hot_W.shape[1] == 1
    x = rng.standard_normal(m)
    np.testing.assert_allclose(np.asarray(A.apply(x)),
                               csr_matvec_ref(n, ptr, col, val, x),
                               rtol=1e-12, atol=1e-12)


def test_sellr_width_classes_cover_rows(rng):
    """Multi-class SELLR: classes partition all n rows, slots fit the
    route grid, and per-class widths bound the padded row lengths."""
    n, m = 3000, 3000
    ptr, col, val = random_csr(n, m, 10, seed=42)
    A = SELLR(n, m, ptr, col, val)
    assert A.width == 0  # multi-class sentinel
    total = sum(nk for _, nk, _, _ in A._classes)
    assert total == n
    offs = [off for off, _, _, _ in A._classes]
    assert offs == sorted(offs)
    last_off, last_nk, last_nkp, last_wk = A._classes[-1]
    # nkp == 0: exact row-major plane; else transposed 128-padded plane
    assert last_nkp == 0 or (last_nkp >= last_nk and last_nkp % 128 == 0)
    assert (last_off + (last_nkp or last_nk) * last_wk
            <= A._dst_rows * 128)


def test_sellr_balanced_source_layout(rng):
    """The balanced x layout (capacity-packed bins + pre-route) engages
    when it shrinks the route grid and reproduces the exact product."""
    n = m = 1000
    ptr, col, val = random_csr(n, m, 8, seed=1008)
    A = SELLR(n, m, ptr, col, val)
    assert A._x_kinds is not None  # balance adopted at this shape
    x = rng.standard_normal(m)
    np.testing.assert_allclose(np.asarray(A.apply(x)),
                               csr_matvec_ref(n, ptr, col, val, x),
                               rtol=1e-12, atol=1e-12)


def test_sellr_duplicated_hot_elements(rng, monkeypatch):
    """Elements hotter than half a bucket split into duplicate copies
    fetched by a small static gather before the pre-route."""
    monkeypatch.setenv("VEXTPU_SELLR_HOT_COL", str(1 << 30))
    n = m = 2000
    ptr, col, val = random_csr(n, m, 8, seed=17, hot_col=3)
    A = SELLR(n, m, ptr, col, val)
    assert A._dup_idx is not None and A._dup_idx.shape[0] > 0
    x = rng.standard_normal(m)
    np.testing.assert_allclose(np.asarray(A.apply(x)),
                               csr_matvec_ref(n, ptr, col, val, x),
                               rtol=1e-12, atol=1e-12)


def test_sellr_lane_skew_spills_to_tail(rng, monkeypatch):
    """With the hot plane disabled, a column referenced by 30% of all
    entries concentrates one (tile, lane) bucket; the per-(tile, lane)
    cap must spill the excess to the CSR tail and stay exact."""
    monkeypatch.setenv("VEXTPU_SELLR_HOT_COL", str(1 << 30))
    n = m = 1000
    ptr, col, val = random_csr(n, m, 8, seed=7, hot_col=7)
    A = SELLR(n, m, ptr, col, val)
    assert A._hot_W is None
    assert A.tail is not None and A.tail.nnz > 0
    x = rng.standard_normal(m)
    np.testing.assert_allclose(np.asarray(A.apply(x)),
                               csr_matvec_ref(n, ptr, col, val, x),
                               rtol=1e-12, atol=1e-12)


def test_sellr_through_spmat_expression(ctx, rng):
    """fmt='sellr' through the SpMat expression terminal, fused with
    surrounding arithmetic."""
    n = m = 512
    ptr, col, val = random_csr(n, m, 6, seed=3)
    A = vex.SpMat(n, m, ptr, col, val, fmt="sellr", context=ctx)
    hx = rng.standard_normal(m)
    hz = rng.standard_normal(n)
    x = vex.vector(data=hx, context=ctx)
    z = vex.vector(data=hz, context=ctx)
    y = vex.vector(n, dtype=np.float64, context=ctx)
    y[:] = 2.0 * (A * x) + z
    ref = 2.0 * csr_matvec_ref(n, ptr, col, val, hx) + hz
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-12, atol=1e-12)


def test_sellr_f32(rng):
    n = m = 777
    ptr, col, val = random_csr(n, m, 9, seed=11)
    val = val.astype(np.float32)
    A = SELLR(n, m, ptr, col, val)
    assert A.dtype == np.float32
    x = rng.standard_normal(m).astype(np.float32)
    np.testing.assert_allclose(np.asarray(A.apply(x)),
                               csr_matvec_ref(n, ptr, col, val, x),
                               rtol=2e-5, atol=2e-5)


def test_sellr_kernel_cache_no_cross_matrix_reuse(ctx, rng):
    """Two same-shaped SELLR matrices carry different plans; the kernel
    cache must key on the plan structure, not just shapes."""
    n = m = 512
    ptr1, col1, val1 = random_csr(n, m, 6, seed=21)
    ptr2, col2, val2 = random_csr(n, m, 6, seed=22)
    A1 = vex.SpMat(n, m, ptr1, col1, val1, fmt="sellr", context=ctx)
    A2 = vex.SpMat(n, m, ptr2, col2, val2, fmt="sellr", context=ctx)
    hx = rng.standard_normal(m)
    x = vex.vector(data=hx, context=ctx)
    y1 = vex.vector(n, dtype=np.float64, context=ctx)
    y2 = vex.vector(n, dtype=np.float64, context=ctx)
    y1[:] = A1 * x
    y2[:] = A2 * x
    np.testing.assert_allclose(np.asarray(y1),
                               csr_matvec_ref(n, ptr1, col1, val1, hx),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(y2),
                               csr_matvec_ref(n, ptr2, col2, val2, hx),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("R", [8, 1024, 2048, 16384])
def test_fused_stages_match_plan(R, rng):
    """fuse_stages peephole ([lane,t]->lane_t, [tinv,lane]->tinv_lane,
    [lane,sub,lane]->lsl) must execute to the identical permutation."""
    from vexcl_tpu.sparse.shuffle import _apply_route, fuse_stages

    M = R * 128
    perm = rng.permutation(M)
    ops = plan_route(perm, R)
    fused = fuse_stages(ops)
    kinds = [op[0] for op in fused]
    if R >= 1024:
        # the big-route shapes must actually exercise every fused kind
        assert "lane_t" in kinds and "tinv_lane" in kinds
        assert all(k not in kinds for k in ("t", "tinv"))
    x = rng.standard_normal(M).astype(np.float32)
    exp = np.empty(M, dtype=np.float32)
    exp[perm] = x
    got = np.asarray(
        _apply_route(np.reshape(x, (-1, 128)), fused, interpret=True)
    ).reshape(-1)
    np.testing.assert_array_equal(got, exp)


def test_free_lanes_plan(rng):
    """plan_route_free_lanes: placing each element at its returned lane
    and running the (A-less) ops reproduces the permutation."""
    from vexcl_tpu.sparse.shuffle_plan import plan_route_free_lanes
    from vexcl_tpu.sparse.shuffle import _apply_route, fuse_stages

    R = 1024
    M = R * 128
    perm = rng.permutation(M)
    lanes, ops = plan_route_free_lanes(perm, R)
    x = rng.standard_normal(M).astype(np.float32)
    placed = np.empty((R, 128), dtype=np.float32)
    placed[np.arange(M) // 128, lanes] = x
    got = np.asarray(
        _apply_route(placed, fuse_stages(ops), interpret=True)
    ).reshape(-1)
    exp = np.empty(M, dtype=np.float32)
    exp[perm] = x
    np.testing.assert_array_equal(got, exp)
