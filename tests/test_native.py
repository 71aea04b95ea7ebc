"""Native C++ helper library (native/vexcl_native.cpp via ctypes)."""

import numpy as np
import pytest

from vexcl_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_csr_to_ell(lib):
    ptr = np.array([0, 2, 3, 6], dtype=np.int64)
    col = np.array([0, 2, 1, 0, 1, 2], dtype=np.int32)
    val = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    ecol, eval_ = native.csr_to_ell(3, ptr, col, val, 3)
    assert ecol[0, 0] == 0 and ecol[0, 1] == 2 and ecol[0, 2] == -1
    assert eval_[2, 2] == 6.0
    # f32 variant
    ecol32, eval32 = native.csr_to_ell(3, ptr, col, val.astype(np.float32), 2)
    assert eval32.dtype == np.float32
    assert eval32[2, 1] == 5.0  # truncated at width 2


def test_kway_merge(lib, rng):
    runs = [np.sort(rng.random(32)) for _ in range(5)]
    keys = np.concatenate(runs)
    offsets = np.arange(6) * 32
    okeys, ovals = native.kway_merge(offsets, keys)
    np.testing.assert_allclose(okeys, np.sort(keys))
    # payload indices give a valid permutation
    np.testing.assert_allclose(keys[ovals], okeys)


def test_philox_host_matches_device(lib):
    import jax.numpy as jnp

    from vexcl_tpu.ops.random import philox4x32

    host = native.philox_host(16, 99)
    idx = jnp.arange(16, dtype=jnp.uint32)
    z = jnp.zeros_like(idx)
    dev = philox4x32(idx, z, z, z, 99, 0)
    dev = np.stack([np.asarray(d) for d in dev], axis=1)
    np.testing.assert_array_equal(host, dev)


def test_scatter_add_native_and_fallback():
    from vexcl_tpu.utils.native import scatter_add

    rng = np.random.default_rng(3)
    idx = rng.integers(0, 64, 1000)
    val = rng.random(1000)
    out = np.zeros(64)
    scatter_add(out, idx, val)
    expect = np.zeros(64)
    np.add.at(expect, idx, val)
    np.testing.assert_allclose(out, expect, rtol=1e-12)
    # complex path
    cval = val + 1j * val[::-1]
    cout = np.zeros(64, np.complex128)
    scatter_add(cout, idx, cval)
    cexpect = np.zeros(64, np.complex128)
    np.add.at(cexpect, idx, cval)
    np.testing.assert_allclose(cout, cexpect, rtol=1e-12)
