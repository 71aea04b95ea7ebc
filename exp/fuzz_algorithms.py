"""Randomized edge-case sweep over the algorithm layer (CPU, 8-dev mesh).

Hammers sort / sort_by_key / scan / scan_by_key / reduce_by_key / fft with
random sizes (incl. odd, prime, tiny), dtypes, and adversarial key
distributions (all-equal, all-distinct, long runs, alternating), comparing
against numpy oracles.  Not part of the pytest suite (slow-ish, random);
run ad hoc:  python exp/fuzz_algorithms.py [seed]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np

import vexcl_tpu as vex

SIZES = [1, 2, 3, 7, 17, 127, 128, 129, 1000, 1003, 4096, 9973, 65536]


def keys_for(rng, n, mode, dtype=np.int32):
    if mode == "equal":
        return np.full(n, 7, dtype)
    if mode == "distinct":
        return rng.permutation(n).astype(dtype)
    if mode == "runs":
        run = max(1, n // max(1, rng.integers(1, 64)))
        return (np.arange(n) // run).astype(dtype)
    if mode == "alt":
        return (np.arange(n) % 2).astype(dtype)
    return rng.integers(0, max(2, n // 4), n).astype(dtype)


def check_sort(rng, n, mode):
    k = keys_for(rng, n, mode)
    v = rng.random(n).astype(np.float32)
    kv = vex.vector(data=k)
    vex.sort(kv)                      # in-place, reference semantics
    assert np.array_equal(kv.to_numpy(), np.sort(k)), (n, mode, "sort")
    kv, vv = vex.vector(data=k), vex.vector(data=v)
    vex.sort_by_key(kv, vv)
    idx = np.argsort(k, kind="stable")
    assert np.array_equal(kv.to_numpy(), k[idx]), (n, mode, "sbk keys")
    assert np.allclose(vv.to_numpy(), v[idx]), (n, mode, "sbk vals")


def check_scan(rng, n):
    v = rng.random(n).astype(np.float32)
    got = vex.inclusive_scan(vex.vector(data=v)).to_numpy()
    assert np.allclose(got, np.cumsum(v), rtol=2e-5, atol=1e-4), (n, "scan")
    got = vex.exclusive_scan(vex.vector(data=v)).to_numpy()
    ref = np.concatenate([[0], np.cumsum(v)[:-1]]).astype(np.float32)
    assert np.allclose(got, ref, rtol=2e-5, atol=1e-4), (n, "exscan")


def _seg_oracle(k, v, op):
    out = np.empty_like(v)
    acc = v[0]
    out[0] = acc
    for i in range(1, len(v)):
        acc = v[i] if k[i] != k[i - 1] else op(acc, v[i])
        out[i] = acc
    return out


def check_scan_by_key(rng, n, mode):
    k = keys_for(rng, n, mode)
    ksort = np.sort(k)  # scan_by_key contract: contiguous segments
    v = rng.random(n).astype(np.float32)
    got = vex.inclusive_scan_by_key(
        vex.vector(data=ksort), vex.vector(data=v)).to_numpy()
    ref = _seg_oracle(ksort, v, np.add)
    assert np.allclose(got, ref, rtol=2e-5, atol=1e-4), (n, mode, "segscan")


def check_reduce_by_key(rng, n, mode):
    k = np.sort(keys_for(rng, n, mode))
    v = rng.random(n).astype(np.float32)
    ko, vo, cnt = vex.reduce_by_key(
        vex.vector(data=k), vex.vector(data=v))
    ko, vo = ko.to_numpy(), vo.to_numpy()
    uk, start = np.unique(k, return_index=True)
    ref = np.add.reduceat(v, start)
    assert cnt == len(uk), (n, mode, "rbk count")
    assert np.array_equal(ko[:cnt], uk), (n, mode, "rbk keys")
    vo = vo[:cnt]
    assert np.allclose(vo, ref, rtol=2e-5, atol=1e-3), (n, mode, "rbk vals")


def check_fft(rng, n):
    x = (rng.random(n) + 1j * rng.random(n)).astype(np.complex64)
    out = vex.vector(n, dtype=np.complex64)
    out[:] = vex.fft(vex.vector(data=x))
    got = out.to_numpy()
    ref = np.fft.fft(x.astype(np.complex128))
    err = np.abs(got - ref).max() / max(1e-30, np.abs(ref).max())
    assert err < 5e-6, (n, "fft", err)


def main(seed=0):
    rng = np.random.default_rng(seed)
    ctx = vex.Context(vex.Filter.Count(8))
    print(ctx)
    modes = ["equal", "distinct", "runs", "alt", "rand"]
    for n in SIZES:
        for mode in modes[: 2 if n <= 3 else 5]:
            check_sort(rng, n, mode)
            check_scan_by_key(rng, n, mode)
            check_reduce_by_key(rng, n, mode)
        check_scan(rng, n)
        check_fft(rng, n)
        print(f"n={n}: ok")
    print("fuzz sweep passed")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
