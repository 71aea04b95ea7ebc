"""Randomized view / multivector sweep (CPU, 8-dev mesh).

Fuzzes the vector_view layer — slicer with random (start, stop, stride)
per axis, permutation with random index vectors, reshape, reduce_view —
and multivector fused assignments, against numpy oracles.  Run ad hoc:
python exp/fuzz_views.py [seed]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np

import vexcl_tpu as vex


def rand_slice(rng, d):
    start = int(rng.integers(0, d))
    stop = int(rng.integers(start + 1, d + 1))
    step = int(rng.integers(1, 4))
    return slice(start, stop, step)


def check_slicer(rng, dims):
    n = int(np.prod(dims))
    ha = rng.normal(size=n).astype(np.float32)
    a = vex.vector(data=ha)
    s = vex.slicer(dims)
    key = tuple(
        rand_slice(rng, d) if rng.random() < 0.7 else int(rng.integers(0, d))
        for d in dims
    )
    view = s[key](a)
    ref = ha.reshape(dims)[key]
    m = int(np.prod(ref.shape)) if ref.ndim else 1
    if m == 0:
        return
    out = vex.vector(m, dtype=np.float32)
    out[:] = view * 2.0 + 1.0
    got = out.to_numpy()
    assert np.allclose(got, (ref * 2.0 + 1.0).ravel(), rtol=1e-6), (dims, key)

    # assignable view: write a constant through the same slice
    b = vex.vector(data=ha.copy())
    s[key](b).assign(7.0)
    refw = ha.copy().reshape(dims)
    refw[key] = 7.0
    assert np.allclose(b.to_numpy(), refw.ravel()), ("write", dims, key)


def check_permutation(rng, n):
    ha = rng.normal(size=n).astype(np.float32)
    idx = rng.permutation(n).astype(np.int32)
    a = vex.vector(data=ha)
    iv = vex.vector(data=idx)
    out = vex.vector(n, dtype=np.float32)
    out[:] = vex.permutation(iv)(a)
    assert np.allclose(out.to_numpy(), ha[idx]), ("perm", n)
    # reversed via index expression
    out[:] = vex.permutation(np.float64(n - 1) - vex.element_index(0, n))(a)
    assert np.allclose(out.to_numpy(), ha[::-1]), ("perm-expr", n)


def check_multivector(rng, n, m):
    has = [rng.normal(size=n).astype(np.float32) for _ in range(m)]
    x = vex.multivector(data=np.stack(has))
    y = vex.multivector(n, m, dtype=np.float32)
    y[:] = x * 2.0 - 1.0
    for c, h in zip(y.components, has):
        assert np.allclose(np.asarray(c), h * 2.0 - 1.0, rtol=1e-6)


def main(seed=0):
    rng = np.random.default_rng(seed)
    ctx = vex.Context(vex.Filter.Count(8))
    print(ctx.size, "devices")
    shapes = [(64,), (40,), (8, 16), (16, 8), (7, 9), (4, 6, 8), (3, 5, 7)]
    for rep in range(3):
        for dims in shapes:
            check_slicer(rng, dims)
        for n in (64, 1000, 1003):
            check_permutation(rng, n)
        for n, m in ((256, 2), (1000, 3), (1003, 4)):
            check_multivector(rng, n, m)
        print(f"rep {rep}: ok")
    print("view/multivector fuzz passed")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
