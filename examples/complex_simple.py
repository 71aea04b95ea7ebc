#!/usr/bin/env python
"""Complex multiply / divide on device vectors
(reference: examples/complex_simple.cpp:10-60).

The reference defines cmul/cdiv as hand-written float2 user functions
because its codegen has no complex type.  Here complex64 is a native
dtype of the expression engine: ``x * y`` and ``x / y`` ARE complex
multiplication and division, and the user-function route still exists
for parity (a @vex.function over complex operands fuses like any other).

On the axon TPU platform complex arrays cross the host boundary as
(real, imag) planes (vector.py shims); inside the compiled kernel they
are native complex64.
"""
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import vexcl_tpu as vex  # noqa: E402


@vex.function
def cmul(a, b):
    # the reference's VEX_FUNCTION(cmul) written against native complex
    return a * b


def main():
    # the reference filters for DoublePrecision because its cdiv needs f64;
    # complex64 arithmetic needs no f64 support, so any device will do
    ctx = vex.Context(vex.Filter.Env)
    print(ctx)

    n = 16
    i = np.arange(n)
    x = (i + 1j * (n - i)).astype(np.complex64)
    y = ((n - i) + 1j * i).astype(np.complex64)

    X = vex.vector(data=x)
    Y = vex.vector(data=y)
    T = vex.vector(n, dtype=np.complex64)

    T[:] = cmul(X, Y)           # user-function route (reference parity)
    tt = T.to_numpy()
    for k in range(n):
        print(f"X * Y = {x[k]} * {y[k]} = {tt[k]}")
    assert np.allclose(tt, x * y, rtol=1e-5)

    T[:] = X / Y                # native operator route
    tt = T.to_numpy()
    for k in range(n):
        print(f"X / Y = {x[k]} / {y[k]} = {tt[k]}")
    assert np.allclose(tt, x / y, rtol=1e-5)

    print("ok")


if __name__ == "__main__":
    main()
