#!/usr/bin/env python
"""Hello world (reference: examples/simple/hello.cpp): list devices,
run one fused expression, print the result."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import vexcl_tpu as vex  # noqa: E402


def main():
    ctx = vex.Context(vex.Filter.Env)
    print(ctx)

    n = 1 << 16
    a = vex.vector(data=np.arange(n, dtype=np.float32))
    b = vex.vector(n, dtype=np.float32, fill=0.5)
    c = vex.vector(n, dtype=np.float32)
    c[:] = 2 * a + vex.sqrt(b)  # one fused kernel
    print(c)


if __name__ == "__main__":
    main()
