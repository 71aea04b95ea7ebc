"""Exclusive device access (examples/exclusive.cpp analog).

The reference's Filter::Exclusive locks devices with a file lock so
concurrent processes pick distinct GPUs (vexcl/backend/opencl/filter.hpp
Exclusive/file-lock :214-330).  vexcl_tpu's Filter.Exclusive does the
same with an fcntl lock under VEXTPU_LOCK_DIR.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import vexcl_tpu as vex

ctx = vex.Context(vex.Filter.Exclusive(vex.Filter.Env))
if ctx.size:
    print("Locked devices:")
    print(ctx)
else:
    print("No available devices found.")
