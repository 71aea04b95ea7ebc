#!/usr/bin/env python
"""Third-party sort interop (reference: examples/thrust-sort.cpp).

The reference hands a vex::vector's raw device pointers to Thrust and
A/Bs thrust::sort against vex::sort.  The TPU analog: exchange the
container with torch (CPU in this environment) through the interop
layer, sort there, bring the result back, and verify + time both sides
with the vex profiler.  The on-device path stays vex.sort (XLA's sort
network); the exchange demonstrates the raw-buffer interop surface.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import vexcl_tpu as vex  # noqa: E402
from vexcl_tpu import interop  # noqa: E402


def check(x, who):
    h = np.asarray(x)
    if not np.all(h[:-1] <= h[1:]):
        print(f"{who} has failed to sort a vector")
        return False
    return True


def main():
    ctx = vex.Context(vex.Filter.Env & vex.Filter.Count(1))
    print(ctx)

    prof = vex.profiler(ctx)

    n = 1 << 22
    x = vex.vector(n, dtype=np.int32)
    x[:] = vex.cast(np.int32, vex.Random()(vex.element_index(), 42) * (1 << 30))
    x0 = np.asarray(x)  # keep the unsorted input for the second run

    # --- vex.sort on device -------------------------------------------------
    warm = vex.vector(data=x0)
    vex.sort(warm)  # compile outside the timed region (kernel cache warm)
    prof.tic_cl("vex.sort")
    vex.sort(x)
    prof.toc("vex.sort")
    ok = check(x, "vex.sort")

    # --- third-party sort through the interop layer -------------------------
    try:
        import torch
    except Exception:  # pragma: no cover - torch is baked into this image
        print("torch not available; skipping third-party leg")
        torch = None

    if torch is not None:
        y = vex.vector(data=x0)
        prof.tic_cl("torch.sort (incl. exchange)")
        t = interop.to_torch(y)          # device -> host torch tensor
        t, _ = torch.sort(t)
        y = interop.from_torch(t)        # back onto the device
        prof.toc("torch.sort (incl. exchange)")
        ok = check(y, "torch.sort") and ok
        same = np.array_equal(np.asarray(x), np.asarray(y))
        print(f"results identical: {same}")
        ok = ok and same

    print(prof)
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
