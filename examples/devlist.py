#!/usr/bin/env python
"""Device enumeration demo (examples/devlist.cpp analog)."""
import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import vexcl_tpu as vex

print("All devices:")
print(vex.Context(vex.Filter.All, set_current=False))
print("\nFiltered (Env):")
print(vex.Context(vex.Filter.Env, set_current=False))
