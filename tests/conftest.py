"""Test fixture: fake multi-device context on CPU.

Analog of tests/context_setup.hpp in the reference: the suite must exercise
all multi-device paths (partitioning, ghost/halo exchange, cross-shard
merges) without real multi-chip hardware.  The reference duplicates a queue
on one physical device (context_setup.hpp:24-38); here we ask XLA for 8
virtual CPU devices, which gives a genuine 8-way mesh for sharding tests.
"""

import os

# Must run before jax initializes.  Force CPU: the ambient environment may
# preset JAX_PLATFORMS=axon (the real TPU), but the suite needs the 8-device
# virtual mesh.  Run bench.py / examples for real-TPU coverage.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("VEXTPU_CACHE_DIR", "")  # no disk cache in tests

import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU backend in every
# process and wins over the env var — force the platform at config level.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import vexcl_tpu as vex  # noqa: E402

SEED = int(os.environ.get("VEXTPU_TEST_SEED", "42"))


@pytest.fixture(scope="session")
def ctx():
    """Multi-device context over all 8 virtual CPU devices."""
    return vex.Context(vex.Filter.Env, set_current=True)


@pytest.fixture(scope="session")
def ctx1():
    """Single-device context."""
    return vex.Context(vex.Filter.Position(0), set_current=False)


@pytest.fixture()
def rng():
    return np.random.default_rng(SEED)


def check_sample(vec, oracle, nsamples=32, rtol=1e-8, atol=1e-10, rng=None):
    """Random-sampling oracle check (tests/context_setup.hpp:53-81)."""
    rng = rng or np.random.default_rng(SEED)
    data = np.asarray(vec)
    n = len(data)
    idx = rng.integers(0, n, size=min(nsamples, n))
    for i in idx:
        expected = oracle(int(i))
        np.testing.assert_allclose(data[i], expected, rtol=rtol, atol=atol)
