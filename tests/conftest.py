"""Test configuration: run all tests on CPU with 8 virtual devices.

The standard JAX fake-mesh trick (SURVEY.md §4): multi-chip sharding logic is
validated on a host-platform mesh; the real TPU chip is exercised by
``bench.py`` / ``__graft_entry__.py`` outside the test suite.
Must run before the first ``import jax`` anywhere in the test process.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The driver env preselects the TPU platform via sitecustomize (which also
# rewrites JAX_PLATFORMS), so the env-var route is not enough — override the
# already-imported config before any backend initialises.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
