"""Test config: force an 8-virtual-device CPU platform.

The environment boots jax with a remote TPU platform (axon) whose *eager*
dispatch round-trips a network tunnel — tests must run on host CPU. The env
var JAX_PLATFORMS is pre-set to "axon" by sitecustomize, so we override via
jax.config *before any backend is initialized*. Multi-chip sharding tests run
on the 8 virtual CPU devices (the driver separately dry-runs the real
multi-chip path via __graft_entry__.dryrun_multichip).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running integration test")
