"""Test configuration.

Forces an 8-virtual-device CPU platform before jax initialises, so sharding
and collective tests run on any machine (the multi-chip dry-run validation
path; see SURVEY.md §4: XLA_FLAGS=--xla_force_host_platform_device_count=N).
"""

import os
import sys

# Neutralise any remote-TPU plugin environment so tests always run on local
# CPU devices (the plugin would otherwise tunnel every jit compile off-box).
# The plugin registers from sitecustomize at interpreter start, so if its
# trigger variable is present we must re-exec with a clean environment.
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
