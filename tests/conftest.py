"""Test harness config: run everything on a virtual 8-device CPU mesh so
sharding paths are exercised without TPU hardware."""
import os

# The session environment pins JAX_PLATFORMS=axon (remote TPU tunnel) via a
# sitecustomize hook that already imported jax; force the local CPU backend
# with 8 virtual devices both ways (env for fresh processes, config for this
# already-imported one).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long end-to-end pipeline runs")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
