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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The full suite compiles hundreds of XLA:CPU executables; with them all
    held live, XLA's compile path aborted the process (SIGABRT inside
    backend_compile_and_load) partway through the run — reproduced in rounds
    2 and 3, while every module passes in isolation. Dropping the live
    executable caches between modules keeps the cumulative footprint flat.
    Costs re-compiles of shared ops per module (~10% wall) and fixes the
    advertised CI signal (VERDICT r2 task 2)."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
