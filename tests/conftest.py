"""Test harness: CPU backend with 8 virtual devices, float64 enabled.

Must set the environment before the first ``import jax`` anywhere in the test
process (SURVEY.md §4: multi-host tests runnable on CPU via
``xla_force_host_platform_device_count``).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The TPU-tunnel sitecustomize force-registers its backend and sets
# jax_platforms itself, so the env var alone is not enough.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (long traverses, big equality sweeps)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test, skipped unless --runslow is given "
        "(keeps the default `pytest tests/` lane under ~10 min)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow — run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
