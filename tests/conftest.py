"""Test harness configuration.

Tests run on CPU with 8 virtual devices so GSPMD sharding is exercised
without TPU hardware (SURVEY.md §4's rebuild test strategy).

Note: this container's sitecustomize imports jax at interpreter startup
(axon PJRT plugin), so JAX_PLATFORMS env vars set here are too late —
we override via jax.config before any backend is initialized instead.
"""

import os

# Must precede backend initialization; jax is already imported by
# sitecustomize but no backend exists yet at conftest time.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (minute-scale kernel/trainer tests)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: minute-scale test, skipped unless --runslow or UNFLOW_SLOW=1"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("UNFLOW_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow; use --runslow or UNFLOW_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
