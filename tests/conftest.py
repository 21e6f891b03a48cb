"""Test harness configuration.

Tests run on CPU with 8 virtual devices so GSPMD sharding is exercised
without TPU hardware (SURVEY.md §4's rebuild test strategy).

Note: this container's sitecustomize imports jax at interpreter startup
(axon PJRT plugin), so JAX_PLATFORMS env vars set here are too late —
we override via jax.config before any backend is initialized instead.
"""

import os
from pathlib import Path

# Must precede backend initialization; jax is already imported by
# sitecustomize but no backend exists yet at conftest time.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# The XLA:CPU AOT loader logs a scary-but-benign machine-feature E-line
# for every compilation-cache hit (its compile-time pseudo-features like
# +prefer-no-scatter never appear in host detection). Silence C++ logs.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache (repo-local, gitignored). This is the
# single biggest suite-time lever on this 1-core host: full train-step
# compiles take 30-90s each, many tests lower byte-identical programs
# (cache hits ~0.1s), and repeat runs skip nearly all compilation.
_cache_dir = Path(__file__).resolve().parent.parent / ".cache" / "jax"
_cache_dir.mkdir(parents=True, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
# Subprocess tests (CLI crash/resume, 2-process pods, cli.infer) inherit
# the cache through the env (jax config reads these at import).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_cache_dir))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_report_header(config):
    # Suite time is dominated by XLA compiles on a cold cache (30-90s
    # each); say which run this is so timing numbers are comparable.
    entries = sum(1 for _ in _cache_dir.glob("*")) if _cache_dir.exists() else 0
    state = f"warm ({entries} entries)" if entries else "COLD (first run pays all compiles)"
    return f"xla persistent compile cache: {state} at {_cache_dir}"


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (minute-scale kernel/trainer tests)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: minute-scale test, skipped unless --runslow or UNFLOW_SLOW=1"
    )


@pytest.hookimpl(trylast=True)
def pytest_collection_modifyitems(config, items):
    if not config.getoption("--runslow") and os.environ.get("UNFLOW_SLOW") != "1":
        skip = pytest.mark.skip(reason="slow; use --runslow or UNFLOW_SLOW=1")
        for item in items:
            if "slow" in item.keywords:
                item.add_marker(skip)

    # The on-chip MXU parity run is ~5 min of mostly-idle waiting on the
    # tunneled remote-compile service. Overlap it with the CPU tests:
    # pre-launch the child now and push the joining test to the end of
    # the run. trylast: run after the core's -k/-m deselection so a
    # filtered-out parity test never touches the chip.
    parity = [i for i in items
              if i.name == "test_mxu_correlation_parity_on_tpu"]
    if parity and not config.option.collectonly:
        from tests.test_ops_correlation_tpu import start_parity_child

        config._mxu_parity_child = start_parity_child()
        for item in parity:
            items.remove(item)
            items.append(item)


def pytest_unconfigure(config):
    # If the run aborted before the joining test consumed the child
    # (crash, Ctrl-C, --exitfirst on an earlier failure), don't leak a
    # chip-holding orphan.
    proc = getattr(config, "_mxu_parity_child", None)
    if proc is not None and proc.poll() is None:
        proc.kill()
        proc.communicate()


@pytest.fixture
def rng():
    return np.random.RandomState(0)
