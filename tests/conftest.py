"""Test configuration: force an 8-virtual-device CPU platform.

Tests must run without TPU hardware; multi-chip sharding tests use the
virtual CPU mesh (the TPU-native answer to testing multi-node without a
cluster — see SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

# Persistent XLA compilation cache: most of the tier's time is CPU *compiles*
# of jitted train steps (e.g. test_dense_path_step 78 s cold vs 54 s warm).
# Keyed by HLO hash, so stale entries can't go wrong — safe across code edits.
# Opt out with JAX_TEST_CACHE=0.
if os.environ.get("JAX_TEST_CACHE", "1") != "0":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The env var alone is not enough under the axon harness (it re-registers the
# TPU plugin); the config update reliably pins the CPU platform.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (long loops, subprocess CLI runs)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running tier (run with --runslow or RUN_SLOW=1)"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or \
            os.environ.get("RUN_SLOW", "") not in ("", "0"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow (or RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
