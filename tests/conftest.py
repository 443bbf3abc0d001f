"""Test configuration: force CPU with 8 virtual devices and float64.

Accuracy-parity tests vs the Julia reference require f64; multi-device tests
use the host-platform device-count flag (no TPU pod needed). Must run before
jax initializes a backend.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import pytest

# This sandbox preimports jax with JAX_PLATFORMS=axon (remote TPU tunnel);
# the env vars above are therefore too late — switch the platform explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: DISABLED for the test suite. Five full-suite
# runs on this box died with SIGSEGV inside
# `backend.deserialize_executable` when a long pytest process loaded a
# persisted XLA:CPU executable ~150 tests in — regardless of whether the
# entry was written by this process, a previous run, with or without the
# interpret-pallas bypass; the same entries deserialize fine from fresh
# short-lived processes (every crash-site file passes in isolation). The
# jax 0.9.0 XLA:CPU AOT deserialization path is simply not safe in
# long-lived processes on this platform, so the suite pays cold compiles
# (deterministic, crash-free). The TPU tools keep the cache — the axon
# backend's deserialization has been reliable across hundreds of loads.
jax.config.update("jax_enable_compilation_cache", False)


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run @pytest.mark.slow tests (flagship-scale live integrations)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: flagship-scale live re-integration (minutes of CPU); "
        "excluded from the default tier, run with --runslow",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)

