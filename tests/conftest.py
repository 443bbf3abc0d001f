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
# Cache compilations across pytest runs. Persist only non-trivial compiles:
# persisting everything maximizes read/write traffic through the zstandard
# cache layer, whose corruption by concurrent writers SIGSEGVs jax 0.9.0 on
# subsequent reads (observed twice during full-suite runs sharing the cache
# dir with other processes; see also CLAUDE.md gotcha on interpret-mode
# pallas persistence).
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


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

