"""Tier-2: ALL example scripts as integration tests — the reference runs
every example as its own CI job (.buildkite/pipeline.yml:30-107); here every
script under examples/ runs with CLOUDY_EXAMPLE_FAST=1 (shortened horizon,
same physics configuration, full build → integrate → plot → NetCDF pipeline),
and a slow-marker subset re-runs the flagship cases at full length."""

import os
import subprocess
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")

ALL_EXAMPLES = sorted(
    f[:-3]
    for f in os.listdir(EXAMPLES)
    if f.endswith(".py") and f != "common.py"
)

# box/rainshaft/condensation scripts produce a NetCDF named after themselves;
# these produce plots/printouts only (the first two like their reference
# counterparts; calibration_example is BUILD-NEW with no reference analogue)
NO_NETCDF = {
    "parcel_example",
    "test_kernel_tensor_approximation",
    "calibration_example",
}


def _run_example(name, fast=True, timeout=420):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
    if fast:
        env["CLOUDY_EXAMPLE_FAST"] = "1"
    proc = subprocess.run(
        [sys.executable, f"{name}.py"],
        cwd=EXAMPLES,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def test_all_reference_examples_present():
    """Every reference example script has a counterpart (SURVEY §2 row 34),
    plus the BUILD-NEW calibration example (no reference analogue)."""
    assert len(ALL_EXAMPLES) == 23, ALL_EXAMPLES
    assert "calibration_example" in ALL_EXAMPLES


@pytest.mark.parametrize("name", ALL_EXAMPLES)
def test_example_runs(name):
    out = _run_example(name)
    if name in NO_NETCDF:
        assert ("done" in out) or ("max rel error" in out)
        return
    nc = os.path.join(EXAMPLES, "output", f"{name}.nc")
    assert os.path.exists(nc), out
    assert ("final moments" in out) or ("total mass" in out)


@pytest.mark.parametrize(
    "name", ["box_single_gamma", "box_mono_gamma_mixture"]
)
def test_flagship_examples_full_length(name):
    out = _run_example(name, fast=False)
    assert "final moments" in out
    png = os.path.join(EXAMPLES, "output", f"{name}_moments.png")
    assert os.path.exists(png)
