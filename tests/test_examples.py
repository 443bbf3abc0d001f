"""Tier-2: example scripts as integration tests (the reference runs every
example in CI, .buildkite/pipeline.yml:30-107). A fast subset runs here;
outputs (plots + NetCDF) must be produced and finite."""

import os
import subprocess
import sys

import numpy as np
import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")


def _run_example(name, timeout=420):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
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


@pytest.mark.parametrize(
    "name",
    ["box_single_gamma", "box_mono_gamma_mixture", "condensation_single_gamma"],
)
def test_box_examples_run(name):
    out = _run_example(name)
    assert "final moments" in out
    nc = os.path.join(EXAMPLES, "output", f"{name}.nc")
    assert os.path.exists(nc)
    png = os.path.join(EXAMPLES, "output", f"{name}_moments.png")
    assert os.path.exists(png)


def test_kernel_tensor_approximation_example():
    out = _run_example("test_kernel_tensor_approximation")
    assert "max rel error" in out


def test_parcel_example():
    out = _run_example("parcel_example")
    assert "parcel example done" in out
