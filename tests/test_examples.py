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


# family/kernel VARIANTS of configurations already covered by a default-tier
# sibling (e.g. the 3/4-mode mixtures vs the 2-mode one, the hydro-kernel
# twins, the exp/lognormal n_particles twins of the gamma one) run on the
# slow tier; every physics class keeps one default-tier representative
SLOW_EXAMPLES = {
    "box_gamma_mixture_long",
    "box_gamma_mix_moving",  # 44 s: the MovingThreshold physics is default-
    # tier-covered by the parity + scenario tests; the example is slow-tier
    "box_gamma_mixture_3modes",
    "box_gamma_mixture_4modes",
    "box_gamma_mixture_hydro",
    "box_single_gamma_hydro",
    "box_single_lognorm",
    "n_particles_exp",
    "n_particles_lognorm",
    "condensation_exp_gamma",
    "single_particle_exp",
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in SLOW_EXAMPLES else n
        for n in ALL_EXAMPLES
    ],
)
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
