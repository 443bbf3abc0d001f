"""Scenario harness smoke tests (the cheap scenarios)."""

import numpy as np
import pytest

from cloudy_tpu import harness


def test_box_single_gamma_scenario(tmp_path):
    ts, ys, rep = harness.run_scenario(
        "box_single_gamma_golovin", outdir=str(tmp_path)
    )
    assert rep["finite"]
    # golovin number decay anchor
    np.testing.assert_allclose(
        ys[-1, 0], 1e8 * np.exp(-5.0 * 1e-2 * ts[-1]), rtol=1e-3
    )
    assert (tmp_path / "box_single_gamma_golovin.nc").exists()
    assert (tmp_path / "runs.jsonl").exists()


def test_exp_gamma_mixture_scenario(tmp_path):
    ts, ys, rep = harness.run_scenario("box_exp_gamma_mixture", outdir=str(tmp_path))
    assert rep["finite"]
    # total mass conserved (flat mass indices via the spec, exp has 2 moments)
    from cloudy_tpu.spec import Family, SpectrumSpec

    spec = SpectrumSpec((Family.EXPONENTIAL, Family.GAMMA))
    i0, i1 = spec.dist_moment_ind(0, 1), spec.dist_moment_ind(1, 1)
    np.testing.assert_allclose(
        ys[-1, i0] + ys[-1, i1], ys[0, i0] + ys[0, i1], rtol=1e-6
    )


def test_scenario_registry_complete():
    assert set(harness.SCENARIOS) == {
        "box_single_gamma_golovin",
        "box_exp_gamma_mixture",
        "box_long_numerical",
        "rainshaft_128",
        "pod_ensemble",
    }
